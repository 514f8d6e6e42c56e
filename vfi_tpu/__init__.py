"""vfi_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-frame-inpainting framework.

Re-designed from scratch with the capabilities of MichiganCOG/video-frame-inpainting
(the official code for "A Temporally-Aware Interpolation Network for Video Frame
Inpainting", Sun, Szeto & Corso, ACCV 2018).

The task: given K *preceding* frames and F *following* frames of a video, generate
the T *middle* frames.  All models share one forward signature
``model.apply(variables, T, preceding_frames, following_frames) -> {'pred': ...}``
(reference: src/environments/environments.py:86-89).

Conventions (deliberately different from the torch reference — TPU-first):
  * frames are NHWC:  videos are ``[B, T, H, W, C]`` float32/bfloat16 in [-1, 1]
  * per-pixel 1-D kernels are channels-last: ``[B, H, W, ks]`` (ks on TPU lanes)
  * models are flax.linen Modules; training steps are pure jitted functions
  * parallelism is expressed via ``jax.sharding.Mesh`` + NamedSharding, never
    explicit device placement
"""

__version__ = "0.1.0"
