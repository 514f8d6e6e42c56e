"""High-level serving API.

The reference has no library-level entry point (everything goes through
predict.py); for production serving this exposes a minimal object API:

    from vfi_tpu.api import VideoInpainter
    ip = VideoInpainter.from_checkpoint("TAI_gray", "checkpoints/kth_bi-TAI")
    middles = ip.inpaint(preceding_u8, following_u8, T=5)   # uint8 in/out

Forward functions are jitted once per (batch, T, H, W) signature and cached;
inputs are uint8 RGB/gray frames, conversion to the model's BGR [-1,1] NHWC
convention happens inside.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.registry import create_model
from .train.environments import TrainState
from .utils import checkpoint as ckpt


class VideoInpainter:
    def __init__(self, model, g_params=None, dtype=jnp.float32):
        self.model = model
        self.g_params = g_params
        self.dtype = dtype
        self._host = getattr(model, "host_forward", None)

    @classmethod
    def from_checkpoint(
        cls,
        model_key: str,
        checkpoint_dir: Optional[str] = None,
        snapshot: str = "model_best.ckpt",
        dtype=jnp.float32,
    ) -> "VideoInpainter":
        model = create_model(model_key)
        if getattr(model, "host_forward", None) is not None or checkpoint_dir is None:
            return cls(model)
        # Shapes don't matter for params; init lazily on first call instead.
        inst = cls(model, g_params=None, dtype=dtype)
        inst._checkpoint = (checkpoint_dir, snapshot)
        return inst

    def _ensure_params(self, T, p, f):
        if self.g_params is not None or self._host is not None:
            return
        variables = jax.jit(self.model.init, static_argnums=1)(jax.random.PRNGKey(0), T, p, f)
        g_params = variables.get("params", {})
        if getattr(self, "_checkpoint", None):
            cdir, snap = self._checkpoint
            template = TrainState(step=np.zeros((), np.int32), g_params=g_params, g_opt=None)
            state, _ = ckpt.load_snapshot(cdir, snap, template)
            g_params = state.g_params
        self.g_params = jax.tree.map(lambda a: jnp.asarray(a, self.dtype), g_params)

    @functools.lru_cache(maxsize=8)
    def _fwd(self, T: int):
        @jax.jit
        def fwd(params, p, f):
            return self.model.apply({"params": params}, T, p, f)["pred"]

        return fwd

    @staticmethod
    def _to_model(frames_u8: np.ndarray, gray: bool) -> jnp.ndarray:
        x = frames_u8.astype(np.float32) / 255.0
        if x.ndim == 4:  # [T, H, W, C] -> add batch
            x = x[None]
        if x.shape[-1] == 3:
            x = x[..., ::-1]  # RGB -> BGR (framework convention)
            if gray:
                from .ops.image import _BGR_LUMA

                x = (x @ np.asarray(_BGR_LUMA, np.float32))[..., None]
        return jnp.asarray(x * 2.0 - 1.0)

    def inpaint(self, preceding_u8: np.ndarray, following_u8: np.ndarray, T: int) -> np.ndarray:
        """uint8 frames [B?, K, H, W, C] + [B?, F, H, W, C] -> uint8 middles.

        Accepts RGB (C=3) or single-channel input; returns the same layout.
        """
        squeeze = preceding_u8.ndim == 4
        gray = getattr(self.model, "c_dim", 3) == 1 and preceding_u8.shape[-1] == 3
        p = self._to_model(preceding_u8, gray)
        f = self._to_model(following_u8, gray)

        if self._host is not None:
            pred = self._host(T, np.asarray(p), np.asarray(f))["pred"]
        else:
            self._ensure_params(T, p, f)
            pred = np.asarray(self._fwd(T)(self.g_params, p.astype(self.dtype), f.astype(self.dtype)))

        out = np.clip((pred.astype(np.float32) + 1.0) / 2.0, 0.0, 1.0) * 255.0
        out = np.round(out).astype(np.uint8)
        if out.shape[-1] == 3:
            out = out[..., ::-1]  # BGR -> RGB
        return out[0] if squeeze else out
