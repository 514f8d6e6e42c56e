#!/usr/bin/env python
"""Interleaved A/B: int8 serving modes (VFI_INT8) vs bf16, ONE process.

The v5e MXU runs int8 at 2x the bf16 rate and the serving forward is
conv-dominated (profile_infer.py), so the QConv modes (nn/quant.py) should
stack on bf16.  Variants:
  * bf16  — the production serving path (baseline)
  * int8d — VFI_INT8=1 dynamic per-batch activation scales (extra amax pass)
  * int8s — VFI_INT8=2 static calibrated scales ("quant" collection; the
            quantize fuses into the producer epilogue, no extra pass)

Methodology per CLAUDE.md: all variants compiled in the same process, timed
in alternating blocks; also reports the output agreement (max-abs + PSNR vs
the bf16 program on identical weights/inputs).

Usage: python benchmarks/ab_int8.py [iters_per_block] [blocks]
Knobs: AB_BATCH (default 64; 16 with AB_COLOR), AB_T (default 5; 3 with
AB_COLOR), AB_SKIP_DYNAMIC=1, AB_COLOR=1 (TAI_color 256x320 num_block=4,
the UCF/HMDB serving shape)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

COLOR = os.environ.get("AB_COLOR", "0") == "1"
B = int(os.environ.get("AB_BATCH", "16" if COLOR else "64"))
K = F = 4 if COLOR else 5
T = int(os.environ.get("AB_T", "3" if COLOR else "5"))
H, W = (256, 320) if COLOR else (128, 128)
C = 3 if COLOR else 1
NUM_BLOCK = 4 if COLOR else 5

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def build(mode: str):
    os.environ["VFI_INT8"] = mode
    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=C, feature_size=3, ks=51, num_block=NUM_BLOCK)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (B, K, H, W, C), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (B, F, H, W, C), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))
    if mode == "2":
        # one-batch calibration: populate the "quant" act_amax scalars
        calib = jax.jit(
            lambda v, p, f: model.apply(v, T, p, f, mutable=["quant"])[1],
            static_argnums=(),
        )
        quant = calib(variables, p, f)
        variables = {**variables, **jax.device_get(quant)}

    def fwd(v, p, f):
        return model.apply(v, T, p, f)["pred"]

    jfwd = jax.jit(fwd)
    out = np.asarray(jfwd(variables, p, f)).astype(np.float32)  # compile + settle
    os.environ["VFI_INT8"] = "0"
    return jfwd, variables, p, f, out


def time_block(jfwd, variables, p, f, iters):
    out = jfwd(variables, p, f)
    np.asarray(out)  # sync before timing
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfwd(variables, p, f)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


variants = {}
variants["int8s"] = build("2")
if os.environ.get("AB_SKIP_DYNAMIC", "0") != "1":
    variants["int8d"] = build("1")
variants["bf16"] = build("0")

ref = variants["bf16"][4]
for name, v in variants.items():
    if name == "bf16":
        continue
    d = np.abs(v[4] - ref)
    mse = float(np.mean((v[4] / 2 - ref / 2) ** 2))  # [-1,1] -> [0,1] scale
    print(f"{name}-vs-bf16 output: max abs {d.max():.4f}, mean {d.mean():.5f}, "
          f"PSNR {10 * np.log10(1.0 / max(mse, 1e-20)):.1f} dB")

res = {k: [] for k in variants}
for blk in range(BLOCKS):
    for k, v in variants.items():
        res[k].append(time_block(*v[:4], ITERS))
for k, v in res.items():
    ms = np.array(v)
    fps = B * T / (ms / 1e3)
    print(f"{k}: blocks {[f'{m:.1f}' for m in v]} ms -> median {np.median(ms):.1f} ms"
          f" = {np.median(fps):.0f} frames/s (B={B}, T={T})")
