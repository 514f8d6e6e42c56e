#!/usr/bin/env python
"""Interleaved serving-batch comparison in ONE process (round 3).

Single-run batch sweeps over the axon tunnel drift +-4%, which is larger
than the differences between the large-batch candidates — so the candidate
batches are compiled together and timed in alternating blocks.

Usage: python benchmarks/ab_batch.py [iters] [blocks]
Knobs: AB_BATCHES (comma list, default "48,96,128"; "8,16,32" with
AB_COLOR), AB_DTYPE, AB_INT8=1 (static-calibrated int8 serving mode,
nn/quant.py), AB_COLOR=1 (TAI_color 256x320 num_block=4)
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
BATCHES = [int(b) for b in os.environ.get(
    "AB_BATCHES", "8,16,32" if COLOR else "48,96,128").split(",")]
DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
K = F = 4 if COLOR else 5
T = int(os.environ.get("AB_T", "3" if COLOR else "5"))  # 10 = the KTH m=10 config
H, W = (256, 320) if COLOR else (128, 128)
C = 3 if COLOR else 1
NUM_BLOCK = 4 if COLOR else 5
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


INT8 = os.environ.get("AB_INT8", "0") == "1"


def build(B):
    if INT8:
        os.environ["VFI_INT8"] = "2"  # read at trace time by nn.layers.Conv
    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=C, feature_size=3, ks=51, num_block=NUM_BLOCK)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (B, K, H, W, C), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (B, F, H, W, C), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    if DTYPE == "bfloat16":
        variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))
    if INT8:
        calib = jax.jit(lambda v, p, f: model.apply(v, T, p, f, mutable=["quant"])[1])
        variables = {**variables, **jax.device_get(calib(variables, p, f))}
    jfwd = jax.jit(lambda v, p, f: model.apply(v, T, p, f)["pred"])
    np.asarray(jfwd(variables, p, f))
    return jfwd, variables, p, f


def time_block(jfwd, variables, p, f, iters):
    np.asarray(jfwd(variables, p, f))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jfwd(variables, p, f)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


built = {}
for B in BATCHES:
    try:
        built[B] = build(B)
    except Exception as e:  # OOM at large wide batches: skip, keep sweeping
        print(f"B={B}: SKIPPED ({type(e).__name__}: {str(e)[:200]})")
BATCHES = [B for B in BATCHES if B in built]
res = {B: [] for B in BATCHES}
for blk in range(BLOCKS):
    for B in BATCHES:
        res[B].append(time_block(*built[B], max(4, ITERS * 48 // B)))
for B in BATCHES:
    ms = np.median(res[B])
    print(f"B={B}: blocks {[f'{m:.1f}' for m in res[B]]} ms -> median {ms:.1f} ms "
          f"= {B * T / (ms / 1e3):.0f} frames/s ({DTYPE}{'+int8' if INT8 else ''})")
