#!/usr/bin/env python
"""Interleaved batch sweep for wide-W (UCF 256x320) TAI_color INFERENCE.

The recorded wide serving number (96.7 f/s at B=4) predates the B=48 KTH
finding that small batches under-utilize the chip.  Inference states are
small enough that several batch variants coexist on-chip, so this is a true
interleaved A/B (the only trustworthy comparison over the tunnel).

Usage: python benchmarks/ab_color_batch.py [iters_per_block] [blocks] [B ...]
Knobs: AB_DTYPE (default bfloat16)
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

DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
K, T, F, H, W = 4, 3, 4, 256, 320

args = sys.argv[1:]
ITERS = int(args[0]) if len(args) > 0 else 10
BLOCKS = int(args[1]) if len(args) > 1 else 4
BATCHES = [int(a) for a in args[2:]] or [4, 8, 16, 24]


def build(B):
    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51, num_block=4)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (B, K, H, W, 3), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (B, F, H, W, 3), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    if DTYPE == "bfloat16":
        variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))
    fwd = jax.jit(lambda v, p, f: model.apply(v, T, p, f)["pred"])
    np.asarray(fwd(variables, p, f))  # compile
    return fwd, variables, p, f


def time_block(rec, iters):
    fwd, variables, p, f = rec
    np.asarray(fwd(variables, p, f))  # sync
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, p, f)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


recs = {}
for B in BATCHES:
    try:
        recs[B] = build(B)
    except Exception as e:  # OOM a variant (e.g. B=64 wide), keep the rest
        print(f"B={B}: skipped ({type(e).__name__}: {str(e)[:120]})", flush=True)
BATCHES = [B for B in BATCHES if B in recs]
fps = {B: [] for B in BATCHES}
for _ in range(BLOCKS):
    for B in BATCHES:
        dt = time_block(recs[B], ITERS)
        fps[B].append(B * T / dt)
for B in BATCHES:
    v = np.array(fps[B])
    print(f"B={B}: blocks {[f'{x:.0f}' for x in v]} f/s -> median {np.median(v):.0f}"
          f" ({DTYPE}, 256x320)")
