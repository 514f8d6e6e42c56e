#!/usr/bin/env python
"""Interleaved A/B of SEPCONV_NATIVE_LAYOUT inside ONE process (round 3).

Process-level A/Bs over the axon tunnel see ±4% run-to-run drift, which
swamped the first full-program comparison (933/949 vs 973 f/s across three
separate invocations).  Here both variants are compiled in the same process
and timed in alternating blocks, so tunnel/host state is shared and the only
difference is the compiled program.

Usage: python benchmarks/ab_native_layout.py [iters_per_block] [blocks]
Knobs: AB_BATCH (default 24), AB_DTYPE (default bfloat16)
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

B = int(os.environ.get("AB_BATCH", "24"))
DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
K = T = F = 5
H = W = 128

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def build(native: bool):
    os.environ["SEPCONV_NATIVE_LAYOUT"] = "1" if native else "0"
    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=1, feature_size=3, ks=51, num_block=5)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (B, K, H, W, 1), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (B, F, H, W, 1), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    if DTYPE == "bfloat16":
        variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))

    # distinct python callables -> distinct jit cache entries, each traced
    # under the env-var value in effect right now
    def fwd(v, p, f):
        return model.apply(v, T, p, f)["pred"]

    jfwd = jax.jit(fwd)
    np.asarray(jfwd(variables, p, f))  # compile + settle
    return jfwd, variables, p, f


def time_block(jfwd, variables, p, f, iters):
    out = jfwd(variables, p, f)
    np.asarray(out)  # sync before timing
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfwd(variables, p, f)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


a = build(True)
b = build(False)
res = {"native=1": [], "native=0": []}
for blk in range(BLOCKS):
    res["native=1"].append(time_block(*a, ITERS))
    res["native=0"].append(time_block(*b, ITERS))
for k, v in res.items():
    ms = np.array(v)
    fps = B * T / (ms / 1e3)
    print(f"{k}: blocks {[f'{m:.1f}' for m in v]} ms -> median {np.median(ms):.1f} ms"
          f" = {np.median(fps):.0f} frames/s (B={B}, {DTYPE})")
