#!/usr/bin/env python
"""Decompose the bi-TAI G-step cost: time fwd+grad of the big sub-modules in
isolation at the training operating point (B=8, K=T=F=5, gray 128^2).

Parts:
  mcnet     — the doubled-batch bidirectional MC-Net rollout (B_eff=16)
  full      — the whole generator forward for reference

Knobs (env):
  G_PARTS=mcnet,full    which parts to run
  G_DTYPE=float32       float32 | bfloat16 (params + inputs cast)
  G_SCAN=0              1 -> MCNet(scan_rollout=True)
  G_REMAT=0             1 -> MCNet(remat=True)
  G_BATCH=8             training batch (mcnet doubles it)

Usage: python benchmarks/bench_g_parts.py [iters]
"""

import json
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

B = int(os.environ.get("G_BATCH", "8"))
K, T, F, H, W = 5, 5, 5, 128, 128
DTYPE = os.environ.get("G_DTYPE", "float32")
SCAN = os.environ.get("G_SCAN", "0") == "1"
REMAT = os.environ.get("G_REMAT", "0") == "1"


def _cast(tree):
    if DTYPE == "bfloat16":
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16), tree)
    return tree


def _timed(fn, *args, iters):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000


def bench_mcnet(iters):
    from vfi_tpu.nn.mcnet import MCNet

    model = MCNet(gf_dim=64, c_dim=1, scan_rollout=SCAN, remat=REMAT)
    rng = jax.random.PRNGKey(0)
    Beff = 2 * B  # both directions as one doubled batch
    diff = jax.random.normal(rng, (Beff, K - 1, H, W, 1))
    xt = jax.random.normal(rng, (Beff, H, W, 1))
    variables = jax.jit(model.init, static_argnums=1)(rng, T, diff, xt)
    variables, diff, xt = _cast((variables, diff, xt))

    def loss(params, diff, xt):
        out = model.apply({"params": params}, T, diff, xt)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in jax.tree.leaves(out))

    g = jax.jit(jax.grad(loss))
    return _timed(g, variables["params"], diff, xt, iters=iters)


def bench_full(iters):
    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=1, feature_size=3, ks=51, num_block=5,
                           scan_rollout=SCAN, remat=REMAT)
    rng = jax.random.PRNGKey(0)
    p = jax.random.normal(rng, (B, K, H, W, 1))
    f = jax.random.normal(rng, (B, F, H, W, 1))
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    variables, p, f = _cast((variables, p, f))

    def loss(params, p, f):
        out = model.apply({"params": params}, T, p, f)
        return jnp.sum(out["pred"].astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    return _timed(g, variables["params"], p, f, iters=iters)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    parts = os.environ.get("G_PARTS", "mcnet,full").split(",")
    tag = f"{DTYPE}{' scan' if SCAN else ''}{' remat' if REMAT else ''}"
    for part in parts:
        ms = {"mcnet": bench_mcnet, "full": bench_full}[part](iters)
        print(json.dumps({"metric": f"bi-TAI G-part {part} fwd+grad B={B} [{tag}]",
                          "value": round(ms, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
