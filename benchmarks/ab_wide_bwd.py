#!/usr/bin/env python
"""Interleaved A/B: wide-W (UCF 256x320) GAN train step, XLA-AD sepconv
backward vs the column-tiled fused Pallas adjoints — in ONE process.

Process-level runs over the axon tunnel drift too much to trust
(CLAUDE.md round-3 lesson); the two variants here share tunnel/host state
and alternate in timed blocks.  The SEPCONV_PALLAS_BWD env var is read at
trace time, so each variant builds its own environment and traces its step
under the value in effect then.

Usage: python benchmarks/ab_wide_bwd.py [iters_per_block] [blocks]
Knobs: AB_BATCH (default 2), AB_DTYPE (default bfloat16)

CAUTION: this script keeps BOTH variants' train states resident.  At B=4
the wide G program plans 15.60 GiB of temp (benchmarks/mem_wide.py) — two
resident states push it into a spilling schedule and the readings become
memory-pressure artifacts (the round-3 "2403-2737 ms" numbers).  For B>=3
use benchmarks/wide_remat.py AB_MODE=bwd, which runs the variants
sequentially with a single resident state (clean B=4: 350 vs 385 ms).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import numpy as np

B = int(os.environ.get("AB_BATCH", "2"))
DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
K, T, F, H, W = 4, 3, 4, 256, 320

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def build(pallas_bwd: bool):
    os.environ["SEPCONV_PALLAS_BWD"] = "1" if pallas_bwd else "0"
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51, num_block=4)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=3,
                      train_dtype=DTYPE)
    env = create_training_environment(model, cfg)
    batch = np.random.RandomState(0).uniform(-1, 1, (B, K + T + F, H, W, 3)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    targets = jax.numpy.asarray(batch)
    state, m = env.train_step(state, K, T, F, targets)  # compile
    np.asarray(m["G_loss"])
    return env, state, targets


def time_block(rec, iters):
    env, state, targets = rec
    state, m = env.train_step(state, K, T, F, targets)
    np.asarray(m["G_loss"])  # sync before timing
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = env.train_step(state, K, T, F, targets)
    np.asarray(m["G_loss"])
    rec[1] = state  # chain the evolving state so donation stays live
    return (time.perf_counter() - t0) / iters * 1e3


a = list(build(False))
b = list(build(True))
res = {"xla_ad": [], "pallas_adjoints": []}
for blk in range(BLOCKS):
    res["xla_ad"].append(time_block(a, ITERS))
    res["pallas_adjoints"].append(time_block(b, ITERS))
for k, v in res.items():
    ms = np.array(v)
    print(f"{k}: blocks {[f'{m:.0f}' for m in v]} ms -> median {np.median(ms):.0f} ms"
          f" (B={B}, {DTYPE}, 256x320)")
