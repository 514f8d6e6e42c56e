#!/usr/bin/env python
"""Interleaved A/B: bi-TAI GAN train step with plain C=1 first convs vs the
VFI_PAD_C1 padded-channel variant — in ONE process.

The padded variant (nn/layers.py:PadC1Conv) is numerically identical; the
question is purely whether an 8-wide minor dim on the rollout's first-stage
conv inputs removes enough of the C=1 relayout work (~7% of the G-step in
the round-3 profile) to matter.  Process-level runs over the axon tunnel
drift +-4%, so the variants alternate in timed blocks in one process
(CLAUDE.md round-3 methodology).

The env var is read at module-construction/trace time, so each variant
builds its own environment under the value in effect then; the param
pytrees are identical.

Usage: python benchmarks/ab_pad_c1.py [iters_per_block] [blocks]
Knobs: AB_BATCH (default 8), AB_DTYPE (default bfloat16)
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

B = int(os.environ.get("AB_BATCH", "8"))
DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
K = T = F = 5
H = W = 128

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def build(pad_c1: bool):
    os.environ["VFI_PAD_C1"] = "1" if pad_c1 else "0"
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    model = TAIFillInModel(gf_dim=64, c_dim=1, feature_size=3, ks=51, num_block=5)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=5,
                      train_dtype=DTYPE)
    env = create_training_environment(model, cfg)
    batch = np.random.RandomState(0).uniform(-1, 1, (B, K + T + F, H, W, 1)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    targets = jax.numpy.asarray(batch)
    state, m = env.train_step(state, K, T, F, targets)  # compile
    np.asarray(m["G_loss"])
    return [env, state, targets]


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


a = build(False)
b = build(True)
res = {"plain_c1": [], "pad_c1": []}
for blk in range(BLOCKS):
    res["plain_c1"].append(time_block(a, ITERS))
    res["pad_c1"].append(time_block(b, ITERS))
for k, v in res.items():
    ms = np.array(v)
    print(f"{k}: blocks {[f'{m:.1f}' for m in v]} ms -> median {np.median(ms):.1f} ms"
          f" (B={B}, {DTYPE}, KTH 128x128)")
