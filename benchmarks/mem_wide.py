#!/usr/bin/env python
"""Peak-HBM attribution for the wide-W (UCF 256x320) GAN train step.

This probe AOT-compiles the G and D update programs at several batch sizes
(optionally with rollout remat) and prints XLA's memory_analysis() — peak
HBM temp, argument and output sizes — so memory questions get numbers, not
guesses.  Measured (bf16, remat=0): G temp 10.67 GiB at B=2, 15.60 GiB at
B=4 — a single resident train state fits beside B=4 on the 16 GB v5e, a
second one does not.  This probe is what exposed the round-3 "B=4 memory
cliff" as a pair of measurement artifacts (see benchmarks/wide_remat.py).

Usage: python benchmarks/mem_wide.py [B ...]   (default: 2 4)
Knobs: MEM_DTYPE (default bfloat16), MEM_REMAT=1 (rollout submodule remat)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import numpy as np

DTYPE = os.environ.get("MEM_DTYPE", "bfloat16")
REMAT = os.environ.get("MEM_REMAT", "0") == "1"
K, T, F, H, W = 4, 3, 4, 256, 320
BATCHES = [int(a) for a in sys.argv[1:]] or [2, 4]


def build(B):
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51,
                           num_block=4, remat=REMAT)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=3,
                      train_dtype=DTYPE)
    env = create_training_environment(model, cfg)
    batch = np.random.RandomState(0).uniform(-1, 1, (B, K + T + F, H, W, 3)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    return env, state, jax.numpy.asarray(batch)


def report(tag, compiled):
    m = compiled.memory_analysis()
    gib = 1024**3
    print(f"  {tag}: peak {m.temp_size_in_bytes / gib:.2f} GiB temp, "
          f"args {m.argument_size_in_bytes / gib:.2f}, "
          f"out {m.output_size_in_bytes / gib:.2f}, "
          f"alias {m.alias_size_in_bytes / gib:.2f} GiB", flush=True)


for B in BATCHES:
    print(f"B={B} {DTYPE} remat={REMAT} 256x320 TAI_color:", flush=True)
    env, state, targets = build(B)
    gstate = (state.g_params, state.g_opt, state.rng, state.step)
    d_frozen = (state.d_params, state.d_sn)
    g_lowered = type(env)._g_update.lower(env, gstate, d_frozen, K, T, F, targets)
    g_compiled = g_lowered.compile()
    report("G", g_compiled)
    pred_shape = jax.eval_shape(
        lambda gs, df, t: type(env)._g_update(env, gs, df, K, T, F, t)[1],
        gstate, d_frozen, targets)
    pred = jax.numpy.zeros(pred_shape.shape, pred_shape.dtype)
    dstate = (state.d_params, state.d_sn, state.d_opt)
    d_compiled = type(env)._d_update.lower(env, dstate, pred, K, T, F, targets).compile()
    report("D", d_compiled)
