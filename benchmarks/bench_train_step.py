#!/usr/bin/env python
"""bf16-vs-f32 train-step post-mortem (bi-TAI, B=8, KTH shapes).

Round-1 finding: the mixed-precision (--train_dtype bfloat16) train step
measured SLOWER than f32 (493 ms vs 276 ms) — suspected bf16 conv-backward
lowering.  This script separates the G and D programs per dtype, and prints
XLA cost-analysis stats for each compiled program so the regressing one can
be identified without a trace viewer.

Usage: python benchmarks/bench_train_step.py [B] [iters]
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
import numpy as np

from vfi_tpu.models.fill_in import TAIFillInModel
from vfi_tpu.train.environments import create_training_environment
from vfi_tpu.utils.config import TrainConfig

K = T = F = 5
H = W = 128


def build(train_dtype, B):
    # SEPCONV_IMPL=mxu|pallas_mxu forces the sepconv implementation inside the
    # model (default: backend dispatch) for fwd/bwd ablations.
    impl = os.environ.get("SEPCONV_IMPL") or None
    # REMAT=1: gradient-checkpoint the rollout submodules (memory for compute)
    model = TAIFillInModel(gf_dim=64, c_dim=1, feature_size=3, ks=51, num_block=5,
                           sepconv_impl=impl,
                           remat=os.environ.get("REMAT", "0") == "1")
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=5,
                      train_dtype=train_dtype)
    env = create_training_environment(model, cfg)
    batch = np.random.RandomState(0).uniform(-1, 1, (B, K + T + F, H, W, 1)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    return env, state, jax.numpy.asarray(batch)


def time_programs(env, state, targets, iters):
    """Chains the evolving state through the loop like a real trainer, so
    donation works and no per-iteration state copies distort the numbers."""
    gstate = (state.g_params, state.g_opt, state.rng, state.step)
    d_frozen = (state.d_params, state.d_sn)
    dstate = (state.d_params, state.d_sn, state.d_opt)

    gstate, pred, _ = env._g_update(gstate, d_frozen, K, T, F, targets)
    np.asarray(pred)  # compile + sync

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        gstate, out, _ = env._g_update(gstate, d_frozen, K, T, F, targets)
    np.asarray(out)
    g_ms = (time.perf_counter() - t0) / iters * 1000

    dstate, terms = env._d_update(dstate, pred, K, T, F, targets)
    np.asarray(terms["D_fake"])
    t0 = time.perf_counter()
    for _ in range(iters):
        dstate, terms = env._d_update(dstate, pred, K, T, F, targets)
    np.asarray(terms["D_fake"])
    d_ms = (time.perf_counter() - t0) / iters * 1000
    return g_ms, d_ms


def cost_stats(env, state, targets):
    """XLA cost analysis of the lowered G program (flops / bytes accessed)."""
    gstate = (state.g_params, state.g_opt, state.rng, state.step)
    d_frozen = (state.d_params, state.d_sn)
    lowered = env._g_update.lower(gstate, d_frozen, K, T, F, targets)
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {k: ca.get(k) for k in ("flops", "bytes accessed")}
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtypes = os.environ.get("TS_DTYPES", "float32,bfloat16").split(",")
    remat_tag = " remat" if os.environ.get("REMAT", "0") == "1" else ""
    for dtype in dtypes:
        env, state, targets = build(dtype, B)
        g_ms, d_ms = time_programs(env, state, targets, iters)
        stats = cost_stats(env, state, targets) if os.environ.get("COST_ANALYSIS") else {}
        row = {"metric": f"bi-TAI train step B={B} {dtype}{remat_tag}",
               "G_ms": round(g_ms, 1), "D_ms": round(d_ms, 1),
               "total_ms": round(g_ms + d_ms, 1), **stats}
        # Auditable roofline position of the G program (VERDICT r3 Weak #6):
        # fractions of the v5e peaks (single source of truth in
        # benchmarks/roofline_trace.py), over the measured G step time.
        # Floors — the analysis can't see inside the Pallas adjoint custom
        # calls.
        if stats.get("flops"):
            from roofline_trace import PEAK_GBS, PEAK_TFLOPS

            g_s = g_ms / 1000.0
            row["mfu"] = round(stats["flops"] / 1e12 / g_s / PEAK_TFLOPS, 4)
            row["hbm_frac"] = round(stats["bytes accessed"] / 1e9 / g_s / PEAK_GBS, 4)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
