#!/usr/bin/env python
"""Dynamic-(K,T,F) train-step benchmark: ONE compiled program, random sampled
lengths every iteration (max K=F=7, T=10 — the KTH --sample_KTF envelope).

Round-1 number: 429 ms/iter (f32).  Usage: bench_dynamic_step.py [B] [iters]
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
from vfi_tpu.train.dynamic_env import create_dynamic_environment
from vfi_tpu.utils.config import TrainConfig

MAX_K = MAX_F = 7
MAX_T = 10
H = W = 128


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    for dtype in ("float32", "bfloat16"):
        model = TAIFillInModel(gf_dim=64, c_dim=1, feature_size=3, ks=51, num_block=5)
        cfg = TrainConfig(K=MAX_K, T=MAX_T, F=MAX_F, df_dim=64, Ip=1,
                          disc_window_size=5, train_dtype=dtype)
        env = create_dynamic_environment(model, cfg)
        batch = np.random.RandomState(0).uniform(
            -1, 1, (B, MAX_K + MAX_T + MAX_F, H, W, 1)).astype(np.float32)
        state = env.init_state(jax.random.PRNGKey(0), batch, MAX_K, MAX_T, MAX_F)
        targets = jax.numpy.asarray(batch)
        rng = np.random.RandomState(1)

        def ktf():
            return np.asarray([rng.randint(2, MAX_K + 1), rng.randint(1, MAX_T + 1),
                               rng.randint(2, MAX_F + 1)])

        state, terms = env.train_step_dynamic(state, targets, ktf())
        np.asarray(terms["G_loss"])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, terms = env.train_step_dynamic(state, targets, ktf())
        np.asarray(terms["G_loss"])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(json.dumps({"metric": f"bi-TAI DYNAMIC train step B={B} maxKTF=7/10/7 {dtype}",
                          "value": round(ms, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
