#!/usr/bin/env python
"""Hardware-validate the UCF-101/HMDB color configuration (VERDICT r2 item 5).

Reference config (exp_args/default_args/UCF-101/train.txt + create_model.py:29):
TAI_color = TAIFillInModel(64, 3, 3, 51, num_block=4), K=F=4, T=3, RGB
240x320 with --padding_size 16 0 -> network shape 256x320.

Measures forward inference f/s and one GAN train-step ms at that shape —
exercises the Pallas sepconv tiling/VMEM picker at W=320 (ops/sepconv.py
dispatches per-shape; this was only ever run at W=128 before round 3).

Knobs: C_DTYPE=float32|bfloat16, C_BATCH (default 4), C_PARTS=fwd,train,
C_REMAT=1 (gradient-checkpoint rollout submodules).
Usage: python benchmarks/bench_color.py [iters]

HISTORY: the round-3 "B=4 memory cliff" (2065 ms/step vs 261 at B=2) was a
measurement artifact of THIS script — the train loop used to feed the host
numpy batch into train_step every iteration, re-uploading ~43 MB over the
axon tunnel per step.  With the batch device-put once (like every other
train bench), B=4 bf16 measures 351 ms/step (87.8 ms/sample — better
per-sample than B=2) and remat is NOT needed: the G program's planned temp
is 15.60 GiB at B=4 (AOT memory_analysis, benchmarks/mem_wide.py), which
fits beside a single resident train state.  The 2403-2737 ms A/B readings
(ab_wide_bwd.py) carry the second artifact: TWO resident B=4 states push
the program past HBM into a spilling schedule.
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

B = int(os.environ.get("C_BATCH", "4"))
K, T, F, H, W = 4, 3, 4, 256, 320
DTYPE = os.environ.get("C_DTYPE", "bfloat16")


def _cast(tree):
    if DTYPE == "bfloat16":
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16), tree)
    return tree


def bench_fwd(iters):
    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51, num_block=4)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (B, K, H, W, 3), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (B, F, H, W, 3), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    variables, p, f = _cast((variables, p, f))

    fwd = jax.jit(lambda v, p, f: model.apply(v, T, p, f)["pred"])
    np.asarray(fwd(variables, p, f))
    np.asarray(fwd(variables, p, f))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, p, f)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return B * T / dt, dt * 1000


def bench_train(iters):
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51, num_block=4,
                           remat=os.environ.get("C_REMAT", "0") == "1")
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=3,
                      train_dtype=DTYPE)
    env = create_training_environment(model, cfg)
    rng = np.random.RandomState(0)
    batch = rng.uniform(-1, 1, (B, K + T + F, H, W, 3)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    # Device-put ONCE: feeding the numpy batch per iteration re-uploads
    # ~43 MB/step over the tunnel and dominated the old measurement.
    targets = jnp.asarray(batch)

    # chain the evolving state through the loop so donation works
    state, m = env.train_step(state, K, T, F, targets)
    np.asarray(m["G_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = env.train_step(state, K, T, F, targets)
    np.asarray(m["G_loss"])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    parts = os.environ.get("C_PARTS", "fwd,train").split(",")
    if "fwd" in parts:
        fps, ms = bench_fwd(iters)
        print(json.dumps({"metric": f"TAI_color 256x320 inference B={B} [{DTYPE}]",
                          "value": round(fps, 1), "unit": "frames/sec/chip",
                          "ms_per_batch": round(ms, 1)}))
    if "train" in parts:
        ms = bench_train(iters)
        tag = DTYPE + (" remat" if os.environ.get("C_REMAT", "0") == "1" else "")
        print(json.dumps({"metric": f"TAI_color 256x320 GAN train step B={B} [{tag}]",
                          "value": round(ms, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
