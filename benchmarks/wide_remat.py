#!/usr/bin/env python
"""Wide-W (UCF 256x320) GAN train step: sequential single-state variant A/B.

Variants (AB_MODE):
  remat (default) — MC-Net rollout remat OFF vs ON
  bwd             — sepconv backward: XLA-AD vs column-tiled fused adjoints

Two B=4 wide train states cannot coexist on the 16 GB chip (the interleaved
A/B attempt pushed the G program into a spilling schedule), so the variants
run SEQUENTIALLY in one process: variant A is built, timed in blocks, and
freed before variant B is built.  Multi-x effects dwarf the ±4% tunnel drift
that interleaving guards against; block spreads are printed so drift stays
visible.

Round-3 history this script settled: the recorded "B=2 261 ms vs B=4
2065-2403 ms memory cliff" was two stacked measurement artifacts
(bench_color.py fed the numpy batch per iteration = ~43 MB tunnel H2D per
step; ab_wide_bwd.py kept two B=4 states resident).  Clean B=4 bf16:
remat=0 351 ms, remat=1 392 ms — no cliff, remat not needed at B=4.

Usage: python benchmarks/wide_remat.py [iters_per_block] [blocks]
Knobs: AB_MODE (remat|bwd), AB_BATCH (default 4), AB_DTYPE (default bfloat16)
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import numpy as np

B = int(os.environ.get("AB_BATCH", "4"))
DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
MODE = os.environ.get("AB_MODE", "remat")
K, T, F, H, W = 4, 3, 4, 256, 320

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def run(tag: str, remat: bool = False, pallas_bwd: bool | None = None):
    if pallas_bwd is not None:
        # read at trace time by the sepconv dispatch (ops/sepconv.py)
        os.environ["SEPCONV_PALLAS_BWD"] = "1" if pallas_bwd else "0"
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51,
                           num_block=4, remat=remat)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=3,
                      train_dtype=DTYPE)
    env = create_training_environment(model, cfg)
    batch = np.random.RandomState(0).uniform(-1, 1, (B, K + T + F, H, W, 3)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    targets = jax.numpy.asarray(batch)
    state, m = env.train_step(state, K, T, F, targets)  # compile
    np.asarray(m["G_loss"])

    blocks = []
    for _ in range(BLOCKS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = env.train_step(state, K, T, F, targets)
        np.asarray(m["G_loss"])
        blocks.append((time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{tag}: blocks {[f'{b:.0f}' for b in blocks]} ms"
          f" -> median {np.median(blocks):.0f} ms (B={B}, {DTYPE}, 256x320)",
          flush=True)
    del state, targets, env, m
    gc.collect()


if MODE == "remat":
    run("remat=0", remat=False)
    run("remat=1", remat=True)
elif MODE == "bwd":
    run("xla_ad", pallas_bwd=False)
    run("pallas_adjoints", pallas_bwd=True)
else:
    raise SystemExit(f"unknown AB_MODE {MODE!r}")
