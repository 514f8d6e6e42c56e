#!/usr/bin/env python
"""Minimize the full-suite jaxlib segfault (VERDICT r2 item 8 / weak #6).

Symptom: a single-process run of the whole test suite (~115 tests, hundreds
of compiled CPU executables) reproducibly segfaulted inside jaxlib during a
late donation-heavy GAN train step; every per-file subset passes.  The
mitigation is tests/conftest.py's per-module `jax.clear_caches()`.

This script reproduces the suspected mechanism WITHOUT pytest: compile many
distinct throwaway programs (like a long test session does), then run the
donation-heavy bi-TAI GAN train step.  Exit codes:
  0  no crash  (with --clear: supports "cache pressure" hypothesis if the
               no-clear run crashed)
  -11/other    crash reproduced -> stock-jaxlib bug, record alongside versions

ROUND-3 FINDINGS (2026-08-17, jax 0.8.x, 1-core CPU host):
  * 300 synthetic tiny-program compiles + 6 donation-heavy GAN steps: NO CRASH
    — executable-count churn alone is not the trigger.
  * Deterministic repro: `VFI_NO_CLEAR_CACHES=1 python -m pytest tests/ -q`
    segfaults after ~110 tests.  faulthandler stack: SIGSEGV **inside
    jax/_src/compiler.py:362 backend_compile_and_load** — i.e. during XLA:CPU
    COMPILATION of a fresh program (test_train_step init_state), not during
    execution and not in repo code.  The trigger is accumulated in-process
    compiler state from hundreds of LARGE programs (the earlier "donation-heavy
    step" attribution was wrong — the donation step merely sits late in the
    suite).  Upstream jaxlib bug; tests/conftest.py's per-module
    jax.clear_caches() keeps the accumulation bounded and remains the fix.

Usage:
  python scripts/repro_segfault.py [--programs N] [--clear]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def churn_programs(n: int, clear: bool):
    """Compile n distinct tiny programs (unique shapes force fresh
    executables), mimicking a long test session's executable accumulation."""
    import jax.numpy as jnp

    for i in range(n):
        size = 8 + i  # unique shape -> unique compilation
        f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum() + jnp.sin(x).mean())
        x = jnp.ones((size, size + 1), jnp.float32)
        float(f(x))
        if clear and i % 40 == 39:
            jax.clear_caches()
        if i % 50 == 0:
            print(f"  compiled {i}/{n} programs", flush=True)


def donation_heavy_step():
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    B, K, T, F, H, W = 8, 2, 2, 2, 32, 32
    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3)
    env = create_training_environment(model, cfg)
    rng = np.random.RandomState(0)
    batch = rng.uniform(-1, 1, (B, K + T + F, H, W, 1)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    for i in range(6):
        state, m = env.train_step(state, K, T, F, batch)
        print(f"  step {i}: G_loss={float(m['G_loss']):.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=300)
    ap.add_argument("--clear", action="store_true",
                    help="clear compile caches periodically (the conftest mitigation)")
    args = ap.parse_args()
    print(f"jax {jax.__version__}, devices: {len(jax.devices())}", flush=True)
    print(f"churning {args.programs} programs (clear={args.clear})...", flush=True)
    churn_programs(args.programs, args.clear)
    print("running donation-heavy GAN train steps...", flush=True)
    donation_heavy_step()
    print("NO CRASH", flush=True)


if __name__ == "__main__":
    main()
