#!/usr/bin/env python
"""Hardware smoke + timing sweep across the model zoo (round 3).

Every family the registry exposes gets a real-chip forward at a
representative shape — catches TPU-specific lowering issues (Mosaic, gather,
attention) that the CPU test suite cannot, and records a ms/batch figure.
OFFillInModel is host-side by design (Farnebäck/OpenCV) and is skipped.

Usage: python benchmarks/bench_zoo.py [iters]   Knobs: ZOO_DTYPE, ZOO_KEYS
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

from vfi_tpu.models.registry import create_model

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DTYPE = os.environ.get("ZOO_DTYPE", "bfloat16")

# key -> (B, K, T, F, H, W, c_dim)
CONFIGS = {
    "TimeWeightedInterpolationFillInModel_gray": (8, 5, 5, 5, 128, 128, 1),
    "BidirectionalTimeWeightedAverageFillInModel_gray": (8, 5, 5, 5, 128, 128, 1),
    "BidirectionalSimpleAverageFillInModel_gray": (8, 5, 5, 5, 128, 128, 1),
    "TimeWeightedPFFillInModel": (8, 5, 5, 5, 128, 128, 1),
    "MCNet_gray": (8, 5, 5, 2, 128, 128, 1),
    "SloMoFillInModel_color": (2, 2, 3, 2, 256, 320, 3),
    "SCTSkipConScaledTForward_gray": (2, 5, 5, 5, 128, 128, 1),
    "SCTFrameEncDecBNSkipConScaledTForward_gray": (2, 5, 5, 5, 128, 128, 1),
}


def main():
    keys = os.environ.get("ZOO_KEYS", "").split(",") if os.environ.get("ZOO_KEYS") else list(CONFIGS)
    for key in keys:
        B, K, T, F, H, W, C = CONFIGS[key]
        model = create_model(key)
        rng = jax.random.PRNGKey(0)
        p = jax.random.uniform(rng, (B, K, H, W, C), minval=-1.0, maxval=1.0)
        f = jax.random.uniform(rng, (B, F, H, W, C), minval=-1.0, maxval=1.0)
        try:
            variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
            if DTYPE == "bfloat16":
                variables, p, f = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                    (variables, p, f))
            fwd = jax.jit(lambda v, p, f: model.apply(v, T, p, f)["pred"])
            out = fwd(variables, p, f)
            np.asarray(out)  # compile + sync
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fwd(variables, p, f)
            arr = np.asarray(out)
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            assert np.isfinite(arr.astype(np.float32)).all(), f"{key}: non-finite output"
            print(json.dumps({"metric": f"zoo fwd {key} B={B} {H}x{W} T={T} [{DTYPE}]",
                              "value": round(ms, 1), "unit": "ms/batch",
                              "frames_per_sec": round(B * T / (ms / 1e3), 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"zoo fwd {key}", "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
