#!/usr/bin/env python
"""Microbenchmark: sepconv implementations at the bi-TAI operating point.

The bi-TAI forward calls sepconv twice per middle frame on [B*T, 128, 128]
gray images with ks=51 (tai.py:96-105) — B*T=40 at the training batch size.
Round-1 numbers (f32): mxu 27 ms, VPU pallas 94 ms.  The v2 pallas_mxu kernel
builds the banded matrix in VMEM (no S/slab HBM round-trips).

Usage:  python benchmarks/bench_sepconv.py [BT] [iters]
Prints one JSON line per (impl, dtype).
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

from vfi_tpu.ops.sepconv import sepconv


def run(impl, dtype, BT, iters, H=128, W=128, ks=51, grad=False):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (BT, H + ks - 1, W + ks - 1, 1), dtype)
    v = jax.random.normal(k[1], (BT, H, W, ks), dtype)
    h = jax.random.normal(k[2], (BT, H, W, ks), dtype)

    if grad:
        ct = jax.random.normal(k[3], (BT, H, W, 1), dtype)
        fn = jax.jit(jax.grad(
            lambda x, v, h: jnp.sum(sepconv(x, v, h, impl=impl) * ct).astype(jnp.float32),
            argnums=(0, 1, 2),
        ))

        def once():
            return fn(x, v, h)[1]
    else:
        fn = jax.jit(lambda x, v, h: sepconv(x, v, h, impl=impl))

        def once():
            return fn(x, v, h)

    np.asarray(once())  # compile + warm
    np.asarray(once())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = once()
    np.asarray(out)  # end-sync (per CLAUDE.md methodology)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    BT = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    impls = os.environ.get("SEPCONV_IMPLS", "mxu,pallas_mxu").split(",")
    dtypes = os.environ.get("SEPCONV_DTYPES", "float32,bfloat16").split(",")
    grad = os.environ.get("SEPCONV_GRAD") == "1"
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    results = {}
    for impl in impls:
        for dt in dtypes:
            ms = run(impl, jnp.dtype(dt), BT, iters, grad=grad) * 1000
            tag = "fwd+grad" if grad else "fwd"
            results[f"{impl}/{dt}"] = ms
            print(json.dumps({"metric": f"sepconv {tag} {impl} {dt} BT={BT} 128x128 ks=51",
                              "value": round(ms, 2), "unit": "ms"}))
    return results


if __name__ == "__main__":
    main()
