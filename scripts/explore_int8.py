#!/usr/bin/env python
"""Does int8 convolution lower to the v5e MXU's 2x int8 path at all?

The serving forward is bandwidth-bound and conv-dominated (profile_infer.py:
71% conv fusions at 53-60% MXU efficiency, CLAUDE.md round-3 frontier), so an
int8 inference mode could in principle stack another ~1.5-2x on bf16 (half
the HBM traffic, double the MXU rate).  Before building anything, measure the
primitive: a chained conv tower (one launch per timing unit — per-op launches
cost ~40 ms tunnel RPC each) in bf16 vs int8-in/int32-out vs int8-storage/
bf16-compute.

Run: python scripts/explore_int8.py  (real chip; ~2 min warm)
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, KS = 64, 64, 64, 128, 5
DEPTH = 20  # convs chained inside one program
ITERS = 10

FLOP_PER_CONV = 2 * B * H * W * C * C * KS * KS


def conv(x, k, out_dtype):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def tower_bf16(x, k):
    for _ in range(DEPTH):
        x = conv(x, k, jnp.bfloat16)
        x = jnp.maximum(x, 0)
    return x


def tower_int8(x, k):
    # conv in int8 -> int32 accumulate -> rescale back to int8 to chain
    for _ in range(DEPTH):
        y = conv(x, k, jnp.int32)
        x = jnp.clip(y >> 12, -127, 127).astype(jnp.int8)
    return x


def tower_int8_storage(x, k):
    # int8 tensors in HBM, bf16 compute: tests the bandwidth-only win
    for _ in range(DEPTH):
        y = conv(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16) * (1.0 / 127), jnp.bfloat16)
        x = jnp.clip(y, -127, 127).astype(jnp.int8)
    return x


def bench(name, fn, x, k):
    f = jax.jit(fn)
    try:
        out = f(x, k)
        np.asarray(out[0, 0, 0, :1])  # force sync (block_until_ready lies over the tunnel)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED to compile/run: {type(e).__name__}: {e}")
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(x, k)
    np.asarray(out[0, 0, 0, :1])
    dt = (time.perf_counter() - t0) / ITERS
    per_conv_ms = dt / DEPTH * 1e3
    tops = FLOP_PER_CONV / (dt / DEPTH) / 1e12
    print(f"{name}: {dt*1e3:8.2f} ms/launch  {per_conv_ms:6.3f} ms/conv  {tops:6.1f} T{'OP' if 'int8 ' in name else 'FLOP'}/s")
    return per_conv_ms


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    xf = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32), jnp.bfloat16)
    kf = jnp.asarray((rng.uniform(-1, 1, (KS, KS, C, C)) / (C * KS)).astype(np.float32), jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
    ki = jnp.asarray(rng.randint(-127, 128, (KS, KS, C, C)), jnp.int8)

    r_bf16 = bench("bf16 conv       ", tower_bf16, xf, kf)
    r_int8 = bench("int8 conv (i32) ", tower_int8, xi, ki)
    r_i8st = bench("int8-storage/bf16", tower_int8_storage, xi, ki)
    if r_bf16 and r_int8:
        print(f"int8 speedup over bf16: {r_bf16 / r_int8:.2f}x")
    if r_bf16 and r_i8st:
        print(f"int8-storage speedup:   {r_bf16 / r_i8st:.2f}x")


if __name__ == "__main__":
    main()
