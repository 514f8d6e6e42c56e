#!/usr/bin/env python
"""Interleaved A/B: four separate kernel heads vs one merged (grouped-conv) stack.

Round-3 roofline finding (benchmarks/roofline_trace.py): the four KernelHead
branches (vfi_tpu/nn/kernelnet.py:122-125) are the worst-utilized convs in the
inference program — C_out=51 post_up at ~21% MXU (lanes = 51/128) and C_out=64
conv_i at ~28% — because each branch is too narrow to fill the 128-lane MXU.
All four branches consume the SAME decoder feature, so they merge exactly:

  variant A (shipped): 4x [conv64 -> relu -> conv64 -> relu -> conv51 -> relu
                            -> up2x -> conv51]
  variant B (merged) : conv256 (dense, weights concatenated along C_out)
                       -> relu -> grouped conv256 (groups=4) -> relu
                       -> grouped conv204 (groups=4) -> relu -> up2x
                       -> grouped conv204 (groups=4), then split 4x 51.

B is mathematically identical to A (same weights, block-diagonal); the open
question is whether XLA lowers feature_group_count=4 onto the MXU better than
four narrow convs.  This script answers it with an interleaved same-process
A/B (the only trustworthy comparison over the axon tunnel) plus an exactness
check.

Usage: python benchmarks/ab_merged_heads.py [iters] [blocks]
Knobs: AB_SHAPE=wide|kth (default wide), AB_DTYPE (default bfloat16),
PROFILE=1 — compare per-variant DEVICE time from jax.profiler traces instead
of wall clock.  Wall clock is useless here: a ~30 ms subgraph dispatched over
the axon tunnel is launch-rate-limited (~40 ms RPC per launch), so the
device-time comparison is the only meaningful one for a kernel this small.
"""

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

from vfi_tpu.ops.image import upsample2x_bilinear

DTYPE = os.environ.get("AB_DTYPE", "bfloat16")
SHAPE = os.environ.get("AB_SHAPE", "wide")
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

KS = 51
KF2 = 64  # kf_dim * 2
LAYERS = 3
if SHAPE == "wide":
    # TAI_color 256x320 B=16: heads run at H/2 x W/2 on the doubled batch
    B, H2, W2 = 32, 128, 160
else:
    # KTH 128^2 B=48 inference: fold = 2B*T? heads see the T-folded batch
    B, H2, W2 = 240, 64, 64


def init_weights(rng):
    ws = []
    keys = jax.random.split(rng, 4 * (LAYERS + 1) * 2)
    ki = iter(range(len(keys)))

    def mk(cin, cout):
        w = jax.random.normal(keys[next(ki)], (3, 3, cin, cout)) * 0.05
        b = jax.random.normal(keys[next(ki)], (cout,)) * 0.01
        return w, b

    for _ in range(4):  # four heads
        head = [mk(KF2, KF2) for _ in range(LAYERS - 2)]
        head.insert(0, mk(KF2, KF2))
        head.append(mk(KF2, KS))  # to_ks
        head.append(mk(KS, KS))  # post_up
        ws.append(head)
    return ws


def conv(x, w, b, groups=1):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def separate_stack(x, ws):
    outs = []
    for head in ws:
        h = x
        for w, b in head[:-1]:
            h = jax.nn.relu(conv(h, w, b))
        h = upsample2x_bilinear(h, True)
        w, b = head[-1]
        outs.append(conv(h, w, b))
    return outs


def merged_weights(ws):
    """Concatenate the 4 heads' weights: first conv along C_out (shared
    input), every later conv block-diagonally via feature_group_count=4."""
    merged = []
    n = len(ws[0])
    for li in range(n):
        w = jnp.concatenate([head[li][0] for head in ws], axis=3)
        b = jnp.concatenate([head[li][1] for head in ws], axis=0)
        merged.append((w, b))
    return merged


def merged_stack(x, mws):
    w, b = mws[0]
    h = jax.nn.relu(conv(x, w, b))  # dense: shared input, C_out = 4*KF2
    for w, b in mws[1:-2]:
        h = jax.nn.relu(conv(h, w, b, groups=4))
    w, b = mws[-2]
    h = jax.nn.relu(conv(h, w, b, groups=4))  # to_ks: C_out = 4*KS
    h = upsample2x_bilinear(h, True)
    w, b = mws[-1]
    h = conv(h, w, b, groups=4)  # post_up
    return [h[..., i * KS:(i + 1) * KS] for i in range(4)]


def main():
    rng = jax.random.PRNGKey(0)
    ws = init_weights(rng)
    mws = merged_weights(ws)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H2, W2, KF2))
    if DTYPE == "bfloat16":
        cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
        ws, mws, x = cast(ws), cast(mws), cast(x)

    sep = jax.jit(lambda x, ws: separate_stack(x, ws))
    mer = jax.jit(lambda x, mws: merged_stack(x, mws))

    a = sep(x, ws)
    b = mer(x, mws)
    err = max(float(jnp.max(jnp.abs(ai.astype(jnp.float32) - bi.astype(jnp.float32))))
              for ai, bi in zip(a, b))
    print(f"max |A-B| = {err:.2e}  (shape {SHAPE}: B={B} {H2}x{W2}, {DTYPE})",
          file=sys.stderr, flush=True)

    if os.environ.get("PROFILE", "0") == "1":
        from profile_infer import device_breakdown

        for name, fn, args in (("separate", sep, (x, ws)), ("merged", mer, (x, mws))):
            out_dir = f"/tmp/vfi_ab_heads_{name}"
            jax.profiler.start_trace(out_dir)
            out = None
            for _ in range(ITERS):
                out = fn(*args)
            np.asarray(out[0])
            jax.profiler.stop_trace()
            by = device_breakdown(out_dir)
            tot = sum(by.values()) / 1e3 / ITERS
            conv = by.get("convolution fusion", 0.0) / 1e3 / ITERS
            print(f"{name:9s}: device {tot:7.2f} ms/it (conv {conv:.2f}) -> {out_dir}")
        return

    def time_block(fn, args, iters):
        np.asarray(fn(*args)[0])
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[0])
        return (time.perf_counter() - t0) / iters * 1e3

    res = {"separate": [], "merged": []}
    for _ in range(BLOCKS):
        res["separate"].append(time_block(sep, (x, ws), ITERS))
        res["merged"].append(time_block(mer, (x, mws), ITERS))
    for k, v in res.items():
        med = sorted(v)[len(v) // 2]
        print(f"{k:9s}: blocks {['%.2f' % t for t in v]} ms -> median {med:.2f} ms")


if __name__ == "__main__":
    main()
