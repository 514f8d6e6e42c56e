#!/usr/bin/env python
"""Interleaved A/B: batch ONLY the four kernel heads' first convs (no groups).

Round-3 follow-up to benchmarks/ab_merged_heads.py (VERDICT r3 item 9).  The
full merge lost (40.3 -> 55.6 ms/it device): XLA's feature_group_count=4
lowering added relayout/split work that outweighed the lane-fill win.  This
tries the narrower move: the four heads share one input (kernelnet.py:122-125),
so their FIRST convs concatenate into a single dense 64->256 conv (100% lane
fill vs 50%) with a free split afterwards — every later conv stays exactly as
shipped, no grouped convs anywhere.

  variant A (shipped): 4x [conv64 -> relu -> conv64 -> relu -> conv51 -> relu
                           -> up2x -> conv51]
  variant B (first-batched): conv256 dense -> relu -> split 4x64, then per
                             head [conv64 -> relu -> conv51 -> relu -> up2x
                             -> conv51]

B is mathematically identical to A (first-conv weights concatenated along
C_out).  Compared via per-variant DEVICE time from jax.profiler traces
(PROFILE=1) — wall clock is launch-rate-limited for a ~30 ms subgraph over
the axon tunnel — plus an exactness check.

Usage: PROFILE=1 python benchmarks/ab_first_heads.py [iters]
Knobs: AB_SHAPE=wide|kth (default kth), AB_DTYPE (default bfloat16)
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
SHAPE = os.environ.get("AB_SHAPE", "kth")
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

KS = 51
KF2 = 64
LAYERS = 3
if SHAPE == "wide":
    B, H2, W2 = 32, 128, 160  # TAI_color 256x320 B=16 (doubled batch), H/2
else:
    B, H2, W2 = 240, 64, 64  # KTH 128^2 B=48: heads see the T-folded batch


def init_weights(rng):
    ws = []
    keys = jax.random.split(rng, 4 * (LAYERS + 1) * 2)
    ki = iter(range(len(keys)))

    def mk(cin, cout):
        w = jax.random.normal(keys[next(ki)], (3, 3, cin, cout)) * 0.05
        b = jax.random.normal(keys[next(ki)], (cout,)) * 0.01
        return w, b

    for _ in range(4):
        head = [mk(KF2, KF2) for _ in range(LAYERS - 1)]
        head.append(mk(KF2, KS))  # to_ks
        head.append(mk(KS, KS))  # post_up
        ws.append(head)
    return ws


def conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def head_tail(h, head):
    """Everything after the first conv+relu, exactly as shipped."""
    for w, b in head[1:-2]:
        h = jax.nn.relu(conv(h, w, b))
    w, b = head[-2]
    h = jax.nn.relu(conv(h, w, b))
    h = upsample2x_bilinear(h, True)
    w, b = head[-1]
    return conv(h, w, b)


def separate_stack(x, ws):
    return [head_tail(jax.nn.relu(conv(x, *head[0])), head) for head in ws]


def first_batched_stack(x, ws):
    w0 = jnp.concatenate([head[0][0] for head in ws], axis=3)  # [3,3,64,256]
    b0 = jnp.concatenate([head[0][1] for head in ws], axis=0)
    h = jax.nn.relu(conv(x, w0, b0))
    return [head_tail(h[..., i * KF2:(i + 1) * KF2], head) for i, head in enumerate(ws)]


def main():
    ws = init_weights(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H2, W2, KF2))
    if DTYPE == "bfloat16":
        cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
        ws, x = cast(ws), cast(x)

    sep = jax.jit(separate_stack)
    bat = jax.jit(first_batched_stack)

    a, b = sep(x, ws), bat(x, ws)
    err = max(float(jnp.max(jnp.abs(ai.astype(jnp.float32) - bi.astype(jnp.float32))))
              for ai, bi in zip(a, b))
    print(f"max |A-B| = {err:.2e}  (shape {SHAPE}: B={B} {H2}x{W2}, {DTYPE})",
          file=sys.stderr, flush=True)

    if os.environ.get("PROFILE", "0") == "1":
        from profile_infer import device_breakdown

        for name, fn in (("separate", sep), ("first_batched", bat)):
            out_dir = f"/tmp/vfi_ab_first_{name}"
            jax.profiler.start_trace(out_dir)
            out = None
            for _ in range(ITERS):
                out = fn(x, ws)
            np.asarray(out[0])
            jax.profiler.stop_trace()
            by = device_breakdown(out_dir)
            tot = sum(by.values()) / 1e3 / ITERS
            cv = by.get("convolution fusion", 0.0) / 1e3 / ITERS
            print(f"{name:13s}: device {tot:7.2f} ms/it (conv {cv:.2f}) -> {out_dir}")
        return

    def time_block(fn, iters):
        np.asarray(fn(x, ws)[0])
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(x, ws)
        np.asarray(out[0])
        return (time.perf_counter() - t0) / iters * 1e3

    res = {"separate": [], "first_batched": []}
    for _ in range(BLOCKS):
        res["separate"].append(time_block(sep, ITERS))
        res["first_batched"].append(time_block(bat, ITERS))
    for k, v in res.items():
        med = sorted(v)[len(v) // 2]
        print(f"{k:13s}: blocks {['%.2f' % t for t in v]} ms -> median {med:.2f} ms")


if __name__ == "__main__":
    main()
