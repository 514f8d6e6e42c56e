"""Adaptive separable convolution (SepConv, Niklaus et al. 2017) for TPU.

The op at the heart of the TAI/TWI interpolation networks.  For every output
pixel ``(y, x)`` a pair of per-pixel 1-D kernels (a vertical one and a
horizontal one, each of length ``ks``) is applied to the ``ks x ks`` input
window anchored at that pixel:

    out[b, y, x, c] = sum_{fy, fx} x[b, y+fy, x+fx, c] * v[b, y, x, fy] * h[b, y, x, fx]

(Behavioral reference: the hand-written CUDA kernel in the upstream project,
src/separable_convolution/cfile/SeparableConvolution_kernel.cu:19-47, which
computes exactly this accumulation in NCHW layout with kernels stored as
``[B, ks, H, W]``.  We use NHWC / kernels-last ``[B, H, W, ks]`` so that the
``ks`` and ``W`` dimensions land on TPU lanes.)

Four interchangeable implementations live here:

  * :func:`sepconv_direct` — O(ks^2) elementwise accumulation in pure XLA.
    Simple, obviously correct; used as the ground truth in tests.
  * :func:`sepconv_mxu` — an MXU formulation: the horizontal pass is recast as
    a banded-matrix matmul built with a row-skewing reshape trick, so the bulk
    of the FLOPs run on the systolic array; the vertical pass is a cheap
    multiply-reduce.  Fully differentiable through XLA AD (the gradient is
    again matmuls).  The default off-TPU, and the small-batch backward.
  * :func:`sepconv_pallas` — a fused Pallas VPU kernel (forward) that keeps
    the input slab, both kernel stacks and the accumulator in VMEM.  Wrapped
    in ``jax.custom_vjp`` whose backward is the XLA-AD gradient of
    :func:`sepconv_mxu`.
  * :func:`sepconv_pallas_mxu` — the v2 fused MXU kernel (TPU default): the
    banded matrix is built in VMEM by a log-barrel-shift skew, pre-transposed
    for MXU-native per-row matmuls.  Its custom VJP picks between fused
    Pallas adjoint kernels (large batches, no S residual in HBM) and XLA AD
    (small batches, fuses with surrounding work) by residual size.

The public entry point :func:`sepconv` dispatches to the best implementation
for the current backend.

Measured on TPU v5e (B*T=40, 128x128 gray, ks=51; benchmarks/bench_sepconv.py):
    sepconv_mxu         12.5 ms f32 (HIGH) / 9.1 ms bf16   (run-to-run 12-22 ms)
    sepconv_pallas      94 ms       (VPU-bound: unaligned lane shifts dominate)
    sepconv_pallas_mxu  7.7 ms f32 / 6.2 ms bf16           (the TPU default)
The v2 kernel removes sepconv_mxu's HBM round-trips (S ~466 MB + slabs
~186 MB per call) by building the banded matrix directly in VMEM, pre-
transposed so the per-row matmuls are MXU-native.  Orientation matters: the
same kernel with S untransposed (contraction on rhs lanes) ran 13.2/10.3 ms —
the implicit per-dot operand transposes were most of the gap.
"""

from __future__ import annotations

import functools
import os
from typing import Literal

import jax
import jax.numpy as jnp
from jax import lax

Impl = Literal["direct", "mxu", "pallas", "pallas_mxu"]


def _check_shapes(x: jax.Array, v: jax.Array, h: jax.Array) -> tuple[int, int, int, int, int]:
    """Validate operand shapes; returns (B, H, W, C, ks)."""
    if x.ndim != 4 or v.ndim != 4 or h.ndim != 4:
        raise ValueError(
            f"sepconv expects rank-4 operands (x=[B,Hp,Wp,C], v/h=[B,H,W,ks]); "
            f"got x{x.shape} v{v.shape} h{h.shape}"
        )
    B, H, W, ks = v.shape
    if h.shape != (B, H, W, ks):
        raise ValueError(f"vertical {v.shape} and horizontal {h.shape} kernel shapes differ")
    Bx, Hp, Wp, C = x.shape
    if Bx != B or Hp != H + ks - 1 or Wp != W + ks - 1:
        raise ValueError(
            f"input must be pre-padded to [B, H+ks-1, W+ks-1, C] = "
            f"[{B}, {H + ks - 1}, {W + ks - 1}, C]; got {x.shape}"
        )
    return B, H, W, C, ks


def pad_for_sepconv(x: jax.Array, ks: int) -> jax.Array:
    """Replication-pad an NHWC image by floor(ks/2) on every spatial side.

    Mirrors the ReplicationPad2d the reference applies before its CUDA sepconv
    (src/models/tai/tai.py:170-171,229-236).
    """
    p = ks // 2
    return jnp.pad(x, ((0, 0), (p, p + (ks - 1 - 2 * p)), (p, p + (ks - 1 - 2 * p)), (0, 0)), mode="edge")


# ---------------------------------------------------------------------------
# Direct O(ks^2) reference implementation
# ---------------------------------------------------------------------------


def sepconv_direct(x: jax.Array, v: jax.Array, h: jax.Array) -> jax.Array:
    """Elementwise-accumulation reference implementation.

    Uses two nested ``fori_loop``s over the filter taps so the trace stays
    small even at ks=51.  Accumulates in float32.
    """
    B, H, W, C, ks = _check_shapes(x, v, h)
    xf = x.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    def fy_body(fy, acc):
        rows = lax.dynamic_slice_in_dim(xf, fy, H, axis=1)  # [B, H, W+ks-1, C]

        def fx_body(fx, inner):
            cols = lax.dynamic_slice_in_dim(rows, fx, W, axis=2)  # [B, H, W, C]
            hk = lax.dynamic_slice_in_dim(hf, fx, 1, axis=3)  # [B, H, W, 1]
            return inner + cols * hk

        inner = lax.fori_loop(0, ks, fx_body, jnp.zeros((B, H, W, C), jnp.float32))
        vk = lax.dynamic_slice_in_dim(vf, fy, 1, axis=3)  # [B, H, W, 1]
        return acc + inner * vk

    out = lax.fori_loop(0, ks, fy_body, jnp.zeros((B, H, W, C), jnp.float32))
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# MXU (banded-matmul) implementation
# ---------------------------------------------------------------------------


def _skew_rows(m: jax.Array) -> jax.Array:
    """Shift row ``x`` of the last-2-dim matrix right by ``x`` positions.

    Input  ``[..., W, ks]``  ->  output ``[..., W, W+ks-1]`` with
    ``out[..., x, u] = m[..., x, u-x]`` for ``0 <= u-x < ks`` else 0.

    Implemented with the classic pad-flatten-reshape trick: padding each row
    to width ``ks+W`` and re-slicing the flat buffer at stride ``ks+W-1``
    realigns row ``x`` with offset ``x``.
    """
    *lead, W, ks = m.shape
    padded = jnp.pad(m, [(0, 0)] * len(lead) + [(0, 0), (0, W)])  # [..., W, ks+W]
    flat = padded.reshape(*lead, W * (ks + W))
    flat = flat[..., : W * (ks + W - 1)]
    return flat.reshape(*lead, W, ks + W - 1)


def sepconv_mxu(x: jax.Array, v: jax.Array, h: jax.Array) -> jax.Array:
    """Banded-matmul formulation: bulk FLOPs on the MXU.

    For each output row ``y`` the horizontal filtering of the ks input rows
    that contribute to it is one matmul against a banded matrix
    ``S[y][x, u] = h[b, y, x, u-x]``:

        inner[b, y, fy, x, c] = sum_u  x[b, y+fy, u, c] * S[b, y, x, u]
        out[b, y, x, c]       = sum_fy inner[b, y, fy, x, c] * v[b, y, x, fy]

    ``S`` is built with a reshape trick (no gathers) and the contraction is a
    batched matmul over ``(b, y)`` — exactly what the MXU wants.  Everything
    here is standard XLA, so ``jax.grad`` of this function again yields
    batched matmuls (no custom VJP needed).
    """
    B, H, W, C, ks = _check_shapes(x, v, h)
    # bf16 operands: single-pass MXU matmuls with f32 accumulation (fast path).
    # f32 operands: HIGHEST precision keeps the MXU passes f32-accurate —
    # required to hit the reference-parity tolerance in tests.
    if x.dtype == jnp.bfloat16:
        dt, prec = jnp.bfloat16, lax.Precision.DEFAULT
    elif x.dtype == jnp.float64:
        # f64 (CPU-only; requires jax_enable_x64): exact double accumulation,
        # used by the grad-parity exactness leg to separate formulation bugs
        # from f32 reduction-order noise (scripts/grad_parity_fullsize.py).
        dt, prec = jnp.float64, lax.Precision.HIGHEST
    else:
        # HIGH = 3-pass bf16 on the MXU: ~2x faster than HIGHEST with ~2^-16
        # relative error — far inside the reference-parity tolerance.
        dt, prec = jnp.float32, lax.Precision.HIGH
    acc_dt = jnp.float64 if dt == jnp.float64 else jnp.float32
    S = _skew_rows(h.astype(dt))  # [B, H, W, W+ks-1]

    # Row slabs: slabs[b, y, fy, u, c] = x[b, y+fy, u, c]
    xf = x.astype(dt)
    slabs = jnp.stack([xf[:, fy : fy + H] for fy in range(ks)], axis=2)  # [B, H, ks, W+ks-1, C]

    # Batched matmul over (b, y): [ks, u] x [x, u]^T -> [ks, x]  (per channel).
    inner = jnp.einsum(
        "byfuc,byxu->byfxc", slabs, S, preferred_element_type=acc_dt, precision=prec
    )
    out = jnp.einsum(
        "byfxc,byxf->byxc", inner.astype(dt), v.astype(dt), preferred_element_type=acc_dt, precision=prec
    )
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused Pallas TPU kernel
# ---------------------------------------------------------------------------


def _sepconv_pallas_raw(x: jax.Array, v: jax.Array, h: jax.Array, *, row_tile: int) -> jax.Array:
    """Fused TPU kernel.

    Internal layout (TPU-friendly): channels are folded into the item axis so
    the trailing dims are spatial — W rides the lanes, rows/filter taps ride
    the sublanes:

        x2:   [N, H+ks-1, W+ks-1]   (N = B*C)
        v/h:  [N, ks, H, W]         (per-pixel kernels, tap-major)
        out:  [N, H, W]

    Grid: (N, H/row_tile).  Each cell keeps the whole padded image, the tile's
    kernel stacks and a f32 accumulator in VMEM; the fy loop does a cheap
    sublane-dim dynamic slice, and the fx taps are a *static* unrolled loop of
    lane-shifted FMAs (Mosaic resolves static unaligned slices at compile
    time).  The whole ks^2 accumulation runs on the VPU with zero HBM traffic
    for intermediates.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C, ks = _check_shapes(x, v, h)
    TH = row_tile
    assert H % TH == 0, f"H={H} must be divisible by row_tile={TH}"

    # NHWC -> internal layouts.
    x2 = jnp.moveaxis(x, 3, 1).reshape(B * C, H + ks - 1, W + ks - 1)
    vt = jnp.moveaxis(v, 3, 1)  # [B, ks, H, W]
    ht = jnp.moveaxis(h, 3, 1)
    if C > 1:
        vt = jnp.repeat(vt, C, axis=0)
        ht = jnp.repeat(ht, C, axis=0)
    N = B * C
    nt = H // TH

    # Pre-tile the padded input into *overlapping* row tiles so every slice in
    # the kernel is static (Mosaic cannot prove alignment of dynamic sublane
    # offsets).  Overlap costs (TH+ks-1)/TH extra HBM for x — x is by far the
    # smallest operand, so this is noise next to the v/h kernel stacks.
    xt = jnp.stack([x2[:, i * TH : i * TH + TH + ks - 1] for i in range(nt)], axis=1)
    # xt: [N, nt, TH+ks-1, W+ks-1]

    def kernel(x_ref, v_ref, h_ref, o_ref):
        hv = h_ref[0]  # [ks, TH, W], loaded once
        xbuf0 = x_ref[0, 0]  # [TH+ks-1, W+ks-1]

        def fy_body(fy, carry):
            acc, xbuf = carry
            rows = xbuf[:TH]  # static slice; xbuf is pre-rolled by fy rows
            inner = jnp.zeros((TH, W), jnp.float32)
            for fx in range(ks):  # static lane shifts, resolved at compile time
                inner = inner + rows[:, fx : fx + W] * hv[fx]
            vk = v_ref[0, pl.ds(fy, 1)][0]  # [TH, W]
            acc = acc + inner * vk
            # roll rows up by one (shift must be non-negative: n-1 == -1 mod n)
            return acc, pltpu.roll(xbuf, TH + ks - 2, axis=0)

        acc, _ = lax.fori_loop(
            0, ks, fy_body, (jnp.zeros((TH, W), jnp.float32), xbuf0)
        )
        o_ref[0] = acc.astype(o_ref.dtype)

    grid = (N, nt)
    out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TH + ks - 1, W + ks - 1), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, ks, TH, W), lambda n, i: (n, 0, i, 0)),
            pl.BlockSpec((1, ks, TH, W), lambda n, i: (n, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W), lambda n, i: (n, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * W * ks * ks,
            bytes_accessed=(xt.size + vt.size + ht.size + N * H * W) * 4,
            transcendentals=0,
        ),
    )(xt, vt, ht)
    return jnp.moveaxis(out2.reshape(B, C, H, W), 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _sepconv_pallas_vjp(x, v, h):
    return _sepconv_pallas_raw(x, v, h, row_tile=_pick_row_tile(v.shape[1]))


def _pick_row_tile(H: int) -> int:
    for t in (16, 8, 4, 2, 1):
        if H % t == 0:
            return t
    return 1


def _sepconv_fwd(x, v, h):
    return _sepconv_pallas_vjp(x, v, h), (x, v, h)


def _sepconv_bwd(res, g):
    x, v, h = res
    # The adjoint of the banded-matmul formulation is itself batched matmuls;
    # XLA derives it.  (Behaviorally equals the three hand-written CUDA adjoint
    # kernels in SeparableConvolution_kernel.cu:49-162.)
    _, vjp = jax.vjp(sepconv_mxu, x, v, h)
    return vjp(g)


_sepconv_pallas_vjp.defvjp(_sepconv_fwd, _sepconv_bwd)


def sepconv_pallas(x: jax.Array, v: jax.Array, h: jax.Array) -> jax.Array:
    """Fused Pallas forward with MXU-formulation backward."""
    return _sepconv_pallas_vjp(x, v, h)


# ---------------------------------------------------------------------------
# Fused Pallas MXU kernel (v2): banded matrix built in VMEM
# ---------------------------------------------------------------------------


def _sepconv_pallas_mxu_raw(x: jax.Array, v: jax.Array, h: jax.Array, *, row_tile: int) -> jax.Array:
    """Fused MXU kernel: the banded matrix ``S`` lives only in VMEM.

    The plain-XLA :func:`sepconv_mxu` is bandwidth-bound: it materializes
    ``S = skew(h)`` ([B, H, W, W+ks-1], ~466 MB at the bi-TAI operating point)
    and the row slabs in HBM (round-1 roofline, CLAUDE.md).  This kernel fuses
    the skew into the matmul cell so the only HBM traffic is x, v, h and the
    output.

    Per grid cell (one image n, one tile of TH output rows):
      1. build ``S[yy, x, u] = h[yy, x, u - x]`` from the [TH, W, ks] kernel
         block with a *log-barrel shift*: row x must move right by x lanes;
         7 (=log2 W) masked circular rolls do all W distinct shifts at once.
         (This sidesteps the Mosaic reshape limits that blocked the
         flatten-reshape skew in round 1.)
      2. for each output row: one [ks, W+ks-1] x [W+ks-1, W] MXU matmul
         against the input slab (the horizontal pass), then a sublane
         reduction against the tap-major vertical kernels (the vertical pass).

    Layouts (lane axis last):
      xt: [N, nt, TH+ks-1, Wp]  overlapping row tiles of the padded input
      ht: [N, H, ks, W]         tap-major (skewed along sublanes into S^T)
      vt: [N, H, ks, W]         tap-major (sublane reduction in step 2)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C, ks = _check_shapes(x, v, h)
    TH = row_tile
    assert H % TH == 0, f"H={H} must be divisible by row_tile={TH}"

    # Column tiling (round 3): wide images (UCF/HMDB 320, ImageNet-VID) blow
    # the 16 MB scoped-VMEM stack with a full-width S, and Mosaic requires
    # lane-dim blocks of 128 — so for W > 128 the output columns are tiled at
    # TW=128 (W zero-padded up to a multiple; padded kernel columns are zero,
    # so padded outputs are zero and get sliced off).  The skew is position-
    # independent, so each column tile runs the identical kernel.
    W_in = W
    if W > 128:
        TW = 128
        pad_w = (-W) % TW
        if pad_w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            W = W + pad_w
    else:
        TW = W
    nw = W // TW
    Wp = W + ks - 1
    TWp = TW + ks - 1
    nt = H // TH
    n_bits = max((TW - 1).bit_length(), 1)

    # f32 runs as an explicit 3-dot bf16 hi/lo split (the same math as XLA's
    # Precision.HIGH, which Mosaic's dot lowering does not expose; HIGHEST
    # costs 6 MXU passes and measured slower than the XLA einsum).
    f32_split = x.dtype != jnp.bfloat16

    # Kernel-operand layout.  Two options, A/B'd on hardware (r3):
    #   0 (default): host-side moveaxis to tap-major [B, H, ks, W].  XLA
    #     materializes relayout copies before the custom call (5.6 ms/iter
    #     B=24 / 13.5 B=32 bf16 in the inference profile), but fuses them
    #     into the producing convs well enough that the full program wins.
    #   1: ship v/h exactly as produced ([B, H, W, ks]) and swapaxes each
    #     [W, ks] tile to tap-major in VMEM.  Wins the STANDALONE kernel
    #     microbench (bf16 6.0 vs 7.1 ms, f32 10.4 vs 14.1 at BT=40) but
    #     loses the full bi-TAI inference program: interleaved same-process
    #     A/B measured 932 vs 990 f/s (B=24) and 860 vs 888 (B=32) — the
    #     in-VMEM transpose serializes with the MXU work, while the host
    #     relayout overlaps with surrounding fusions.
    native_layout = os.environ.get("SEPCONV_NATIVE_LAYOUT", "0") == "1"
    x2 = jnp.moveaxis(x, 3, 1).reshape(B * C, H + ks - 1, Wp)
    if native_layout:
        vt, ht = v, h  # [B, H, W, ks] — as produced by the kernel heads
    else:
        vt = jnp.moveaxis(v, 3, 2)  # [B, H, ks, W] tap-major (sublane reduction)
        ht = jnp.moveaxis(h, 3, 2)  # [B, H, ks, W] tap-major (skew along sublanes)
    if C > 1:
        vt = jnp.repeat(vt, C, axis=0)
        ht = jnp.repeat(ht, C, axis=0)
    N = B * C
    xt = jnp.stack(
        [
            jnp.stack(
                [x2[:, i * TH : i * TH + TH + ks - 1, j * TW : j * TW + TWp] for j in range(nw)],
                axis=1,
            )
            for i in range(nt)
        ],
        axis=1,
    )  # [N, nt, nw, TH+ks-1, TWp] — overlapping row/col tiles

    def _dot(a, b):
        # [ks, Wp] x [Wp, W] -> [ks, W]: lhs contraction on lanes, rhs on
        # sublanes — the MXU-native orientation, no operand transposes.
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def _split(a32):
        hi = a32.astype(jnp.bfloat16)
        lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def kernel(x_ref, h_ref, v_ref, o_ref):
        xbuf = x_ref[0, 0, 0]  # [TH+ks-1, TWp]
        if native_layout:
            # [TH, TW, ks] -> [TH, ks, TW] tap-major, transposed tile-locally
            # in VMEM (cheap) instead of by HBM relayout copies outside the call.
            hbuf = jnp.swapaxes(h_ref[0], 1, 2)
            vbuf = jnp.swapaxes(v_ref[0], 1, 2)
        else:
            hbuf = h_ref[0]  # [TH, ks, TW] tap-major
            vbuf = v_ref[0]  # [TH, ks, TW] tap-major

        # --- step 1: log-barrel skew  S[yy, u, x] = h[yy, x, u-x] ------------
        # Build S pre-transposed: pad the tap (sublane) axis to TWp, then roll
        # column x DOWN by x sublanes — log2(TW) masked circular rolls realize
        # all TW distinct shifts (f32: Mosaic's rotate is 32-bit only).  The
        # masks depend only on the lane index: [1, 1, TW] broadcasts.
        S = jnp.pad(hbuf.astype(jnp.float32), ((0, 0), (0, TWp - ks), (0, 0)))  # [TH, TWp, TW]
        lane = lax.broadcasted_iota(jnp.int32, (1, 1, TW), 2)
        for k in range(n_bits):
            shifted = pltpu.roll(S, 1 << k, axis=1)
            S = jnp.where((lane >> k) & 1 == 1, shifted, S)
        # No wrap corruption: column x's content ends at sublane
        # x + ks - 1 <= (TW-1) + (ks-1) = TWp - 1.

        # --- step 2: per-row MXU matmul + tap reduction ----------------------
        if f32_split:
            S_hi, S_lo = _split(S)
            x_hi, x_lo = _split(xbuf.astype(jnp.float32))
        else:
            S_b = S.astype(jnp.bfloat16)

        rows = []
        for yy in range(TH):
            if f32_split:
                sh = x_hi[yy : yy + ks]  # [ks, TWp] static sublane slices
                sl = x_lo[yy : yy + ks]
                inner = _dot(sh, S_hi[yy]) + _dot(sl, S_hi[yy]) + _dot(sh, S_lo[yy])
            else:
                inner = _dot(xbuf[yy : yy + ks], S_b[yy])  # [ks, TW]
            rows.append(jnp.sum(inner * vbuf[yy].astype(jnp.float32), axis=0))
        o_ref[0] = jnp.stack(rows).astype(o_ref.dtype)

    if native_layout:
        kb, kmap = (1, TH, TW, ks), (lambda n, i, j: (n, i, j, 0))
    else:
        kb, kmap = (1, TH, ks, TW), (lambda n, i, j: (n, i, 0, j))
    out2 = pl.pallas_call(
        kernel,
        grid=(N, nt, nw),
        in_specs=[
            pl.BlockSpec((1, 1, 1, TH + ks - 1, TWp), lambda n, i, j: (n, i, j, 0, 0)),
            pl.BlockSpec(kb, kmap),
            pl.BlockSpec(kb, kmap),
        ],
        out_specs=pl.BlockSpec((1, TH, TW), lambda n, i, j: (n, i, j)),
        out_shape=jax.ShapeDtypeStruct((N, H, W), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * ks * TWp * W,
            bytes_accessed=(xt.size + vt.size + ht.size + N * H * W) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, ht, vt)
    return jnp.moveaxis(out2.reshape(B, C, H, W), 1, 3)[:, :, :W_in]


def _sepconv_pallas_bwd_vh_raw(x, v, h, g, *, row_tile: int):
    """Fused adjoints for the per-pixel kernels (grad_v, grad_h).

    Math (SeparableConvolution_kernel.cu:49-118, NHWC, summed over c):
      grad_v[y,x,f] = sum_c g[y,x,c] * inner[y,x,f]          (inner = fwd's
                      horizontal pass, recomputed here — rematerialization)
      grad_h[y,x,j] = sum_c g[y,x,c] * A[y,x,x+j],
                      A[y,x,u] = sum_f v[y,x,f] * x[y+f,u,c]  (vertical pass)
    The A -> grad_h step is an UNSKEW (row x shifted left by x): the same
    log-barrel trick as the forward skew, reversed.

    Outputs: grad_v tap-major [N, H, ks, W] and grad_h natural [N, H, W, ks],
    per folded image n = (b, c); the caller sums over c and restores layouts.

    Wide images (W > 128) are column-tiled at TW=128 exactly like the forward
    kernel (padded kernel/cotangent columns are zero, so the padded-column
    grads are zero and get sliced off).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C, ks = _check_shapes(x, v, h)
    TH = row_tile
    assert H % TH == 0
    W_in = W
    if W > 128:
        TW = 128
        pad_w = (-W) % TW
        if pad_w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            W = W + pad_w
    else:
        TW = W
    nw = W // TW
    Wp = W + ks - 1
    TWp = TW + ks - 1
    nt = H // TH
    n_bits = max((TW - 1).bit_length(), 1)
    f32_split = x.dtype != jnp.bfloat16

    x2 = jnp.moveaxis(x, 3, 1).reshape(B * C, H + ks - 1, Wp)
    ht = jnp.moveaxis(h, 3, 2)  # [B, H, ks, W] tap-major (for the S^T skew)
    vn = v  # [B, H, W, ks] natural (lhs of the A matmul)
    g2 = jnp.moveaxis(g, 3, 1).reshape(B * C, H, W)
    if C > 1:
        ht = jnp.repeat(ht, C, axis=0)
        vn = jnp.repeat(vn, C, axis=0)
    N = B * C
    xt = jnp.stack(
        [
            jnp.stack(
                [x2[:, i * TH : i * TH + TH + ks - 1, j * TW : j * TW + TWp] for j in range(nw)],
                axis=1,
            )
            for i in range(nt)
        ],
        axis=1,
    )  # [N, nt, nw, TH+ks-1, TWp]

    def _dot(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def _split(a32):
        hi = a32.astype(jnp.bfloat16)
        lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def kernel(x_ref, h_ref, v_ref, g_ref, gv_ref, gh_ref):
        xbuf = x_ref[0, 0, 0]  # [TH+ks-1, TWp]
        hbuf = h_ref[0]  # [TH, ks, TW] tap-major
        vbuf = v_ref[0]  # [TH, TW, ks] natural
        gbuf = g_ref[0].astype(jnp.float32)  # [TH, TW]

        # S^T skew (identical to the forward kernel).
        S = jnp.pad(hbuf.astype(jnp.float32), ((0, 0), (0, TWp - ks), (0, 0)))
        lane = lax.broadcasted_iota(jnp.int32, (1, 1, TW), 2)
        for k in range(n_bits):
            shifted = pltpu.roll(S, 1 << k, axis=1)
            S = jnp.where((lane >> k) & 1 == 1, shifted, S)

        if f32_split:
            S_hi, S_lo = _split(S)
            x_hi, x_lo = _split(xbuf.astype(jnp.float32))
            v_hi, v_lo = _split(vbuf.astype(jnp.float32))
        else:
            S_b = S.astype(jnp.bfloat16)

        gv_rows, A_rows = [], []
        for yy in range(TH):
            if f32_split:
                sh, sl = x_hi[yy : yy + ks], x_lo[yy : yy + ks]
                inner = _dot(sh, S_hi[yy]) + _dot(sl, S_hi[yy]) + _dot(sh, S_lo[yy])
                # A[x, u] = sum_f v[x, f] * slab[f, u]   ([W, ks] x [ks, Wp])
                A = lax.dot_general(v_hi[yy], sh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                A = A + lax.dot_general(v_lo[yy], sh, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                A = A + lax.dot_general(v_hi[yy], sl, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                slab = xbuf[yy : yy + ks]
                inner = _dot(slab, S_b[yy])  # [ks, W]
                A = lax.dot_general(vbuf[yy], slab, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)  # [W, Wp]
            gv_rows.append(inner * gbuf[yy][None, :])  # [ks, W]
            A_rows.append(A)

        # Batched unskew over the whole tile: Ahat[yy, x, j] = A[yy, x, x+j] —
        # roll row x LEFT by x lanes; masks depend only on x ([1, TW, 1]).
        A_all = jnp.stack(A_rows)  # [TH, TW, TWp]
        sub = lax.broadcasted_iota(jnp.int32, (1, TW, 1), 1)
        for k in range(n_bits):
            shifted = pltpu.roll(A_all, TWp - (1 << k), axis=2)
            A_all = jnp.where((sub >> k) & 1 == 1, shifted, A_all)

        gv_ref[0] = jnp.stack(gv_rows).astype(gv_ref.dtype)
        gh_ref[0] = (A_all[:, :, :ks] * gbuf[:, :, None]).astype(gh_ref.dtype)

    gv2, gh2 = pl.pallas_call(
        kernel,
        grid=(N, nt, nw),
        in_specs=[
            pl.BlockSpec((1, 1, 1, TH + ks - 1, TWp), lambda n, i, j: (n, i, j, 0, 0)),
            pl.BlockSpec((1, TH, ks, TW), lambda n, i, j: (n, i, 0, j)),
            pl.BlockSpec((1, TH, TW, ks), lambda n, i, j: (n, i, j, 0)),
            pl.BlockSpec((1, TH, TW), lambda n, i, j: (n, i, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, ks, TW), lambda n, i, j: (n, i, 0, j)),
            pl.BlockSpec((1, TH, TW, ks), lambda n, i, j: (n, i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, ks, W), v.dtype),
            jax.ShapeDtypeStruct((N, H, W, ks), h.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * ks * TWp * W,
            bytes_accessed=(xt.size + ht.size + vn.size + g2.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, ht, vn, g2)
    # fold channels (kernels are shared across c -> sum the per-(b,c) grads)
    # and drop the padded columns of wide images
    gv = jnp.moveaxis(gv2.reshape(B, C, H, ks, W), 4, 3).sum(axis=1)[:, :, :W_in]
    gh = gh2.reshape(B, C, H, W, ks).sum(axis=1)[:, :, :W_in]
    return gv, gh


def _sepconv_pallas_bwd_x_raw(v, h, g, *, row_tile: int):
    """Fused adjoint for the input (SeparableConvolution_kernel.cu:120-162).

    grad_x[s, u, c] = sum_{y,x} g[y,x,c] * v[y,x,s-y] * h[y,x,u-x]
                    = sum_y  (GV_y @ S_y)[s - y]      rows accumulated with
    GV_y[f, x] = g[y,x]*v[y,x,f] and S_y the forward's (untransposed) banded
    matrix.  Each tile emits its local [TH+ks-1, TWp] slab; the overlapping
    rows/columns across tiles are added outside the kernel (cheap: ~1.3x of
    x's HBM).  Wide images (W > 128) are column-tiled at TW=128 like the
    forward (padded kernel/cotangent columns are zero -> zero slabs, and the
    padded input-gradient columns are sliced off).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, ks = v.shape
    TH = row_tile
    assert H % TH == 0
    W_in = W
    if W > 128:
        TW = 128
        pad_w = (-W) % TW
        if pad_w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            W = W + pad_w
    else:
        TW = W
    nw = W // TW
    TWp = TW + ks - 1
    nt = H // TH
    n_bits = max((TW - 1).bit_length(), 1)
    C = g.shape[-1]
    f32_split = g.dtype != jnp.bfloat16

    hn = h  # [B, H, W, ks] natural (skewed along lanes into S)
    vt = jnp.moveaxis(v, 3, 2)  # [B, H, ks, W] tap-major (GV rows)
    g2 = jnp.moveaxis(g, 3, 1).reshape(B * C, H, W)
    if C > 1:
        hn = jnp.repeat(hn, C, axis=0)
        vt = jnp.repeat(vt, C, axis=0)
    N = B * C

    def _split(a32):
        hi = a32.astype(jnp.bfloat16)
        lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def kernel(h_ref, v_ref, g_ref, o_ref):
        hbuf = h_ref[0]  # [TH, TW, ks] natural
        vbuf = v_ref[0]  # [TH, ks, TW] tap-major
        gbuf = g_ref[0].astype(jnp.float32)  # [TH, TW]

        # Untransposed skew: S[yy, x, u] = h[yy, x, u-x] (roll along lanes).
        S = jnp.pad(hbuf.astype(jnp.float32), ((0, 0), (0, 0), (0, TWp - ks)))  # [TH, TW, TWp]
        row = lax.broadcasted_iota(jnp.int32, (1, TW, 1), 1)
        for k in range(n_bits):
            shifted = pltpu.roll(S, 1 << k, axis=2)
            S = jnp.where((row >> k) & 1 == 1, shifted, S)

        if f32_split:
            S_hi, S_lo = _split(S)

        G_rows = []
        for yy in range(TH):
            gv = vbuf[yy].astype(jnp.float32) * gbuf[yy][None, :]  # [ks, W]
            if f32_split:
                gv_hi, gv_lo = _split(gv)
                G = lax.dot_general(gv_hi, S_hi[yy], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                G = G + lax.dot_general(gv_lo, S_hi[yy], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                G = G + lax.dot_general(gv_hi, S_lo[yy], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                G = lax.dot_general(gv.astype(jnp.bfloat16), S[yy].astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            G_rows.append(G)
        # Overlap-add acc[yy+f] += G[yy, f]: yet another skew — pad each G_yy
        # to the full local height, barrel-roll stack row yy DOWN by yy
        # sublanes (log2 TH masked rolls, masks on the leading axis), then
        # reduce over yy.
        Gs = jnp.stack(G_rows)  # [TH, ks, TWp]
        Gs = jnp.pad(Gs, ((0, 0), (0, TH - 1), (0, 0)))  # [TH, TH+ks-1, TWp]
        lead = lax.broadcasted_iota(jnp.int32, (TH, 1, 1), 0)
        for k in range(max((TH - 1).bit_length(), 1)):
            shifted = pltpu.roll(Gs, 1 << k, axis=1)
            Gs = jnp.where((lead >> k) & 1 == 1, shifted, Gs)
        o_ref[0, 0, 0] = jnp.sum(Gs, axis=0).astype(o_ref.dtype)

    slabs = pl.pallas_call(
        kernel,
        grid=(N, nt, nw),
        in_specs=[
            pl.BlockSpec((1, TH, TW, ks), lambda n, i, j: (n, i, j, 0)),
            pl.BlockSpec((1, TH, ks, TW), lambda n, i, j: (n, i, 0, j)),
            pl.BlockSpec((1, TH, TW), lambda n, i, j: (n, i, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TH + ks - 1, TWp), lambda n, i, j: (n, i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, nt, nw, TH + ks - 1, TWp), g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * ks * TWp * W,
            bytes_accessed=(hn.size + vt.size + g2.size + N * nt * nw * (TH + ks - 1) * TWp) * g.dtype.itemsize,
            transcendentals=0,
        ),
    )(hn, vt, g2)

    # Overlap-add the per-tile slabs into the padded-input gradient; drop the
    # padded columns of wide images.
    gx2 = jnp.zeros((N, H + ks - 1, W + ks - 1), jnp.float32)
    for i in range(nt):
        for j in range(nw):
            gx2 = gx2.at[
                :, i * TH : i * TH + TH + ks - 1, j * TW : j * TW + TWp
            ].add(slabs[:, i, j].astype(jnp.float32))
    gx2 = gx2.astype(g.dtype)[:, :, : W_in + ks - 1]
    return jnp.moveaxis(gx2.reshape(B, C, H + ks - 1, W_in + ks - 1), 1, 3)


def _pick_row_tile_mxu(H: int, W: int, ks: int, itemsize: int) -> int:
    """Largest tile whose VMEM stack stays under the 16 MB scoped limit.

    Empirical model (hardware-calibrated at W=320, r3): the kernel's live
    temporaries — S in f32 plus its barrel-roll copies, the hi/lo or bf16
    casts, the transposed kernel tiles and the row accumulators — total
    ~35 bytes per S element (t*TW*(TW+ks-1)), far above the naive
    S+blocks estimate (a t=4 full-width W=320 cell measured 16.41 MB vs 5.9
    modeled — the failure that motivated column tiling).  Since wide images
    are column-tiled at TW=128, each grid cell sees a 128-wide tile and the
    model is W-invariant above 128: budget 15 MB keeps t=16 (~12.7 MB)
    everywhere, the config hardware-validated at both W=128 and W=320.
    """
    del itemsize  # the dominant temporaries are f32 regardless of input dtype
    tw = min(W, 128)  # wide images are column-tiled at TW=128 in the kernel
    for t in (16, 8, 4, 2, 1):
        if H % t != 0:
            continue
        if 35 * t * tw * (tw + ks - 1) < 15 * 1024 * 1024:
            return t
    return 1


@jax.custom_vjp
def _sepconv_pallas_mxu_vjp(x, v, h):
    return _sepconv_pallas_mxu_raw(
        x, v, h, row_tile=_pick_row_tile_mxu(v.shape[1], v.shape[2], v.shape[3], x.dtype.itemsize)
    )


def _sepconv_mxu_fwd(x, v, h):
    return _sepconv_pallas_mxu_vjp(x, v, h), (x, v, h)


def _pick_row_tile_bwd(H: int, W: int, ks: int) -> int:
    """The bwd_vh cell holds S + A + two output blocks — halve the fwd
    budget (same W-aware empirical VMEM model as _pick_row_tile_mxu)."""
    tw = min(W, 128)  # wide images are column-tiled at TW=128 in the kernels
    for t in (8, 4, 2, 1):
        if H % t != 0:
            continue
        if 35 * t * tw * (tw + ks - 1) < 7 * 1024 * 1024:
            return t
    return 1


# Above this S-materialization size the XLA-AD backward's HBM residuals
# (S + slabs, recomputed inside the bwd) risk OOM / scheduler pathology;
# below it, XLA-AD fuses with surrounding work and matches or beats the
# fused adjoints (B=8 bi-TAI: AD 158 ms/step bf16 vs fused 169; f32 tie).
# Measured boundary points on the 16 GB v5e:
#   * B=16 f32 KTH 128^2 (S ~933 MB): XLA-AD OOMs -> need the fused adjoints.
#   * B=4 bf16 UCF 256x320 (S ~727 MB): XLA-AD runs the GAN step at 350 ms
#     vs 385 ms through the column-tiled fused adjoints -> prefer XLA-AD
#     (clean single-state measurement, benchmarks/wide_remat.py AB_MODE=bwd).
# 800 MB sits between those two measurements.
_PALLAS_BWD_BYTES_THRESHOLD = 800 * 1024**2


def _use_pallas_bwd(v_shape, itemsize) -> bool:
    flag = os.environ.get("SEPCONV_PALLAS_BWD")
    if flag in ("0", "1"):
        return flag == "1"
    B, H, W, ks = v_shape
    # Wide-image f32 grad programs with the XLA-AD sepconv backward crash the
    # libtpu AOT compiler at full-model scale (v5e tunnel, jaxlib 0.9.0:
    # remote_compile HTTP 500 "tpu_compile_helper subprocess exit code 1",
    # reproduced 5x at UCF 256x320 f32 fold=3 and fold=6 = B=1/B=2; the fused
    # adjoint program at the identical shape compiles and runs, and the
    # standalone sepconv XLA-AD grad also compiles — a program-scale compiler
    # bug, not an op bug; scripts/parity_r04_tpu.py).  Route wide f32 to the
    # column-tiled adjoints; wide bf16 keeps the measured-preferred XLA-AD
    # below the byte threshold (B=4 bf16: AD 350 ms vs adjoints 385).
    if itemsize == 4 and W > 128:
        return True
    # Size of the S residual the XLA-AD backward would materialize in HBM —
    # the quantity that OOMs/pathologizes large shapes.  Wide images (W>128)
    # hit the threshold immediately (W=320 color: S alone is multi-GB), which
    # is why the adjoint kernels grew column tiling in round 3.
    s_bytes = B * H * W * (W + ks - 1) * itemsize
    return s_bytes > _PALLAS_BWD_BYTES_THRESHOLD


def _sepconv_mxu_bwd(res, grad):
    """Memory-aware backward: fused Pallas adjoints when the XLA-AD path's S
    residual would be large (see _PALLAS_BWD_BYTES_THRESHOLD); XLA AD of
    sepconv_mxu otherwise (faster at small batch, where it fuses)."""
    x, v, h = res
    if jax.default_backend() != "tpu" and os.environ.get("SEPCONV_PALLAS_BWD") != "1":
        return _sepconv_bwd(res, grad)
    if not _use_pallas_bwd(v.shape, x.dtype.itemsize):
        return _sepconv_bwd(res, grad)
    TH = _pick_row_tile_bwd(v.shape[1], v.shape[2], v.shape[3])
    gv, gh = _sepconv_pallas_bwd_vh_raw(x, v, h, grad, row_tile=TH)
    gx = _sepconv_pallas_bwd_x_raw(v, h, grad, row_tile=TH)
    return gx, gv, gh


_sepconv_pallas_mxu_vjp.defvjp(_sepconv_mxu_fwd, _sepconv_mxu_bwd)


def sepconv_pallas_mxu(x: jax.Array, v: jax.Array, h: jax.Array) -> jax.Array:
    """Fused S-in-VMEM MXU forward with the XLA-AD backward of sepconv_mxu."""
    return _sepconv_pallas_mxu_vjp(x, v, h)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def sepconv(x: jax.Array, v: jax.Array, h: jax.Array, impl: Impl | None = None) -> jax.Array:
    """Adaptive separable convolution.

    :param x: pre-padded input images ``[B, H+ks-1, W+ks-1, C]``
              (see :func:`pad_for_sepconv`)
    :param v: per-pixel vertical kernels ``[B, H, W, ks]``
    :param h: per-pixel horizontal kernels ``[B, H, W, ks]``
    :param impl: force an implementation; default picks per-backend.
    :return: filtered images ``[B, H, W, C]``
    """
    if impl is None:
        # The fused S^T-in-VMEM kernel wins on TPU (7.7/6.2 ms vs 12.5/9.1 ms
        # f32/bf16 at the bi-TAI operating point); everywhere else (CPU tests,
        # interpret-free grad paths) the plain-XLA banded matmul is exact f32
        # and fast enough.
        impl = "pallas_mxu" if jax.default_backend() == "tpu" else "mxu"
    if impl == "direct":
        return sepconv_direct(x, v, h)
    if impl == "mxu":
        return sepconv_mxu(x, v, h)
    if impl == "pallas":
        return sepconv_pallas(x, v, h)
    if impl == "pallas_mxu":
        return sepconv_pallas_mxu(x, v, h)
    raise ValueError(f"unknown sepconv impl {impl!r}")
