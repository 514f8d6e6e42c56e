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

Three interchangeable implementations live here:

  * :func:`sepconv_direct` — O(ks^2) elementwise accumulation in pure XLA.
    Simple, obviously correct; used as the ground truth in tests.
  * :func:`sepconv_mxu` — an MXU formulation: the horizontal pass is recast as
    a banded-matrix matmul built with a row-skewing reshape trick, so the bulk
    of the FLOPs run on the systolic array; the vertical pass is a cheap
    multiply-reduce.  Fully differentiable through XLA AD (the gradient is
    again matmuls).  This is the default on all backends.
  * :func:`sepconv_pallas` — a fused Pallas TPU kernel (forward) that keeps
    the input slab, both kernel stacks and the accumulator in VMEM, avoiding
    all HBM round-trips of intermediates.  Wrapped in ``jax.custom_vjp`` whose
    backward is the (XLA-AD-derived) gradient of :func:`sepconv_mxu`.

The public entry point :func:`sepconv` dispatches to the best implementation
for the current backend.

Measured on TPU v5e (B*T=40, 128x128 gray, ks=51, f32):
    sepconv_mxu     27 ms   (HIGHEST precision; ~7 ms in bf16)
    sepconv_pallas  94 ms   (VPU-bound: the 51 unaligned lane shifts per row
                             dominate — cross-lane shuffles beat the FMAs)
The banded-matmul MXU formulation is the default: for this op the systolic
array IS the speed-of-light path on TPU, and its AD comes for free.
"""

from __future__ import annotations

import functools
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
    else:
        # HIGH = 3-pass bf16 on the MXU: ~2x faster than HIGHEST with ~2^-16
        # relative error — far inside the reference-parity tolerance.
        dt, prec = jnp.float32, lax.Precision.HIGH
    S = _skew_rows(h.astype(dt))  # [B, H, W, W+ks-1]

    # Row slabs: slabs[b, y, fy, u, c] = x[b, y+fy, u, c]
    xf = x.astype(dt)
    slabs = jnp.stack([xf[:, fy : fy + H] for fy in range(ks)], axis=2)  # [B, H, ks, W+ks-1, C]

    # Batched matmul over (b, y): [ks, u] x [x, u]^T -> [ks, x]  (per channel).
    inner = jnp.einsum(
        "byfuc,byxu->byfxc", slabs, S, preferred_element_type=jnp.float32, precision=prec
    )
    out = jnp.einsum(
        "byfxc,byxf->byxc", inner.astype(dt), v.astype(dt), preferred_element_type=jnp.float32, precision=prec
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
      h:  [N, H, W, ks]         taps on lanes (skewed into S in VMEM)
      vt: [N, H, ks, W]         tap-major (sublane reduction in step 2)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C, ks = _check_shapes(x, v, h)
    TH = row_tile
    assert H % TH == 0, f"H={H} must be divisible by row_tile={TH}"
    Wp = W + ks - 1
    nt = H // TH
    n_bits = max((W - 1).bit_length(), 1)

    if x.dtype == jnp.bfloat16:
        prec = lax.Precision.DEFAULT
    else:
        # Mosaic's dot lowering supports DEFAULT/HIGHEST only (no 3-pass HIGH);
        # HIGHEST keeps the f32 path reference-accurate.
        prec = lax.Precision.HIGHEST

    x2 = jnp.moveaxis(x, 3, 1).reshape(B * C, H + ks - 1, Wp)
    vt = jnp.moveaxis(v, 3, 2)  # [B, H, ks, W]
    ht = h  # [B, H, W, ks]
    if C > 1:
        vt = jnp.repeat(vt, C, axis=0)
        ht = jnp.repeat(ht, C, axis=0)
    N = B * C
    xt = jnp.stack([x2[:, i * TH : i * TH + TH + ks - 1] for i in range(nt)], axis=1)

    def kernel(x_ref, h_ref, v_ref, o_ref):
        xbuf = x_ref[0, 0]  # [TH+ks-1, Wp]
        hbuf = h_ref[0]  # [TH, W, ks]
        vbuf = v_ref[0]  # [TH, ks, W]

        # --- step 1: log-barrel skew  S[yy, x, u] = h[yy, x, u-x] ------------
        S = jnp.pad(hbuf, ((0, 0), (0, 0), (0, Wp - ks)))  # [TH, W, Wp]
        row = lax.broadcasted_iota(jnp.int32, (TH, W, Wp), 1)
        for k in range(n_bits):
            shifted = pltpu.roll(S, 1 << k, axis=2)
            S = jnp.where((row >> k) & 1 == 1, shifted, S)
        # No wrap corruption: row x's content ends at lane x + ks - 1 <= Wp - 1.

        # --- step 2: per-row MXU matmul + tap reduction ----------------------
        rows = []
        for yy in range(TH):
            slab = xbuf[yy : yy + ks]  # [ks, Wp] static sublane slice
            inner = lax.dot_general(
                slab, S[yy], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # [ks, W]
            rows.append(jnp.sum(inner * vbuf[yy].astype(jnp.float32), axis=0))
        o_ref[0] = jnp.stack(rows).astype(o_ref.dtype)

    out2 = pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, 1, TH + ks - 1, Wp), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, TH, W, ks), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, TH, ks, W), lambda n, i: (n, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W), lambda n, i: (n, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * ks * Wp * W,
            bytes_accessed=(xt.size + vt.size + ht.size + N * H * W) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, ht, vt)
    return jnp.moveaxis(out2.reshape(B, C, H, W), 1, 3)


def _pick_row_tile_mxu(H: int, W: int, ks: int, itemsize: int) -> int:
    """Largest tile whose VMEM working set (S + blocks) stays well under budget."""
    for t in (16, 8, 4, 2, 1):
        if H % t != 0:
            continue
        s_bytes = t * W * (W + ks - 1) * 4  # S is built in f32
        blocks = t * W * ks * itemsize * 2 + (t + ks - 1) * (W + ks - 1) * itemsize
        if 2 * (s_bytes + blocks) < 10 * 1024 * 1024:  # double-buffered
            return t
    return 1


@jax.custom_vjp
def _sepconv_pallas_mxu_vjp(x, v, h):
    return _sepconv_pallas_mxu_raw(
        x, v, h, row_tile=_pick_row_tile_mxu(v.shape[1], v.shape[2], v.shape[3], x.dtype.itemsize)
    )


def _sepconv_mxu_fwd(x, v, h):
    return _sepconv_pallas_mxu_vjp(x, v, h), (x, v, h)


_sepconv_pallas_mxu_vjp.defvjp(_sepconv_mxu_fwd, _sepconv_bwd)


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
        impl = "mxu"
    if impl == "direct":
        return sepconv_direct(x, v, h)
    if impl == "mxu":
        return sepconv_mxu(x, v, h)
    if impl == "pallas":
        return sepconv_pallas(x, v, h)
    if impl == "pallas_mxu":
        return sepconv_pallas_mxu(x, v, h)
    raise ValueError(f"unknown sepconv impl {impl!r}")
