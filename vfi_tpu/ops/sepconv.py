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
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax import lax

Impl = Literal["direct", "mxu", "pallas"]


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
    dt = jnp.float32
    S = _skew_rows(h.astype(dt))  # [B, H, W, W+ks-1]

    # Row slabs: slabs[b, y, fy, u, c] = x[b, y+fy, u, c]
    xf = x.astype(dt)
    slabs = jnp.stack([xf[:, fy : fy + H] for fy in range(ks)], axis=2)  # [B, H, ks, W+ks-1, C]

    # Batched matmul over (b, y): [ks, u] x [x, u]^T -> [ks, x]  (per channel).
    # HIGHEST precision keeps MXU passes f32-accurate (bf16x6) — required to hit
    # the reference-parity tolerance; the op is bandwidth- not FLOP-limited here.
    inner = jnp.einsum(
        "byfuc,byxu->byfxc", slabs, S, preferred_element_type=dt, precision=lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "byfxc,byxf->byxc", inner, v.astype(dt), preferred_element_type=dt, precision=lax.Precision.HIGHEST
    )
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused Pallas TPU kernel
# ---------------------------------------------------------------------------


def _sepconv_pallas_raw(x: jax.Array, v: jax.Array, h: jax.Array, *, row_tile: int) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C, ks = _check_shapes(x, v, h)
    TH = row_tile
    assert H % TH == 0, f"H={H} must divide row_tile={TH}"

    def kernel(x_ref, v_ref, h_ref, o_ref, acc_ref):
        # Block shapes:
        #   x_ref: [TH+ks-1, W+ks-1, C]   v_ref/h_ref: [TH, W, ks]
        #   o_ref: [TH, W, C]             acc_ref: [TH, W, C] f32 scratch
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def fy_body(fy, _):
            rows = x_ref[pl.ds(fy, TH)]  # [TH, W+ks-1, C]

            def fx_body(fx, inner):
                cols = rows[:, pl.ds(fx, W), :]  # [TH, W, C]
                hk = h_ref[:, :, fx]  # [TH, W]
                return inner + cols * hk[:, :, None]

            inner = lax.fori_loop(0, ks, fx_body, jnp.zeros((TH, W, C), jnp.float32))
            vk = v_ref[:, :, fy]
            acc_ref[...] += inner * vk[:, :, None]
            return 0

        lax.fori_loop(0, ks, fy_body, 0)
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    grid = (B, H // TH)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH + ks - 1, W + ks - 1, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, TH, W, ks), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, TH, W, ks), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, TH, W, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * W * C * ks * ks,
            bytes_accessed=(x.size + v.size + h.size + B * H * W * C) * 4,
            transcendentals=0,
        ),
    )(x, v, h)


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
    raise ValueError(f"unknown sepconv impl {impl!r}")
