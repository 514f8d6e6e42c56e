#!/usr/bin/env python
"""Decompose the wide-f32 B=1 gradient-parity error (PARITY_r04).

Measured so far at TAI_color 256x320 B=1 f32 (the only compilable wide-f32
training config on this libtpu — see ops/sepconv.py:_use_pallas_bwd):

  * TPU fused-adjoint grads vs CPU exact-f32:      2.098e-2  global-L2-rel
  * intrinsic f32 conditioning floor (CPU f32 vs
    CPU f64, same formulation — wide_f32_floor.py): 2.596e-4

The 2.1e-2 is ~80x the conditioning floor, so it is NOT f32 evaluation noise
of the shape — it is the Pallas path's own numerics (the forward's 3-dot bf16
hi/lo split + the fused adjoints' splits) amplified through the full-model
backward.  This script separates the two remaining confounds with one more
TPU program, the `impl="mxu"` formulation (exact-f32 HIGHEST-precision
einsums, XLA-AD backward, no Pallas custom calls — a DIFFERENT XLA program
from the two that deterministically crash the libtpu AOT compiler, so worth
one fail-fast attempt):

  * tpu_mxu_ad_vs_cpu_exact   — pure TPU-vs-CPU backend noise (identical
                                 formulation both sides)
  * tpu_adjoint_vs_tpu_mxu_ad — the shipped Pallas path (hi/lo fwd + fused
                                 adjoints) vs exact-f32 on ONE backend

Results land in PARITY_r04.json under
grad['TAI_color_UCF'].rows['B1_f32'].decomposition and calibrate the wide-f32
gate in scripts/parity_r04_tpu.py.

Run: python scripts/wide_f32_decompose.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from vfi_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from parity_r04_tpu import (  # noqa: E402
    _grad_compare, _grad_fn, _inputs, _mirror_params, _run_grads, _tai,
)

C_DIM, NUM_BLOCK = 3, 4
K, T, F = 4, 3, 4
H, W, B = 256, 320, 1
OUT = os.path.join(REPO, "PARITY_r04.json")


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    assert tpu.platform != "cpu", "needs the real chip"

    params = _mirror_params(C_DIM, NUM_BLOCK)
    p, f = _inputs(C_DIM, K, T, F, H, W, B, seed=200 + B)
    tgt = np.random.RandomState(999).uniform(-1, 1, (B, T, H, W, C_DIM)).astype(np.float32)

    dec = {}

    # Leg 1 (fail-fast candidate): exact-f32 mxu formulation on the TPU.
    try:
        m_mxu = _tai(C_DIM, NUM_BLOCK, "mxu")
        v_tpu = jax.device_put(params, tpu)
        t0 = time.perf_counter()
        g_mxu_tpu = _run_grads(m_mxu, v_tpu, T, p, f, tgt, tpu, None)
        dec["seconds_tpu_mxu"] = round(time.perf_counter() - t0, 1)
        print(f"TPU mxu-AD leg done ({dec['seconds_tpu_mxu']}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        dec["error_tpu_mxu"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"TPU mxu-AD leg failed: {dec['error_tpu_mxu']}", flush=True)
        g_mxu_tpu = None

    # Leg 2: the shipped Pallas path (pallas fwd + fused adjoints) on the TPU.
    g_adj = None
    if g_mxu_tpu is not None:
        m_pal = _tai(C_DIM, NUM_BLOCK, "pallas_mxu")
        v_tpu = jax.device_put(params, tpu)
        t0 = time.perf_counter()
        g_adj = _run_grads(m_pal, v_tpu, T, p, f, tgt, tpu, "1")
        print(f"TPU adjoint leg done ({time.perf_counter() - t0:.0f}s)", flush=True)
        dec["tpu_adjoint_vs_tpu_mxu_ad"] = _grad_compare(g_adj, g_mxu_tpu)

        # Leg 3: CPU exact reference (same mxu formulation).
        m_cpu = _tai(C_DIM, NUM_BLOCK, "mxu")
        v_cpu = jax.device_put(params, cpu)
        t0 = time.perf_counter()
        g_ref = _run_grads(m_cpu, v_cpu, T, p, f, tgt, cpu, None)
        print(f"CPU exact leg done ({time.perf_counter() - t0:.0f}s)", flush=True)
        dec["tpu_mxu_ad_vs_cpu_exact"] = _grad_compare(g_mxu_tpu, g_ref)

    print(json.dumps(dec, indent=1))
    with open(OUT) as fh:
        res = json.load(fh)
    row = res["grad"]["TAI_color_UCF"]["rows"].setdefault("B1_f32", {})
    row["decomposition"] = dec
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(f"recorded in {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
