#!/usr/bin/env python
"""Intrinsic f32 conditioning floor for the wide-shape gradient parity gate.

Context (PARITY_r04): the TPU fused-adjoint wide-f32 gradient (TAI_color
256x320 B=1 — the only compilable wide-f32 training config on this libtpu)
measured global-L2-rel 2.1e-2 against the CPU exact-f32 reference, marginally
over the generic 2e-2 f32 gate.  With the XLA-AD cross-check impossible at
this shape (deterministic AOT compiler crash), the question is how much of
that 2.1e-2 is f32 evaluation noise intrinsic to the shape itself.

This script measures that floor with no TPU involved: CPU exact-f32 grads vs
CPU f64 grads of the SAME loss / weights / inputs as the parity B1 case
(`sepconv_mxu` preserves float64, so the f64 leg is a near-exact reference).
Every difference between the two legs is pure f32 rounding/conditioning —
identical formulation, identical schedule family, one backend.

The measured floor is recorded in PARITY_r04.json under
grad['TAI_color_UCF'].rows['B1_f32'].f32_conditioning_floor and is what the
wide-f32 gate in scripts/parity_r04_tpu.py is calibrated against.

Run: python scripts/wide_f32_floor.py            (re-execs the f64 leg in a
subprocess with JAX_ENABLE_X64=1 so x64 promotion cannot leak into f32)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# Hard-assign, not setdefault: the axon environment exports JAX_PLATFORMS=axon,
# which silently routed this CPU-only script to the TPU (and OOMed it on the
# f64 leg).  This script has no TPU mode at all.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

C_DIM, NUM_BLOCK = 3, 4
K, T, F = 4, 3, 4
H, W, B = 256, 320, 1
OUT = os.path.join(REPO, "PARITY_r04.json")


def _grads(x64: bool):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from parity_r04_tpu import _inputs, _mirror_params, _tai

    dt = jnp.float64 if x64 else jnp.float32
    params = jax.tree.map(lambda a: jnp.asarray(a, dt), _mirror_params(C_DIM, NUM_BLOCK))
    p, f = _inputs(C_DIM, K, T, F, H, W, B, seed=200 + B)
    tgt = np.random.RandomState(999).uniform(-1, 1, (B, T, H, W, C_DIM))
    p, f, tgt = (jnp.asarray(a, dt) for a in (p, f, tgt))
    model = _tai(C_DIM, NUM_BLOCK, "mxu")

    def loss(v, a, b, t):
        pred = model.apply({"params": v}, T, a, b)["pred"]
        return jnp.mean((pred - t) ** 2)

    t0 = time.perf_counter()
    g = jax.device_get(jax.jit(jax.grad(loss))(params, p, f, tgt))
    dt_s = time.perf_counter() - t0
    return g, dt_s


def main():
    if "--f64-leg" in sys.argv:
        import jax

        jax.config.update("jax_enable_x64", True)
        g, secs = _grads(x64=True)
        np.savez(sys.argv[-1], **{f"leaf{i}": np.asarray(l, np.float64)
                                  for i, l in enumerate(jax.tree.leaves(g))})
        print(json.dumps({"seconds": round(secs, 1)}))
        return 0

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import jax

    from parity_r04_tpu import _grad_compare

    g32, s32 = _grads(x64=False)
    print(f"f32 leg done ({s32:.0f}s)", flush=True)

    tmp = "/tmp/wide_floor_f64.npz"
    r = subprocess.run([sys.executable, os.path.abspath(__file__), "--f64-leg", tmp],
                       env={**os.environ, "JAX_ENABLE_X64": "1"}, text=True,
                       capture_output=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        return 1
    print(f"f64 leg done ({r.stdout.strip()})", flush=True)
    z = np.load(tmp)
    leaves64 = [z[f"leaf{i}"] for i in range(len(z.files))]
    leaves32 = jax.tree.leaves(g32)
    assert len(leaves64) == len(leaves32)
    cmp = _grad_compare(leaves32, leaves64)
    print(json.dumps(cmp, indent=1))

    with open(OUT) as fh:
        res = json.load(fh)
    row = res["grad"]["TAI_color_UCF"]["rows"].setdefault("B1_f32", {})
    row["f32_conditioning_floor"] = {
        "what": "CPU exact-f32 grads vs CPU f64 grads, same loss/weights/inputs",
        **cmp,
    }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(f"recorded in {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
