#!/usr/bin/env python
"""Interleaved A/B of XLA compiler options on the serving program.

The B=64 bf16 serving program is conv-bound at ~53-60% MXU efficiency
(benchmarks/profile_infer.py; bench.py roofline floor 49% MFU / 49% HBM).
Every graph-level lever has been A/B'd to neutral-or-worse (merged heads,
native kernel-head layout, pad-C1, first-conv batching), so the last
unexplored single-chip knob is the compiler itself.  The candidate with a
mechanism is the scoped-VMEM budget: the fusion emitter tiles fusions to fit
`xla_tpu_scoped_vmem_limit_kib` (default 16 MB — the same limit the Pallas
wide-W kernels had to tile around), and a bigger budget permits deeper
fusions / larger conv tiles on a 128 MB-VMEM v5e.

Method (per CLAUDE.md lessons): every variant is compiled in THIS process via
`jax.jit(...).lower(...).compile(compiler_options=...)` (options ride the
executable build request through the axon tunnel and key the compile cache),
then timed in interleaved rounds — launch `iters` steps, one np.asarray sync
at the end — so tunnel drift shows up inside each variant's spread rather
than between variants.  Unknown/rejected options are recorded per-variant,
not fatal.

Run: python benchmarks/ab_xla_flags.py [--batch 64] [--iters 8] [--rounds 5]
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from vfi_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import numpy as np  # noqa: E402


VARIANTS = [
    ("baseline", None),
    ("vmem32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--wide", action="store_true",
                    help="TAI_color 256x320 B=16 instead of KTH 128^2")
    opt = ap.parse_args()

    if opt.wide:
        os.environ.setdefault("BENCH_BATCH", "16")
        from vfi_tpu.models.fill_in import TAIFillInModel
        import jax.numpy as jnp

        K = F = 4
        T = 3
        H, W, C, B = 256, 320, 3, opt.batch if opt.batch != 64 else 16
        model = TAIFillInModel(gf_dim=64, c_dim=C, feature_size=3, ks=51, num_block=4)
    else:
        from vfi_tpu.models.fill_in import TAIFillInModel
        import jax.numpy as jnp

        K = F = T = 5
        H = W = 128
        C, B = 1, opt.batch
        model = TAIFillInModel(gf_dim=64, c_dim=C, feature_size=3, ks=51, num_block=5)

    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (B, K, H, W, C), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (B, F, H, W, C), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))

    def fwd(variables, p, f):
        return model.apply(variables, T, p, f)["pred"]

    lowered = jax.jit(fwd).lower(variables, p, f)

    compiled = {}
    for name, opts in VARIANTS:
        t0 = time.perf_counter()
        try:
            compiled[name] = lowered.compile(compiler_options=opts)
            print(f"[compile] {name}: {time.perf_counter() - t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record rejected options
            print(f"[compile] {name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # Numerics guard: variants must agree with the baseline at bf16 level.
    ref = None
    for name, exe in compiled.items():
        out = np.asarray(exe(variables, p, f), dtype=np.float32)
        if ref is None:
            ref = out
        else:
            print(f"[check] {name} max-abs vs baseline: {np.abs(out - ref).max():.2e}",
                  flush=True)

    times = {name: [] for name in compiled}
    for r in range(opt.rounds):
        for name, exe in compiled.items():
            np.asarray(exe(variables, p, f))  # warm/steady entry sync
            t0 = time.perf_counter()
            out = None
            for _ in range(opt.iters):
                out = exe(variables, p, f)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / opt.iters * 1000
            times[name].append(dt)
            print(f"[round {r}] {name}: {dt:.1f} ms/batch", flush=True)

    print()
    summary = {}
    for name, ts in times.items():
        med = statistics.median(ts)
        summary[name] = {
            "median_ms": round(med, 2),
            "fps": round(B * T / med * 1000, 1),
            "spread_ms": [round(min(ts), 2), round(max(ts), 2)],
        }
    print(json.dumps({"shape": f"{H}x{W} c={C} B={B} bf16", "results": summary}, indent=1))


if __name__ == "__main__":
    raise SystemExit(main())
