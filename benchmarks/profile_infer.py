#!/usr/bin/env python
"""Profile bi-TAI inference at two batch sizes to explain the B=32 regression
(VERDICT r2 item 6: B=16 966 < B=24 1024 > B=32 893 f/s bf16).

Captures one trace per batch size and prints the per-iteration device-time
breakdown by HLO category side by side.

Usage: python benchmarks/profile_infer.py [batches ...]   (default: 24 32)
Knobs: BENCH_DTYPE as in bench.py; WIDE=1 profiles the UCF-shape TAI_color
(256x320 RGB, num_block=4, K=4/T=3/F=4 — the wide-W column-tiled sepconv
path) instead of the KTH-gray flagship; default batches become [8, 16].
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 8


def device_breakdown(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    by = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        cat = (ev.get("args") or {}).get("hlo_category")
        if cat:
            by[cat] += ev["dur"]
    return by


def wide_build(batch):
    """UCF-shape TAI_color builder (mirrors benchmarks/ab_color_batch.py)."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.models.fill_in import TAIFillInModel

    K, T, F, H, W = 4, 3, 4, 256, 320
    model = TAIFillInModel(gf_dim=64, c_dim=3, feature_size=3, ks=51, num_block=4)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (batch, K, H, W, 3), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (batch, F, H, W, 3), minval=-1.0, maxval=1.0)
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))
    fwd = jax.jit(lambda v, p, f: model.apply(v, T, p, f)["pred"])
    return fwd, variables, p, f


def main():
    wide = os.environ.get("WIDE", "0") == "1"
    batches = [int(b) for b in sys.argv[1:]] or ([8, 16] if wide else [24, 32])

    from vfi_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import numpy as np

    from bench import build

    results = {}
    for b in batches:
        fwd, variables, p, f = (wide_build if wide else build)(b)
        np.asarray(fwd(variables, p, f))
        np.asarray(fwd(variables, p, f))
        out_dir = f"/tmp/vfi_profile_infer_{'wide_' if wide else ''}b{b}"
        import jax

        jax.profiler.start_trace(out_dir)
        out = None
        for _ in range(ITERS):
            out = fwd(variables, p, f)
        np.asarray(out)
        jax.profiler.stop_trace()
        results[b] = device_breakdown(out_dir)
        print(f"B={b}: trace -> {out_dir}", file=sys.stderr, flush=True)

    cats = sorted({c for r in results.values() for c in r},
                  key=lambda c: -max(r.get(c, 0) for r in results.values()))
    header = "category".ljust(26) + "".join(
        f"B={b} ms/it  per-sample".rjust(24) for b in batches)
    print(header)
    for c in cats:
        row = c.ljust(26)
        for b in batches:
            ms = results[b].get(c, 0.0) / 1e3 / ITERS
            row += f"{ms:12.2f}  {ms / b * 1000:9.1f}us".rjust(24)
        print(row)
    tot = {b: sum(results[b].values()) / 1e3 / ITERS for b in batches}
    row = "TOTAL".ljust(26)
    for b in batches:
        row += f"{tot[b]:12.2f}  {tot[b] / b * 1000:9.1f}us".rjust(24)
    print(row)


if __name__ == "__main__":
    main()
