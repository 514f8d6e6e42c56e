#!/usr/bin/env python
"""Capture an XLA profiler trace of the MC-Net rollout fwd+grad (and optionally
the full train step) to attribute where the ~93 ms bf16 goes (round-3 item 2).

Writes a trace under /tmp/vfi_profile; inspect op totals with
  python benchmarks/profile_mcnet.py --summarize /tmp/vfi_profile

Knobs: G_DTYPE, G_SCAN, G_BATCH as in bench_g_parts.py.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def summarize(trace_dir):
    """Aggregate device-op durations from the .trace.json.gz events."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace files under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # find device lanes (TPU/XLA ops have 'dur' and a name)
    by_name = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        args = ev.get("args") or {}
        hlo_cat = args.get("hlo_category") or ""
        if not hlo_cat:
            continue  # keep only device HLO op events
        key = hlo_cat
        by_name[key] += ev["dur"]
        total += ev["dur"]
    print(f"trace: {path}")
    print(f"total device op time: {total/1e3:.1f} ms (all steps in window)")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/1e3:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")


def capture():
    from vfi_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfi_tpu.nn.mcnet import MCNet

    B = int(os.environ.get("G_BATCH", "8"))
    K, T, H, W = 5, 5, 128, 128
    DTYPE = os.environ.get("G_DTYPE", "bfloat16")
    SCAN = os.environ.get("G_SCAN", "0") == "1"

    model = MCNet(gf_dim=64, c_dim=1, scan_rollout=SCAN)
    rng = jax.random.PRNGKey(0)
    Beff = 2 * B
    diff = jax.random.normal(rng, (Beff, K - 1, H, W, 1))
    xt = jax.random.normal(rng, (Beff, H, W, 1))
    variables = jax.jit(model.init, static_argnums=1)(rng, T, diff, xt)
    if DTYPE == "bfloat16":
        variables, diff, xt = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), (variables, diff, xt))

    def loss(params, diff, xt):
        out = model.apply({"params": params}, T, diff, xt)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in jax.tree.leaves(out))

    g = jax.jit(jax.grad(loss))
    np.asarray(jax.tree.leaves(g(variables["params"], diff, xt))[0])
    np.asarray(jax.tree.leaves(g(variables["params"], diff, xt))[0])

    out_dir = "/tmp/vfi_profile"
    jax.profiler.start_trace(out_dir)
    out = None
    for _ in range(5):
        out = g(variables["params"], diff, xt)
    np.asarray(jax.tree.leaves(out)[0])
    jax.profiler.stop_trace()
    print("trace written to", out_dir)
    summarize(out_dir)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize":
        summarize(sys.argv[2])
    else:
        capture()
