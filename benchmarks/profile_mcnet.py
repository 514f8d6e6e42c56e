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

    # Per-op breakdown: group repeated instances (fusion.123 -> fusion) by the
    # op's long_name/shape when available so the hot conv shapes stand out.
    by_op = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        if not (args.get("hlo_category") or ""):
            continue
        name = ev.get("name", "")
        expr = args.get("long_name") or args.get("expression") or ""
        # strip ssa ids: "%fusion.1023 = bf16[16,128,128,64]{...} fusion(...)"
        shape = ""
        if "=" in expr:
            rhs = expr.split("=", 1)[1].strip()
            shape = rhs.split(" ")[0]
        base = name.rstrip("0123456789.")
        key = f"{base:<24s} {shape}" if shape else name
        by_op[key][0] += ev["dur"]
        by_op[key][1] += 1
    print("\ntop ops (grouped by base name + result shape):")
    for k, (v, n) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {v/1e3:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  x{n:<4d} {k}")


def capture_gstep():
    """Trace the REAL G-update program (bi-TAI loss + grad + Adam) — the
    operating point item-2 optimizations must win at (isolated-module numbers
    have lied before; see CLAUDE.md 'measure INSIDE the train program')."""
    from vfi_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import numpy as np

    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    B = int(os.environ.get("G_BATCH", "8"))
    K = T = F = 5
    H = W = 128
    DTYPE = os.environ.get("G_DTYPE", "bfloat16")

    model = TAIFillInModel(gf_dim=64, c_dim=1, feature_size=3, ks=51, num_block=5)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=64, Ip=1, disc_window_size=5,
                      train_dtype=DTYPE)
    env = create_training_environment(model, cfg)
    batch = np.random.RandomState(0).uniform(-1, 1, (B, K + T + F, H, W, 1)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    targets = jax.numpy.asarray(batch)

    gstate = (state.g_params, state.g_opt, state.rng, state.step)
    d_frozen = (state.d_params, state.d_sn)
    gstate, pred, _ = env._g_update(gstate, d_frozen, K, T, F, targets)
    np.asarray(pred)
    gstate, pred, _ = env._g_update(gstate, d_frozen, K, T, F, targets)
    np.asarray(pred)

    out_dir = "/tmp/vfi_profile_gstep"
    jax.profiler.start_trace(out_dir)
    for _ in range(5):
        gstate, pred, _ = env._g_update(gstate, d_frozen, K, T, F, targets)
    np.asarray(pred)
    jax.profiler.stop_trace()
    print("trace written to", out_dir)
    summarize(out_dir)


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
    elif os.environ.get("PROFILE_TARGET", "mcnet") == "gstep":
        capture_gstep()
    else:
        capture()
