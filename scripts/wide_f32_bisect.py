#!/usr/bin/env python
"""Minimize + attempt workarounds for the wide-f32 libtpu AOT compiler crash
(VERDICT r4 item 4 / Weak #4).

Round 4 characterized a deterministic libtpu bug on this stack (jaxlib 0.9.0
tunnel): full-model f32 GRAD programs of bi-TAI at wide shapes (W > 128,
UCF 256x320) crash the AOT compiler ("remote_compile HTTP 500:
tpu_compile_helper subprocess exit code 1", ~25 s in) — XLA-AD at fold=3 and
fold=6, fused adjoints at fold=6 — while bf16 at the same shapes, f32 at
narrow shapes, and standalone sepconv-only grads all compile.  Production
dispatch routes wide-f32 to the adjoints (ops/sepconv.py:_use_pallas_bwd),
leaving B=1 the only compilable wide-f32 training config.

This script, in one process (a crashed compile does NOT poison the client —
round-4 evidence: a bf16 compile right after a crash in the same process
succeeds):

* ``--stage bisect``: shrink the crashing XLA-AD B=2 f32 program one knob at
  a time (T, K/F, num_block, gf, ks, H, W) and record crash/ok per config —
  the smallest still-crashing config is the minimal repro for an upstream
  report.  Crashing legs cost ~25 s; compiling legs pay a real compile.
* ``--stage workaround``: at the REAL config (TAI_color nb=4, K=F=4 T=3,
  256x320, B=2, f32), try program-shrinking structures the round-1 fused-step
  pathology responded to: (a) remat of the rollout submodules (--remat flag
  plumbing, nn/mcnet.py:136-146), (b) jax.checkpoint around the whole
  generator apply, (c) both backward implementations under each.  Any leg
  that compiles is executed once to confirm it runs, unlocking wide-f32
  training at B>=2.

Results: WIDE_F32_r05.json at the repo root + console log.

Run: python scripts/wide_f32_bisect.py [--stage bisect,workaround] [--budget_min 45]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vfi_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

JSON_PATH = os.path.join(REPO, "WIDE_F32_r05.json")

BASE = dict(c_dim=3, nb=4, K=4, T=3, F=4, H=256, W=320, B=2, gf=64, ks=51, kf=32)


def _model(cfg, remat=False):
    from vfi_tpu.models.fill_in import TAIFillInModel

    return TAIFillInModel(
        gf_dim=cfg["gf"], c_dim=cfg["c_dim"], feature_size=3, ks=cfg["ks"],
        num_block=cfg["nb"], kf_dim=cfg["kf"], layers=3,
        sepconv_impl="pallas_mxu", remat=remat,
    )


_init_cache = {}


def _params(cfg, model):
    """Init once per architecture, on CPU at tiny spatial size (conv params
    are H/W/K/T/F-independent; full-size TPU inits would cost a compile per
    bisect leg)."""
    key = tuple(cfg[k] for k in ("gf", "nb", "ks", "kf", "c_dim"))
    if key not in _init_cache:
        cpu = jax.devices("cpu")[0]
        hw = 1 << max(6, cfg["nb"] + 2)
        p0 = np.zeros((1, 2, hw, hw, cfg["c_dim"]), np.float32)
        with jax.default_device(cpu):
            v = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), 1, p0, p0)
        _init_cache[key] = jax.device_get(v["params"])
    return _init_cache[key]


def _try_grad_compile(cfg, bwd_flag: str, remat=False, outer_checkpoint=False,
                      run_after=False):
    """AOT-compile (and optionally run) the full-model f32 grad program.

    Returns (status, seconds, detail): status in {"ok", "crash", "error"}.
    """
    tpu = jax.devices()[0]
    K, T, F, H, W, B, c = (cfg[k] for k in ("K", "T", "F", "H", "W", "B", "c_dim"))
    old = os.environ.pop("SEPCONV_PALLAS_BWD", None)
    os.environ["SEPCONV_PALLAS_BWD"] = bwd_flag
    t0 = time.perf_counter()
    try:
        # everything — incl. model construction and CPU init — inside the
        # try: an invalid shrink config must record as "error", not kill the
        # whole sweep
        model = _model(cfg, remat=remat)
        rng = np.random.RandomState(7)
        p = rng.uniform(-1, 1, (B, K, H, W, c)).astype(np.float32)
        f = rng.uniform(-1, 1, (B, F, H, W, c)).astype(np.float32)
        tgt = rng.uniform(-1, 1, (B, T, H, W, c)).astype(np.float32)
        params = _params(cfg, model)

        def loss(vv, a, b, t):
            apply = lambda vv_, a_, b_: model.apply({"params": vv_}, T, a_, b_)["pred"]
            if outer_checkpoint:
                apply = jax.checkpoint(apply)
            pred = apply(vv, a, b)
            return jnp.mean((pred.astype(jnp.float32) - t) ** 2)

        args = jax.device_put((params, p, f, tgt), tpu)
        lowered = jax.jit(jax.grad(loss)).lower(*args)
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        if run_after:
            g = compiled(*args)
            leaf = np.asarray(jax.tree.leaves(g)[0])  # force execution
            if not np.all(np.isfinite(leaf)):
                return "error", dt, "non-finite gradient leaf"
        return "ok", dt, f"compiled in {dt:.0f}s"
    except Exception as e:  # noqa: BLE001
        dt = time.perf_counter() - t0
        msg = f"{type(e).__name__}: {str(e)[:300]}"
        crash = ("remote_compile" in msg or "tpu_compile_helper" in msg
                 or "INTERNAL" in msg or "500" in msg)
        return ("crash" if crash else "error"), dt, msg
    finally:
        os.environ.pop("SEPCONV_PALLAS_BWD", None)
        if old is not None:
            os.environ["SEPCONV_PALLAS_BWD"] = old


def _time_grad(cfg, bwd_flag: str, dtype_str: str = "f32", remat=False,
               outer_checkpoint=False, iters=10):
    """Time the full-model grad program (end-sync methodology, CLAUDE.md):
    launch all iters, force one leaf at the end."""
    tpu = jax.devices()[0]
    K, T, F, H, W, B, c = (cfg[k] for k in ("K", "T", "F", "H", "W", "B", "c_dim"))
    dtype = jnp.bfloat16 if dtype_str == "bf16" else jnp.float32
    old = os.environ.pop("SEPCONV_PALLAS_BWD", None)
    os.environ["SEPCONV_PALLAS_BWD"] = bwd_flag
    try:
        model = _model(cfg, remat=remat)
        rng = np.random.RandomState(7)
        cast = lambda a: np.asarray(a).astype(dtype)
        p = cast(rng.uniform(-1, 1, (B, K, H, W, c)))
        f = cast(rng.uniform(-1, 1, (B, F, H, W, c)))
        tgt = rng.uniform(-1, 1, (B, T, H, W, c)).astype(np.float32)
        params = jax.tree.map(cast, _params(cfg, model))

        def loss(vv, a, b, t):
            apply = lambda vv_, a_, b_: model.apply({"params": vv_}, T, a_, b_)["pred"]
            if outer_checkpoint:
                apply = jax.checkpoint(apply)
            return jnp.mean((apply(vv, a, b).astype(jnp.float32) - t) ** 2)

        gfn = jax.jit(jax.grad(loss))
        args = jax.device_put((params, p, f, tgt), tpu)
        g = gfn(*args)
        np.asarray(jax.tree.leaves(g)[0])  # warm + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            g = gfn(*args)
        np.asarray(jax.tree.leaves(g)[0])  # one end sync
        ms = (time.perf_counter() - t0) / iters * 1000
        return "ok", ms, f"{ms:.1f} ms/grad (B={B}, {ms / B:.1f} ms/sample)"
    except Exception as e:  # noqa: BLE001
        return "error", 0.0, f"{type(e).__name__}: {str(e)[:200]}"
    finally:
        os.environ.pop("SEPCONV_PALLAS_BWD", None)
        if old is not None:
            os.environ["SEPCONV_PALLAS_BWD"] = old


def _load():
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as fh:
            return json.load(fh)
    return {"bisect": {}, "workaround": {}}


def _save(results):
    with open(JSON_PATH, "w") as fh:
        json.dump(results, fh, indent=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="bisect,workaround")
    ap.add_argument("--budget_min", type=float, default=60.0)
    args = ap.parse_args(argv)
    stages = set(args.stage.split(","))
    deadline = time.time() + args.budget_min * 60
    results = _load()

    def record(section, label, cfg, status, dt, detail, extra=None):
        row = {"cfg": {k: cfg[k] for k in ("nb", "K", "T", "F", "H", "W", "B",
                                           "gf", "ks")},
               "status": status, "seconds": round(dt, 1), "detail": detail}
        if extra:
            row.update(extra)
        results[section][label] = row
        _save(results)
        print(f"[{section}] {label}: {status} ({dt:.0f}s) {detail[:160]}", flush=True)

    if "bisect" in stages:
        # Greedy single-knob shrinks from the known-crashing baseline.  Every
        # leg is XLA-AD (bwd=0) f32 B=2 — the canonical crashing program.
        legs = [
            ("baseline", BASE),
            ("T1", {**BASE, "T": 1}),
            ("KF2", {**BASE, "K": 2, "F": 2}),
            # nb < 4 is architecturally invalid (kernelnet asserts), so depth
            # cannot be shrunk independently
            ("gf16", {**BASE, "gf": 16, "kf": 16}),
            ("ks21", {**BASE, "ks": 21}),
            ("H64", {**BASE, "H": 64}),
            ("W192", {**BASE, "W": 192}),
        ]
        for label, cfg in legs:
            if label in results["bisect"]:
                print(f"[bisect] {label}: cached "
                      f"{results['bisect'][label]['status']}", flush=True)
                continue
            if time.time() > deadline:
                print("budget exhausted", flush=True)
                break
            status, dt, detail = _try_grad_compile(cfg, "0")
            record("bisect", label, cfg, status, dt, detail)
        # Combine every shrink that kept the crash into one minimal config.
        still = {lbl for lbl, row in results["bisect"].items()
                 if lbl != "baseline" and row["status"] == "crash"}
        if still and "minimal" not in results["bisect"] and time.time() < deadline:
            mini = dict(BASE)
            for lbl, cfg in legs:
                if lbl in still:
                    mini.update({k: v for k, v in cfg.items() if BASE[k] != v})
            status, dt, detail = _try_grad_compile(mini, "0")
            record("bisect", "minimal", mini, status, dt, detail)

    if "workaround" in stages:
        legs = [
            ("xla_ad_remat", dict(bwd="0", remat=True, outer=False)),
            ("adjoint_remat", dict(bwd="1", remat=True, outer=False)),
            ("xla_ad_outer_ckpt", dict(bwd="0", remat=False, outer=True)),
            ("adjoint_outer_ckpt", dict(bwd="1", remat=False, outer=True)),
        ]
        for label, kw in legs:
            if label in results["workaround"]:
                print(f"[workaround] {label}: cached "
                      f"{results['workaround'][label]['status']}", flush=True)
                continue
            if time.time() > deadline:
                print("budget exhausted", flush=True)
                break
            status, dt, detail = _try_grad_compile(
                BASE, kw["bwd"], remat=kw["remat"], outer_checkpoint=kw["outer"],
                run_after=True)
            record("workaround", label, BASE, status, dt, detail)

    if "timing" in stages:
        # Grad-program cost of the unlocked wide-f32 paths, against the bf16
        # recipe and the old B=1 envelope, all measured with one methodology
        # (grad-only program, end-sync).  Compiles ride the persistent cache.
        legs = [
            ("plain_bf16_xla_B2", dict(bwd="0", dtype="bf16")),
            ("plain_f32_adjoint_B1", dict(bwd="1", dtype="f32", B=1)),
            ("remat_f32_xla_B2", dict(bwd="0", dtype="f32", remat=True)),
            ("remat_f32_adjoint_B2", dict(bwd="1", dtype="f32", remat=True)),
            ("ckpt_f32_xla_B2", dict(bwd="0", dtype="f32", outer=True)),
            ("remat_bf16_xla_B2", dict(bwd="0", dtype="bf16", remat=True)),
        ]
        results.setdefault("timing", {})
        for label, kw in legs:
            if label in results["timing"]:
                print(f"[timing] {label}: cached", flush=True)
                continue
            if time.time() > deadline:
                print("budget exhausted", flush=True)
                break
            cfg = {**BASE, "B": kw.get("B", 2)}
            status, ms, detail = _time_grad(
                cfg, kw["bwd"], dtype_str=kw.get("dtype", "f32"),
                remat=kw.get("remat", False), outer_checkpoint=kw.get("outer", False))
            results["timing"][label] = {"status": status, "ms_per_grad": round(ms, 1),
                                        "B": cfg["B"], "detail": detail}
            _save(results)
            print(f"[timing] {label}: {status} {detail}", flush=True)

    n_ok = sum(1 for r in results["workaround"].values() if r["status"] == "ok")
    print(json.dumps({"workarounds_compiling": n_ok,
                      "bisect_legs": len(results["bisect"])}, indent=1))


if __name__ == "__main__":
    main()
