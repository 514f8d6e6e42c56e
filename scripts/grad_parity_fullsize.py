#!/usr/bin/env python
"""Full-paper-size gradient parity: jax.grad vs torch autograd on CPU.

Closes VERDICT r3 Weak #1: the r03 gradient-parity gate
(tests/test_grad_parity.py, worst rel 5e-6) ran at toy size (gf=8, ks=5, 32²)
while forward parity ran at full paper size — and the round-2 lesson was that
full-size runs catch what toy sizes don't (the ContentEnc fix came from one).
This script runs the SAME torch-mirror-vs-importer gradient comparison at
gf=64, ks=51, 128² for TAI_gray (nb=5) and TAI_color (nb=4), with the
reference generator's non-GAN loss (L2 + GDL,
src/environments/environments.py:300-307 semantics), in TWO legs:

  * f64 exactness leg (torch .double() vs jax x64, run in a subprocess with
    JAX_ENABLE_X64=1 so x64 type promotion cannot leak into the f32 leg):
    proves the two formulations are IDENTICAL — any worst-tensor relative
    error above f64 noise is a real bug.  Gate: worst rel <= 1e-7.
  * f32 characterization leg (production dtypes): at full size the worst
    per-tensor max-abs relative error is dominated by reduction-order noise
    on deep near-cancelling bias sums (measured ~1e-2 here while the SAME
    comparison passes 1e-7 in f64, and while CPU-vs-TPU XLA-AD — identical
    formulation — shows 28% on such leaves).  Gate: GLOBAL L2 relative error
    <= 2e-2 and loss |Δ| <= 1e-5; worst-tensor rel recorded as a diagnostic.

Results land in the PARITY_r04 artifact (grad_fullsize_cpu section).

Run with JAX_PLATFORMS=cpu:  JAX_PLATFORMS=cpu python scripts/grad_parity_fullsize.py
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

F64_REL_GATE = 1e-7
F32_GLOBAL_L2_GATE = 2e-2
CONFIGS = (("TAI_gray gf=64 ks=51 nb=5 K=T=F=5 128^2", 1, 5),
           ("TAI_color gf=64 ks=51 nb=4 K=F=4 T=3 128^2", 3, 4))


def run_config(c_dim: int, num_block: int, x64: bool) -> dict:
    import jax
    import torch

    torch.set_num_threads(1)
    from tests import torch_mirror
    from tests.test_grad_parity import _torch_gdl
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.train.losses import gdl_loss, l2_loss
    from vfi_tpu.utils.torch_import import import_generator_state_dict

    np_dt = np.float64 if x64 else np.float32
    gf, kf, ks, layers = 64, 32, 51, 3
    K = F = 5 if c_dim == 1 else 4
    T = 5 if c_dim == 1 else 3
    H = W = 128
    B = 1
    rng = np.random.RandomState(300 + c_dim)

    torch.manual_seed(10 + c_dim)
    tm = torch_mirror.TAIFillInModel(gf, c_dim, 3, ks, num_block=num_block,
                                     kf_dim=kf, layers=layers)
    tm.train(False)
    if x64:
        tm.double()

    p = rng.uniform(-1, 1, (B, K, c_dim, H, W)).astype(np_dt)
    f = rng.uniform(-1, 1, (B, F, c_dim, H, W)).astype(np_dt)
    tgt = rng.uniform(-1, 1, (B, T, c_dim, H, W)).astype(np_dt)

    t0 = time.perf_counter()
    out = tm(T, torch.tensor(p), torch.tensor(f))["pred"]
    loss_t = ((out - torch.tensor(tgt)) ** 2).mean() + _torch_gdl(out, torch.tensor(tgt))
    loss_t.backward()
    t_torch = time.perf_counter() - t0

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    gd = {
        k: (v.grad.detach().numpy() if v.grad is not None else np.zeros_like(v.detach().numpy()))
        for k, v in tm.named_parameters()
    }
    del tm
    params, _ = import_generator_state_dict(sd, "tai", num_block=num_block,
                                            layers=layers, dtype=np_dt)
    grads_torch, _ = import_generator_state_dict(gd, "tai", num_block=num_block,
                                                 layers=layers, dtype=np_dt)

    model = TAIFillInModel(gf_dim=gf, c_dim=c_dim, feature_size=3, ks=ks,
                           num_block=num_block, kf_dim=kf, layers=layers)
    pj, fj, tj = (a.transpose(0, 1, 3, 4, 2) for a in (p, f, tgt))

    def loss_fn(v):
        pred = model.apply({"params": v}, T, pj, fj)["pred"]
        return l2_loss(pred, tj) + gdl_loss(pred, tj)

    t0 = time.perf_counter()
    loss_j, grads_jax = jax.jit(jax.value_and_grad(loss_fn))(params)
    loss_j = float(loss_j)
    t_jax = time.perf_counter() - t0

    flat_j = jax.tree_util.tree_flatten_with_path(grads_jax)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(grads_torch)[0]
    assert [k for k, _ in flat_j] == [k for k, _ in flat_t]
    worst, worst_key = 0.0, ""
    num = den = 0.0
    for (k, gj), (_, gt) in zip(flat_j, flat_t):
        gj, gt = np.asarray(gj, np.float64), np.asarray(gt, np.float64)
        rel = float(np.max(np.abs(gj - gt)) / (np.max(np.abs(gt)) + 1e-30))
        if rel > worst:
            worst, worst_key = rel, jax.tree_util.keystr(k)
        num += float(((gj - gt) ** 2).sum())
        den += float((gt**2).sum())
    global_l2 = float(np.sqrt(num / max(den, 1e-30)))
    loss_delta = abs(loss_j - float(loss_t.detach()))
    if x64:
        passed = worst <= F64_REL_GATE and loss_delta < 1e-10
    else:
        passed = global_l2 <= F32_GLOBAL_L2_GATE and loss_delta < 1e-5
    return {
        "leg": "f64_exact" if x64 else "f32",
        "n_tensors": len(flat_j), "worst_rel": worst, "worst_tensor": worst_key,
        "global_l2_rel": global_l2,
        "loss_abs_delta": loss_delta, "torch_seconds": round(t_torch, 1),
        "jax_seconds": round(t_jax, 1),
        "rel_gate": F64_REL_GATE if x64 else None,
        "global_l2_gate": None if x64 else F32_GLOBAL_L2_GATE,
        "passed": bool(passed),
    }


def run_leg(leg: str) -> int:
    """Run one leg in THIS process and merge rows into the artifact."""
    if leg == "f64":
        import jax

        jax.config.update("jax_enable_x64", True)
    from scripts.parity_r04_tpu import _load, _save  # shares the artifact

    results = _load()
    section = results.setdefault("grad_fullsize_cpu", {})
    ok = True
    for name, c_dim, nb in CONFIGS:
        row = run_config(c_dim, nb, x64=(leg == "f64"))
        section[f"{name} [{row['leg']}]"] = row
        ok &= row["passed"]
        print(f"[{'PASS' if row['passed'] else 'FAIL'}] {name} [{row['leg']}]: worst rel "
              f"{row['worst_rel']:.2e} at {row['worst_tensor']}, global L2 "
              f"{row['global_l2_rel']:.2e}, loss |d| {row['loss_abs_delta']:.1e} "
              f"(torch {row['torch_seconds']}s, jax {row['jax_seconds']}s)", flush=True)
        _save(results)
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=["f32", "f64"], default=None,
                    help="run one leg in-process (default: both, f64 in a "
                         "JAX_ENABLE_X64=1 subprocess)")
    args = ap.parse_args()
    if args.leg:
        return run_leg(args.leg)

    rc = run_leg("f32")
    env = dict(os.environ, JAX_ENABLE_X64="1")
    r = subprocess.run([sys.executable, os.path.abspath(__file__), "--leg", "f64"],
                       cwd=REPO, env=env)
    rc = rc or r.returncode
    print("overall:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
