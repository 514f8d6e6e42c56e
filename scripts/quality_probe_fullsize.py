#!/usr/bin/env python
"""Full-paper-size serving-dtype quality probe ON the TPU (VERDICT r3 item 6).

The toy-scale probe (scripts/int8_quality_probe.py, gf=8/ks=5/32² on CPU)
measured int8-static at −0.36 dB / −0.012 SSIM vs f32 — but deployers will
quote that number for the real model, and the docs themselves prescribe
per-checkpoint validation.  This probe runs the SAME train→predict→metrics
pipeline at the paper's full architecture (TAI_gray gf=64 ks=51 nb=5, K=T=F=5,
128²) on the real chip:

  1. trains full-size bi-TAI on synthetic moving-gradient clips via cli/train.py
     (bf16 + --device_normalize, the hardware-validated round-2 recipe) for
     --iters steps — enough for a structured, non-random checkpoint;
  2. predicts the held-out clips four ways — f32, bf16, int8-static, and
     (opt-in) int8-dynamic — each through cli/predict.py on the TPU, at BOTH
     the trained m=5 and the reference's m=10 generalization setting
     (predict T=10 from the T=5-trained checkpoint, the same workflow behind
     the reference's kth m=10 tables — README.md:196-221);
  3. computes PSNR/SSIM vs ground truth with the standard eval pipeline and
     prints per-mode scores plus deltas vs f32.

Every TPU process runs serially (one axon client at a time).  Results merge
into --out (default QUALITY_r05.json) under a per-family key; the round-4
artifact (QUALITY_r04.json, gratings only) is preserved as recorded.

Round 5 (VERDICT r4 Weak #3 / item 7): a second, busier synthetic family —
``--family textures`` (broadband moving textures with occlusion,
vfi_tpu/data/synthetic.py) — stresses the int8/bf16 claims beyond the
band-limited gratings; and ``--skip_train --ckpt_dir ... --ckpt_name ...``
lets the probe score an already-trained checkpoint (e.g. the 20k-iter soak
checkpoint from scripts/train_soak.py).

Run: python scripts/quality_probe_fullsize.py [--iters 3000] [--work /tmp/q_full]
(3000 iters ≈ 8 min of device time at the measured 157 ms/step bf16 recipe,
fed via --device_cache; the round-4 artifact was recorded at 400 iters.)
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from vfi_tpu.data.synthetic import make_videolist  # noqa: E402

MODEL_KEY = ('{"class": "TAIFillInModel", "args": [], "kwargs": '
             '{"gf_dim": 64, "c_dim": 1, "ks": 51, "num_block": 5, "kf_dim": 32}}')

K = T = F = 5
HW = 128


def make_dataset(root: str, n_clips: int, seed: int, n_frames: int = 16,
                 family: str = "gratings") -> str:
    return make_videolist(root, n_clips, seed, n_frames=n_frames, hw=HW,
                          family=family)


def run(args, timeout=7200):
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=os.environ.copy(),
                       capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        sys.exit(f"FAILED: {args}\nstdout:\n{r.stdout[-3000:]}\nstderr:\n{r.stderr[-3000:]}")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--work", type=str, default="/tmp/q_full")
    ap.add_argument("--family", choices=["gratings", "textures"], default="gratings")
    ap.add_argument("--out", type=str, default="QUALITY_r05.json",
                    help="artifact filename at the repo root; entries merge "
                         "under the --family key")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing checkpoint (see --ckpt_dir/--ckpt_name)")
    ap.add_argument("--ckpt_dir", type=str, default=None,
                    help="checkpoints_dir holding the model (default <work>/ckpt)")
    ap.add_argument("--ckpt_name", type=str, default="probe",
                    help="experiment name under --ckpt_dir")
    ap.add_argument("--snapshot", type=str, default="model_latest.ckpt")
    ap.add_argument("--device_cache", type=int, default=48,
                    help="cli/train.py --device_cache batches for the training leg")
    ap.add_argument("--dynamic_int8", action="store_true")
    ap.add_argument("--skip_m10", action="store_true",
                    help="skip the m=10 generalization legs")
    opt = ap.parse_args()

    fam = opt.family
    train_list = make_dataset(os.path.join(opt.work, f"train_{fam}"), 24, seed=3,
                              family=fam)
    test_list = make_dataset(os.path.join(opt.work, f"test_{fam}"), 6, seed=99,
                             family=fam)
    # m=10 legs: same clip family, clips long enough for K+10+F frames.
    test_list_m10 = make_dataset(os.path.join(opt.work, f"test_{fam}_m10"), 6,
                                 seed=99, n_frames=K + 10 + F, family=fam)
    ckpt_dir = opt.ckpt_dir or os.path.join(opt.work, f"ckpt_{fam}")

    if not opt.skip_train:
        print(f"training FULL-SIZE bi-TAI for {opt.iters} iters on TPU "
              f"({fam}, bf16, device-normalize)...", flush=True)
        run([os.path.join(REPO, "cli", "train.py"), "--name", opt.ckpt_name,
             "--model_key", MODEL_KEY,
             "--K", str(K), "--T", str(T), "--F", str(F),
             "--alt_K", "7", "--alt_T", "10", "--alt_F", "7",
             "--c_dim", "1", "--image_size", str(HW),
             "--batch_size", "8", "--train_video_list_path", train_list,
             "--val_video_list_path", test_list, "--max_iter", str(opt.iters),
             "--print_freq", "100", "--save_latest_freq", str(opt.iters),
             "--validate_freq", str(opt.iters + 1),  # skip the val sweep; predict measures
             "--df_dim", "64", "--Ip", "1",
             "--train_dtype", "bfloat16", "--device_normalize",
             "--device_cache", str(opt.device_cache),
             "--checkpoints_dir", ckpt_dir,
             "--tensorboard_dir", os.path.join(opt.work, "tb")])

    modes = [("f32", []), ("bf16", ["--dtype", "bfloat16"]),
             ("int8", ["--dtype", "bfloat16", "--quantize", "int8", "--calib_clips", "4"])]
    if opt.dynamic_int8:
        modes.append(("int8_dynamic", ["--dtype", "bfloat16", "--quantize", "int8_dynamic"]))

    def probe(t_pred: int, tlist: str, tag: str) -> dict:
        results = {}
        for mode, extra in modes:
            qual = os.path.join(opt.work, f"qual_{fam}_{tag}{mode}")
            quant = os.path.join(opt.work, f"quant_{fam}_{tag}{mode}")
            print(f"predict [{fam}/{tag}{mode}] T={t_pred} on TPU...", flush=True)
            run([os.path.join(REPO, "cli", "predict.py"),
                 "--K", str(K), "--T", str(t_pred), "--F", str(F), "--c_dim", "1",
                 "--image_size", str(HW), "--batch_size", "6",
                 "--model_key", MODEL_KEY, "--name", opt.ckpt_name,
                 "--checkpoints_dir", ckpt_dir, "--snapshot_file_name", opt.snapshot,
                 "--test_video_list_path", tlist, "--qual_result_root", qual] + extra)
            run([os.path.join(REPO, "cli", "compute_quant_results.py"), qual, quant,
                 str(K), str(t_pred)])
            data = np.load(os.path.join(quant, "results.npz"))
            results[mode] = {"psnr": float(data["psnr"].mean()),
                             "ssim": float(data["ssim"].mean())}
            print(f"{tag}{mode}: PSNR {results[mode]['psnr']:.3f} dB, "
                  f"SSIM {results[mode]['ssim']:.4f}", flush=True)
        return results

    train_note = (f"checkpoint reused from {ckpt_dir}/{opt.ckpt_name}" if opt.skip_train
                  else f"{opt.iters} TPU train iters")
    out = {"config": f"TAI_gray gf=64 ks=51 nb=5 K=T=F=5 {HW}^2, "
                     f"{train_note} on synthetic {fam}"}
    legs = [("modes", T, test_list, "")]
    if not opt.skip_m10:
        # The reference's m=10 tables evaluate T=10 prediction from the
        # m=5-trained checkpoint (BASELINE.md kth m=10 rows) — same here.
        legs.append(("modes_m10", 10, test_list_m10, "m10_"))
    for key, t_pred, tlist, tag in legs:
        results = probe(t_pred, tlist, tag)
        out[key] = results
        for mode in results:
            if mode != "f32":
                out[f"{tag}{mode}_minus_f32"] = {
                    "psnr": round(results[mode]["psnr"] - results["f32"]["psnr"], 4),
                    "ssim": round(results[mode]["ssim"] - results["f32"]["ssim"], 5),
                }
    # Merge under the family key so the two families' runs share one artifact.
    out_path = os.path.join(REPO, opt.out)
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            merged = json.load(fh)
    merged[fam] = out
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
