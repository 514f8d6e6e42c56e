#!/usr/bin/env python
"""Quality probe for the int8 serving mode on a TRAINED model (CPU, no egress).

Random-weight parity numbers flatter int8 (tests/test_quant.py notes why), so
this probe trains a tiny bi-TAI on synthetic clips through the real CLI, then
runs the full predict -> compute_quant_results pipeline three ways — f32,
bf16, int8-static — and prints the PSNR/SSIM each achieves against ground
truth.  The question a deployer asks is not "does int8 match f32 bitwise" but
"how much measured quality does int8 cost on a trained checkpoint"; this is
the strongest offline stand-in for the per-checkpoint validation the docs
prescribe (docs/PERFORMANCE.md section 1).

Run: python scripts/int8_quality_probe.py [--iters 150] [--work DIR]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

MODEL_KEY = ('{"class": "TAIFillInModel", "args": [], "kwargs": '
             '{"gf_dim": 8, "c_dim": 1, "ks": 5, "num_block": 5, "kf_dim": 4}}')


def make_dataset(root: str, n_clips: int, n_frames: int = 16, hw: int = 32) -> str:
    """Moving-gradient clips: structured enough that training reduces loss."""
    rng = np.random.RandomState(3)
    os.makedirs(root, exist_ok=True)
    lines = []
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    for i in range(n_clips):
        vx, vy = rng.uniform(-2, 2, 2)
        phase = rng.uniform(0, 2 * np.pi)
        frames = []
        for t in range(n_frames):
            img = 127.5 + 80 * np.sin(2 * np.pi * (xx + vx * t) / hw + phase) * np.cos(
                2 * np.pi * (yy + vy * t) / hw
            )
            frames.append(img)
        vid = np.clip(np.stack(frames), 0, 255).astype(np.uint8)[..., None]
        vid = np.repeat(vid, 3, axis=-1)
        path = os.path.join(root, f"clip{i}.npy")
        np.save(path, vid)
        lines.append(f"{path} 1-{n_frames}")
    list_path = os.path.join(root, "list.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return list_path


def run(args, **kw):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    env.pop("VFI_INT8", None)
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=7200, **kw)
    if r.returncode != 0:
        sys.exit(f"FAILED: {args}\nstdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--work", type=str, default="/tmp/int8_probe")
    opt = ap.parse_args()

    train_list = make_dataset(os.path.join(opt.work, "train"), 16)
    test_list = make_dataset(os.path.join(opt.work, "test"), 6)
    ckpt_dir = os.path.join(opt.work, "ckpt")

    print(f"training tiny bi-TAI for {opt.iters} iters (CPU)...", flush=True)
    run([os.path.join(REPO, "cli", "train.py"), "--name", "probe",
         "--model_key", MODEL_KEY,
         "--K", "2", "--T", "2", "--F", "2", "--alt_K", "3", "--alt_T", "3", "--alt_F", "3",
         "--c_dim", "1", "--image_size", "32",
         "--batch_size", "4", "--train_video_list_path", train_list,
         "--val_video_list_path", test_list, "--max_iter", str(opt.iters),
         "--print_freq", "50", "--save_latest_freq", str(opt.iters),
         "--validate_freq", str(opt.iters), "--df_dim", "8", "--Ip", "1",
         "--checkpoints_dir", ckpt_dir, "--tensorboard_dir", os.path.join(opt.work, "tb")])

    results = {}
    for mode, extra in (
        ("f32", []),
        ("bf16", ["--dtype", "bfloat16"]),
        ("int8", ["--quantize", "int8", "--calib_clips", "4"]),
    ):
        qual = os.path.join(opt.work, f"qual_{mode}")
        quant = os.path.join(opt.work, f"quant_{mode}")
        run([os.path.join(REPO, "cli", "predict.py"),
             "--K", "2", "--T", "2", "--F", "2", "--c_dim", "1", "--image_size", "32",
             "--batch_size", "2", "--model_key", MODEL_KEY, "--name", "probe",
             "--checkpoints_dir", ckpt_dir, "--snapshot_file_name", "model_latest.ckpt",
             "--test_video_list_path", test_list, "--qual_result_root", qual] + extra)
        run([os.path.join(REPO, "cli", "compute_quant_results.py"), qual, quant, "2", "2"])
        data = np.load(os.path.join(quant, "results.npz"))
        results[mode] = {"psnr": float(data["psnr"].mean()), "ssim": float(data["ssim"].mean())}
        print(f"{mode}: PSNR {results[mode]['psnr']:.3f} dB, SSIM {results[mode]['ssim']:.4f}",
              flush=True)

    d_psnr = results["int8"]["psnr"] - results["f32"]["psnr"]
    d_ssim = results["int8"]["ssim"] - results["f32"]["ssim"]
    print(json.dumps({**results, "int8_minus_f32": {"psnr": round(d_psnr, 4),
                                                    "ssim": round(d_ssim, 5)}}))


if __name__ == "__main__":
    main()
