#!/usr/bin/env python
"""PARITY_E2E: end-to-end METRIC-PIPELINE parity vs an independent torch path.

PARITY_r03 proves forward parity (max-abs-err ~1e-7 at full paper size).  This
closes the remaining distance to the reference's acceptance check
(README.md:196-221: regenerate quant tables to +-0.1 dB / +-0.005 SSIM): it
runs the COMPLETE production path of this framework —

    torch snapshot -> cli/import_torch_checkpoint.py -> cli/predict.py
    (PNG dump, uint8 quantization) -> eval.quant.compute_quant_results
    (batched on-device PSNR/SSIM) -> results.npz

— and compares every per-frame PSNR/SSIM value against a fully INDEPENDENT
pipeline: the modern-torch mirror forward (tests/torch_mirror.py) + the
reference's PNG quantization semantics (predict.py:103-120) + numpy/scipy
reimplementations of skimage's compare_psnr / compare_ssim
(compute_quant_results.py:48-50 semantics: uniform 7x7 filter, sample
covariance correction, data_range=255, valid-crop mean).

Model: TAI_gray at FULL paper size (gf=64, ks=51, num_block=5, K=T=F=5,
128x128 gray — exp_args/default_args/KTH/train.txt).  Data: synthetic uint8
clips through the framework's own loader on both sides, so the two pipelines
share bytes-in and are independent everywhere after that.

Gates (the reference's own tolerance): |dPSNR| <= 0.1 dB, |dSSIM| <= 0.005
per frame.  Writes PARITY_E2E.md.  Usage: python scripts/parity_e2e_metrics.py
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
from scipy.ndimage import uniform_filter

torch.set_num_threads(1)

K = T = F = 5
H = W = 128
N_CLIPS = 4
GF, KS, NB, KF, LAYERS = 64, 51, 5, 32, 3


# --- independent skimage-semantics metrics (numpy/scipy) ---------------------

def compare_psnr(pred_u8: np.ndarray, gt_u8: np.ndarray) -> float:
    """skimage.measure.compare_psnr on uint8: data_range=255."""
    mse = np.mean((pred_u8.astype(np.float64) - gt_u8.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


def compare_ssim(gt_u8: np.ndarray, pred_u8: np.ndarray) -> float:
    """skimage compare_ssim defaults for 2-D uint8 input: win_size=7, no
    gaussian weights, sample-covariance normalization N/(N-1), mean over the
    valid (pad-cropped) region, data_range=255."""
    x = gt_u8.astype(np.float64)
    y = pred_u8.astype(np.float64)
    win = 7
    NP = win * win
    cov_norm = NP / (NP - 1.0)
    f = lambda a: uniform_filter(a, size=win)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


def main():
    work = tempfile.mkdtemp(prefix="parity_e2e_")
    rng = np.random.RandomState(42)

    # 1. synthetic uint8 clips (smooth drift so PSNR is in a realistic range)
    for i in range(N_CLIPS):
        base = rng.randint(30, 220, (1, H, W, 3)).astype(np.float32)
        drift = rng.randint(-3, 4, (K + T + F, 1, 1, 3)).cumsum(0)
        wave = 12 * np.sin(np.linspace(0, 3, K + T + F))[:, None, None, None]
        clip = np.clip(base + drift + wave, 0, 255).astype(np.uint8)
        np.save(os.path.join(work, f"clip{i}.npy"), clip)
    vlist = os.path.join(work, "list.txt")
    with open(vlist, "w") as fh:
        fh.write("\n".join(f"{work}/clip{i}.npy 1-{K+T+F}" for i in range(N_CLIPS)))

    # 2. full-size torch mirror -> reference-style snapshot file
    torch.manual_seed(1234)
    from tests import torch_mirror

    tm = torch_mirror.TAIFillInModel(GF, 1, 3, KS, num_block=NB, kf_dim=KF, layers=LAYERS)
    tm.eval()
    snap_pt = os.path.join(work, "reference_snapshot.pt")
    torch.save({"updates": 0, "sum_avg_psnr_err": 0.0, "sum_avg_ssim_err": 0.0,
                "generator": tm.state_dict()}, snap_pt)

    # 3. import through the production CLI
    ckpt_dir = os.path.join(work, "ckpt", "e2e")
    from cli import import_torch_checkpoint

    import_torch_checkpoint.main([snap_pt, "--model_key", "TAI_gray",
                                  "--dest_dir", ckpt_dir,
                                  "--snapshot_file_name", "model_best.ckpt"])

    # 4. predict through the production CLI (PNG dump)
    qual = os.path.join(work, "qual")
    from cli import predict

    predict.main(["--name", "e2e", "--checkpoints_dir", os.path.join(work, "ckpt"),
                  "--snapshot_file_name", "model_best.ckpt",
                  "--model_key", "TAI_gray", "--K", str(K), "--T", str(T),
                  "--F", str(F), "--c_dim", "1", "--image_size", str(H),
                  "--batch_size", str(N_CLIPS),
                  "--test_video_list_path", vlist, "--qual_result_root", qual])

    # 5. batched on-device metrics through the production pipeline
    from vfi_tpu.eval.quant import compute_quant_results

    quant = os.path.join(work, "quant")
    compute_quant_results(qual, quant, K, T)
    res = np.load(os.path.join(quant, "results.npz"), allow_pickle=True)
    psnr_jax, ssim_jax = res["psnr"], res["ssim"]
    order = [os.path.basename(str(v)) for v in res["video"]]

    # 6. independent torch pipeline on the same loader bytes
    from vfi_tpu.data.datasets import ContiguousVideoClipDataset, batch_iterator

    ds = ContiguousVideoClipDataset(1, vlist, K + T + F, False, False, (H, W),
                                    resample_on_fail=False)
    batch = next(batch_iterator(ds, N_CLIPS, False, False))
    targets = batch["targets"]  # [N, K+T+F, H, W, 1] float BGR-gray in [-1,1]
    labels = [os.path.basename(l) for l in batch["clip_label"]]
    p = torch.tensor(targets[:, :K].transpose(0, 1, 4, 2, 3))
    f = torch.tensor(targets[:, -F:].transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        pred_t = tm(T, p, f)["pred"].numpy().transpose(0, 1, 3, 4, 2)  # [N,T,H,W,1]

    def to_u8(x):  # reference predict.py:103-120 PNG encoding
        return np.round(np.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0).astype(np.uint8)

    gt_u8 = to_u8(targets[:, K : K + T])[..., 0]
    pr_u8 = to_u8(pred_t)[..., 0]
    psnr_t = np.zeros((N_CLIPS, T))
    ssim_t = np.zeros((N_CLIPS, T))
    for i in range(N_CLIPS):
        for t in range(T):
            psnr_t[i, t] = compare_psnr(pr_u8[i, t], gt_u8[i, t])
            ssim_t[i, t] = compare_ssim(gt_u8[i, t], pr_u8[i, t])

    # align row order (results.npz rows follow folder BFS order)
    perm = [labels.index(name) for name in order]
    psnr_t, ssim_t = psnr_t[perm], ssim_t[perm]

    dpsnr = np.abs(psnr_jax - psnr_t)
    dssim = np.abs(ssim_jax - ssim_t)
    ok = dpsnr.max() <= 0.1 and dssim.max() <= 0.005

    lines = [
        "# PARITY_E2E — end-to-end metric-pipeline parity (offline acceptance check)",
        "",
        "Full production path (torch snapshot -> import CLI -> predict CLI PNG dump ->",
        "batched on-device PSNR/SSIM -> results.npz) vs an independent pipeline",
        "(torch-mirror forward + numpy/scipy skimage-semantics metrics) on the same",
        "loader bytes.  Model: TAI_gray FULL paper size (gf=64 ks=51 nb=5), K=T=F=5,",
        f"{N_CLIPS} synthetic 128^2 clips.  Gates = the reference acceptance tolerance",
        "(README.md:196-221): |dPSNR| <= 0.1 dB, |dSSIM| <= 0.005 per middle frame.",
        "Generated by `python scripts/parity_e2e_metrics.py`.",
        "",
        "| quantity | framework (mean) | torch+numpy (mean) | max abs frame delta |",
        "|---|---|---|---|",
        f"| PSNR (dB) | {psnr_jax.mean():.4f} | {psnr_t.mean():.4f} | {dpsnr.max():.2e} |",
        f"| SSIM | {ssim_jax.mean():.5f} | {ssim_t.mean():.5f} | {dssim.max():.2e} |",
        "",
        f"**{'PASS' if ok else 'FAIL'}** ({N_CLIPS * T} middle frames compared)",
        "",
    ]
    with open(os.path.join(REPO, "PARITY_E2E.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
