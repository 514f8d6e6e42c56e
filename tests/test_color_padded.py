"""BASELINE config 3 shape-path: color bi-TAI (num_block=4) with padded
inference — network runs at (H+pad, W), saved frames cropped back."""

import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_color_padded_predict(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(1):
        vid = rng.randint(0, 255, (8, 32, 48, 3), dtype=np.uint8)
        path = str(tmp_path / f"clip{i}.npy")
        np.save(path, vid)
        lines.append(f"{path} 1-8")
    lst = str(tmp_path / "list.txt")
    open(lst, "w").write("\n".join(lines) + "\n")

    qual = str(tmp_path / "qual")
    model_key = (
        '{"class": "TAIFillInModel", "args": [], '
        '"kwargs": {"gf_dim": 8, "c_dim": 3, "ks": 5, "num_block": 4, "kf_dim": 4}}'
    )

    # Learned models require a snapshot (reference environments.py:57-58):
    # write an initialized one under checkpoints/<name>/model_best.ckpt.
    import jax

    from vfi_tpu.models.registry import create_model
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils import checkpoint as ckpt
    from vfi_tpu.utils.config import TrainConfig

    model = create_model(model_key)
    tenv = create_training_environment(
        model, TrainConfig(K=3, T=2, F=3, df_dim=8, Ip=1, disc_window_size=3)
    )
    targets = rng.uniform(-1, 1, (1, 8, 48, 32, 3)).astype(np.float32)
    state = tenv.init_state(jax.random.PRNGKey(0), targets, 3, 2, 3)
    ckpt_dir = str(tmp_path / "ckpt" / "exp")
    ckpt.save_snapshot(ckpt_dir, "model_best.ckpt", state,
                       {"updates": 0, "sum_avg_psnr_err": 0.0, "sum_avg_ssim_err": 0.0})

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "cli", "predict.py"),
            "--K", "3", "--T", "2", "--F", "3", "--c_dim", "3",
            "--image_size", "32", "--padding_size", "16", "0",
            "--batch_size", "1", "--model_key", model_key,
            "--test_video_list_path", lst, "--qual_result_root", qual,
            "--checkpoints_dir", str(tmp_path / "ckpt"), "--name", "exp",
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    clip_dir = os.path.join(qual, os.listdir(qual)[0])
    pred = np.array(Image.open(os.path.join(clip_dir, "pred_middle_0003.png")))
    # padding cropped: saved frames are image_size, not image_size+padding
    assert pred.shape == (32, 32, 3)
    gt = np.array(Image.open(os.path.join(clip_dir, "gt_preceding_0000.png")))
    assert gt.shape == (32, 32, 3)
