"""TensorBoard / qualitative visualization helpers.

Reference: src/util/util.py:49-155 (frame-border annotator, metric plots,
image grids).  NHWC numpy throughout; no torchvision dependency — the grid
compositor is a small numpy routine.
"""

from __future__ import annotations

import io
from typing import Dict

import numpy as np

from ..ops.image import inverse_transform


def draw_frame_borders(video: np.ndarray, K: int, T: int) -> np.ndarray:
    """Draw green borders on context frames and red on generated frames.

    :param video: [B, Ttot, H, W, 3] floats in [0, 1] (RGB)
    """
    v = video.copy()
    v[:, :, :2, :, :] = 0
    v[:, :, -2:, :, :] = 0
    v[:, :, :, :2, :] = 0
    v[:, :, :, -2:, :] = 0

    def _edges(sel, channel):
        v[:, sel, :2, :, channel] = 1
        v[:, sel, -2:, :, channel] = 1
        v[:, sel, :, :2, channel] = 1
        v[:, sel, :, -2:, channel] = 1

    ctx = list(range(K)) + list(range(K + T, v.shape[1]))
    _edges(ctx, 1)  # green
    _edges(list(range(K, K + T)), 0)  # red
    return v


def make_grid(images: np.ndarray, nrow: int, pad: int = 2) -> np.ndarray:
    """[N, H, W, 3] -> one [GH, GW, 3] grid image (values clipped to [0,1])."""
    N, H, W, C = images.shape
    ncol = nrow
    nr = (N + ncol - 1) // ncol
    grid = np.zeros((nr * (H + pad) + pad, ncol * (W + pad) + pad, C), images.dtype)
    for i in range(N):
        r, c = divmod(i, ncol)
        y, x = pad + r * (H + pad), pad + c * (W + pad)
        grid[y : y + H, x : x + W] = images[i]
    return np.clip(grid, 0.0, 1.0)


def visual_grid(visuals: Dict[str, np.ndarray], K: int, T: int) -> np.ndarray:
    """Stack annotated sequences from a dict of [B, Ttot, H, W, C] videos in
    [-1, 1] (BGR) into one grid image with seq_len frames per row
    (reference util.py:117-155)."""
    seqs = []
    seq_len = None
    for _, vis in visuals.items():
        vis = np.asarray(inverse_transform(vis))
        if vis.shape[-1] == 1:
            vis = np.repeat(vis, 3, axis=-1)
        else:
            vis = vis[..., ::-1]  # BGR -> RGB
        seqs.append(draw_frame_borders(vis, K, T))
        seq_len = vis.shape[1]
    grouped = np.stack(seqs, axis=1)  # [B, nvis, Ttot, H, W, 3]
    flat = grouped.reshape(-1, *grouped.shape[3:])
    return make_grid(flat, nrow=seq_len)


def draw_err_plot(err: np.ndarray, err_name: str, lims=None, path: str | None = None):
    """Average PSNR/SSIM-vs-timestep plot (reference util.py:78-103).

    :param err: [N, T] per-video, per-timestep metric values
    :return: an RGB uint8 image array if path is None, else writes a file.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    avg = err.mean(axis=0)
    Tn = err.shape[1]
    fig, ax = plt.subplots()
    x = np.arange(1, Tn + 1)
    ax.plot(x, avg, marker="d")
    ax.set_xlabel("time steps")
    ax.set_ylabel(err_name)
    ax.grid(True)
    ax.set_xticks(x)
    if lims is not None:
        ax.axis(lims)
    if path is not None:
        fig.savefig(path)
        plt.close(fig)
        return None
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    buf.seek(0)
    from PIL import Image

    return np.array(Image.open(buf).convert("RGB"))
