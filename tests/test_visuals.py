"""Visualization helper tests."""

import numpy as np

from vfi_tpu.utils.visuals import draw_frame_borders, make_grid, visual_grid


def test_draw_frame_borders_colors():
    video = np.zeros((1, 4, 16, 16, 3), np.float32) + 0.5
    out = draw_frame_borders(video, K=1, T=2)
    # context frames (0 and 3): green channel maxed on border
    assert out[0, 0, 0, 5, 1] == 1.0 and out[0, 0, 0, 5, 0] == 0.0
    assert out[0, 3, 0, 5, 1] == 1.0
    # generated frames (1, 2): red channel maxed
    assert out[0, 1, 0, 5, 0] == 1.0 and out[0, 1, 0, 5, 1] == 0.0
    # interior untouched
    assert out[0, 1, 8, 8, 0] == 0.5


def test_make_grid_layout():
    imgs = np.random.RandomState(0).rand(6, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=3, pad=2)
    assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 3)
    assert grid.min() >= 0 and grid.max() <= 1


def test_visual_grid_gray_and_color():
    vis = {
        "pred": np.random.RandomState(0).uniform(-1, 1, (2, 4, 8, 8, 1)).astype(np.float32),
        "target": np.random.RandomState(1).uniform(-1, 1, (2, 4, 8, 8, 1)).astype(np.float32),
    }
    grid = visual_grid(vis, K=1, T=2)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    color = {k: np.repeat(v, 3, axis=-1) for k, v in vis.items()}
    grid2 = visual_grid(color, K=1, T=2)
    assert grid2.shape == grid.shape
