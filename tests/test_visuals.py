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


def test_pdf_canvas_geometry(tmp_path):
    """eval/figures.py: cm-precise canvas — figure size, image placement, and
    text width measurement (the fpdf-replacement invariants the comparison
    CLIs lay out with)."""
    from PIL import Image

    from vfi_tpu.eval.figures import GREEN, PdfCanvas, cm2in, in2cm, text_width_cm

    assert abs(cm2in(2.54) - 1.0) < 1e-9 and abs(in2cm(1.0) - 2.54) < 1e-9

    w1 = text_width_cm("Model", 8)
    w2 = text_width_cm("A much longer label", 8)
    w3 = text_width_cm("Model", 16)
    assert 0 < w1 < w2 and w3 > 1.5 * w1
    assert text_width_cm("", 8) == 0.0

    img = tmp_path / "f.png"
    Image.new("RGB", (20, 10), (255, 0, 0)).save(img)
    pdf = PdfCanvas(10.0, 5.0)
    assert abs(pdf.fig.get_size_inches()[0] - cm2in(10.0)) < 1e-6
    pdf.add_image(str(img), 1.0, 1.0, 4.0, 2.0, b_cm=0.1, color=GREEN)
    pdf.add_cropped_image(str(img), (0.25, 0.25, 0.75, 0.75), 6.0, 1.0, 2.0, 1.0)
    pdf.add_text("hello", 1.0, 4.0, 8)
    # image axes placed at the expected figure-fraction rect (top-left cm origin)
    ax = pdf.fig.axes[0]
    left, bottom, width, height = ax.get_position().bounds
    assert abs(left - 0.1) < 1e-6 and abs(width - 0.4) < 1e-6
    assert abs(bottom - (1 - (1.0 + 2.0) / 5.0)) < 1e-6 and abs(height - 0.4) < 1e-6
    out = tmp_path / "o.pdf"
    pdf.save(str(out))
    assert out.is_file() and out.stat().st_size > 500
