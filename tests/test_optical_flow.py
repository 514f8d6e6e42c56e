"""Classical optical-flow baseline unit tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vfi_tpu.models.optical_flow import OFFillInModel, interpolate_frames, invert_flow


def test_invert_zero_flow_is_identity_interior():
    """Interior pixels invert to zero; borders IDW-interpolate (a reference
    quirk: the exact-match branch requires the *farthest* of the k nearest
    splats to sit at distance 0, optical_flow_utils.py:56-63)."""
    flow = np.zeros((12, 10, 2), np.float32)
    inv, matched = invert_flow(flow)
    np.testing.assert_allclose(inv[1:-1, 1:-1], 0.0, atol=1e-5)
    assert matched.all()


def test_invert_constant_shift():
    # every pixel maps 2 right -> inverse maps 2 left (interior)
    flow = np.zeros((16, 16, 2), np.float32)
    flow[..., 0] = 2.0
    inv, matched = invert_flow(flow)
    interior = inv[4:-4, 4:-4, 0]
    np.testing.assert_allclose(interior, -2.0, atol=1e-3)


def test_host_forward_shapes_gray_and_color():
    rng = np.random.RandomState(0)
    model = OFFillInModel()
    for C in (1, 3):
        p = rng.uniform(-1, 1, (1, 2, 48, 48, C)).astype(np.float32)
        f = rng.uniform(-1, 1, (1, 2, 48, 48, C)).astype(np.float32)
        out = model.host_forward(3, p, f)
        assert out["pred"].shape == (1, 3, 48, 48, C)
        assert -1.0 <= out["pred"].min() and out["pred"].max() <= 1.0


def test_interpolation_of_static_scene_reproduces_frame():
    img = np.random.RandomState(0).randint(0, 255, (48, 48, 3), dtype=np.uint8)
    mids = interpolate_frames(img.copy(), img.copy(), 2)
    for m in mids:
        # static scene: interpolation must reproduce the frame (small codec noise ok)
        assert np.abs(m.astype(int) - img.astype(int)).mean() < 2.0
