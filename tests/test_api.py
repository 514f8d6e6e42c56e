"""Serving API tests."""

import numpy as np

from vfi_tpu.api import VideoInpainter
from vfi_tpu.models.fill_in import TAIFillInModel


def test_param_free_model_rgb():
    ip = VideoInpainter.from_checkpoint("TimeWeightedPFFillInModel")
    p = np.random.RandomState(0).randint(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    f = np.random.RandomState(1).randint(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    out = ip.inpaint(p, f, T=3)
    assert out.shape == (3, 16, 16, 3) and out.dtype == np.uint8
    # closed form: middle frame 1 of 3 has weight 0.25 on following
    want = np.round(0.75 * p[-1].astype(np.float32) + 0.25 * f[0].astype(np.float32))
    assert np.abs(out[0].astype(np.float32) - want).max() <= 1.0


def test_learned_model_gray_batched():
    ip = VideoInpainter(TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4))
    rng = np.random.RandomState(0)
    p = rng.randint(0, 255, (2, 2, 32, 32, 1), dtype=np.uint8)
    f = rng.randint(0, 255, (2, 2, 32, 32, 1), dtype=np.uint8)
    out = ip.inpaint(p, f, T=2)
    assert out.shape == (2, 2, 32, 32, 1) and out.dtype == np.uint8
    # cached jitted forward reused on second call
    out2 = ip.inpaint(p, f, T=2)
    np.testing.assert_array_equal(out, out2)
