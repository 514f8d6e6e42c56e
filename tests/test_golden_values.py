"""Golden-value regression tests: fixed-PRNG FULL-TENSOR forward snapshots.

Guards against silent behavior changes during refactors (SURVEY.md §4 item b).
The committed snapshot stores the complete ``pred`` tensor per model family
(tiny shapes, a few KB each) — statistics-only checks could miss transposed
kernels or swapped blends that preserve moments.

Captured on CPU float32.  When an intentional architecture change lands,
delete tests/test_golden_values_snapshot.npz and re-run this file once to
re-record (the first run records and passes; commit the new file).
"""

import os

import jax
import numpy as np
import pytest

from vfi_tpu.models.fill_in import MCNetFillInModel, TAIFillInModel, TWIFillInModel
from vfi_tpu.models.sct import SCTSkipConScaledTForwardFillInModel
from vfi_tpu.models.slomo import SloMoFillInModel

B, K, T, F, H, W = 2, 3, 2, 3, 32, 32


def _pred(model, c_dim=1, rngs=None) -> np.ndarray:
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p = jax.random.uniform(k1, (B, K, H, W, c_dim), minval=-1, maxval=1)
    f = jax.random.uniform(k2, (B, F, H, W, c_dim), minval=-1, maxval=1)
    variables = model.init(jax.random.PRNGKey(7), T, p, f)
    return np.asarray(model.apply(variables, T, p, f, rngs=rngs)["pred"])


GOLDEN = {
    "tai": (TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4), None),
    "twi": (TWIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=4, kf_dim=4), None),
    "mcnet": (MCNetFillInModel(gf_dim=8, c_dim=1), None),
    "slomo": (SloMoFillInModel(base_dim=4, c_dim=1), None),
    "sct_fwd": (
        SCTSkipConScaledTForwardFillInModel(c_dim=1, num_blocks=1, num_heads=2, d_v=16, d_ff=32),
        {"sample": jax.random.PRNGKey(0)},
    ),
}

_GOLDEN_FILE = __file__.replace(".py", "_snapshot.npz")


@pytest.mark.parametrize("name", list(GOLDEN))
def test_forward_snapshot_stable(name):
    model, rngs = GOLDEN[name]
    out = _pred(model, rngs=rngs)
    assert np.all(np.isfinite(out)) and out.std() > 0

    if os.path.isfile(_GOLDEN_FILE) and name in np.load(_GOLDEN_FILE):
        want = np.load(_GOLDEN_FILE)[name]
        assert out.shape == want.shape, f"{name} output shape changed"
        np.testing.assert_allclose(
            out, want, rtol=1e-3, atol=1e-4,
            err_msg=f"{name} forward output drifted from the committed snapshot",
        )
    else:
        data = dict(np.load(_GOLDEN_FILE)) if os.path.isfile(_GOLDEN_FILE) else {}
        for n, (m, r) in GOLDEN.items():
            if n not in data:
                data[n] = _pred(m, rngs=r)
        np.savez_compressed(_GOLDEN_FILE, **data)
