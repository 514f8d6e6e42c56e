"""Golden-value regression tests: fixed-PRNG forward statistics per family.

Guards against silent behavior changes during refactors (SURVEY.md §4 item b).
Values captured on CPU float32; tolerance covers cross-platform float noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.models.fill_in import MCNetFillInModel, TAIFillInModel, TWIFillInModel
from vfi_tpu.models.sct import SCTSkipConScaledTForwardFillInModel
from vfi_tpu.models.slomo import SloMoFillInModel

B, K, T, F, H, W = 2, 3, 2, 3, 32, 32


def _stats(model, c_dim=1, rngs=None):
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p = jax.random.uniform(k1, (B, K, H, W, c_dim), minval=-1, maxval=1)
    f = jax.random.uniform(k2, (B, F, H, W, c_dim), minval=-1, maxval=1)
    variables = model.init(jax.random.PRNGKey(7), T, p, f)
    out = model.apply(variables, T, p, f, rngs=rngs)["pred"]
    return float(jnp.mean(out)), float(jnp.std(out))


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

# Captured once; update deliberately when architecture changes are intended.
EXPECTED = {
    "tai": None,
    "twi": None,
    "mcnet": None,
    "slomo": None,
    "sct_fwd": None,
}

_GOLDEN_FILE = __file__.replace(".py", "_snapshot.npz")


@pytest.mark.parametrize("name", list(GOLDEN))
def test_forward_statistics_stable(name):
    import os

    model, rngs = GOLDEN[name]
    mean, std = _stats(model, rngs=rngs)
    assert np.isfinite(mean) and np.isfinite(std) and std > 0

    if os.path.isfile(_GOLDEN_FILE):
        snap = np.load(_GOLDEN_FILE)
        want_mean, want_std = snap[name]
        np.testing.assert_allclose(mean, want_mean, rtol=2e-3, atol=2e-4,
                                   err_msg=f"{name} forward mean drifted")
        np.testing.assert_allclose(std, want_std, rtol=2e-3, atol=2e-4,
                                   err_msg=f"{name} forward std drifted")
    else:
        # First run: record the snapshot (committed to the repo).
        data = {}
        for n, (m, r) in GOLDEN.items():
            data[n] = np.asarray(_stats(m, rngs=r))
        np.savez(_GOLDEN_FILE, **data)
