"""Legacy SCT variants (old_self_attention.py — dead in the reference registry,
kept for inventory completeness and reachable via the JSON model_key fallback)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.models.legacy_sct import SCTSkipConFillInModel, SCTSuperSkipConFillInModel
from vfi_tpu.models.registry import create_model

B, K, T, F, H, W = 1, 2, 3, 2, 16, 16
TINY = dict(c_dim=1, num_blocks=1, num_heads=2, d_v=16, d_ff=32)


def _inputs(c_dim=1):
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.uniform(-1, 1, (B, K, H, W, c_dim)), jnp.float32)
    f = jnp.asarray(rng.uniform(-1, 1, (B, F, H, W, c_dim)), jnp.float32)
    m = jnp.asarray(rng.uniform(-1, 1, (B, T, H, W, c_dim)), jnp.float32)
    return p, m, f


@pytest.mark.parametrize("cls", [SCTSkipConFillInModel, SCTSuperSkipConFillInModel])
def test_legacy_forward_and_train_contract(cls):
    p, m, f = _inputs()
    model = cls(**TINY)
    variables = model.init(jax.random.PRNGKey(0), T, p, f)
    pred = model.apply(variables, T, p, f)["pred"]
    assert pred.shape == (B, T, H, W, 1)
    assert bool(jnp.isfinite(pred).all())
    # tanh output head (old_self_attention.py:82)
    assert float(jnp.abs(pred).max()) <= 1.0

    # teacher-forced pass reuses the same parameters, different decoder inputs
    tf_pred = model.apply(variables, T, p, f, m, method=cls.forward_train)["pred"]
    assert tf_pred.shape == (B, T, H, W, 1)
    assert bool(jnp.isfinite(tf_pred).all())
    # the free-running and teacher-forced passes see different decoder inputs
    assert not np.allclose(np.asarray(pred), np.asarray(tf_pred))


def test_super_variant_uses_skip_wiring_and_zero_seed():
    p, _, f = _inputs()
    sup = SCTSuperSkipConFillInModel(**TINY)
    assert sup.enc_return_all and sup.dec_enc_attend == "skip"
    # zero start token: the seed is all-zeros regardless of the inputs
    seed = sup._seed_frames(p)
    assert seed.shape == (B, 1, H, W, 1)
    assert float(jnp.abs(seed).max()) == 0.0

    variables = sup.init(jax.random.PRNGKey(0), T, p, f)
    pred = sup.apply(variables, T, p, f)["pred"]
    assert pred.shape == (B, T, H, W, 1)


def test_legacy_reachable_via_json_model_key():
    spec = {"class": "SCTSkipConFillInModel", "args": [], "kwargs": TINY}
    model = create_model(json.dumps(spec))
    assert isinstance(model, SCTSkipConFillInModel)
