"""Shape/behavior golden tests per model family with fixed PRNG keys
(SURVEY.md §4 test-pyramid item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.models.fill_in import (
    BidirectionalSimpleAverageFillInModel,
    BidirectionalTimeWeightedAverageFillInModel,
    MCNetFillInModel,
    TAIFillInModel,
    TimeWeightedPFFillInModel,
    TWIFillInModel,
)

B, K, T, F, H, W = 2, 3, 2, 3, 32, 32


def _data(c_dim, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    p = jax.random.uniform(k1, (B, K, H, W, c_dim), minval=-1, maxval=1)
    f = jax.random.uniform(k2, (B, F, H, W, c_dim), minval=-1, maxval=1)
    return p, f


def test_tw_p_f_exact_values():
    """TW_P_F is closed-form: check against the reference formula
    (tw_p_f.py:25-30): w = linspace(0,1,T+2)[1:-1] weighting the following."""
    p, f = _data(1)
    model = TimeWeightedPFFillInModel()
    out = model.apply({}, T, p, f)
    w = np.linspace(0, 1, T + 2)[1:-1]
    for t in range(T):
        want = (1 - w[t]) * np.asarray(p[:, -1]) + w[t] * np.asarray(f[:, 0])
        np.testing.assert_allclose(np.asarray(out["pred"][:, t]), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cls,kwargs", [
    (TAIFillInModel, dict(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)),
    (TWIFillInModel, dict(gf_dim=8, c_dim=1, ks=5, num_block=4, kf_dim=4)),
    (BidirectionalSimpleAverageFillInModel, dict(gf_dim=8, c_dim=1)),
    (BidirectionalTimeWeightedAverageFillInModel, dict(gf_dim=8, c_dim=1)),
])
def test_bidirectional_models_output_contract(cls, kwargs):
    p, f = _data(kwargs.get("c_dim", 1))
    model = cls(**kwargs)
    variables = model.init(jax.random.PRNGKey(0), T, p, f)
    out = model.apply(variables, T, p, f)
    assert out["pred"].shape == (B, T, H, W, 1)
    assert out["pred_forward"].shape == (B, T, H, W, 1)
    assert out["pred_backward"].shape == (B, T, H, W, 1)
    assert np.all(np.isfinite(np.asarray(out["pred"])))
    # predictions are tanh/blend-bounded
    assert np.abs(np.asarray(out["pred_forward"])).max() <= 1.0 + 1e-5


def test_bi_sa_is_average_of_streams():
    p, f = _data(1)
    model = BidirectionalSimpleAverageFillInModel(gf_dim=8, c_dim=1)
    variables = model.init(jax.random.PRNGKey(0), T, p, f)
    out = model.apply(variables, T, p, f)
    want = 0.5 * np.asarray(out["pred_forward"]) + 0.5 * np.asarray(out["pred_backward"])
    np.testing.assert_allclose(np.asarray(out["pred"]), want, rtol=1e-5, atol=1e-6)


def test_doubled_batch_equals_two_rollouts():
    """K == F uses one doubled-batch rollout; K != F falls back to two calls.
    Both paths must agree on the forward stream."""
    p, f = _data(1)
    model = BidirectionalSimpleAverageFillInModel(gf_dim=8, c_dim=1)
    variables = model.init(jax.random.PRNGKey(0), T, p, f)
    out_same = model.apply(variables, T, p, f)  # K == F path
    f_longer = jnp.concatenate([f, f[:, -1:]], axis=1)  # K != F path
    out_diff = model.apply(variables, T, p, f_longer)
    np.testing.assert_allclose(
        np.asarray(out_same["pred_forward"]),
        np.asarray(out_diff["pred_forward"]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_mcnet_ignores_following_frames():
    p, f = _data(1)
    model = MCNetFillInModel(gf_dim=8, c_dim=1)
    variables = model.init(jax.random.PRNGKey(0), T, p, f)
    out1 = model.apply(variables, T, p, f)
    out2 = model.apply(variables, T, p, f * 0.0)
    np.testing.assert_array_equal(np.asarray(out1["pred"]), np.asarray(out2["pred"]))


def test_registry_keys_complete():
    from vfi_tpu.models.registry import model_keys

    expected = {
        "TAI_gray", "TAI_color", "OFFillInModel", "MCNet_gray", "MCNet_color",
        "SloMoFillInModel_color", "SloMoFillInModel_gray",
        "TimeWeightedInterpolationFillInModel_gray", "TimeWeightedInterpolationFillInModel_color",
        "BidirectionalSimpleAverageFillInModel_gray", "BidirectionalSimpleAverageFillInModel_color",
        "BidirectionalTimeWeightedAverageFillInModel_gray",
        "BidirectionalTimeWeightedAverageFillInModel_color",
        "TimeWeightedPFFillInModel",
    } | {
        f"{n}_{s}"
        for n in (
            "SCTSkipConScaledTForward", "SCTSkipConScaledTInward", "SCTSkipConScaledTRandom",
            "SCTSkipConScaledTRandomB", "SCTSkipConScaledTRandomC", "SCTSkipConScaledTRandomD",
            "SCTBypassScaledTForward", "SCTFrameEncDecBNSkipConScaledTForward",
        )
        for s in ("gray", "color")
    }
    assert set(model_keys()) == expected


def test_registry_json_literal():
    from vfi_tpu.models.registry import create_model

    m = create_model(
        '{"class": "TAIFillInModel", "args": [], '
        '"kwargs": {"gf_dim": 8, "c_dim": 1, "ks": 5, "num_block": 5}}'
    )
    assert m.gf_dim == 8 and m.ks == 5


def test_scan_rollout_matches_unrolled():
    """MCNet(scan_rollout=True) — the lax.scan formulation of rollout steps
    1..T-1 — must reproduce the unrolled rollout on identical params, for both
    the plain and the masked-warmup (dynamic-KTF) paths."""
    from vfi_tpu.nn.mcnet import MCNet

    rng = jax.random.PRNGKey(0)
    B, K, T_, H, W = 2, 4, 3, 32, 32
    diff = jax.random.normal(rng, (B, K - 1, H, W, 1))
    xt = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 1))
    unrolled = MCNet(gf_dim=8, c_dim=1)
    variables = unrolled.init(jax.random.PRNGKey(7), T_, diff, xt)
    scanned = MCNet(gf_dim=8, c_dim=1, scan_rollout=True)

    out_u = unrolled.apply(variables, T_, diff, xt)
    out_s = scanned.apply(variables, T_, diff, xt)
    for name, a, b in zip(out_u._fields, out_u, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)

    skip = jnp.asarray([1, 0])
    out_us = unrolled.apply(variables, T_, diff, xt, skip)
    out_ss = scanned.apply(variables, T_, diff, xt, skip)
    np.testing.assert_allclose(np.asarray(out_us.pred), np.asarray(out_ss.pred),
                               rtol=1e-5, atol=1e-6)


def test_remat_rollout_matches_plain():
    """MCNet(remat=True) — gradient-checkpointed rollout submodules, the
    memory lever for high-resolution training (wide-W 256x320 spills at B=4
    without it) — must be forward-identical AND gradient-identical to the
    plain rollout on the same params: nn.remat changes scheduling, not math."""
    from vfi_tpu.nn.mcnet import MCNet

    rng = jax.random.PRNGKey(0)
    B, K, T_, H, W = 2, 3, 2, 16, 16
    diff = jax.random.normal(rng, (B, K - 1, H, W, 1))
    xt = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 1))
    plain = MCNet(gf_dim=8, c_dim=1)
    variables = plain.init(jax.random.PRNGKey(7), T_, diff, xt)
    rematted = MCNet(gf_dim=8, c_dim=1, remat=True)

    def loss(model, v):
        return jnp.sum(model.apply(v, T_, diff, xt).pred ** 2)

    out_p = plain.apply(variables, T_, diff, xt)
    out_r = rematted.apply(variables, T_, diff, xt)
    for name, a, b in zip(out_p._fields, out_p, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=name)

    g_p = jax.grad(lambda v: loss(plain, v))(variables)
    g_r = jax.grad(lambda v: loss(rematted, v))(variables)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_p, g_r)


def test_max_pool2_matches_reduce_window():
    """max_pool2's block-reshape formulation (cheap gradient, no
    select_and_scatter on TPU) must be forward-identical to the windowed
    nn.max_pool on even extents, fall back on odd extents, and produce the
    same gradient on tie-free inputs."""
    import flax.linen as fnn

    from vfi_tpu.nn.layers import max_pool2

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 8, 12, 5))
    ref = fnn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool2(x)), np.asarray(ref))

    x_odd = jax.random.normal(rng, (2, 7, 9, 3))
    ref_odd = fnn.max_pool(x_odd, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool2(x_odd)), np.asarray(ref_odd))

    # gradient parity on tie-free data (float64-free: random normals collide
    # with probability ~0 in f32)
    g_new = jax.grad(lambda a: jnp.sum(max_pool2(a) ** 2))(x)
    g_ref = jax.grad(lambda a: jnp.sum(fnn.max_pool(a, (2, 2), strides=(2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-6, atol=1e-6)


def test_pad_c1_conv_matches_plain_conv():
    """PadC1Conv (VFI_PAD_C1 experiment) must be bit-identical to Conv for
    single-channel inputs, with the same param pytree."""
    from vfi_tpu.nn.layers import Conv, PadC1Conv

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 1))
    plain = Conv(12, 5, name="c")
    padded = PadC1Conv(12, 5, name="c")
    vp = plain.init(jax.random.PRNGKey(1), x)
    vq = padded.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(vp) == jax.tree.structure(vq)
    for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(plain.apply(vp, x)), np.asarray(padded.apply(vp, x))
    )
