"""Dynamic-int8 serving mode (nn/quant.py, VFI_INT8).

Gates: (a) QConv's param pytree is byte-identical in structure to nn.Conv so
checkpoints are serving-mode-agnostic; (b) the int8 path is actually taken
(int8 tensors in the jaxpr); (c) single-layer error is bounded by the int8
quantization budget; (d) the full bi-TAI forward runs through the quantized
graph and stays close to f32.

Note on (d): with xavier-random weights the final blended pred agrees far
more tightly (~1e-4) than the pre-blend rollout frames (~1e-2) because the
untrained kernel heads are near-uniform; real quality must be validated
per-checkpoint with predict -> compute_quant_results against the f32 run
(see nn/quant.py docstring).  The gate here bounds the representative
pre-blend error.
"""

import os

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfi_tpu.nn.layers import Conv, xavier_conv
from vfi_tpu.nn.quant import QConv


@pytest.fixture
def int8_env(monkeypatch):
    monkeypatch.setenv("VFI_INT8", "1")


def test_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 8, 8, 3))
    vq = QConv(16, 5, strides=2).init(jax.random.PRNGKey(0), x)
    vr = Conv(16, 5, strides=2).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vq) == jax.tree_util.tree_structure(vr)
    assert [(a.shape, a.dtype) for a in jax.tree.leaves(vq)] == [
        (a.shape, a.dtype) for a in jax.tree.leaves(vr)
    ]


def test_single_layer_error_within_int8_budget():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32))
    q = QConv(16, 3)
    v = q.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(16, (3, 3), padding="SAME", kernel_init=xavier_conv,
                  bias_init=nn.initializers.zeros_init())
    yq, yr = q.apply(v, x), ref.apply(v, x)
    scale = float(jnp.max(jnp.abs(yr)))
    err = float(jnp.max(jnp.abs(yq - yr)))
    assert err < 0.02 * scale, (err, scale)  # measured ~0.006x at this size
    # int8 compute is actually in the graph
    assert "i8" in str(jax.make_jaxpr(lambda v, x: q.apply(v, x))(v, x))


def test_conv_helper_dispatches_on_env(int8_env):
    assert isinstance(Conv(8, 3), QConv)
    assert not Conv(8, 3).static


def test_conv_helper_dispatches_static(monkeypatch):
    monkeypatch.setenv("VFI_INT8", "2")
    m = Conv(8, 3)
    assert isinstance(m, QConv) and m.static


def test_static_calibration_records_amax_and_bounds_error():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 16, 16, 8)).astype(np.float32))
    q = QConv(16, 3, static=True)
    v = q.init(jax.random.PRNGKey(0), x)
    assert "quant" in v and v["quant"]["act_amax"].shape == ()
    # calibration pass: running amax picks up the true input amax
    _, upd = q.apply(v, x, mutable=["quant"])
    amax = float(upd["quant"]["act_amax"])
    assert abs(amax - float(jnp.max(jnp.abs(x)))) < 1e-5
    v = {**v, **upd}
    # serving: no mutation, error within the int8 budget vs the f32 conv
    ref = nn.Conv(16, (3, 3), padding="SAME", kernel_init=xavier_conv,
                  bias_init=nn.initializers.zeros_init())
    yq = q.apply(v, x)
    yr = ref.apply({"params": v["params"]}, x)
    scale = float(jnp.max(jnp.abs(yr)))
    assert float(jnp.max(jnp.abs(yq - yr))) < 0.02 * scale
    # out-of-range inputs (beyond the calibrated amax) clip, not overflow
    y2 = q.apply(v, 10.0 * x)
    assert bool(jnp.all(jnp.isfinite(y2)))


def test_tai_forward_int8_static_close_to_f32(monkeypatch):
    from vfi_tpu.models.fill_in import TAIFillInModel

    rng = np.random.RandomState(0)
    K = T = F = 3
    H = W = 32
    p = rng.uniform(-1, 1, (2, K, H, W, 1)).astype(np.float32)
    f = rng.uniform(-1, 1, (2, F, H, W, 1)).astype(np.float32)
    model = TAIFillInModel(gf_dim=8, c_dim=1, feature_size=3, ks=5, num_block=5, kf_dim=4)
    v32 = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), T, p, f)
    out32 = model.apply(v32, T, p, f)

    monkeypatch.setenv("VFI_INT8", "2")
    vq = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), T, p, f)
    # same trained params; calibrate the activation scales on one batch
    vq = {**vq, "params": v32["params"]}
    _, upd = model.apply(vq, T, p, f, mutable=["quant"])
    vq = {**vq, **upd}
    out8 = model.apply(vq, T, p, f)
    assert float(jnp.max(jnp.abs(out8["pred_forward"] - out32["pred_forward"]))) < 0.05
    assert float(jnp.max(jnp.abs(out8["pred"] - out32["pred"]))) < 0.05
    jx = str(jax.make_jaxpr(lambda v: model.apply(v, T, p, f)["pred"])(vq))
    assert jx.count("i8") > 50


def test_tai_forward_int8_close_to_f32(monkeypatch):
    from vfi_tpu.models.fill_in import TAIFillInModel

    rng = np.random.RandomState(0)
    K = T = F = 3
    H = W = 32
    p = rng.uniform(-1, 1, (2, K, H, W, 1)).astype(np.float32)
    f = rng.uniform(-1, 1, (2, F, H, W, 1)).astype(np.float32)
    model = TAIFillInModel(gf_dim=8, c_dim=1, feature_size=3, ks=5, num_block=5, kf_dim=4)
    v = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), T, p, f)
    out32 = model.apply(v, T, p, f)

    monkeypatch.setenv("VFI_INT8", "1")
    out8 = model.apply(v, T, p, f)  # same params through the quantized graph
    # pre-blend rollout frames carry the representative int8 error
    assert float(jnp.max(jnp.abs(out8["pred_forward"] - out32["pred_forward"]))) < 0.05
    assert float(jnp.max(jnp.abs(out8["pred"] - out32["pred"]))) < 0.05
    # and the quantized graph really is quantized
    jx = str(jax.make_jaxpr(lambda v: model.apply(v, T, p, f)["pred"])(v))
    assert jx.count("i8") > 50
