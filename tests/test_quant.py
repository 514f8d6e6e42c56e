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


@pytest.mark.parametrize(
    "model_key",
    [
        '{"class": "MCNetFillInModel", "args": [], "kwargs": {"gf_dim": 8, "c_dim": 1}}',
        '{"class": "SloMoFillInModel", "args": [], "kwargs": {"base_dim": 8, "c_dim": 3}}',
        '{"class": "SCTSkipConScaledTForwardFillInModel", "args": [], '
        '"kwargs": {"c_dim": 3, "num_blocks": 1, "num_heads": 2, "d_v": 16}}',
    ],
)
def test_model_zoo_int8_static_smoke(model_key, monkeypatch):
    """Every conv-tower family serves through the quantized graph: init under
    VFI_INT8=2, calibrate the "quant" scales, apply, and require finite output
    + int8 compute in the jaxpr (wiring check; numerics gated by the TAI test)."""
    import json

    from vfi_tpu.models.registry import create_model

    monkeypatch.setenv("VFI_INT8", "2")
    model = create_model(model_key)
    c = json.loads(model_key)["kwargs"]["c_dim"]
    rng = np.random.RandomState(0)
    K = T = F = 2
    p = jnp.asarray(rng.uniform(-1, 1, (1, K, 32, 32, c)).astype(np.float32))
    f = jnp.asarray(rng.uniform(-1, 1, (1, F, 32, 32, c)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    v = model.init(rngs, T, p, f)
    assert "quant" in v, "static int8 must register calibration scalars"
    _, upd = model.apply(v, T, p, f, mutable=["quant"], rngs={"sample": jax.random.PRNGKey(1)})
    v = {**v, **upd}
    out = model.apply(v, T, p, f, rngs={"sample": jax.random.PRNGKey(1)})
    assert out["pred"].shape == (1, T, 32, 32, c)
    assert bool(jnp.all(jnp.isfinite(out["pred"])))
    jx = str(
        jax.make_jaxpr(
            lambda v: model.apply(v, T, p, f, rngs={"sample": jax.random.PRNGKey(1)})["pred"]
        )(v)
    )
    assert jx.count("i8") > 10


def test_predict_cli_int8_static(tmp_path):
    """--quantize int8 through the real predict CLI: calibration + serving +
    agreement with the unquantized run's PNGs (subprocesses isolate VFI_INT8)."""
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    # tiny synthetic dataset (the test_end_to_end recipe)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(2):
        path = str(tmp_path / f"clip{i}.npy")
        base = rng.randint(0, 200, (1, 32, 32, 3)).astype(np.float32)
        drift = rng.randint(-2, 3, (12, 1, 1, 3)).cumsum(0)
        np.save(path, np.clip(base + drift, 0, 255).astype(np.uint8))
        lines.append(f"{path} 1-12")
    videolist = tmp_path / "list.txt"
    videolist.write_text("\n".join(lines) + "\n")

    # a snapshot for a tiny TAI model (predict loads model_best.ckpt)
    model_key = ('{"class": "TAIFillInModel", "args": [], "kwargs": '
                 '{"gf_dim": 8, "c_dim": 1, "ks": 5, "num_block": 5, "kf_dim": 4}}')
    from vfi_tpu.models.registry import create_model
    from vfi_tpu.train.environments import TrainState
    from vfi_tpu.utils import checkpoint as ckpt

    model = create_model(model_key)
    p = jnp.zeros((1, 2, 32, 32, 1))
    v = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), 2, p, p)
    expr_dir = str(tmp_path / "ckpt" / "q")
    state = TrainState(step=jnp.zeros((), jnp.int32), g_params=v["params"], g_opt=None)
    ckpt.save_snapshot(expr_dir, "model_best.ckpt", state, {})

    def run_predict(qual, extra):
        env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
        env.pop("VFI_INT8", None)
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "cli", "predict.py"),
             "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
             "--c_dim", "1", "--batch_size", "2", "--model_key", model_key,
             "--name", "q", "--checkpoints_dir", str(tmp_path / "ckpt"),
             "--test_video_list_path", str(videolist), "--qual_result_root", qual]
            + extra,
            cwd=repo, env=env, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
        return r

    q32 = str(tmp_path / "qual32")
    q8 = str(tmp_path / "qual8")
    run_predict(q32, [])
    r = run_predict(q8, ["--quantize", "int8", "--calib_clips", "2"])
    assert "int8 activation scales calibrated on 2 clips" in r.stdout

    from PIL import Image

    for clip in os.listdir(q32):
        for name in os.listdir(os.path.join(q32, clip)):
            if not name.startswith("pred_middle_"):
                continue
            a = np.asarray(Image.open(os.path.join(q32, clip, name)), np.float32)
            b = np.asarray(Image.open(os.path.join(q8, clip, name)), np.float32)
            # int8 serving stays visually identical at this scale (uint8 PNGs)
            assert np.mean(np.abs(a - b)) < 2.0, (clip, name, np.mean(np.abs(a - b)))


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
