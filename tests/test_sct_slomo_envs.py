"""Training environments for the SCT (teacher forcing) and SloMo families."""

import jax
import numpy as np

from vfi_tpu.models.sct import SCTSkipConScaledTForwardFillInModel
from vfi_tpu.models.slomo import SloMoFillInModel
from vfi_tpu.train.environments import SCTEnvironment, create_training_environment
from vfi_tpu.train.slomo_env import SloMoEnvironment
from vfi_tpu.utils.config import TrainConfig

B, K, T, F, H, W = 2, 2, 2, 2, 32, 32


def _batch(c_dim=1, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, (B, K + T + F, H, W, c_dim)).astype(np.float32)


def test_sct_environment_teacher_forcing_step():
    model = SCTSkipConScaledTForwardFillInModel(c_dim=1, num_blocks=1, num_heads=2, d_v=16, d_ff=32)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3,
                      tf_p_min=1.0, tf_p_max=1.0)  # always teacher-forced
    env = create_training_environment(model, cfg)
    assert isinstance(env, SCTEnvironment)
    batch = _batch()
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    state, m = env.train_step(state, K, T, F, batch)
    assert np.isfinite(float(m["G_loss"]))
    assert np.isfinite(float(m["D_fake"]))
    # free-running branch as well
    cfg2 = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3,
                       tf_p_min=0.0, tf_p_max=0.0)
    env2 = create_training_environment(model, cfg2)
    state2 = env2.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    _, m2 = env2.train_step(state2, K, T, F, batch)
    assert np.isfinite(float(m2["G_loss"]))


def test_slomo_environment_step_and_lr_decay():
    model = SloMoFillInModel(base_dim=4, c_dim=1)
    # lambda_p = 0 must be requested explicitly to train without VGG weights
    cfg = TrainConfig(K=K, T=T, F=F, lr=1e-4, lr_decay_count=2, lr_decay_rate=0.5, lambda_p=0.0)
    env = create_training_environment(model, cfg)
    assert isinstance(env, SloMoEnvironment)
    batch = _batch()
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    losses = []
    for _ in range(3):
        state, m = env.train_step(state, K, T, F, batch)
        losses.append(float(m["G_loss"]))
    assert all(np.isfinite(l) for l in losses)
    for key in ("reconstruction_loss", "perceptual_loss", "warping_loss", "smooth_loss"):
        assert key in m
    # no VGG weights in this environment -> perceptual term must be exactly 0
    assert float(m["perceptual_loss"]) == 0.0


def test_slomo_missing_vgg_weights_is_hard_error():
    """Reference parity: environments.py:541-544 always builds the VGG16 head."""
    import pytest

    model = SloMoFillInModel(base_dim=4, c_dim=1)
    cfg = TrainConfig(K=K, T=T, F=F)  # default lambda_p = 0.005, no weights
    with pytest.raises(RuntimeError, match="vgg16_weights"):
        create_training_environment(model, cfg)


def _write_fake_vgg_npz(path):
    from vfi_tpu.nn.vgg import _CFG

    rng = np.random.RandomState(0)
    out = {}
    cin = 3
    for si, (width, layers) in enumerate(_CFG):
        for li in range(layers):
            name = f"conv{si + 1}_{li + 1}"
            out[f"{name}/kernel"] = rng.normal(0, 0.05, (3, 3, cin, width)).astype(np.float32)
            out[f"{name}/bias"] = np.zeros((width,), np.float32)
            cin = width
    np.savez(path, **out)


def test_slomo_perceptual_loss_nonzero_with_weights(tmp_path):
    npz = str(tmp_path / "vgg.npz")
    _write_fake_vgg_npz(npz)
    model = SloMoFillInModel(base_dim=4, c_dim=1)
    cfg = TrainConfig(K=K, T=T, F=F, vgg16_weights=npz)
    env = create_training_environment(model, cfg)
    batch = _batch()
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    _, m = env.train_step(state, K, T, F, batch)
    assert float(m["perceptual_loss"]) > 0.0
    assert np.isfinite(float(m["G_loss"]))


def test_vgg_unloadable_path_raises(tmp_path):
    import pytest

    from vfi_tpu.nn.vgg import try_load_vgg16

    bad = tmp_path / "nope.npz"
    bad.write_bytes(b"not an npz")
    with pytest.raises(RuntimeError, match="convert_vgg16"):
        try_load_vgg16(str(bad))
