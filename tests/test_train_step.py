"""End-to-end training-step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.models.fill_in import MCNetFillInModel, TAIFillInModel
from vfi_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from vfi_tpu.train.environments import create_training_environment
from vfi_tpu.utils.config import TrainConfig

B, K, T, F, H, W = 8, 2, 2, 2, 32, 32


def _batch(c_dim, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, (B, K + T + F, H, W, c_dim)).astype(np.float32)


@pytest.fixture(scope="module")
def tai_env():
    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3)
    return create_training_environment(model, cfg)


def test_tai_train_step_decreases_loss(tai_env):
    env = tai_env
    batch = _batch(1)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    state, m0 = env.train_step(state, K, T, F, batch)
    for _ in range(3):
        state, m = env.train_step(state, K, T, F, batch)
    assert np.isfinite(float(m["G_loss"]))
    assert float(m["G_Lp"]) < float(m0["G_Lp"])  # overfits a fixed batch
    for key in ("G_Lp_forward", "G_gdl_backward", "D_real", "D_fake", "G_GAN"):
        assert key in m
    assert int(state.step) == 4


def test_eval_metrics_shapes(tai_env):
    env = tai_env
    batch = _batch(1)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    m = env.eval_metrics(state.g_params, K, T, F, jnp.asarray(batch))
    assert m["psnr"].shape == (B, T)
    assert m["ssim"].shape == (B, T)
    assert np.all(np.asarray(m["ssim"]) <= 1.0)


def test_train_step_sharded_over_mesh(tai_env):
    env = tai_env
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = _batch(1)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    state = replicate_state(mesh, state)
    sharded = shard_batch(mesh, {"targets": batch})["targets"]
    new_state, m = env.train_step(state, K, T, F, sharded)
    assert np.isfinite(float(m["G_loss"]))
    # params remain replicated after the sharded step
    leaf = jax.tree.leaves(new_state.g_params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


def test_sharded_inference_matches_unsharded(tai_env):
    """cli/predict.py's multi-chip path (batch device_put onto the data axis,
    same jitted forward) must produce the single-device numbers exactly."""
    from vfi_tpu.parallel.mesh import batch_sharding

    env = tai_env
    batch = _batch(1, seed=3)
    state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
    p = jnp.asarray(batch[:, :K])
    f = jnp.asarray(batch[:, -F:])
    want = np.asarray(env.forward_test(state.g_params, T, p, f)["pred"])

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    got = np.asarray(
        env.forward_test(
            state.g_params, T, jax.device_put(p, sh), jax.device_put(f, sh)
        )["pred"]
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mcnet_env_and_ktf_sampling():
    model = MCNetFillInModel(gf_dim=8, c_dim=1)
    cfg = TrainConfig(K=3, T=2, F=2, df_dim=8, Ip=1, disc_window_size=3)
    env = create_training_environment(model, cfg)
    rng = np.random.RandomState(0)
    for _ in range(20):
        k, t, f = env.sample_ktf(rng, True)
        assert 2 <= k <= 3 and 1 <= t <= 2 and 1 <= f <= 2
    assert env.sample_ktf(rng, False) == (3, 2, 2)


def test_mixed_precision_training_matches_f32_closely():
    """--train_dtype bfloat16: f32 master params, bf16 compute; losses and
    gradients must track the f32 path closely."""
    batch = _batch(1)
    metrics = {}
    for dt in ("float32", "bfloat16"):
        model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
        cfg = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3, train_dtype=dt)
        env = create_training_environment(model, cfg)
        state = env.init_state(jax.random.PRNGKey(0), batch, K, T, F)
        state, m = env.train_step(state, K, T, F, batch)
        assert jax.tree.leaves(state.g_params)[0].dtype == jnp.float32
        metrics[dt] = {k: float(v) for k, v in m.items()}
    for key in ("G_loss", "G_Lp", "D_fake", "D_real"):
        a, b = metrics["float32"][key], metrics["bfloat16"][key]
        assert abs(a - b) < 0.02 * max(abs(a), 1e-3), (key, a, b)
