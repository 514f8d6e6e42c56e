"""Dynamic (K, T, F) path: one compiled step must reproduce the static step.

SURVEY.md §7 hard part 3: variable K/T/F without recompile storms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.models.fill_in import TAIFillInModel, TimeWeightedPFFillInModel
from vfi_tpu.ops.dynamic import (
    compact_video,
    dynamic_time_weights,
    dynamic_window_labels,
    pack_context,
)
from vfi_tpu.train.dynamic_env import DynamicTAIEnvironment
from vfi_tpu.train.environments import create_training_environment
from vfi_tpu.utils.config import TrainConfig

MAX_K = MAX_T = MAX_F = 3
B, H, W = 2, 32, 32


def _targets(seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, (B, MAX_K + MAX_T + MAX_F, H, W, 1)).astype(np.float32)


def test_pack_context_matches_prefix_slicing():
    t = jnp.asarray(_targets())
    K, T, F = 2, 1, 3
    p, m, f = pack_context(t, jnp.int32(K), jnp.int32(T), jnp.int32(F), MAX_K, MAX_T, MAX_F)
    # right-aligned preceding: last K entries are targets[:, :K]
    np.testing.assert_array_equal(np.asarray(p[:, MAX_K - K :]), np.asarray(t[:, :K]))
    np.testing.assert_array_equal(np.asarray(m[:, :T]), np.asarray(t[:, K : K + T]))
    np.testing.assert_array_equal(np.asarray(f[:, :F]), np.asarray(t[:, K + T : K + T + F]))


def test_dynamic_weights_and_labels():
    w = np.asarray(dynamic_time_weights(jnp.int32(2), MAX_T))
    np.testing.assert_allclose(w[:2], np.linspace(0, 1, 4)[1:-1], rtol=1e-6)
    assert w[2] == 0.0

    labels, valid = dynamic_window_labels(jnp.int32(2), jnp.int32(2), jnp.int32(2), 9, 2)
    labels, valid = np.asarray(labels), np.asarray(valid)
    # real length 6 -> 5 valid windows of size 2; first fully in P, last fully in F
    np.testing.assert_array_equal(valid, [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(labels[:5], [1, 0, 0, 0, 1])


def test_compact_video_orders_real_frames():
    t = jnp.asarray(_targets())
    K, T, F = 2, 2, 1
    p, m, f = pack_context(t, jnp.int32(K), jnp.int32(T), jnp.int32(F), MAX_K, MAX_T, MAX_F)
    video = compact_video(p, m, f, jnp.int32(K), jnp.int32(T), jnp.int32(F))
    np.testing.assert_array_equal(np.asarray(video[:, : K + T + F]), np.asarray(t[:, : K + T + F]))


@pytest.mark.parametrize("K,T,F", [(2, 2, 2), (3, 1, 2)])
def test_tw_p_f_dynamic_matches_static(K, T, F):
    t = jnp.asarray(_targets())
    p, m, f = pack_context(t, jnp.int32(K), jnp.int32(T), jnp.int32(F), MAX_K, MAX_T, MAX_F)
    model = TimeWeightedPFFillInModel()
    dyn = model.apply({}, MAX_T, p, f, lengths=(jnp.int32(K), jnp.int32(T), jnp.int32(F)))
    static = model.apply({}, T, t[:, :K], t[:, K + T : K + T + F])
    np.testing.assert_allclose(
        np.asarray(dyn["pred"][:, :T]), np.asarray(static["pred"]), rtol=1e-5, atol=1e-6
    )


def test_tai_dynamic_forward_matches_static():
    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    t = jnp.asarray(_targets())
    K, T, F = 2, 2, 2
    variables = model.init(jax.random.PRNGKey(0), MAX_T, t[:, :MAX_K], t[:, -MAX_F:])

    static = model.apply(variables, T, t[:, :K], t[:, K + T : K + T + F])
    p, m, f = pack_context(t, jnp.int32(K), jnp.int32(T), jnp.int32(F), MAX_K, MAX_T, MAX_F)
    dyn = model.apply(variables, MAX_T, p, f, lengths=(jnp.int32(K), jnp.int32(T), jnp.int32(F)))

    for key in ("pred", "pred_forward", "pred_backward"):
        np.testing.assert_allclose(
            np.asarray(dyn[key][:, :T]), np.asarray(static[key]), rtol=2e-4, atol=2e-5,
            err_msg=key,
        )


def test_dynamic_train_step_matches_static_losses():
    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    cfg = TrainConfig(K=MAX_K, T=MAX_T, F=MAX_F, df_dim=8, Ip=1, disc_window_size=2)
    env_dyn = DynamicTAIEnvironment(model, cfg)
    env_static = create_training_environment(model, cfg)

    targets = _targets()
    K, T, F = 2, 2, 2
    state_d = env_dyn.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)
    state_s = env_static.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)

    _, m_dyn = env_dyn.train_step_dynamic(state_d, jnp.asarray(targets), jnp.asarray([K, T, F]))
    _, m_static = env_static.train_step(state_s, K, T, F, targets[:, : K + T + F])

    for key in ("G_Lp", "G_gdl", "G_GAN", "G_Lp_forward", "G_gdl_backward", "D_fake", "D_real"):
        np.testing.assert_allclose(
            float(m_dyn[key]), float(m_static[key]), rtol=2e-4, atol=1e-5, err_msg=key
        )

    # a second call with different lengths must NOT recompile (assert cache
    # growth, not absolute size — the jit cache is class-level and shared)
    g_before = env_dyn._g_update_dyn._cache_size()
    d_before = env_dyn._d_update_dyn._cache_size()
    _, m2 = env_dyn.train_step_dynamic(
        env_dyn.init_state(jax.random.PRNGKey(1), targets, MAX_K, MAX_T, MAX_F),
        jnp.asarray(targets),
        jnp.asarray([3, 1, 2]),
    )
    assert np.isfinite(float(m2["G_loss"]))
    assert env_dyn._g_update_dyn._cache_size() == g_before
    assert env_dyn._d_update_dyn._cache_size() == d_before


@pytest.mark.parametrize("tf_p", [1.0, 0.0])
def test_dynamic_sct_matches_static_losses(tf_p):
    """SCT Forward with the teacher-forcing schedule: dynamic == static at the
    same sampled lengths, in both the forced (tf_p=1) and free-running
    (tf_p=0) branches; one compiled program for all length combinations."""
    from vfi_tpu.models.sct import SCTSkipConScaledTForwardFillInModel
    from vfi_tpu.train.dynamic_env import DynamicSCTEnvironment, create_dynamic_environment

    model = SCTSkipConScaledTForwardFillInModel(c_dim=1, num_blocks=1, num_heads=2, d_v=16, d_ff=32)
    cfg = TrainConfig(K=MAX_K, T=MAX_T, F=MAX_F, df_dim=8, Ip=1, disc_window_size=2,
                      tf_p_min=tf_p, tf_p_max=tf_p)
    env_dyn = create_dynamic_environment(model, cfg)
    assert isinstance(env_dyn, DynamicSCTEnvironment)
    env_static = create_training_environment(model, cfg)

    targets = _targets()
    K, T, F = 2, 2, 2
    state_d = env_dyn.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)
    state_s = env_static.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)

    _, m_dyn = env_dyn.train_step_dynamic(state_d, jnp.asarray(targets), jnp.asarray([K, T, F]))
    _, m_static = env_static.train_step(state_s, K, T, F, targets[:, : K + T + F])

    for key in ("G_Lp", "G_gdl", "G_GAN", "D_fake", "D_real", "G_loss"):
        np.testing.assert_allclose(
            float(m_dyn[key]), float(m_static[key]), rtol=2e-4, atol=1e-5, err_msg=key
        )

    # different lengths, same program (no recompilation; the jit cache is
    # class-level and shared across envs, so assert growth, not absolute size)
    g_before = env_dyn._g_update_dyn._cache_size()
    d_before = env_dyn._d_update_dyn._cache_size()
    _, m2 = env_dyn.train_step_dynamic(
        env_dyn.init_state(jax.random.PRNGKey(1), targets, MAX_K, MAX_T, MAX_F),
        jnp.asarray(targets),
        jnp.asarray([3, 1, 2]),
    )
    assert np.isfinite(float(m2["G_loss"]))
    assert env_dyn._g_update_dyn._cache_size() == g_before
    assert env_dyn._d_update_dyn._cache_size() == d_before


def test_dynamic_slomo_matches_static_losses():
    from vfi_tpu.models.slomo import SloMoFillInModel
    from vfi_tpu.train.dynamic_env import create_dynamic_environment

    model = SloMoFillInModel(base_dim=4, c_dim=1)
    cfg = TrainConfig(K=MAX_K, T=MAX_T, F=MAX_F, lr=1e-4, lambda_p=0.0)
    env_dyn = create_dynamic_environment(model, cfg)
    env_static = create_training_environment(model, cfg)

    targets = _targets()
    K, T, F = 2, 2, 2
    state_d = env_dyn.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)
    state_s = env_static.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)

    _, m_dyn = env_dyn.train_step_dynamic(state_d, jnp.asarray(targets), jnp.asarray([K, T, F]))
    _, m_static = env_static.train_step(state_s, K, T, F, targets[:, : K + T + F])
    for key in ("reconstruction_loss", "warping_loss", "smooth_loss", "G_loss"):
        np.testing.assert_allclose(
            float(m_dyn[key]), float(m_static[key]), rtol=2e-4, atol=1e-5, err_msg=key
        )


def test_dynamic_step_mixed_precision_close_to_f32():
    """--train_dtype bfloat16 on the DYNAMIC path: f32 master params, bf16
    compute; losses stay close to the f32 run (the cast was silently skipped
    before round 2)."""
    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    targets = _targets()
    K, T, F = 2, 2, 2
    metrics = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainConfig(K=MAX_K, T=MAX_T, F=MAX_F, df_dim=8, Ip=1,
                          disc_window_size=2, train_dtype=dt)
        env = DynamicTAIEnvironment(model, cfg)
        state = env.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)
        _, m = env.train_step_dynamic(state, jnp.asarray(targets), jnp.asarray([K, T, F]))
        metrics[dt] = m
        # master params must stay f32 regardless of compute dtype
        assert jax.tree.leaves(state.g_params)[0].dtype == jnp.float32
    for key in ("G_Lp", "G_gdl", "G_GAN", "D_fake", "D_real"):
        a = float(metrics["float32"][key])
        b = float(metrics["bfloat16"][key])
        assert abs(a - b) < 0.05 * max(1.0, abs(a)), (key, a, b)


def test_dynamic_sct_inward_matches_static():
    """Inward's ends-inward generation order is deterministic, so the dynamic
    path must reproduce the static forward at the same lengths."""
    from vfi_tpu.models.sct import SCTSkipConScaledTInwardFillInModel

    model = SCTSkipConScaledTInwardFillInModel(c_dim=1, num_blocks=1, num_heads=2, d_v=16, d_ff=32)
    t = jnp.asarray(_targets())
    K, T, F = 2, 3, 2
    variables = model.init(jax.random.PRNGKey(0), MAX_T, t[:, :MAX_K], t[:, -MAX_F:])

    static = model.apply(variables, T, t[:, :K], t[:, K + T : K + T + F])
    p, m, f = pack_context(t, jnp.int32(K), jnp.int32(T), jnp.int32(F), MAX_K, MAX_T, MAX_F)
    dyn = model.apply(variables, MAX_T, p, f,
                      lengths=(jnp.int32(K), jnp.int32(T), jnp.int32(F)))
    np.testing.assert_allclose(
        np.asarray(dyn["pred"][:, :T]), np.asarray(static["pred"]), rtol=2e-4, atol=2e-5
    )


def test_dynamic_sct_random_variants_finite_and_trainable():
    """Random/RandomB sample their generation order, so dynamic == static is
    not meaningful; assert the dynamic env trains them (finite losses, one
    compiled program for different lengths)."""
    from vfi_tpu.models.sct import (
        SCTSkipConScaledTRandomBFillInModel,
        SCTSkipConScaledTRandomFillInModel,
    )
    from vfi_tpu.train.dynamic_env import DynamicSCTEnvironment, create_dynamic_environment

    targets = _targets()
    for cls in (SCTSkipConScaledTRandomFillInModel, SCTSkipConScaledTRandomBFillInModel):
        model = cls(c_dim=1, num_blocks=1, num_heads=2, d_v=16, d_ff=32)
        cfg = TrainConfig(K=MAX_K, T=MAX_T, F=MAX_F, df_dim=8, Ip=1, disc_window_size=2)
        env = create_dynamic_environment(model, cfg)
        assert isinstance(env, DynamicSCTEnvironment)
        state = env.init_state(jax.random.PRNGKey(0), targets, MAX_K, MAX_T, MAX_F)
        _, m1 = env.train_step_dynamic(state, jnp.asarray(targets), jnp.asarray([2, 2, 2]))
        assert np.isfinite(float(m1["G_loss"])), cls.__name__
        g_before = env._g_update_dyn._cache_size()
        _, m2 = env.train_step_dynamic(
            env.init_state(jax.random.PRNGKey(1), targets, MAX_K, MAX_T, MAX_F),
            jnp.asarray(targets), jnp.asarray([3, 1, 2]))
        assert np.isfinite(float(m2["G_loss"])), cls.__name__
        assert env._g_update_dyn._cache_size() == g_before
