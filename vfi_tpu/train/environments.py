"""Training / evaluation environments as pure, jittable step functions.

The reference's environment hierarchy (src/environments/environments.py) is a
stateful OO design around torch autograd; here each environment is a thin
*static* config object whose ``train_step`` / ``eval_step`` are pure functions
``(state, batch) -> (state, metrics)`` compiled once per static (K, T, F)
shape and shardable with pjit over a data mesh.

Environment dispatch parity (environments.py:24-52):
  * TAI / TWI / bi-SA / bi-TWA  -> TAIEnvironment (L2+GDL+GAN + intermediate
    forward/backward reconstruction losses, environments.py:415-485)
  * MC-Net                      -> L2GDLDiscEnvironment (environments.py:262-397)
  * SCT family                  -> SCTEnvironment (teacher-forcing schedule,
    environments.py:488-528)
  * SloMo                       -> SloMoEnvironment (L1 + perceptual + warping
    + smoothness, step-decay LR, environments.py:531-615)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.discriminator import SNDiscriminator
from ..ops.image import inverse_transform
from ..ops.metrics import psnr, quantize_uint8, ssim
from .losses import bce_with_logits, disc_window_labels, gdl_loss, l2_loss


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_opt: Any
    d_params: Any = None
    d_sn: Any = None
    d_opt: Any = None
    rng: Optional[jax.Array] = None


def split_batch(targets: jax.Array, K: int, T: int, F: int):
    """targets [B, K+T+F, H, W, C] -> (preceding, middle, following).

    Mirrors the slicing in train.py:111-115.
    """
    return targets[:, :K], targets[:, K : K + T], targets[:, K + T : K + T + F]


class BaseEnvironment:
    """Shared: generator init/eval; subclasses add losses + optimizers."""

    needs_snapshot = True  # False for parameter-free models (OF, TW_P_F)

    def __init__(self, model, cfg):
        self.model = model
        self.cfg = cfg
        # Extra (non-"params") variable collections for serving — e.g. the
        # calibrated "quant" activation scales of the int8 mode (nn/quant.py).
        # `self` is a static jit argument, so these are baked into the
        # compiled program as constants: set them BEFORE the first
        # forward_test call (later mutations would not retrace).
        self.extra_collections = {}

    # -- init ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_targets: np.ndarray, K: int, T: int, F: int) -> TrainState:
        p, _, f = split_batch(jnp.asarray(sample_targets), K, T, F)
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        # jitted init: unjitted flax init dispatches hundreds of individual
        # ops — hundreds of RPCs over a remote-TPU tunnel (CLAUDE.md gotcha)
        g_vars = jax.jit(self.model.init, static_argnums=1)(g_rng, T, p, f)
        g_params = g_vars.get("params", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_opt=self.g_tx().init(g_params),
            rng=s_rng,
        )
        return self._init_extra(state, d_rng, p, f, T)

    def _init_extra(self, state, rng, p, f, T):
        return state

    def g_tx(self) -> optax.GradientTransformation:
        return optax.adam(self.cfg.lr, b1=self.cfg.beta1, b2=0.999)

    # -- eval ---------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 2))
    def forward_test(self, g_params, T: int, preceding, following) -> Dict[str, jax.Array]:
        # "sample" feeds the randomized-order SCT variants; harmless otherwise.
        return self.model.apply(
            {"params": g_params, **self.extra_collections},
            T, preceding, following, rngs={"sample": jax.random.PRNGKey(0)},
        )

    @functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def eval_metrics(self, g_params, K: int, T: int, F: int, targets) -> Dict[str, jax.Array]:
        """Per-(video, timestep) PSNR/SSIM/L2 for a batch — replaces the
        reference's skimage loops (train.py:268-285) with one on-device pass."""
        p, m, f = split_batch(targets, K, T, F)
        pred = self.model.apply(
            {"params": g_params}, T, p, f, rngs={"sample": jax.random.PRNGKey(0)}
        )["pred"]
        pred_u8, gt_u8 = quantize_uint8(pred), quantize_uint8(m)
        return {
            "psnr": psnr(pred_u8, gt_u8, clamp=100.0),  # [B, T]
            "ssim": ssim(pred_u8, gt_u8),  # [B, T]
            "l2": jnp.mean((inverse_transform(pred) - inverse_transform(m)) ** 2, axis=(2, 3, 4)),
        }


class L2GDLDiscEnvironment(BaseEnvironment):
    """MSE + GDL + sliding-window SN-GAN training (environments.py:262-397)."""

    def _init_extra(self, state, rng, p, f, T):
        c = self.cfg
        self.discriminator = SNDiscriminator(window_size=c.disc_window_size, df_dim=c.df_dim, Ip=c.Ip)
        fake = jnp.concatenate([p, jnp.repeat(jnp.zeros_like(p[:, :1]), T, axis=1), f], axis=1)
        d_vars = self.discriminator.init(rng, fake)
        return state.replace(
            d_params=d_vars["params"],
            d_sn=d_vars.get("sn", {}),
            d_opt=self.d_tx().init(d_vars["params"]),
        )

    def d_tx(self) -> optax.GradientTransformation:
        return optax.adam(self.cfg.lr, b1=self.cfg.beta1, b2=0.999)

    # -- generator loss ------------------------------------------------------
    def _recon_terms(self, out, gt_middle) -> Dict[str, jax.Array]:
        pred01 = inverse_transform(out["pred"])
        gt01 = inverse_transform(gt_middle)
        return {"G_Lp": l2_loss(pred01, gt01), "G_gdl": gdl_loss(pred01, gt01)}

    def _extra_recon_terms(self, out, gt_middle) -> Dict[str, jax.Array]:
        return {}

    def _compute_cast(self, tree):
        """Mixed precision: cast params/inputs to bf16 for compute when
        cfg.train_dtype == 'bfloat16' (master params/optimizer stay f32;
        gradients flow back through the cast as f32)."""
        if getattr(self.cfg, "train_dtype", "float32") != "bfloat16":
            return tree
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            tree,
        )

    def _g_loss(self, g_params, d_params, d_sn, rng, step, K, T, F, targets):
        p, m, f = split_batch(targets, K, T, F)
        g_params = self._compute_cast(g_params)
        p, f = self._compute_cast((p, f))
        out = self._g_forward(g_params, rng, step, T, p, m, f)
        out = jax.tree.map(lambda a: a.astype(jnp.float32), out)
        terms = self._recon_terms(out, m)
        extra = self._extra_recon_terms(out, m)

        fake_video = jnp.concatenate([p, out["pred"], f], axis=1)
        logits = self.discriminator.apply(
            {"params": d_params, "sn": d_sn}, fake_video, train=False
        )
        terms["G_GAN"] = bce_with_logits(logits, jnp.ones_like(logits))

        c = self.cfg
        loss = c.alpha * (terms["G_Lp"] + terms["G_gdl"] + sum(extra.values())) + c.beta * terms["G_GAN"]
        terms.update(extra)
        terms["G_loss"] = loss
        return loss, (out, terms)

    def _g_forward(self, g_params, rng, step, T, p, m, f):
        return self.model.apply({"params": g_params}, T, p, f)

    # -- discriminator loss --------------------------------------------------
    def _d_loss(self, d_params, d_sn, pred, K, T, F, targets):
        d_params = self._compute_cast(d_params)
        p, m, f = split_batch(targets, K, T, F)
        p, m, f, pred = self._compute_cast((p, m, f, pred))
        fake_video = jnp.concatenate([p, jax.lax.stop_gradient(pred), f], axis=1)
        real_video = jnp.concatenate([p, m, f], axis=1)

        logits_fake, mut = self.discriminator.apply(
            {"params": d_params, "sn": d_sn}, fake_video, train=True, mutable=["sn"]
        )
        labels = disc_window_labels(K, T, F, self.cfg.disc_window_size)
        labels = jnp.broadcast_to(labels[None, :], logits_fake.shape)
        loss_fake = bce_with_logits(logits_fake, labels)

        logits_real, mut = self.discriminator.apply(
            {"params": d_params, "sn": mut["sn"]}, real_video, train=True, mutable=["sn"]
        )
        loss_real = bce_with_logits(logits_real, jnp.ones_like(logits_real))
        return loss_fake + loss_real, (mut["sn"], {"D_fake": loss_fake, "D_real": loss_real})

    # -- the two-program step -------------------------------------------------
    # The G update and D update compile as SEPARATE XLA programs: fused into
    # one, the scheduler must plan peak memory for generator-grad residuals,
    # discriminator grads and both Adam states simultaneously — measured 27x
    # slower on v5e (3.7 s vs ~130 ms) once the model stopped fitting the
    # planner's budget. Split, each program is small and fast; semantics are
    # identical (the D update sees the pre-update generator output, detached,
    # like the reference's single forward per iteration, environments.py:348-355).
    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5), donate_argnums=(1,))
    def _g_update(self, gstate, d_frozen, K: int, T: int, F: int, targets):
        g_params, g_opt, rng, step = gstate
        d_params, d_sn = d_frozen
        rng, step_rng = jax.random.split(rng)
        (loss, (out, terms)), g_grads = jax.value_and_grad(self._g_loss, has_aux=True)(
            g_params, d_params, d_sn, step_rng, step, K, T, F, targets
        )
        g_updates, g_opt = self.g_tx().update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        return (g_params, g_opt, rng, step + 1), out["pred"], terms

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5), donate_argnums=(1,))
    def _d_update(self, dstate, pred, K: int, T: int, F: int, targets):
        d_params, d_sn, d_opt = dstate
        (d_loss, (d_sn, d_terms)), d_grads = jax.value_and_grad(self._d_loss, has_aux=True)(
            d_params, d_sn, pred, K, T, F, targets
        )
        d_updates, d_opt = self.d_tx().update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        return (d_params, d_sn, d_opt), d_terms

    def train_step(self, state: TrainState, K: int, T: int, F: int, targets):
        """One G update followed by one D update."""
        gstate, pred, terms = self._g_update(
            (state.g_params, state.g_opt, state.rng, state.step),
            (state.d_params, state.d_sn),
            K, T, F, targets,
        )
        dstate, d_terms = self._d_update(
            (state.d_params, state.d_sn, state.d_opt), pred, K, T, F, targets
        )
        terms.update(d_terms)
        new_state = state.replace(
            step=gstate[3], g_params=gstate[0], g_opt=gstate[1], rng=gstate[2],
            d_params=dstate[0], d_sn=dstate[1], d_opt=dstate[2],
        )
        return new_state, terms

    def sample_ktf(self, rng: np.random.RandomState, allow_random: bool):
        c = self.cfg
        if not allow_random:
            return c.K, c.T, c.F
        return (
            rng.randint(self.min_K, c.K + 1),
            rng.randint(1, c.T + 1),
            rng.randint(self.min_F, c.F + 1),
        )

    min_K = 1
    min_F = 1


class MCNetEnvironment(L2GDLDiscEnvironment):
    """K >= 2 curriculum sampling (environments.py:400-412)."""

    min_K = 2


class TAIEnvironment(L2GDLDiscEnvironment):
    """Adds intermediate forward/backward reconstruction + GDL losses
    (environments.py:415-485); K, F >= 2 sampling."""

    min_K = 2
    min_F = 2

    def _extra_recon_terms(self, out, gt_middle):
        gt01 = inverse_transform(gt_middle)
        fwd01 = inverse_transform(out["pred_forward"])
        bwd01 = inverse_transform(out["pred_backward"])
        return {
            "G_Lp_forward": l2_loss(fwd01, gt01),
            "G_Lp_backward": l2_loss(bwd01, gt01),
            "G_gdl_forward": gdl_loss(fwd01, gt01),
            "G_gdl_backward": gdl_loss(bwd01, gt01),
        }


class SCTEnvironment(L2GDLDiscEnvironment):
    """Sigmoid-scheduled teacher forcing (environments.py:514-528): with
    probability tf_rate(step) the generator consumes the ground-truth middle
    frames (forward_train); otherwise it free-runs."""

    def tf_rate(self, step):
        c = self.cfg
        sig = jax.nn.sigmoid((step - c.tf_offset) / c.tf_decay)
        return (c.tf_p_min - c.tf_p_max) * sig + c.tf_p_max

    def _g_forward(self, g_params, rng, step, T, p, m, f):
        m = self._compute_cast(m)  # teacher-forced decoder inputs follow p/f
        tf_rng, sample_rng = jax.random.split(rng)
        if not hasattr(self.model, "forward_train"):
            # only the Forward lineage defines the teacher-forced pass
            # (self_attention.py:194-255); other variants always free-run
            return self.model.apply({"params": g_params}, T, p, f, rngs={"sample": sample_rng})
        use_tf = jax.random.uniform(tf_rng) < self.tf_rate(step)

        # lax.cond: only the chosen branch executes at runtime (the reference
        # picks eagerly per iteration, environments.py:522-528).
        def forced(_):
            return self.model.apply(
                {"params": g_params}, T, p, f, m, method="forward_train",
                rngs={"sample": sample_rng},
            )

        def free(_):
            return self.model.apply({"params": g_params}, T, p, f, rngs={"sample": sample_rng})

        return jax.lax.cond(use_tf, forced, free, None)


def create_training_environment(model, cfg) -> BaseEnvironment:
    """Dispatch on generator type, mirroring environments.py:24-52."""
    import os

    if os.environ.get("VFI_INT8", "0") in ("1", "2"):
        # int8 QConv is a SERVING mode: jnp.round has a zero gradient, so a
        # leaked VFI_INT8 would silently kill every conv weight gradient.
        raise RuntimeError(
            "VFI_INT8 is set but int8 QConv is inference-only (zero gradients "
            "through jnp.round); unset it for training (use cli/predict.py "
            "--quantize int8 for serving)."
        )
    from ..models.fill_in import (
        BidirectionalSimpleAverageFillInModel,
        BidirectionalTimeWeightedAverageFillInModel,
        MCNetFillInModel,
        TAIFillInModel,
    )

    if isinstance(
        model,
        (
            TAIFillInModel,  # covers TWI (subclass)
            BidirectionalSimpleAverageFillInModel,
            BidirectionalTimeWeightedAverageFillInModel,
        ),
    ):
        return TAIEnvironment(model, cfg)
    if isinstance(model, MCNetFillInModel):
        return MCNetEnvironment(model, cfg)
    try:
        from ..models.slomo import SloMoFillInModel
        from .slomo_env import SloMoEnvironment

        if isinstance(model, SloMoFillInModel):
            return SloMoEnvironment(model, cfg)
    except ImportError:
        pass
    try:
        from ..models.sct import BaseSCTFillInModel

        if isinstance(model, BaseSCTFillInModel):
            return SCTEnvironment(model, cfg)
    except ImportError:
        pass
    raise TypeError(f"no training environment for model type {type(model).__name__}")


def create_eval_environment(model, cfg) -> BaseEnvironment:
    env = BaseEnvironment(model, cfg)
    from ..models.fill_in import TimeWeightedPFFillInModel

    param_free = isinstance(model, TimeWeightedPFFillInModel) or type(model).__name__ == "OFFillInModel"
    env.needs_snapshot = not param_free
    return env
