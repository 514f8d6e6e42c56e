"""Dynamic-(K, T, F) training: ONE compiled step for every sampled length.

The reference re-samples (K, T, F) each iteration (environments.py:156-166,
--sample_KTF).  The static environments would compile one XLA program per
combination (up to max_K * max_T * max_F programs); this module provides
`train_step_dynamic`, compiled once at (max_K, max_T, max_F) with the sampled
lengths as traced scalars — pad-to-max buffers + masks throughout
(SURVEY.md §7 hard part 3).  Exactness: masked warm-up leaves the ConvLSTM
state untouched for padded steps, so results equal the static program at the
same lengths up to float reassociation.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..ops.dynamic import (
    compact_video,
    dynamic_window_labels,
    masked_mean,
    middle_mask,
    pack_context,
)
from ..ops.image import inverse_transform
from .environments import L2GDLDiscEnvironment, SCTEnvironment, TAIEnvironment, TrainState


def _masked_gdl(pred, target, tmask):
    """GDL terms (losses.py:17-45) masked over the middle-frame axis."""
    pw = pred[..., :, :-1, :] - pred[..., :, 1:, :]
    ph = pred[..., 1:, :, :] - pred[..., :-1, :, :]
    tw = target[..., :, :-1, :] - target[..., :, 1:, :]
    th = target[..., 1:, :, :] - target[..., :-1, :, :]
    w_term = jnp.abs(pw - tw)[..., 1:, :, :]
    h_term = jnp.abs(ph - th)[..., :, 1:, :]
    return masked_mean(w_term + h_term, tmask[:, :, None, None, None])


def _masked_bce(logits, labels, valid):
    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    return masked_mean(per, valid)


class DynamicKTFMixin:
    """Adds a single-compilation variable-length train step to the GAN envs."""

    use_intermediate_losses = False  # True for the TAI family

    def _g_forward_dyn(self, g_params, rng, step, K, T, F, p, m, f):
        """Model application hook — overridden by DynamicSCTEnvironment for
        the teacher-forcing branch (mirrors the static _g_forward hook)."""
        return self.model.apply({"params": g_params}, self.cfg.T, p, f, lengths=(K, T, F))

    def _g_loss_dyn(self, g_params, d_params, d_sn, rng, step, K, T, F, targets):
        c = self.cfg
        p, m, f = pack_context(targets, K, T, F, c.K, c.T, c.F)
        # mixed precision: same compute cast as the static path (_g_loss)
        g_params = self._compute_cast(g_params)
        p, f = self._compute_cast((p, f))
        out = self._g_forward_dyn(g_params, rng, step, K, T, F, p, m, f)
        out = jax.tree.map(lambda a: a.astype(jnp.float32), out)
        p = p.astype(jnp.float32)
        f = f.astype(jnp.float32)
        tmask = middle_mask(T, c.T)[None, :]

        pred01 = inverse_transform(out["pred"])
        gt01 = inverse_transform(m)
        terms: Dict[str, jax.Array] = {
            "G_Lp": masked_mean((pred01 - gt01) ** 2, tmask[:, :, None, None, None]),
            "G_gdl": _masked_gdl(pred01, gt01, tmask),
        }
        extra = {}
        if self.use_intermediate_losses:
            fwd01 = inverse_transform(out["pred_forward"])
            bwd01 = inverse_transform(out["pred_backward"])
            extra = {
                "G_Lp_forward": masked_mean((fwd01 - gt01) ** 2, tmask[:, :, None, None, None]),
                "G_Lp_backward": masked_mean((bwd01 - gt01) ** 2, tmask[:, :, None, None, None]),
                "G_gdl_forward": _masked_gdl(fwd01, gt01, tmask),
                "G_gdl_backward": _masked_gdl(bwd01, gt01, tmask),
            }

        fake = compact_video(p, out["pred"], f, K, T, F)
        logits = self.discriminator.apply({"params": d_params, "sn": d_sn}, fake, train=False)
        _, valid = dynamic_window_labels(K, T, F, fake.shape[1], c.disc_window_size)
        terms["G_GAN"] = _masked_bce(logits, jnp.ones_like(logits), valid[None, :])

        loss = c.alpha * (terms["G_Lp"] + terms["G_gdl"] + sum(extra.values())) + c.beta * terms["G_GAN"]
        terms.update(extra)
        terms["G_loss"] = loss
        return loss, (out, p, m, f, terms)

    def _d_loss_dyn(self, d_params, d_sn, pred, p, m, f, K, T, F):
        c = self.cfg
        d_params = self._compute_cast(d_params)
        p, m, f, pred = self._compute_cast((p, m, f, pred))
        fake = compact_video(p, jax.lax.stop_gradient(pred), f, K, T, F)
        real = compact_video(p, m, f, K, T, F)
        labels, valid = dynamic_window_labels(K, T, F, fake.shape[1], c.disc_window_size)

        logits_fake, mut = self.discriminator.apply(
            {"params": d_params, "sn": d_sn}, fake, train=True, mutable=["sn"]
        )
        loss_fake = _masked_bce(logits_fake, jnp.broadcast_to(labels[None], logits_fake.shape), valid[None])
        logits_real, mut = self.discriminator.apply(
            {"params": d_params, "sn": mut["sn"]}, real, train=True, mutable=["sn"]
        )
        loss_real = _masked_bce(logits_real, jnp.ones_like(logits_real), valid[None])
        return loss_fake + loss_real, (mut["sn"], {"D_fake": loss_fake, "D_real": loss_real})

    # Split into two XLA programs for the same scheduler-memory reason as the
    # static step (see environments.py train_step comment).
    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _g_update_dyn(self, gstate, d_frozen, targets, ktf):
        K, T, F = ktf[0], ktf[1], ktf[2]
        g_params, g_opt, rng, step = gstate
        d_params, d_sn = d_frozen
        rng, step_rng = jax.random.split(rng)
        (loss, (out, p, m, f, terms)), g_grads = jax.value_and_grad(self._g_loss_dyn, has_aux=True)(
            g_params, d_params, d_sn, step_rng, step, K, T, F, targets
        )
        g_updates, g_opt = self.g_tx().update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        return (g_params, g_opt, rng, step + 1), (out["pred"], p, m, f), terms

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _d_update_dyn(self, dstate, packed, ktf):
        K, T, F = ktf[0], ktf[1], ktf[2]
        d_params, d_sn, d_opt = dstate
        pred, p, m, f = packed
        (d_loss, (d_sn, d_terms)), d_grads = jax.value_and_grad(self._d_loss_dyn, has_aux=True)(
            d_params, d_sn, pred, p, m, f, K, T, F
        )
        d_updates, d_opt = self.d_tx().update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        return (d_params, d_sn, d_opt), d_terms

    def train_step_dynamic(self, state: TrainState, targets, ktf):
        """One G + D update at traced lengths ``ktf = [K, T, F]``.

        ``targets``: [B, max_K + max_T + max_F, H, W, C] — the max-length clip;
        the sampled prefix K+T+F is used (train.py:111-115 semantics).
        """
        gstate, packed, terms = self._g_update_dyn(
            (state.g_params, state.g_opt, state.rng, state.step),
            (state.d_params, state.d_sn),
            targets, ktf,
        )
        dstate, d_terms = self._d_update_dyn(
            (state.d_params, state.d_sn, state.d_opt), packed, ktf
        )
        terms.update(d_terms)
        return (
            state.replace(
                step=gstate[3], g_params=gstate[0], g_opt=gstate[1], rng=gstate[2],
                d_params=dstate[0], d_sn=dstate[1], d_opt=dstate[2],
            ),
            terms,
        )


class DynamicL2GDLDiscEnvironment(DynamicKTFMixin, L2GDLDiscEnvironment):
    pass


class DynamicMCNetEnvironment(DynamicL2GDLDiscEnvironment):
    min_K = 2


class DynamicTAIEnvironment(DynamicKTFMixin, TAIEnvironment):
    use_intermediate_losses = True


class DynamicSCTEnvironment(DynamicKTFMixin, SCTEnvironment):
    """Dynamic-(K,T,F) SCT training with the sigmoid teacher-forcing schedule
    (environments.py:514-528): one compiled program covers every sampled
    combination AND both TF branches (lax.cond executes only the chosen one).
    """

    def _g_forward_dyn(self, g_params, rng, step, K, T, F, p, m, f):
        m = self._compute_cast(m)  # teacher-forced decoder inputs follow p/f
        tf_rng, sample_rng = jax.random.split(rng)
        if not hasattr(self.model, "forward_train"):
            # Inward/Random variants have no teacher-forced pass; free-run
            return self.model.apply(
                {"params": g_params}, self.cfg.T, p, f, lengths=(K, T, F),
                rngs={"sample": sample_rng},
            )
        use_tf = jax.random.uniform(tf_rng) < self.tf_rate(step)

        def forced(_):
            return self.model.apply(
                {"params": g_params}, self.cfg.T, p, f, m, lengths=(K, T, F),
                method="forward_train", rngs={"sample": sample_rng},
            )

        def free(_):
            return self.model.apply(
                {"params": g_params}, self.cfg.T, p, f, lengths=(K, T, F),
                rngs={"sample": sample_rng},
            )

        return jax.lax.cond(use_tf, forced, free, None)


class DynamicSloMoEnvironment:
    """Mixin-free dynamic SloMo step (no discriminator)."""

    def __init__(self, model, cfg):
        from .slomo_env import SloMoEnvironment

        self._base = SloMoEnvironment(model, cfg)
        self.model = model
        self.cfg = cfg

    def __getattr__(self, name):
        return getattr(self._base, name)

    def _g_loss_dyn(self, g_params, K, T, F, targets):
        import jax.numpy as jnp

        from ..ops.image import inverse_transform
        from ..ops.warp import flow_warp

        c = self.cfg
        p, m, f = pack_context(targets, K, T, F, c.K, c.T, c.F)
        out = self.model.apply({"params": g_params}, c.T, p, f, lengths=(K, T, F))
        tmask5 = middle_mask(T, c.T)[None, :, None, None, None]

        pred = out["pred"]
        terms = {"reconstruction_loss": masked_mean(jnp.abs(pred - m), tmask5)}
        perc = self._base._perceptual(pred, m)
        terms["perceptual_loss"] = perc if perc is not None else jnp.zeros(())

        I0, I1 = p[:, -1], f[:, 0]
        B = pred.shape[0]
        Ft0, Ft1 = out["F_t_0_collector"], out["F_t_1_collector"]

        def fold(a):
            return a.reshape(B * c.T, *a.shape[2:])

        I0r = fold(jnp.broadcast_to(I0[:, None], (B, c.T, *I0.shape[1:])))
        I1r = fold(jnp.broadcast_to(I1[:, None], (B, c.T, *I1.shape[1:])))
        w0 = flow_warp(I0r, fold(Ft0)).reshape(B, c.T, *I0.shape[1:])
        w1 = flow_warp(I1r, fold(Ft1)).reshape(B, c.T, *I1.shape[1:])
        per_t = masked_mean(jnp.abs(w0 - m), tmask5) + masked_mean(jnp.abs(w1 - m), tmask5)
        terms["warping_loss"] = (
            jnp.mean(jnp.abs(flow_warp(I0, out["F_1_0"]) - I1))
            + jnp.mean(jnp.abs(flow_warp(I1, out["F_0_1"]) - I0))
            + per_t
        )
        from .losses import gdl_loss

        zero = jnp.zeros_like(out["F_0_1"])
        terms["smooth_loss"] = gdl_loss(out["F_1_0"], zero) + gdl_loss(out["F_0_1"], zero)

        loss = (
            c.lambda_r * terms["reconstruction_loss"]
            + c.lambda_p * terms["perceptual_loss"]
            + c.lambda_w * terms["warping_loss"]
            + c.lambda_s * terms["smooth_loss"]
        )
        terms["G_loss"] = loss
        return loss, terms

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step_dynamic(self, state, targets, ktf):
        K, T, F = ktf[0], ktf[1], ktf[2]
        rng, _ = jax.random.split(state.rng)
        (loss, terms), grads = jax.value_and_grad(self._g_loss_dyn, has_aux=True)(
            state.g_params, K, T, F, targets
        )
        updates, g_opt = self._base.g_tx().update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return state.replace(step=state.step + 1, g_params=g_params, g_opt=g_opt, rng=rng), terms


def create_dynamic_environment(model, cfg):
    """Dynamic-(K,T,F) counterpart of create_training_environment.

    Covered families: TAI/TWI/bi-SA/bi-TWA, MCNet, SloMo, and ALL SCT
    variants — the Forward lineage teacher-forces; Inward/Random free-run
    with runtime-T generation orders.
    """
    from ..models.fill_in import (
        BidirectionalSimpleAverageFillInModel,
        BidirectionalTimeWeightedAverageFillInModel,
        MCNetFillInModel,
        TAIFillInModel,
    )

    if isinstance(
        model,
        (
            TAIFillInModel,
            BidirectionalSimpleAverageFillInModel,
            BidirectionalTimeWeightedAverageFillInModel,
        ),
    ):
        return DynamicTAIEnvironment(model, cfg)
    if isinstance(model, MCNetFillInModel):
        return DynamicMCNetEnvironment(model, cfg)
    try:
        from ..models.slomo import SloMoFillInModel

        if isinstance(model, SloMoFillInModel):
            return DynamicSloMoEnvironment(model, cfg)
    except ImportError:
        pass
    try:
        from ..models.sct import BaseSCTFillInModel

        # The Forward lineage teacher-forces; Inward/Random free-run with
        # runtime-T generation orders (models/sct.py dynamic-order support).
        if isinstance(model, BaseSCTFillInModel):
            return DynamicSCTEnvironment(model, cfg)
    except ImportError:
        pass
    return None
