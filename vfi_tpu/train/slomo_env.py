"""SloMo training environment.

Behavioral reference: environments.py:531-615 — L1 reconstruction + frozen
VGG16 perceptual + warping + GDL-smoothness losses with lambda weights, and
step-decay learning rate (lr * rate^(step // count)).

No discriminator.  The perceptual term requires VGG16 weights (see
vfi_tpu.nn.vgg); training with lambda_p > 0 and no weights is a hard error
so SloMo cannot silently train without the reference's loss composition.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..nn.vgg import try_load_vgg16
from ..ops.image import inverse_transform
from ..ops.warp import flow_warp
from .environments import BaseEnvironment, TrainState, split_batch
from .losses import gdl_loss, l1_loss, l2_loss


class SloMoEnvironment(BaseEnvironment):
    def __init__(self, model, cfg):
        super().__init__(model, cfg)
        self._vgg = try_load_vgg16(cfg.vgg16_weights)
        if self._vgg is None and cfg.lambda_p > 0:
            # The reference ALWAYS trains SloMo with the frozen-VGG16
            # perceptual term (environments.py:541-544,571-575); silently
            # zeroing it would train a model that cannot match the paper.
            raise RuntimeError(
                "SloMo training with lambda_p > 0 requires VGG16 weights: pass "
                "--vgg16_weights <npz> (convert a torchvision vgg16 state_dict "
                "with cli/convert_vgg16.py), or explicitly opt out of reference "
                "parity with --lambda_p 0."
            )

    def g_tx(self):
        c = self.cfg
        schedule = lambda step: c.lr * (c.lr_decay_rate ** (step // c.lr_decay_count))
        return optax.adam(schedule, b1=c.beta1, b2=0.999)

    def _perceptual(self, pred, gt):
        if self._vgg is None:
            return None
        vgg, variables = self._vgg
        B, T = pred.shape[:2]

        def feats(v):
            v01 = inverse_transform(v)
            if v01.shape[-1] == 1:
                v01 = jnp.repeat(v01, 3, axis=-1)
            flat = v01.reshape(B * T, *v01.shape[2:])
            return vgg.apply(variables, flat)

        return l2_loss(feats(pred), feats(gt))

    def _g_loss(self, g_params, rng, step, K, T, F, targets):
        c = self.cfg
        p, m, f = split_batch(targets, K, T, F)
        out = self.model.apply({"params": g_params}, T, p, f)
        I0, I1 = p[:, -1], f[:, 0]
        pred = out["pred"]

        terms: Dict[str, jax.Array] = {}
        terms["reconstruction_loss"] = l1_loss(pred, m)

        perc = self._perceptual(pred, m)
        terms["perceptual_loss"] = perc if perc is not None else jnp.zeros(())

        # Warping loss (environments.py:584-586): per-t backward warps of the
        # context frames toward every GT middle frame + cross-warps of I0/I1.
        Ft0 = out["F_t_0_collector"]  # [B, T, H, W, 2]
        Ft1 = out["F_t_1_collector"]
        B = pred.shape[0]

        def fold(a):
            return a.reshape(B * T, *a.shape[2:])

        I0r = fold(jnp.broadcast_to(I0[:, None], (B, T, *I0.shape[1:])))
        I1r = fold(jnp.broadcast_to(I1[:, None], (B, T, *I1.shape[1:])))
        per_t = l1_loss(flow_warp(I0r, fold(Ft0)), fold(m)) + l1_loss(flow_warp(I1r, fold(Ft1)), fold(m))
        terms["warping_loss"] = (
            l1_loss(flow_warp(I0, out["F_1_0"]), I1)
            + l1_loss(flow_warp(I1, out["F_0_1"]), I0)
            + per_t
        )

        # Smoothness: GDL of each flow field against zero (environments.py:589-591).
        zero01 = jnp.zeros_like(out["F_0_1"])
        terms["smooth_loss"] = gdl_loss(out["F_1_0"], zero01) + gdl_loss(out["F_0_1"], zero01)

        loss = (
            c.lambda_r * terms["reconstruction_loss"]
            + c.lambda_p * terms["perceptual_loss"]
            + c.lambda_w * terms["warping_loss"]
            + c.lambda_s * terms["smooth_loss"]
        )
        terms["G_loss"] = loss
        return loss, terms

    @functools.partial(jax.jit, static_argnums=(0, 2, 3, 4), donate_argnums=(1,))
    def train_step(self, state: TrainState, K: int, T: int, F: int, targets):
        rng, step_rng = jax.random.split(state.rng)
        (loss, terms), grads = jax.value_and_grad(self._g_loss, has_aux=True)(
            state.g_params, step_rng, state.step, K, T, F, targets
        )
        updates, g_opt = self.g_tx().update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return state.replace(step=state.step + 1, g_params=g_params, g_opt=g_opt, rng=rng), terms

    def sample_ktf(self, rng, allow_random: bool):
        c = self.cfg
        if not allow_random:
            return c.K, c.T, c.F
        return rng.randint(1, c.K + 1), rng.randint(1, c.T + 1), rng.randint(1, c.F + 1)
