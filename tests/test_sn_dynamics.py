"""GAN-dynamics parity for the spectral-norm deviation (VERDICT r2 weak #7).

The reference SNDiscriminator *persistently divides the stored weight by
sigma in place* every forward (SNDiscriminator.py:63-68); vfi_tpu uses the
textbook Miyato normalize-on-the-fly formulation.  The docstring claim that
"after the first few steps the two coincide" was never tested against actual
optimization.  Here both semantics train side by side from an identical
imported init — same Adam(lr, 0.5, 0.999), same data, same BCE window loss —
and the D-loss trajectories must track.

Torch side: an exact modern-torch re-implementation of the reference
semantics (in-place weight division + persistent u, matching
max_singular_value's u @ W / W^T iteration order).  Adam is per-element
scale-invariant, so the sigma-factor difference in the first step's gradient
(before the stored weight has been pulled to sigma=1) must wash out.
"""

import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as TF

import jax

from vfi_tpu.nn.discriminator import SNDiscriminator as JaxDisc
from vfi_tpu.utils.torch_import import import_discriminator_state_dict

from . import torch_mirror

DF, WINDOW, H, W = 8, 3, 32, 32
B, K, T, F_ = 2, 3, 2, 3
TTOT = K + T + F_
LR, BETA1 = 1e-4, 0.5
STEPS = 10


class RefSemanticsSNConv2d(torch_mirror.SNConv2dMirror):
    """Reference forward: u update + persistent in-place weight division
    (SNDiscriminator.py:63-68), unlike the mirror's on-the-fly version."""

    def forward(self, x):
        w_mat = self.weight.view(self.weight.shape[0], -1)
        sigma, u = torch_mirror._max_singular_value(w_mat.detach(), self.u, self.Ip)
        self.u = u.detach()
        with torch.no_grad():
            self.weight.data = self.weight.data / sigma
        return TF.conv2d(x, self.weight, self.bias, stride=self.stride,
                         padding=self.padding)


class RefSemanticsSNLinear(torch_mirror.SNLinearMirror):
    def forward(self, x):
        sigma, u = torch_mirror._max_singular_value(self.weight.detach(), self.u, self.Ip)
        self.u = u.detach()
        with torch.no_grad():
            self.weight.data = self.weight.data / sigma
        return TF.linear(x, self.weight, self.bias)


def _window_labels():
    """Sliding-window fake labels: windows fully inside P or F are real
    (reference environments.py:308-323)."""
    nw = TTOT - WINDOW + 1
    lab = np.zeros(nw, np.float32)
    for s in range(nw):
        if s + WINDOW <= K or s >= K + T:
            lab[s] = 1.0
    return lab


def test_sn_loss_trajectories_track():
    torch.manual_seed(4)
    tm = torch_mirror.SNDiscriminator((H, W), 1, WINDOW, DF, Ip=1)
    # swap in reference-semantics layers, preserving weights and u
    for i in (0, 2, 4, 6):
        old = tm.conv_layers[i]
        new = RefSemanticsSNConv2d(old.in_channels, old.out_channels,
                                   old.kernel_size[0], old.stride[0],
                                   old.padding[0], old.Ip)
        new.load_state_dict(old.state_dict())
        tm.conv_layers[i] = new
    old = tm.linear_layer
    new = RefSemanticsSNLinear(old.in_features, old.out_features, old.Ip)
    new.load_state_dict(old.state_dict())
    tm.linear_layer = new

    params, sn, report = import_discriminator_state_dict(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, DF)
    assert report.skipped == []

    rng = np.random.RandomState(17)
    fake = rng.uniform(-1, 1, (B, TTOT, 1, H, W)).astype(np.float32)
    real = rng.uniform(-1, 1, (B, TTOT, 1, H, W)).astype(np.float32)
    lab_fake = _window_labels()
    nw = TTOT - WINDOW + 1

    # ---- torch trajectory (reference semantics) ----
    opt_t = torch.optim.Adam(tm.parameters(), lr=LR, betas=(BETA1, 0.999))
    t_fake, t_real = torch.tensor(fake), torch.tensor(real)
    t_lab = torch.tensor(np.broadcast_to(lab_fake, (B, nw)).copy())
    t_ones = torch.ones(B, nw)
    torch_losses = []
    for _ in range(STEPS):
        opt_t.zero_grad()
        lf = tm(t_fake)
        lr_ = tm(t_real)
        loss = (TF.binary_cross_entropy_with_logits(lf, t_lab)
                + TF.binary_cross_entropy_with_logits(lr_, t_ones))
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss))

    # ---- jax trajectory (normalize-on-the-fly) ----
    disc = JaxDisc(window_size=WINDOW, df_dim=DF, Ip=1)
    j_fake = jax.numpy.asarray(fake.transpose(0, 1, 3, 4, 2))
    j_real = jax.numpy.asarray(real.transpose(0, 1, 3, 4, 2))
    j_lab = jax.numpy.asarray(np.broadcast_to(lab_fake, (B, nw)).copy())
    j_ones = jax.numpy.ones((B, nw))
    opt = optax.adam(LR, b1=BETA1, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)

    def loss_fn(p, sn_state):
        lf, vs = disc.apply({"params": p, "sn": sn_state}, j_fake,
                            train=True, mutable=["sn"])
        lr_, vs = disc.apply({"params": p, "sn": vs["sn"]}, j_real,
                             train=True, mutable=["sn"])
        loss = (optax.sigmoid_binary_cross_entropy(lf, j_lab).mean()
                + optax.sigmoid_binary_cross_entropy(lr_, j_ones).mean())
        return loss, vs["sn"]

    @jax.jit
    def step(p, sn_state, opt_state):
        (loss, new_sn), g = jax.value_and_grad(loss_fn, has_aux=True)(p, sn_state)
        updates, opt_state = opt.update(g, opt_state, p)
        return optax.apply_updates(p, updates), new_sn, opt_state, loss

    jax_losses = []
    for _ in range(STEPS):
        params, sn, opt_state, loss = step(params, sn, opt_state)
        jax_losses.append(float(loss))

    # The residual semantic gap: the reference applies the SN stack once PER
    # WINDOW (SNDiscriminator.py:149-154), so with Ip=1 the under-converged
    # sigma estimate — and the persistent division — is refreshed nw times per
    # forward, while the vectorized version normalizes once.  Measured: 0.23%
    # loss gap at identical init, trajectories tracking within ~1% over 10
    # Adam steps (the sigma-factor gradient difference washes out in Adam's
    # per-element normalization).
    assert torch_losses[0] == pytest.approx(jax_losses[0], rel=5e-3)
    for i, (lt, lj) in enumerate(zip(torch_losses, jax_losses)):
        assert lt == pytest.approx(lj, rel=0.02), (i, torch_losses, jax_losses)
    # both must actually be learning (loss decreases from the start)
    assert torch_losses[-1] < torch_losses[0]
    assert jax_losses[-1] < jax_losses[0]
