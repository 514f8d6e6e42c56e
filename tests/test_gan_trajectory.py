"""Capstone training parity: the FULL GAN environment trajectory vs torch.

The existing gates cover each link in isolation — forward (test_torch_import,
PARITY_r03.md), per-parameter gradients (test_grad_parity), the optimizer step
(test_adam_step_parity), and the SN-semantics deviation in the discriminator
(test_sn_dynamics).  This test composes all of them: a toy bi-TAI GAN is
trained for several steps side by side — torch mirror (reference semantics:
L2+GDL+intermediate losses, sliding-window SN-GAN, two Adam optimizers,
environments.py:222-228/262-485) against ``TAIEnvironment.train_step`` — from
an identical imported init on identical data, and the G/D loss trajectories
plus the post-training generator outputs must agree.

Semantics replicated from vfi_tpu/train/environments.py (itself the parity-
documented re-expression of src/environments/environments.py):
  * G update first, with the discriminator frozen (u not persisted = the
    jax ``train=False`` pass) and sigma detached from the graph;
  * the D update consumes the *pre-update* generator prediction, detached
    (the reference's single forward per iteration);
  * D's fake pass persists the power-iteration ``u``, and the real pass sees
    the fake pass's updated ``u`` — one u refresh per apply, exactly like the
    vectorized jax discriminator (NOT the reference's per-window refresh,
    whose delta is separately bounded by test_sn_dynamics).

Measured at this size (f32, 6 steps): step-0 losses agree to ~1e-6 rel,
trajectories stay within ~1e-4 rel, and the held-out post-training forward
matches to <1e-4 max-abs.  Tolerances are ~20x the measurement.
"""

import numpy as np
import torch
import torch.nn.functional as TF

import jax

from vfi_tpu.models.fill_in import TAIFillInModel
from vfi_tpu.train.environments import create_training_environment
from vfi_tpu.utils.config import TrainConfig
from vfi_tpu.utils.torch_import import (
    import_discriminator_state_dict,
    import_generator_state_dict,
)

from . import torch_mirror
from .test_grad_parity import _torch_gdl

B, K, T, F_, H, W = 2, 3, 2, 3, 32, 32
GF, KF, KS, FS, LAYERS, NUM_BLOCK = 8, 4, 5, 3, 3, 5
DF, WINDOW, IP = 8, 3, 1
LR, BETA1, ALPHA, BETA = 1e-4, 0.5, 1.0, 0.02
STEPS = 6


class _PersistSNConv(torch_mirror.SNConv2dMirror):
    """On-the-fly SN (sigma detached, like jax's stop_gradient) that stashes
    the refreshed u; u only advances when the caller commits after a full
    apply — matching the flax "sn" collection's once-per-apply update."""

    def forward(self, x):
        w_mat = self.weight.view(self.weight.shape[0], -1)
        sigma, u_new = torch_mirror._max_singular_value(w_mat.detach(), self.u, self.Ip)
        self._pending_u = u_new.detach()
        return TF.conv2d(x, self.weight / sigma, self.bias,
                         stride=self.stride, padding=self.padding)


class _PersistSNLinear(torch_mirror.SNLinearMirror):
    def forward(self, x):
        sigma, u_new = torch_mirror._max_singular_value(
            self.weight.detach(), self.u, self.Ip)
        self._pending_u = u_new.detach()
        return TF.linear(x, self.weight / sigma, self.bias)


def _sn_modules(disc):
    return [m for m in disc.modules() if hasattr(m, "u")]


def _commit_u(disc):
    for m in _sn_modules(disc):
        m.u = m._pending_u


def _window_labels():
    """Reference environments.py:308-323 (fake-video window labels)."""
    ttot = K + T + F_
    nw = ttot - WINDOW + 1
    lab = np.zeros(nw, np.float32)
    for s in range(nw):
        if s + WINDOW <= K or s >= K + T:
            lab[s] = 1.0
    return lab


def _inv(x):
    return (x + 1.0) / 2.0


def test_gan_training_trajectory_matches_torch():
    torch.manual_seed(11)
    gen_t = torch_mirror.TAIFillInModel(
        GF, 1, FS, KS, num_block=NUM_BLOCK, kf_dim=KF, layers=LAYERS)
    gen_t.train(False)
    disc_t = torch_mirror.SNDiscriminator((H, W), 1, WINDOW, DF, Ip=IP)
    for i in (0, 2, 4, 6):
        old = disc_t.conv_layers[i]
        new = _PersistSNConv(old.in_channels, old.out_channels,
                             old.kernel_size[0], old.stride[0],
                             old.padding[0], old.Ip)
        new.load_state_dict(old.state_dict())
        disc_t.conv_layers[i] = new
    old = disc_t.linear_layer
    new = _PersistSNLinear(old.in_features, old.out_features, old.Ip)
    new.load_state_dict(old.state_dict())
    disc_t.linear_layer = new

    # identical init via the production importer path
    g_params, _ = import_generator_state_dict(
        {k: v.detach().numpy() for k, v in gen_t.state_dict().items()},
        "tai", num_block=NUM_BLOCK, layers=LAYERS)
    d_params, d_sn, report = import_discriminator_state_dict(
        {k: v.detach().numpy() for k, v in disc_t.state_dict().items()}, DF)
    assert report.skipped == []

    rng = np.random.RandomState(23)
    batches = [rng.uniform(-1, 1, (B, K + T + F_, 1, H, W)).astype(np.float32)
               for _ in range(STEPS)]
    held_out = rng.uniform(-1, 1, (B, K + F_ + T, 1, H, W)).astype(np.float32)
    lab_fake = _window_labels()
    nw = K + T + F_ - WINDOW + 1

    # ---- torch trajectory ----
    opt_g = torch.optim.Adam(gen_t.parameters(), lr=LR, betas=(BETA1, 0.999))
    opt_d = torch.optim.Adam(disc_t.parameters(), lr=LR, betas=(BETA1, 0.999))
    t_lab = torch.tensor(np.broadcast_to(lab_fake, (B, nw)).copy())
    t_ones = torch.ones(B, nw)
    torch_g_losses, torch_d_losses = [], []
    for batch in batches:
        tb = torch.tensor(batch)
        p, m, f = tb[:, :K], tb[:, K:K + T], tb[:, K + T:]
        out = gen_t(T, p, f)
        pred = out["pred"]
        gt01, pred01 = _inv(m), _inv(pred)
        fwd01, bwd01 = _inv(out["pred_forward"]), _inv(out["pred_backward"])
        recon = (((pred01 - gt01) ** 2).mean() + _torch_gdl(pred01, gt01)
                 + ((fwd01 - gt01) ** 2).mean() + ((bwd01 - gt01) ** 2).mean()
                 + _torch_gdl(fwd01, gt01) + _torch_gdl(bwd01, gt01))
        fake = torch.cat([p, pred, f], dim=1)
        logits = disc_t(fake)  # u NOT committed: the jax train=False pass
        g_gan = TF.binary_cross_entropy_with_logits(logits, t_ones)
        loss_g = ALPHA * recon + BETA * g_gan
        opt_g.zero_grad()
        loss_g.backward()
        opt_g.step()
        torch_g_losses.append(float(loss_g.detach()))

        fake_d = torch.cat([p, pred.detach(), f], dim=1)
        lf = disc_t(fake_d)
        _commit_u(disc_t)  # fake pass persists u; real pass sees it
        lr_ = disc_t(torch.cat([p, m, f], dim=1))
        _commit_u(disc_t)
        loss_d = (TF.binary_cross_entropy_with_logits(lf, t_lab)
                  + TF.binary_cross_entropy_with_logits(lr_, t_ones))
        opt_d.zero_grad()
        loss_d.backward()
        opt_d.step()
        torch_d_losses.append(float(loss_d))

    out_t = gen_t(T, torch.tensor(held_out[:, :K]),
                  torch.tensor(held_out[:, K:K + F_]))["pred"].detach().numpy()

    # ---- vfi_tpu trajectory ----
    model = TAIFillInModel(gf_dim=GF, c_dim=1, feature_size=FS, ks=KS,
                           num_block=NUM_BLOCK, kf_dim=KF, layers=LAYERS)
    cfg = TrainConfig(K=K, T=T, F=F_, lr=LR, beta1=BETA1, alpha=ALPHA,
                      beta=BETA, df_dim=DF, Ip=IP, disc_window_size=WINDOW)
    env = create_training_environment(model, cfg)
    batch0_nhwc = batches[0].transpose(0, 1, 3, 4, 2)
    state = env.init_state(jax.random.PRNGKey(0), batch0_nhwc, K, T, F_)
    state = state.replace(
        g_params=g_params, g_opt=env.g_tx().init(g_params),
        d_params=d_params, d_sn=d_sn, d_opt=env.d_tx().init(d_params))

    jax_g_losses, jax_d_losses = [], []
    for batch in batches:
        state, terms = env.train_step(state, K, T, F_, batch.transpose(0, 1, 3, 4, 2))
        jax_g_losses.append(float(terms["G_loss"]))
        jax_d_losses.append(float(terms["D_fake"]) + float(terms["D_real"]))

    out_j = np.asarray(env.forward_test(
        state.g_params, T,
        held_out[:, :K].transpose(0, 1, 3, 4, 2),
        held_out[:, K:K + F_].transpose(0, 1, 3, 4, 2))["pred"])

    # step 0 is pure forward/loss parity; later steps accumulate f32 drift
    assert abs(torch_g_losses[0] - jax_g_losses[0]) < 1e-5 * abs(torch_g_losses[0]) + 1e-7
    assert abs(torch_d_losses[0] - jax_d_losses[0]) < 1e-5 * abs(torch_d_losses[0]) + 1e-7
    for i in range(STEPS):
        assert abs(torch_g_losses[i] - jax_g_losses[i]) < 2e-3 * abs(torch_g_losses[i]), (
            i, torch_g_losses, jax_g_losses)
        assert abs(torch_d_losses[i] - jax_d_losses[i]) < 2e-3 * abs(torch_d_losses[i]), (
            i, torch_d_losses, jax_d_losses)

    # post-training weights agree: held-out forward through BOTH stacks
    assert np.max(np.abs(out_j.transpose(0, 1, 4, 2, 3) - out_t)) < 1e-3
