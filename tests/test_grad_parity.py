"""Gradient-parity gate: torch autograd vs jax.grad through the importer.

Forward parity (test_torch_import.py, PARITY_r03.md) proves imported
reference checkpoints *evaluate* identically; this gate extends the evidence
to the TRAINING path: with identical weights and an identical image loss
(L2 + GDL, the generator's non-GAN terms from the reference's
src/environments/environments.py:300-307), the gradient of every parameter
must match torch autograd.  The torch grads ride the same name/layout map as
the weights — legal because every converter in vfi_tpu/utils/torch_import.py
is a fixed permutation (transpose/flip), and permutations commute with
differentiation.

Measured worst-case relative error in f32 at this size: 5e-06 over all 138
parameter tensors (through the custom-VJP sepconv, the ConvLSTM rollout
backward, and the corner-aligned upsample adjoint).  Tolerance is 20x that.
"""

import os
import sys

import jax
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vfi_tpu.models.fill_in import TAIFillInModel
from vfi_tpu.train.losses import gdl_loss, l2_loss
from vfi_tpu.utils.torch_import import import_generator_state_dict

from . import torch_mirror

REL_TOL = 1e-4


def _torch_gdl(pred: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
    """gdl_loss on [B, T, C, H, W] — same interior crop and mean."""
    pw = pred[..., :, :-1] - pred[..., :, 1:]
    ph = pred[..., :-1, :] - pred[..., 1:, :]
    tw = target[..., :, :-1] - target[..., :, 1:]
    th = target[..., :-1, :] - target[..., 1:, :]
    return ((pw - tw).abs()[..., 1:, :] + (ph - th).abs()[..., :, 1:]).mean()


@pytest.mark.parametrize(
    "c_dim,num_block",
    [(1, 5), (3, 4)],  # TAI_gray-like and TAI_color-like configs
)
def test_tai_grad_parity(c_dim, num_block):
    gf, kf, ks, fs, layers = 8, 4, 5, 3, 3
    K = F = 3
    T = 2
    H = W = 32
    rng = np.random.RandomState(7 + c_dim)

    torch.manual_seed(0)
    tm = torch_mirror.TAIFillInModel(
        gf, c_dim, fs, ks, num_block=num_block, kf_dim=kf, layers=layers
    )
    tm.train(False)

    p = rng.uniform(-1, 1, (2, K, c_dim, H, W)).astype(np.float32)
    f = rng.uniform(-1, 1, (2, F, c_dim, H, W)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (2, T, c_dim, H, W)).astype(np.float32)

    out = tm(T, torch.tensor(p), torch.tensor(f))["pred"]
    loss_t = ((out - torch.tensor(tgt)) ** 2).mean() + _torch_gdl(out, torch.tensor(tgt))
    loss_t.backward()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # dead modules (merge_residual1) get no grad from torch; zeros keep the
    # dict key-complete so the importer reports them as skipped, same as sd
    gd = {
        k: (v.grad.detach().numpy() if v.grad is not None else np.zeros_like(v.detach().numpy()))
        for k, v in tm.named_parameters()
    }

    params, _ = import_generator_state_dict(sd, "tai", num_block=num_block, layers=layers)
    grads_torch, _ = import_generator_state_dict(gd, "tai", num_block=num_block, layers=layers)

    model = TAIFillInModel(
        gf_dim=gf, c_dim=c_dim, feature_size=fs, ks=ks,
        num_block=num_block, kf_dim=kf, layers=layers,
    )
    pj, fj, tj = (a.transpose(0, 1, 3, 4, 2) for a in (p, f, tgt))

    def loss_fn(params):
        pred = model.apply({"params": params}, T, pj, fj)["pred"]
        return l2_loss(pred, tj) + gdl_loss(pred, tj)

    loss_j, grads_jax = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5

    _assert_grad_trees_match(grads_jax, grads_torch)


def _assert_grad_trees_match(grads_jax, grads_torch):
    flat_j = jax.tree_util.tree_flatten_with_path(grads_jax)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(grads_torch)[0]
    assert [k for k, _ in flat_j] == [k for k, _ in flat_t]
    for (k, gj), (_, gt) in zip(flat_j, flat_t):
        gj, gt = np.asarray(gj), np.asarray(gt)
        rel = np.max(np.abs(gj - gt)) / (np.max(np.abs(gt)) + 1e-12)
        assert rel < REL_TOL, (jax.tree_util.keystr(k), rel)


def test_adam_step_parity():
    """Closes the training-update chain: with forward and gradients proven
    equal (tests above), the remaining link is the optimizer.  optax.adam at
    the environments' exact hyperparameters (environments.py:83 here,
    torch.optim.Adam(lr, (beta1, 0.999)) in the reference,
    src/environments/environments.py:153) must step identically."""
    import optax

    rng = np.random.RandomState(0)
    w0 = rng.randn(16, 16).astype(np.float32)
    lr, b1 = 1e-3, 0.9
    grads = [rng.randn(16, 16).astype(np.float32) for _ in range(3)]

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    t_opt = torch.optim.Adam([tw], lr=lr, betas=(b1, 0.999))
    for g in grads:
        t_opt.zero_grad()
        tw.grad = torch.tensor(g)
        t_opt.step()

    tx = optax.adam(lr, b1=b1, b2=0.999)
    p = np.asarray(w0)
    import jax.numpy as jnp

    p = jnp.asarray(p)
    st = tx.init(p)
    for g in grads:
        u, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, u)

    np.testing.assert_allclose(np.asarray(p), tw.detach().numpy(), atol=5e-7, rtol=0)


def test_slomo_grad_parity():
    """Gates the flow-warp ADJOINT: ops/warp.py warp_mode='torch03' backward
    vs torch grid_sample's backward (slomo.py:265-286), through the full
    SloMo stack (flow UNet -> per-t synthesis -> refine UNet -> visibility
    blend) with an L1 reconstruction loss.  Measured worst rel err: 2e-06
    over 92 tensors."""
    from vfi_tpu.models.slomo import SloMoFillInModel as JaxSloMo
    from vfi_tpu.train.losses import l1_loss

    gf, c_dim = 4, 1
    K, T, F_ = 2, 3, 2
    H = W = 32
    rng = np.random.RandomState(11)

    torch.manual_seed(3)
    tm = torch_mirror.SloMoFillInModel(gf_dim=gf, c_input_dim=c_dim)
    tm.train(False)

    p = rng.uniform(-1, 1, (2, K, c_dim, H, W)).astype(np.float32)
    f = rng.uniform(-1, 1, (2, F_, c_dim, H, W)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (2, T, c_dim, H, W)).astype(np.float32)

    out = tm(T, torch.tensor(p), torch.tensor(f))["pred"]
    loss_t = (out - torch.tensor(tgt)).abs().mean()
    loss_t.backward()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    gd = {k: v.grad.detach().numpy() for k, v in tm.named_parameters()}

    params, _ = import_generator_state_dict(sd, "slomo")
    grads_torch, _ = import_generator_state_dict(gd, "slomo")

    model = JaxSloMo(base_dim=gf, c_dim=c_dim, warp_mode="torch03")
    pj, fj, tj = (a.transpose(0, 1, 3, 4, 2) for a in (p, f, tgt))

    def loss_fn(params):
        pred = model.apply({"params": params}, T, pj, fj)["pred"]
        return l1_loss(pred, tj)

    loss_j, grads_jax = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    _assert_grad_trees_match(grads_jax, grads_torch)
