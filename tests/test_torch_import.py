"""Checkpoint-importer parity gate.

A randomly-initialized torch mirror (tests/torch_mirror.py, state_dict layout
identical to a real reference checkpoint) is converted with
vfi_tpu.utils.torch_import and the flax forward must reproduce the torch
forward to float precision.  This is the offline half of the ±0.1 dB north
star: given any real reference ``model_best.ckpt``, the same code path
produces a vfi_tpu snapshot whose outputs match the PyTorch model.
"""

import os
import sys

import jax
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vfi_tpu.models.fill_in import MCNetFillInModel, TAIFillInModel
from vfi_tpu.utils.torch_import import import_generator_state_dict, model_kind_for_key

from . import torch_mirror

TOL = dict(atol=3e-4, rtol=1e-3)


def _to_nhwc_video(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 1, 3, 4, 2)


def _state_dict_numpy(m: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _video(rng, b, t, c, h, w):
    return rng.uniform(-1, 1, (b, t, c, h, w)).astype(np.float32)


@pytest.mark.parametrize(
    "c_dim,num_block",
    [(1, 5), (3, 4)],  # TAI_gray-like and TAI_color-like configs (create_model.py:27-30)
)
def test_tai_import_forward_parity(c_dim, num_block):
    gf, kf, ks, fs, layers = 8, 4, 5, 3, 3
    K = F = 3
    T = 2
    H = W = 32
    rng = np.random.RandomState(42 + c_dim)

    torch.manual_seed(0)
    tm = torch_mirror.TAIFillInModel(gf, c_dim, fs, ks, num_block=num_block, kf_dim=kf, layers=layers)
    tm.eval()

    p = _video(rng, 2, K, c_dim, H, W)
    f = _video(rng, 2, F, c_dim, H, W)
    with torch.no_grad():
        out_t = tm(T, torch.tensor(p), torch.tensor(f))

    params, report = import_generator_state_dict(
        _state_dict_numpy(tm), "tai", num_block=num_block, layers=layers
    )
    # the only unconverted tensors must be the dead merge_residual1 pair
    assert sorted(report.skipped) == [
        "merge_residual1.res.0.bias",
        "merge_residual1.res.0.weight",
        "merge_residual1.res.2.bias",
        "merge_residual1.res.2.weight",
    ]

    model = TAIFillInModel(
        gf_dim=gf, c_dim=c_dim, feature_size=fs, ks=ks, num_block=num_block, kf_dim=kf, layers=layers
    )
    # structural check: imported tree must exactly match a fresh init's treedef/shapes
    p_j = p.transpose(0, 1, 3, 4, 2)
    f_j = f.transpose(0, 1, 3, 4, 2)
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), T, p_j, f_j))["params"]
    ref_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    got_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [k for k, _ in got_paths] == [k for k, _ in ref_paths]
    for (k, got), (_, want) in zip(got_paths, ref_paths):
        assert got.shape == want.shape, (k, got.shape, want.shape)

    out_j = model.apply({"params": params}, T, p_j, f_j)

    for key in ("pred", "pred_forward", "pred_backward", "interp_net_outputs_1", "interp_net_outputs_2"):
        np.testing.assert_allclose(
            np.asarray(out_j[key]), _to_nhwc_video(out_t[key]), err_msg=key, **TOL
        )


def test_twi_import_forward_parity():
    gf, kf, ks, fs, layers = 8, 4, 5, 3, 3
    K = F = 3
    T = 2
    H = W = 32
    rng = np.random.RandomState(3)

    torch.manual_seed(2)
    tm = torch_mirror.TWIFillInModel(gf, 1, fs, ks, num_block=5, kf_dim=kf, layers=layers)
    tm.eval()

    p = _video(rng, 2, K, 1, H, W)
    f = _video(rng, 2, F, 1, H, W)
    with torch.no_grad():
        out_t = tm(T, torch.tensor(p), torch.tensor(f))

    params, report = import_generator_state_dict(_state_dict_numpy(tm), "twi")
    assert len(report.skipped) == 4  # dead merge_residual1

    from vfi_tpu.models.fill_in import TWIFillInModel

    model = TWIFillInModel(gf_dim=gf, c_dim=1, feature_size=fs, ks=ks, num_block=5, kf_dim=kf, layers=layers)
    out_j = model.apply({"params": params}, T, p.transpose(0, 1, 3, 4, 2), f.transpose(0, 1, 3, 4, 2))
    for key in ("pred", "interp_net_outputs_1", "interp_net_outputs_2"):
        np.testing.assert_allclose(
            np.asarray(out_j[key]), _to_nhwc_video(out_t[key]), err_msg=key, **TOL
        )


def test_mcnet_import_forward_parity():
    gf, fs, c_dim = 8, 3, 1
    K, T = 4, 3
    H = W = 32
    rng = np.random.RandomState(7)

    torch.manual_seed(1)
    tm = torch_mirror.MCNetFillInModel(gf, c_dim, fs)
    tm.eval()

    p = _video(rng, 2, K, c_dim, H, W)
    f = _video(rng, 2, 2, c_dim, H, W)
    with torch.no_grad():
        out_t = tm(T, torch.tensor(p), torch.tensor(f))

    params, report = import_generator_state_dict(_state_dict_numpy(tm), "mcnet")
    assert report.skipped == []

    model = MCNetFillInModel(gf_dim=gf, c_dim=c_dim, feature_size=fs)
    out_j = model.apply({"params": params}, T, p.transpose(0, 1, 3, 4, 2), f.transpose(0, 1, 3, 4, 2))
    np.testing.assert_allclose(np.asarray(out_j["pred"]), _to_nhwc_video(out_t["pred"]), **TOL)


def test_import_cli_roundtrip(tmp_path):
    """torch.save -> cli/import_torch_checkpoint.py -> predict-style snapshot
    load -> forward parity."""
    from cli.import_torch_checkpoint import main as import_main
    from vfi_tpu.train.environments import TrainState
    from vfi_tpu.utils import checkpoint as ckpt

    gf, kf, ks, fs = 8, 4, 5, 3
    torch.manual_seed(5)
    tm = torch_mirror.TAIFillInModel(gf, 1, fs, ks, num_block=5, kf_dim=kf)
    tm.eval()
    src = str(tmp_path / "model_best_ref.ckpt")
    torch.save(
        {
            "updates": 200000,
            "sum_avg_psnr_err": 170.1,
            "sum_avg_ssim_err": 4.5,
            "generator": tm.state_dict(),
            "optimizer_G": {},
        },
        src,
    )

    dest = str(tmp_path / "imported")
    model_key = (
        '{"class": "TAIFillInModel", "args": [], '
        '"kwargs": {"gf_dim": 8, "c_dim": 1, "ks": 5, "num_block": 5, "kf_dim": 4}}'
    )
    import_main([src, "--model_key", model_key, "--dest_dir", dest, "--image_size", "32"])

    # load exactly the way cli/predict.py does
    model = TAIFillInModel(gf_dim=gf, c_dim=1, ks=ks, num_block=5, kf_dim=kf)
    rng = np.random.RandomState(11)
    p = _video(rng, 1, 2, 1, 32, 32)
    f = _video(rng, 1, 2, 1, 32, 32)
    p_j, f_j = p.transpose(0, 1, 3, 4, 2), f.transpose(0, 1, 3, 4, 2)
    template = model.init(jax.random.PRNGKey(0), 2, p_j, f_j)["params"]
    state, counters = ckpt.load_snapshot(
        dest, "model_best.ckpt", TrainState(step=np.zeros((), np.int32), g_params=template, g_opt=None)
    )
    assert int(counters["updates"]) == 200000

    out_j = model.apply({"params": state.g_params}, 2, p_j, f_j)
    with torch.no_grad():
        out_t = tm(2, torch.tensor(p), torch.tensor(f))
    np.testing.assert_allclose(np.asarray(out_j["pred"]), _to_nhwc_video(out_t["pred"]), **TOL)


def test_model_kind_for_key():
    assert model_kind_for_key("TAI_gray") == "tai"
    assert model_kind_for_key("TAIFillInModel") == "tai"
    assert model_kind_for_key("TWI_gray") == "twi"
    assert model_kind_for_key("TimeWeightedInterpolationFillInModel") == "twi"
    assert model_kind_for_key("MCNet_gray") == "mcnet"
    assert model_kind_for_key("bi_SA_gray") == "bidirectional"
    assert model_kind_for_key("SloMoFillInModel_gray") == "slomo"
    with pytest.raises(ValueError):
        model_kind_for_key("SCTSkipConScaledTForward")  # no published checkpoints


def test_flow_warp_torch03_matches_grid_sample():
    """flow_warp(mode="torch03") must reproduce the reference FlowWarper
    (slomo.py:265-286): X = 2*((gx+u)/W - .5) sampled with grid_sample's
    align_corners=True convention, zero padding."""
    import torch.nn.functional as TF

    from vfi_tpu.ops.warp import flow_warp

    rng = np.random.RandomState(0)
    B, H, W, C = 2, 12, 10, 3
    img = rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32)
    uv = rng.uniform(-3, 3, (B, H, W, 2)).astype(np.float32)

    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    X = gx[None] + uv[..., 0]
    Y = gy[None] + uv[..., 1]
    grid = torch.tensor(np.stack([2 * (X / W - 0.5), 2 * (Y / H - 0.5)], -1), dtype=torch.float32)
    timg = torch.tensor(img.transpose(0, 3, 1, 2))
    want = TF.grid_sample(timg, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
    want = want.numpy().transpose(0, 2, 3, 1)

    import jax.numpy as jnp

    got = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(uv), mode="torch03"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_slomo_import_forward_parity():
    """Imported reference SloMo weights + warp_mode='torch03' must reproduce
    the torch forward (flow UNet, per-t synthesis, refine UNet, visibility
    blend — slomo.py:289-342)."""
    from vfi_tpu.models.slomo import SloMoFillInModel as JaxSloMo

    gf, c_dim = 4, 1
    K, T, F_ = 2, 3, 2
    H = W = 32
    rng = np.random.RandomState(11)

    torch.manual_seed(3)
    tm = torch_mirror.SloMoFillInModel(gf_dim=gf, c_input_dim=c_dim)
    tm.eval()

    p = _video(rng, 2, K, c_dim, H, W)
    f = _video(rng, 2, F_, c_dim, H, W)
    with torch.no_grad():
        out_t = tm(T, torch.tensor(p), torch.tensor(f))

    params, report = import_generator_state_dict(_state_dict_numpy(tm), "slomo")
    assert report.skipped == []

    model = JaxSloMo(base_dim=gf, c_dim=c_dim, warp_mode="torch03")
    out_j = model.apply({"params": params}, T, p.transpose(0, 1, 3, 4, 2), f.transpose(0, 1, 3, 4, 2))
    for key in ("pred", "F_0_1", "F_1_0", "F_t_0_collector", "F_t_1_collector"):
        got = np.asarray(out_j[key])
        want = out_t[key].numpy()
        if want.ndim == 5:  # [B,T,C,H,W] -> NHWC video
            want = _to_nhwc_video(out_t[key])
        else:  # [B,C,H,W] -> NHWC image
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, err_msg=key, **TOL)


def test_discriminator_import_forward_parity():
    """Imported reference SNDiscriminator weights + power-iteration u buffers
    must reproduce the torch logits (enables exact GAN training resume)."""
    from vfi_tpu.nn.discriminator import SNDiscriminator as JaxDisc
    from vfi_tpu.utils.torch_import import import_discriminator_state_dict

    df, c_dim, window = 8, 1, 3
    B, T, H, W = 2, 5, 32, 32
    torch.manual_seed(9)
    tm = torch_mirror.SNDiscriminator((H, W), c_dim, window, df, Ip=1)
    tm.eval()

    rng = np.random.RandomState(13)
    video = rng.uniform(-1, 1, (B, T, c_dim, H, W)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(video)).numpy()

    params, sn, report = import_discriminator_state_dict(_state_dict_numpy(tm), df)
    assert report.skipped == []
    assert set(sn) == {"conv0", "conv1", "conv2", "conv3", "head"}

    disc = JaxDisc(window_size=window, df_dim=df, Ip=1)
    got = disc.apply({"params": params, "sn": sn},
                     video.transpose(0, 1, 3, 4, 2), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_import_cli_with_discriminator(tmp_path):
    """A training checkpoint with a discriminator imports d_params/d_sn for
    GAN-training resume."""
    from cli.import_torch_checkpoint import main as import_main
    from vfi_tpu.utils import checkpoint as ckpt

    torch.manual_seed(6)
    gen = torch_mirror.MCNetFillInModel(8, 1, 3)
    disc = torch_mirror.SNDiscriminator((32, 32), 1, 3, 8, Ip=1)
    src = str(tmp_path / "model_latest_ref.ckpt")
    torch.save({"updates": 7, "sum_avg_psnr_err": 1.0, "sum_avg_ssim_err": 1.0,
                "generator": gen.state_dict(), "discriminator": disc.state_dict()}, src)

    dest = str(tmp_path / "imported")
    model_key = '{"class": "MCNetFillInModel", "args": [], "kwargs": {"gf_dim": 8, "c_dim": 1, "feature_size": 3}}'
    import_main([src, "--model_key", model_key, "--dest_dir", dest,
                 "--image_size", "32", "--df_dim", "8",
                 "--snapshot_file_name", "model_latest.ckpt"])

    # restore through a template carrying discriminator fields, the way a
    # resuming trainer would
    import jax

    from vfi_tpu.train.environments import TrainState

    model = MCNetFillInModel(gf_dim=8, c_dim=1, feature_size=3)
    p = np.zeros((1, 2, 32, 32, 1), np.float32)
    g_tpl = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), 2, p, p))["params"]
    g_tpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), g_tpl)

    from vfi_tpu.nn.discriminator import SNDiscriminator as JaxDisc

    d = JaxDisc(window_size=3, df_dim=8, Ip=1)
    d_vars = d.init(jax.random.PRNGKey(1), np.zeros((1, 5, 32, 32, 1), np.float32))
    state, counters = ckpt.load_snapshot(
        dest, "model_latest.ckpt",
        TrainState(step=np.zeros((), np.int32), g_params=g_tpl, g_opt=None,
                   d_params=d_vars["params"], d_sn=d_vars["sn"]))
    assert int(counters["updates"]) == 7
    # imported values must differ from the zero template (real data loaded)
    leaf = np.asarray(jax.tree.leaves(state.d_params)[0])
    assert np.abs(leaf).sum() > 0
