"""PyTorch oracle for the checkpoint importer tests.

An independent, modern-torch re-implementation of the reference MC-Net /
bi-TAI FORWARD SEMANTICS (behavioral refs: src/models/mcnet/mcnet.py,
src/models/tai/tai.py).  Module attribute names and Sequential indices are
chosen so that ``state_dict()`` has exactly the key layout of a real
reference checkpoint — that interchangeability is the point: the importer
tests feed a randomly-initialized mirror state_dict through
``vfi_tpu.utils.torch_import`` and assert that the flax forward reproduces
this torch forward.  CPU-only; the reference's CUDA sepconv is replaced by an
unfold-based einsum implementing the same accumulation
(SeparableConvolution_kernel.cu:40-44).

Torch-0.3 semantics notes baked in:
  * ``nn.Upsample(mode='bilinear')`` in 0.3 had corner-aligned sampling ->
    ``align_corners=True`` here.
  * All tensors NCHW, videos [B,T,C,H,W] in [-1,1], BGR channel order.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF


def inverse_transform(x):
    return (x + 1.0) / 2.0


def bgr2gray(x):
    # BGR-ordered luma weights (src/util/util.py:30-41); x: [B, 3, H, W]
    return (0.1140 * x[:, 0] + 0.5870 * x[:, 1] + 0.2989 * x[:, 2]).unsqueeze(1)


def bgr2gray_batched(x):
    # x: [B, T, 3, H, W]
    return (0.1140 * x[:, :, 0] + 0.5870 * x[:, :, 1] + 0.2989 * x[:, :, 2]).unsqueeze(2)


def sepconv(x_pad, v, h, ks):
    """out[b,c,y,x] = sum_{fy,fx} x_pad[b,c,y+fy,x+fx] * v[b,fy,y,x] * h[b,fx,y,x]."""
    B, C, Hp, Wp = x_pad.shape
    H, W = Hp - ks + 1, Wp - ks + 1
    patches = TF.unfold(x_pad, ks).view(B, C, ks, ks, H, W)
    return torch.einsum("bcijyx,biyx,bjyx->bcyx", patches, v, h)


class MotionEnc(nn.Module):
    def __init__(self, gf):
        super().__init__()
        self.dyn_conv1 = nn.Sequential(nn.Conv2d(1, gf, 5, padding=2), nn.ReLU())
        self.dyn_conv2 = nn.Sequential(nn.MaxPool2d(2), nn.Conv2d(gf, gf * 2, 5, padding=2), nn.ReLU())
        self.dyn_conv3 = nn.Sequential(nn.MaxPool2d(2), nn.Conv2d(gf * 2, gf * 4, 7, padding=3), nn.ReLU())
        self.pool3 = nn.MaxPool2d(2)

    def forward(self, diff):
        r1 = self.dyn_conv1(diff)
        r2 = self.dyn_conv2(r1)
        r3 = self.dyn_conv3(r2)
        return self.pool3(r3), [r1, r2, r3]


class ContentEnc(nn.Module):
    def __init__(self, c_dim, gf):
        super().__init__()
        self.cont_conv1 = nn.Sequential(
            nn.Conv2d(c_dim, gf, 3, padding=1), nn.ReLU(), nn.Conv2d(gf, gf, 3, padding=1), nn.ReLU()
        )
        self.cont_conv2 = nn.Sequential(
            nn.MaxPool2d(2),
            nn.Conv2d(gf, gf * 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(gf * 2, gf * 2, 3, padding=1), nn.ReLU(),
        )
        self.cont_conv3 = nn.Sequential(
            nn.MaxPool2d(2),
            nn.Conv2d(gf * 2, gf * 4, 3, padding=1), nn.ReLU(),
            nn.Conv2d(gf * 4, gf * 4, 3, padding=1), nn.ReLU(),
            nn.Conv2d(gf * 4, gf * 4, 3, padding=1), nn.ReLU(),
        )
        self.pool3 = nn.MaxPool2d(2)

    def forward(self, raw):
        r1 = self.cont_conv1(raw)
        r2 = self.cont_conv2(r1)
        r3 = self.cont_conv3(r2)
        return self.pool3(r3), [r1, r2, r3]


class CombLayers(nn.Module):
    def __init__(self, gf):
        super().__init__()
        self.h_comb = nn.Sequential(
            nn.Conv2d(gf * 8, gf * 4, 3, padding=1), nn.ReLU(),
            nn.Conv2d(gf * 4, gf * 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(gf * 2, gf * 4, 3, padding=1), nn.ReLU(),
        )

    def forward(self, h_dyn, h_cont):
        return self.h_comb(torch.cat((h_dyn, h_cont), dim=1))


class Residual(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.res = nn.Sequential(
            nn.Conv2d(in_dim, out_dim, 3, padding=1), nn.ReLU(), nn.Conv2d(out_dim, out_dim, 3, padding=1)
        )

    def forward(self, a, b):
        return self.res(torch.cat((a, b), dim=1))


def fixed_unpooling(x):
    B, C, H, W = x.shape
    out = x.new_zeros(B, C, 2 * H, 2 * W)
    out[:, :, ::2, ::2] = x
    return out


class DecCnn(nn.Module):
    def __init__(self, c_dim, gf):
        super().__init__()
        self.dec3 = nn.Sequential(
            nn.ConvTranspose2d(gf * 4, gf * 4, 3, padding=1), nn.ReLU(),
            nn.ConvTranspose2d(gf * 4, gf * 4, 3, padding=1), nn.ReLU(),
            nn.ConvTranspose2d(gf * 4, gf * 2, 3, padding=1), nn.ReLU(),
        )
        self.dec2 = nn.Sequential(
            nn.ConvTranspose2d(gf * 2, gf * 2, 3, padding=1), nn.ReLU(),
            nn.ConvTranspose2d(gf * 2, gf, 3, padding=1), nn.ReLU(),
        )
        self.dec1 = nn.Sequential(
            nn.ConvTranspose2d(gf, gf, 3, padding=1), nn.ReLU(),
            nn.ConvTranspose2d(gf, c_dim, 3, padding=1), nn.Tanh(),
        )

    def forward(self, comb, res1, res2, res3):
        x = self.dec3(fixed_unpooling(comb) + res3)
        x = self.dec2(fixed_unpooling(x) + res2)
        return self.dec1(fixed_unpooling(x) + res1)


class ConvLstmCell(nn.Module):
    def __init__(self, feature_size, num_features, forget_bias=1.0):
        super().__init__()
        self.num_features = num_features
        self.forget_bias = forget_bias
        self.conv = nn.Conv2d(num_features * 2, num_features * 4, feature_size, padding=(feature_size - 1) // 2)

    def forward(self, x, state):
        c, h = torch.chunk(state, 2, dim=1)
        i, j, f, o = torch.chunk(self.conv(torch.cat((x, h), dim=1)), 4, dim=1)
        new_c = c * torch.sigmoid(f + self.forget_bias) + torch.sigmoid(i) * torch.tanh(j)
        new_h = torch.tanh(new_c) * torch.sigmoid(o)
        return new_h, torch.cat((new_c, new_h), dim=1)


class MCNet(nn.Module):
    """Warm-up over K-1 difference frames, then T-step autoregressive rollout
    (reference mcnet.py:391-453)."""

    def __init__(self, gf_dim, c_dim, feature_size):
        super().__init__()
        self.c_dim = c_dim
        self.gf_dim = gf_dim
        self.motion_enc = MotionEnc(gf_dim)
        self.conv_lstm_cell = ConvLstmCell(feature_size, 4 * gf_dim)
        self.content_enc = ContentEnc(c_dim, gf_dim)
        self.comb_layers = CombLayers(gf_dim)
        self.residual3 = Residual(gf_dim * 8, gf_dim * 4)
        self.residual2 = Residual(gf_dim * 4, gf_dim * 2)
        self.residual1 = Residual(gf_dim * 2, gf_dim * 1)
        self.dec_cnn = DecCnn(c_dim, gf_dim)

    def forward(self, K, T, diff_in, xt):
        B, _, _, H, W = diff_in.shape
        diff_in = [diff_in[:, t] for t in range(diff_in.shape[1])]
        state = torch.zeros(B, 8 * self.gf_dim, H // 8, W // 8)

        h_dyn = res_m = None
        for t in range(K - 1):
            enc_h, res_m = self.motion_enc(diff_in[t])
            h_dyn, state = self.conv_lstm_cell(enc_h, state)

        pred, dyn, cont, res = [], [], [], []
        for t in range(T):
            if t > 0:
                enc_h, res_m = self.motion_enc(diff_in[-1])
                h_dyn, state = self.conv_lstm_cell(enc_h, state)
            h_cont, res_c = self.content_enc(xt)
            h_tpl = self.comb_layers(h_dyn, h_cont)
            dyn.append(h_dyn)
            cont.append(h_cont)
            r1 = self.residual1(res_m[0], res_c[0])
            r2 = self.residual2(res_m[1], res_c[1])
            r3 = self.residual3(res_m[2], res_c[2])
            res.append([r1, r2, r3])
            x_hat = self.dec_cnn(h_tpl, r1, r2, r3)
            if self.c_dim == 3:
                x_hat_gray = bgr2gray(inverse_transform(x_hat))
                xt_gray = bgr2gray(inverse_transform(xt))
            else:
                x_hat_gray = inverse_transform(x_hat)
                xt_gray = inverse_transform(xt)
            diff_in.append(x_hat_gray - xt_gray)
            xt = x_hat
            pred.append(x_hat)
        return pred, dyn, cont, res


def _conv_block(num_layers, c_in, c_out):
    seq = []
    for i in range(num_layers):
        seq += [nn.Conv2d(c_in if i == 0 else c_out, c_out, 3, padding=1), nn.ReLU()]
    return nn.Sequential(*seq)


def _kernel_head(num_layers, kf_dim, ks):
    seq = []
    for i in range(num_layers):
        c_out = ks if i == num_layers - 1 else kf_dim * 2
        seq += [nn.Conv2d(kf_dim * 2, c_out, 3, padding=1), nn.ReLU()]
    seq += [nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True), nn.Conv2d(ks, ks, 3, padding=1)]
    return nn.Sequential(*seq)


class TAI(nn.Module):
    """The interpolation U-Net + 4 kernel heads (reference tai.py:123-241)."""

    def __init__(self, gf_dim, ks, num_block, layers, kf_dim, rc_loc=4):
        super().__init__()
        self.ks, self.num_block, self.rc_loc = ks, num_block, rc_loc
        conv, pool = [], []
        for i in range(3, num_block):
            c_in = gf_dim * 8 * 2 if i == 3 else kf_dim * (2 ** (i - 1))
            conv.append(_conv_block(layers, c_in, kf_dim * (2**i)))
            pool.append(nn.AvgPool2d(2, 2))
        self.moduleConv = nn.ModuleList(conv)
        self.modulePool = nn.ModuleList(pool)

        deconv, upsample = [], []
        nd = num_block - 1
        for i in range(nd):
            eff_in, eff_out = 2 ** (nd - i + 1), 2 ** (nd - i)
            c_in = kf_dim * (eff_out if i == 0 else eff_in)
            c_out = kf_dim * eff_out
            deconv.append(_conv_block(layers, c_in, c_out))
            up_in = c_out + 1 if i == rc_loc - 1 else c_out
            upsample.append(
                nn.Sequential(
                    nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
                    nn.Conv2d(up_in, c_out, 3, padding=1),
                    nn.ReLU(),
                )
            )
        self.moduleDeconv = nn.ModuleList(deconv)
        self.moduleUpsample = nn.ModuleList(upsample)

        self.moduleVertical1 = _kernel_head(layers, kf_dim, ks)
        self.moduleVertical2 = _kernel_head(layers, kf_dim, ks)
        self.moduleHorizontal1 = _kernel_head(layers, kf_dim, ks)
        self.moduleHorizontal2 = _kernel_head(layers, kf_dim, ks)
        pad = int(math.floor(ks / 2.0))
        self.modulePad = nn.ReplicationPad2d([pad, pad, pad, pad])

    def forward(self, in1, in2, dyn1, dyn2, cont1, cont2, res_list, ratio=0.0):
        x = torch.cat([dyn1, dyn2, cont1, cont2], 1)
        enc = []
        for i in range(self.num_block - 3):
            x = self.moduleConv[i](x)
            enc.append(x)
            x = self.modulePool[i](x)
        for i in range(self.num_block - 1):
            x = self.moduleDeconv[i](x)
            if i == self.rc_loc - 1:
                rc = x.new_full((x.shape[0], 1, x.shape[2], x.shape[3]), ratio)
                x = torch.cat([x, rc], dim=1)
            x = self.moduleUpsample[i](x)
            if i < self.num_block - 3:
                x = x + enc[self.num_block - 3 - i - 1]
            else:
                x = x + res_list[self.num_block - i - 1]
        d1 = sepconv(self.modulePad(in1), self.moduleVertical1(x), self.moduleHorizontal1(x), self.ks)
        d2 = sepconv(self.modulePad(in2), self.moduleVertical2(x), self.moduleHorizontal2(x), self.ks)
        return d1, d2


class TAIFillInModel(nn.Module):
    """Bidirectional MC-Net + TAI blending (reference tai.py:14-120)."""

    def __init__(self, gf_dim, c_dim, feature_size, ks, num_block=5, kf_dim=32, layers=3):
        super().__init__()
        self.c_dim = c_dim
        self.generator = MCNet(gf_dim, c_dim, feature_size)
        self.merge_residual3 = Residual(gf_dim * 8, kf_dim * 4)
        self.merge_residual2 = Residual(gf_dim * 4, kf_dim * 2)
        self.merge_residual1 = Residual(gf_dim * 2, kf_dim * 1)
        self.kernelnet = TAI(gf_dim, ks, num_block, layers, kf_dim)

    def forward(self, T, preceding_frames, following_frames):
        K = preceding_frames.shape[1]
        F = following_frames.shape[1]
        xt = preceding_frames[:, -1]
        xt_F = following_frames[:, 0]

        gp = (
            bgr2gray_batched(inverse_transform(preceding_frames))
            if self.c_dim == 3
            else inverse_transform(preceding_frames)
        )
        diff_in = gp[:, 1:] - gp[:, :-1]
        gf = (
            bgr2gray_batched(inverse_transform(following_frames))
            if self.c_dim == 3
            else inverse_transform(following_frames)
        )
        rev = torch.flip(gf, dims=[1])
        diff_in_F = rev[:, 1:] - rev[:, :-1]

        fp, fd, fc, fr = self.generator(K, T, diff_in, xt)
        bp, bd, bc, br = self.generator(F, T, diff_in_F, xt_F)
        bp, bd, bc, br = bp[::-1], bd[::-1], bc[::-1], br[::-1]

        comb, out1, out2 = [], [], []
        w = np.linspace(0, 1, num=T + 2).tolist()[1:-1]
        for t in range(T):
            merged = [
                self.merge_residual1(fr[t][0], br[t][0]),
                self.merge_residual2(fr[t][1], br[t][1]),
                self.merge_residual3(fr[t][2], br[t][2]),
            ]
            d1, d2 = self.kernelnet(fp[t], bp[t], fd[t], bd[t], fc[t], bc[t], merged, ratio=1 - w[t])
            out1.append(d1)
            out2.append(d2)
            comb.append(0.5 * d1 + 0.5 * d2)

        return {
            "pred": torch.stack(comb, dim=1),
            "pred_forward": torch.stack(fp, dim=1),
            "pred_backward": torch.stack(bp, dim=1),
            "interp_net_outputs_1": torch.stack(out1, dim=1),
            "interp_net_outputs_2": torch.stack(out2, dim=1),
        }


class TWIFillInModel(nn.Module):
    """Bidirectional MC-Net + time-weighted interpolation (reference
    twi.py:15-122; submodules named mcnet/interp_net, no ratio plane)."""

    def __init__(self, gf_dim, c_dim, feature_size, ks, num_block=5, kf_dim=32, layers=3):
        super().__init__()
        self.c_dim = c_dim
        self.mcnet = MCNet(gf_dim, c_dim, feature_size)
        self.merge_residual3 = Residual(gf_dim * 8, kf_dim * 4)
        self.merge_residual2 = Residual(gf_dim * 4, kf_dim * 2)
        self.merge_residual1 = Residual(gf_dim * 2, kf_dim * 1)
        self.interp_net = TAI(gf_dim, ks, num_block, layers, kf_dim, rc_loc=-1)

    def forward(self, T, preceding_frames, following_frames):
        K = preceding_frames.shape[1]
        F = following_frames.shape[1]
        xt = preceding_frames[:, -1]
        xt_F = following_frames[:, 0]
        gp = (
            bgr2gray_batched(inverse_transform(preceding_frames))
            if self.c_dim == 3
            else inverse_transform(preceding_frames)
        )
        diff_in = gp[:, 1:] - gp[:, :-1]
        gf = (
            bgr2gray_batched(inverse_transform(following_frames))
            if self.c_dim == 3
            else inverse_transform(following_frames)
        )
        rev = torch.flip(gf, dims=[1])
        diff_in_F = rev[:, 1:] - rev[:, :-1]

        fp, fd, fc, fr = self.mcnet(K, T, diff_in, xt)
        bp, bd, bc, br = self.mcnet(F, T, diff_in_F, xt_F)
        bp, bd, bc, br = bp[::-1], bd[::-1], bc[::-1], br[::-1]

        comb, out1, out2 = [], [], []
        w = np.linspace(0, 1, num=T + 2).tolist()[1:-1]
        for t in range(T):
            merged = [
                self.merge_residual1(fr[t][0], br[t][0]),
                self.merge_residual2(fr[t][1], br[t][1]),
                self.merge_residual3(fr[t][2], br[t][2]),
            ]
            d1, d2 = self.interp_net(fp[t], bp[t], fd[t], bd[t], fc[t], bc[t], merged)
            out1.append(d1)
            out2.append(d2)
            comb.append((1 - w[t]) * d1 + w[t] * d2)

        return {
            "pred": torch.stack(comb, dim=1),
            "pred_forward": torch.stack(fp, dim=1),
            "pred_backward": torch.stack(bp, dim=1),
            "interp_net_outputs_1": torch.stack(out1, dim=1),
            "interp_net_outputs_2": torch.stack(out2, dim=1),
        }


class MCNetFillInModel(nn.Module):
    """Forward-only fill-in baseline (reference mcnet.py:301-347)."""

    def __init__(self, gf_dim, c_dim, feature_size):
        super().__init__()
        self.c_dim = c_dim
        self.generator = MCNet(gf_dim, c_dim, feature_size)

    def forward(self, T, preceding_frames, following_frames):
        K = preceding_frames.shape[1]
        xt = preceding_frames[:, -1]
        gp = (
            bgr2gray_batched(inverse_transform(preceding_frames))
            if self.c_dim == 3
            else inverse_transform(preceding_frames)
        )
        diff_in = gp[:, 1:] - gp[:, :-1]
        pred, _, _, _ = self.generator(K, T, diff_in, xt)
        return {"pred": torch.stack(pred, dim=1)}


# ---------------------------------------------------------------------------
# Super SloMo mirror (behavioral ref: src/models/slomo/slomo.py:28-371)
# ---------------------------------------------------------------------------


class SloMoEncoder(nn.Module):
    """6-stage UNet encoder; Sequential indices match the reference
    state_dict (enc1 convs at 0/2, enc2..enc6 at 1/3 after MaxPool)."""

    def __init__(self, gf, input_dim, alpha=0.1):
        super().__init__()
        self.enc1 = nn.Sequential(
            nn.Conv2d(input_dim, gf, 7, padding=3), nn.LeakyReLU(alpha),
            nn.Conv2d(gf, gf, 7, padding=3), nn.LeakyReLU(alpha))
        specs = [(gf, gf * 2, 5), (gf * 2, gf * 4, 3), (gf * 4, gf * 8, 3),
                 (gf * 8, gf * 16, 3), (gf * 16, gf * 16, 3)]
        for i, (ci, co, k) in enumerate(specs):
            setattr(self, f"enc{i + 2}", nn.Sequential(
                nn.MaxPool2d(2),
                nn.Conv2d(ci, co, k, padding=k // 2), nn.LeakyReLU(alpha),
                nn.Conv2d(co, co, k, padding=k // 2), nn.LeakyReLU(alpha)))

    def forward(self, x):
        outs = []
        for i in range(6):
            x = getattr(self, f"enc{i + 1}")(x)
            outs.append(x)
        return outs[-1], outs[:-1]


class SloMoDecoder(nn.Module):
    """5-stage UNet decoder (reference ComputeDecoder/RefineDecoder share
    this layout; the activation split differs at the caller)."""

    def __init__(self, gf, out_dim, alpha=0.1):
        super().__init__()
        specs = [(gf * 32, gf * 16, gf * 8), (gf * 16, gf * 8, gf * 4),
                 (gf * 8, gf * 4, gf * 2), (gf * 4, gf * 2, gf), (gf * 2, gf, gf)]
        for i, (ci, cm, co) in enumerate(specs):
            setattr(self, f"dec{i + 1}", nn.Sequential(
                nn.Conv2d(ci, cm, 3, padding=1), nn.LeakyReLU(alpha),
                nn.Conv2d(cm, co, 3, padding=1), nn.LeakyReLU(alpha)))
        self.output = nn.Conv2d(gf, out_dim, 1)

    def forward(self, x, res_in):
        for i in range(5):
            x = TF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            x = getattr(self, f"dec{i + 1}")(torch.cat((x, res_in[-(i + 1)]), 1))
        return self.output(x)


def flow_warp_torch03(img, uv):
    """Reference FlowWarper (slomo.py:265-286): grid normalized as
    2*((g+uv)/S - .5), sampled align_corners=True with zero padding."""
    B, C, H, W = img.shape
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    gx = torch.tensor(gx, dtype=img.dtype, device=img.device)
    gy = torch.tensor(gy, dtype=img.dtype, device=img.device)
    X = 2 * ((gx.unsqueeze(0) + uv[:, 0]) / W - 0.5)
    Y = 2 * ((gy.unsqueeze(0) + uv[:, 1]) / H - 0.5)
    grid = torch.stack((X, Y), dim=3)
    return TF.grid_sample(img, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=True)


class SloMo(nn.Module):
    def __init__(self, gf_dim, c_input_dim):
        super().__init__()
        self.c_input_dim = c_input_dim
        self.compute_enc = SloMoEncoder(gf_dim, 2 * c_input_dim)
        self.compute_dec = SloMoDecoder(gf_dim, 4)
        self.refine_enc = SloMoEncoder(gf_dim, 4 * c_input_dim + 4)
        self.refine_dec = SloMoDecoder(gf_dim, 5)

    def forward(self, T, I0, I1):
        c = self.c_input_dim
        img = torch.cat((I0, I1), 1)
        enc, res = self.compute_enc(img)
        flows = torch.tanh(self.compute_dec(enc, res))
        F_0_1, F_1_0 = flows[:, :2], flows[:, 2:]
        preds, f0s, f1s = [], [], []
        for t_ in range(T):
            t = (t_ + 1) / (T + 1)
            F_t_0 = -(1 - t) * t * F_0_1 + t**2 * F_1_0
            F_t_1 = (1 - t) * (1 - t) * F_0_1 - t * (1 - t) * F_1_0
            g0 = flow_warp_torch03(I0, F_t_0)
            g1 = flow_warp_torch03(I1, F_t_1)
            r_enc, r_res = self.refine_enc(torch.cat((I0, g0, F_t_0, F_t_1, g1, I1), 1))
            r_out = self.refine_dec(r_enc, r_res)
            dF0 = torch.tanh(r_out[:, 0:2])
            dF1 = torch.tanh(r_out[:, 2:4])
            V0 = torch.sigmoid(r_out[:, 4:5])
            F0r = torch.clamp(F_t_0 + dF0, -1, 1)
            F1r = torch.clamp(F_t_1 + dF1, -1, 1)
            V1 = 1 - V0
            w0 = flow_warp_torch03(I0, F0r)
            w1 = flow_warp_torch03(I1, F1r)
            norm = (1 - t) * V0 + t * V1
            preds.append(((1 - t) * V0 * w0 + t * V1 * w1) / norm)
            f0s.append(F_t_0)
            f1s.append(F_t_1)
        # NOTE: unlike the reference (which prepends, yielding reversed time,
        # slomo.py:338-340) we return natural order, matching vfi_tpu.
        return (torch.stack(preds, 1), F_0_1, F_1_0,
                torch.stack(f0s, 1), torch.stack(f1s, 1))


class SloMoFillInModel(nn.Module):
    """Reference wrapper (slomo.py:345-371): uses only I0 = last preceding
    and I1 = first following frame."""

    def __init__(self, gf_dim=32, c_input_dim=3):
        super().__init__()
        self.generator = SloMo(gf_dim, c_input_dim)

    def forward(self, T, preceding_frames, following_frames):
        pred, F01, F10, f0, f1 = self.generator(
            T, preceding_frames[:, -1], following_frames[:, 0])
        return {"pred": pred, "F_0_1": F01, "F_1_0": F10,
                "F_t_0_collector": f0, "F_t_1_collector": f1}


# ---------------------------------------------------------------------------
# SNDiscriminator mirror (behavioral ref: src/discriminators/SNDiscriminator.py)
# ---------------------------------------------------------------------------


def _l2normalize_t(v, eps=1e-12):
    return v / (torch.sqrt(torch.sum(v**2)) + eps)


def _max_singular_value(W, u, Ip):
    """One-or-more-step power iteration (SNDiscriminator.py:10-25)."""
    for _ in range(Ip):
        v = _l2normalize_t(torch.matmul(u, W))
        u = _l2normalize_t(torch.matmul(v, W.t()))
    sigma = torch.sum(u * torch.matmul(v, W.t()))
    return sigma, u


class SNConv2dMirror(nn.Conv2d):
    def __init__(self, c_in, c_out, k, stride, padding, Ip):
        super().__init__(c_in, c_out, k, stride=stride, padding=padding)
        self.Ip = Ip
        self.register_buffer("u", torch.randn(1, c_out))

    def forward(self, x):
        W = self.weight.view(self.weight.shape[0], -1)
        sigma, _ = _max_singular_value(W, self.u, self.Ip)
        return TF.conv2d(x, self.weight / sigma, self.bias,
                         stride=self.stride, padding=self.padding)


class SNLinearMirror(nn.Linear):
    def __init__(self, f_in, f_out, Ip):
        super().__init__(f_in, f_out)
        self.Ip = Ip
        self.register_buffer("u", torch.randn(1, f_out))

    def forward(self, x):
        sigma, _ = _max_singular_value(self.weight, self.u, self.Ip)
        return TF.linear(x, self.weight / sigma, self.bias)


class SNDiscriminator(nn.Module):
    """Sliding-window video discriminator with reference state_dict layout
    (conv_layers.{0,2,4,6} + linear_layer, SNDiscriminator.py:95-159)."""

    def __init__(self, img_size, c_dim, window_size, df_dim, Ip):
        super().__init__()
        self.window_size = window_size
        h, w = img_size
        layers = []
        c_in = c_dim * window_size
        for mult in (1, 2, 4, 8):
            layers += [SNConv2dMirror(c_in, df_dim * mult, 4, 2, 1, Ip), nn.LeakyReLU(0.2)]
            c_in = df_dim * mult
            h, w = (h + 2 - 4) // 2 + 1, (w + 2 - 4) // 2 + 1
        self.conv_layers = nn.Sequential(*layers)
        self.num_sn_linear_in_feats = h * w * df_dim * 8
        self.linear_layer = SNLinearMirror(self.num_sn_linear_in_feats, 1, Ip=1)

    def forward(self, video):
        """video [B, T, C, H, W] -> logits [B, T - window + 1]."""
        B, T, C, H, W = video.shape
        outs = []
        for t in range(T - self.window_size + 1):
            cur = video[:, t : t + self.window_size].contiguous().view(
                B, self.window_size * C, H, W)
            feat = self.conv_layers(cur).view(B, self.num_sn_linear_in_feats)
            outs.append(self.linear_layer(feat))
        return torch.cat(outs, dim=1)
