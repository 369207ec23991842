"""Independent torch implementation of the FCVSR forward semantics.

This is a *test oracle*: a from-scratch torch expression of the reference
model's math (derived from studying /root/reference/CVSR_train/arch/
CVSR_freq.py), with state_dict keys matching the reference checkpoints.  It
exists to validate (a) the fcvsr_tpu JAX model reproduces the exact forward
pass given identical weights, and (b) the torch->flax checkpoint converter.

All reference quirks are reproduced: SAC uses kernel1 for both passes, the
forward correlation feature conditions both offset directions, the CorrBlock
raw-memory reshape, identity flows are zero, and DivEnh's conv is dead weight.
"""

import math

import numpy as np
import torch
import torch.fft as tfft
import torch.nn as nn
import torch.nn.functional as F


def flow_warp_t(x, flow):
    n, c, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()
    gf = grid[None] + flow
    gfx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
    gfy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack((gfx, gfy), 3), mode="bilinear",
                         padding_mode="zeros", align_corners=True)


def sac_t(feat, k1, k2, ksize):
    n, c, h, w = feat.shape
    pad = (ksize - 1) // 2
    t = F.pad(feat, (0, 0, pad, pad), mode="replicate")
    t = t.unfold(2, ksize, 1).permute(0, 2, 3, 1, 4).reshape(n, h, w, c, ksize)
    kv = k1.permute(0, 2, 3, 1).reshape(n, h, w, c, ksize)
    t = (t * kv).sum(-1).permute(0, 3, 1, 2)
    t = F.pad(t, (pad, pad, 0, 0), mode="replicate")
    t = t.unfold(3, ksize, 1).permute(0, 2, 3, 1, 4).reshape(n, h, w, c, ksize)
    t = (t * kv).sum(-1).permute(0, 3, 1, 2)  # kernel1 twice (reference bug)
    return t


def iac_t(feat_in, pred_k, offsets, ac_num, c, k):
    chunks = torch.split(pred_k[:, : ac_num * c * k * 2], c * k * 2, dim=1)
    feat = feat_in
    for i in range(ac_num):
        k1, k2 = torch.split(chunks[i], c * k, dim=1)
        warped = flow_warp_t(feat, offsets[i].permute(0, 2, 3, 1))
        feat = sac_t(warped, k1, k2, k) + feat_in
        feat = F.leaky_relu(feat, 0.1)
    return feat


def corr_feature_t(f1, f2, radius=4):
    b, c, h, w = f1.shape
    corr = (f1.reshape(b, c, h * w) * f2.reshape(b, c, h * w)) / math.sqrt(c)
    corr = corr.reshape(b * h * w, 1, c // 2, 2)
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    coords = torch.stack([gx, gy], -1).float()[None].expand(b, h, w, 2)
    coords = coords.reshape(b * h * w, 1, 1, 2)
    r = radius
    dr = torch.linspace(-r, r, 2 * r + 1)
    delta = torch.stack(torch.meshgrid(dr, dr, indexing="ij"), -1)
    lvl = coords + delta.reshape(1, 2 * r + 1, 2 * r + 1, 2)
    hh, ww = corr.shape[-2:]
    xg = 2 * lvl[..., 0] / (ww - 1) - 1
    yg = 2 * lvl[..., 1] / (hh - 1) - 1
    out = F.grid_sample(corr, torch.stack([xg, yg], -1), align_corners=True)
    return out.reshape(b, h, w, -1).permute(0, 3, 1, 2)


class CALayerT(nn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        self.conv_du = nn.Sequential(
            nn.Conv2d(c, c // reduction, 1, bias=False), nn.ReLU(),
            nn.Conv2d(c // reduction, c, 1, bias=False), nn.Sigmoid())

    def forward(self, x):
        return x * self.conv_du(x.mean((2, 3), keepdim=True))


class ConvBlkT(nn.Module):
    def __init__(self, dim, index):
        super().__init__()
        k = 2 * index + 1
        self.conv1 = nn.Conv2d(dim, dim, k, padding=k // 2, bias=False)
        self.conv2 = nn.Conv2d(dim, dim, k, padding=k // 2, bias=False)
        self.relu = nn.PReLU()
        self.CA = CALayerT(dim, 1)

    def forward(self, x):
        out = self.conv2(self.relu(self.conv1(x)))
        return self.CA(out) + out


class MGAAT(nn.Module):
    def __init__(self, dim, ac_ks=3, ac_num=6):
        super().__init__()
        d = dim
        self.dim, self.ac_ks, self.ac_num = d, ac_ks, ac_num
        self.convfuse = nn.Sequential(
            nn.Conv2d(4 * d, 2 * d, 1, bias=False), nn.ReLU(),
            nn.Conv2d(2 * d, 2 * d, 1, bias=False), nn.ReLU(),
            nn.Conv2d(2 * d, 2 * d, 1, bias=False))
        self.convcorr = nn.Sequential(
            nn.Conv2d(2 * d + 83, d, 1, bias=False), nn.ReLU(),
            nn.Conv2d(d, d, 1, bias=False), nn.ReLU(),
            nn.Conv2d(d, 4, 1, bias=False))
        self.MConvB = nn.ModuleList([ConvBlkT(4, i) for i in range(ac_num)])
        self.convcrt = nn.Sequential(
            nn.Conv2d(2 * d, d, 1, bias=False), nn.ReLU(),
            nn.Conv2d(d, 4, 1, bias=False))
        self.conv_KP = nn.Conv2d(d, d, 3, padding=1)
        self.F = nn.Sequential(nn.Conv2d(d, d, 3, padding=1),
                               nn.Conv2d(d, ac_num * d * ac_ks * 2, 1))
        self.conv3 = nn.Conv2d(2 * d, d, 3, padding=1, bias=False)

    def forward(self, x):
        d = self.dim
        b, _, h, w = x.shape
        x1, x2, x3 = x[:, :d], x[:, d:2 * d], x[:, 2 * d:]

        def pack(v):
            f = tfft.rfft2(v, norm="backward")
            return torch.cat([f.imag, f.real], 1)

        x1f, x2f, x3f = pack(x1), pack(x2), pack(x3)
        off_f = (x1f - x2f) + self.convfuse(torch.cat([x1f, x2f], 1))
        off_b = (x3f - x2f) + self.convfuse(torch.cat([x3f, x2f], 1))
        sim = self.convcrt(x2f)
        corrf = corr_feature_t(x1f, x2f)
        zeros2 = torch.zeros_like(off_f[:, :2])
        off_f = self.convcorr(torch.cat([off_f, corrf, zeros2], 1))
        off_b = self.convcorr(torch.cat([off_b, corrf, zeros2], 1))

        def unpack(v):
            re, im = torch.chunk(v, 2, dim=1)
            return tfft.irfft2(torch.complex(re, im), s=(h, w), norm="backward")

        offs_f = [unpack(self.MConvB[i](off_f) * sim) for i in range(self.ac_num)]
        offs_b = [unpack(self.MConvB[i](off_b) * sim) for i in range(self.ac_num)]

        pred_k = self.F(self.conv_KP(x2))
        af = iac_t(x1, pred_k, offs_f, self.ac_num, d, self.ac_ks)
        ab = iac_t(x3, pred_k, offs_b, self.ac_num, d, self.ac_ks)
        return self.conv3(torch.cat([af, ab], 1)) + x2


class ContextBlockT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv_mask = nn.Conv2d(c, 1, 1, bias=False)
        self.channel_add_conv = nn.Sequential(
            nn.Conv2d(c, c, 1, bias=False), nn.LeakyReLU(0.2),
            nn.Conv2d(c, c, 1, bias=False))

    def forward(self, x):
        b, c, h, w = x.shape
        m = torch.softmax(self.conv_mask(x).reshape(b, 1, h * w), dim=2)
        ctx = torch.matmul(x.reshape(b, 1, c, h * w), m.unsqueeze(3)).reshape(b, c, 1, 1)
        return x + self.channel_add_conv(ctx)


class RCBT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.body = nn.Sequential(
            nn.Conv2d(c, c, 3, padding=1, bias=False), nn.LeakyReLU(0.2),
            nn.Conv2d(c, c, 3, padding=1, bias=False))
        self.gcnet = ContextBlockT(c)

    def forward(self, x):
        return x + F.leaky_relu(self.gcnet(self.body(x)), 0.2)


class BlockRCBT(nn.Module):
    def __init__(self, nf, wm=2):
        super().__init__()
        self.body = nn.Sequential(
            nn.Conv2d(nf, nf * wm, 3, padding=1), nn.LeakyReLU(0.1),
            nn.Conv2d(nf * wm, nf, 3, padding=1), RCBT(nf))
        self.down = nn.Sequential(nn.Conv2d(nf, nf, 1))
        self.up = nn.Sequential(nn.Conv2d(nf, nf, 1))

    def forward(self, xs):
        res = [self.body(x) for x in xs]

        def half(v):
            return F.interpolate(v, scale_factor=0.5, mode="bilinear", align_corners=False)

        def dbl(v):
            return F.interpolate(v, scale_factor=2.0, mode="bilinear", align_corners=False)

        down = [res[0]] + [half(self.down[0](r)) for r in res[:-1]]
        up = [dbl(self.up[0](r)) for r in res[1:]] + [res[-1]]
        return [x + r + d + u for x, r, d, u in zip(xs, res, down, up)]


class SCGroupT(nn.Module):
    def __init__(self, nf, n=3):
        super().__init__()
        self.body = nn.Sequential(*[BlockRCBT(nf) for _ in range(n)])
        self.conv = nn.Conv2d(nf, nf, 3, padding=1)

    def forward(self, xs):
        res = xs
        for blk in self.body:
            res = blk(res)
        return [x + self.conv(r) for x, r in zip(xs, res)]


class SCNetT(nn.Module):
    def __init__(self, nf, groups):
        super().__init__()
        self.body = nn.Sequential(*[SCGroupT(nf) for _ in range(groups)])

    def forward(self, xs):
        res = xs
        for g in self.body:
            res = g(res)
        return [x + r for x, r in zip(xs, res)]


def band_masks_t(k, h, w):
    size = 1024
    length = math.sqrt(2) * size / 2
    interval = length / k
    a0 = size // 2
    d2 = (np.arange(size) - a0).astype(np.float64) ** 2
    dist = np.sqrt(d2[:, None] + d2[None, :])
    bands = []
    for n in range(k):
        pf = np.exp(-(dist ** 2) / (2 * ((interval * (n + 1)) ** 2))).astype(np.float32)
        pf = torch.from_numpy(pf)
        for prev in bands:
            pf = pf - prev
        bands.append(pf)
    m = torch.stack(bands)
    return F.interpolate(m[None], size=(h, w), mode="bicubic",
                         align_corners=False)[0]


class DivEnhT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.Conv = nn.Conv2d(c, c, 3, padding=1)  # dead weight, kept for ckpt shape
        self.a = nn.Parameter(torch.zeros(c, 1, 1))
        self.b = nn.Parameter(torch.ones(c, 1, 1))
        self.ca = CALayerT(c)

    def forward(self, x, x_before_sum=None, ex_before_sum=None):
        if x_before_sum is None:
            out = x - x.mean((2, 3), keepdim=True)
            return self.ca(0.2 * self.a * out * x + self.b * x)
        out = x - x_before_sum + 0.2 * ex_before_sum
        o1 = self.ca(0.2 * self.a * out * x + self.b * x)
        o2 = self.ca(0.2 * self.a * ex_before_sum * x + self.b * x)
        return o1 + o2


class MFFRT(nn.Module):
    def __init__(self, dim, k):
        super().__init__()
        self.k = k
        self.DivEnh_block = nn.ModuleList([DivEnhT(dim) for _ in range(k)])
        self.ca = CALayerT(dim)

    def forward(self, x):
        b, c, h, w = x.shape
        mask = band_masks_t(self.k, h, w)
        fx = tfft.fftn(x, dim=(2, 3))
        fx = tfft.fftshift(fx, dim=(2, 3))
        bands = []
        for i in range(self.k):
            f = tfft.ifftshift(fx * mask[i], dim=(2, 3))
            bands.append(tfft.ifftn(f, dim=(2, 3)).real)
        freq = bands[::-1]
        feats, raw_sum, enh_sum = [], None, None
        for i in range(self.k):
            if i == 0:
                fo = self.DivEnh_block[i](freq[i])
            else:
                fo = self.DivEnh_block[i](freq[i], raw_sum, enh_sum)
            raw_sum = freq[i] if raw_sum is None else raw_sum + freq[i]
            enh_sum = fo if enh_sum is None else enh_sum + fo
            feats.append(fo)
        return self.ca(torch.stack(feats).sum(0)) + x


class FCVSRTorchMirror(nn.Module):
    """GShiftNet / FCVSRNet forward semantics with reference state_dict keys."""

    def __init__(self, n_feats=64, in_channels=1, ac_ks=3, ac_num=6,
                 freq_inv=8, sc_groups=10, up_ksize=3, frames=7):
        super().__init__()
        nf = n_feats
        self.nf, self.frames = nf, frames
        self.feat_extract = nn.Sequential(nn.Conv2d(frames * in_channels, frames * nf, 3, padding=1))
        self.lrelu = nn.PReLU()
        self.MGAA = MGAAT(nf, ac_ks, ac_num)
        self.rconcat1 = nn.Conv2d(nf, nf, 3, stride=2, padding=1)
        self.rconcat2 = nn.Conv2d(nf, nf, 3, stride=2, padding=1)
        self.recorb1 = SCNetT(nf, sc_groups)
        self.recorb0 = nn.Conv2d(nf, nf, 3, padding=1)
        ks = up_ksize
        self.upconv1_L2 = nn.Conv2d(nf, nf, ks, padding=ks // 2)
        self.upconv1_L2_2 = nn.Conv2d(nf + nf // 4, nf, ks, padding=ks // 2)
        self.upconv1_L3 = nn.Conv2d(nf, nf, ks, padding=ks // 2)
        self.upconv1 = nn.Conv2d(nf, nf * 4, ks, padding=ks // 2)
        self.upconv2 = nn.Conv2d(nf, nf * 4, ks, padding=ks // 2)
        self.conv_last0 = nn.Conv2d(nf, in_channels, 3, padding=1)
        self.MFFRblock = MFFRT(nf, freq_inv)
        self.upconv_fuse = nn.Conv2d(nf + nf // 4 + nf // 16, nf, 3, padding=1)

    def forward(self, x):
        b, t, c, h, w = x.shape
        nf = self.nf
        shortcut = x
        feat = self.feat_extract(x.reshape(b, t * c, h, w))
        f1, f2, f3 = feat[:, :3 * nf], feat[:, 3 * nf:4 * nf], feat[:, 4 * nf:]
        g1 = self.MGAA(f1)
        g3 = self.MGAA(f3)
        g2 = self.MGAA(torch.cat([g1, f2, g3], 1))
        dec = self.MFFRblock(g2)
        d1 = self.rconcat1(dec)
        d2 = self.rconcat2(d1)
        l1, l2, l3 = self.recorb1([dec, d1, d2])
        ps = F.pixel_shuffle
        out_l3 = self.lrelu(self.upconv1_L3(l3))
        out_l3_1 = ps(out_l3, 2)
        out_l3_2 = ps(out_l3_1, 2)
        out_l2 = self.lrelu(self.upconv1_L2(l2))
        out_l2 = ps(out_l2 + self.upconv1_L2_2(torch.cat([out_l2, out_l3_1], 1)), 2)
        fuse = torch.cat([l1, out_l2, out_l3_2], 1)
        fuse = self.recorb0(self.upconv_fuse(fuse))
        out = self.lrelu(ps(self.upconv1(fuse), 2))
        out = self.lrelu(ps(self.upconv2(out), 2))
        out = self.conv_last0(out)
        base = F.interpolate(shortcut[:, t // 2], scale_factor=4, mode="bilinear")
        return out + base
