"""SIDECVSR — coding-prior guided compressed VSR (flax).

Rebuilds the reference legacy family's representative model
(CVSR_train/arch/SIDECVSR_J_L_fast_3x3.py:317-440): HEVC side information
(motion vectors, residue, partition map, unfiltered prediction) conditions
the feature extractor through SFT layers; MV-guided local patch attention
aligns neighbour features at three pyramid scales; a cross-scale SCNet
(width-4 blocks, no context block) reconstructs.

Quirks preserved: the STN motion scaling ``(mv / size * 2) * 32`` with
clamped normalised grid (SIDECVSR_J_L_fast_3x3.py:22-32), attention applied
as a *mean* (not sum) over the 3x3 patch taps, and the shared tsa_fusion /
fea_fusion convs across pyramid levels.  Returns (sr, L1_features) — the
second output feeds the reference's incremental sliding-window cache.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import downsample2x_bilinear, resize_bilinear, upsample2x_bilinear
from ..ops.warp import grid_sample_bilinear
from .blocks import Conv2d, pixel_shuffle

__all__ = ["SIDECVSR"]


def _stn_warp(x, u, v):
    """Reference STN (SIDECVSR_J_L_fast_3x3.py:16-32): normalised grid +
    (mv/size*2)*32, clamped to [-1,1], border padding, align_corners=True.
    x: (B, H, W, C); u, v: (B, H, W)."""
    b, h, w, c = x.shape
    gx = jnp.linspace(-1.0, 1.0, w)
    gy = jnp.linspace(-1.0, 1.0, h)
    mx, my = jnp.meshgrid(gx, gy)
    nx = jnp.clip(mx[None] + (u / w * 2) * 32, -1, 1)
    ny = jnp.clip(my[None] + (v / h * 2) * 32, -1, 1)
    px = ((nx + 1) / 2 * (w - 1)).reshape(b, h * w)
    py = ((ny + 1) / 2 * (h - 1)).reshape(b, h * w)
    return grid_sample_bilinear(x, px, py, "border").reshape(b, h, w, c)


def _unfold3(x):
    """3x3 patch features: (B, H, W, C) -> (B, H, W, C*9), torch unfold
    channel order (c, ky, kx)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    stacked = jnp.stack(taps, axis=-1)  # (B, H, W, C, 9)
    return stacked.reshape(b, h, w, c * 9), stacked


class MVLocalAttn(nn.Module):
    """MV-guided local patch attention (SIDECVSR_J_L_fast_3x3.py:35-66)."""

    nf: int = 64

    @nn.compact
    def __call__(self, nbh_fea, cen_fea, mv):
        b, h, w, c = cen_fea.shape
        nbh_p_flat, _ = _unfold3(nbh_fea)
        cen_p_flat, _ = _unfold3(cen_fea)
        aligned = _stn_warp(nbh_p_flat, mv[..., 0], mv[..., 1])
        fuse = jnp.concatenate([aligned, cen_p_flat], -1)
        attn = Conv2d(2 * self.nf, 1, name="kp0")(fuse)
        attn = jax.nn.leaky_relu(attn, 0.1)
        attn = Conv2d(9, 1, name="kp1")(attn)
        attn = jax.nn.softmax(attn, axis=-1)
        al = aligned.reshape(b, h, w, c, 9)
        return jnp.mean(al * attn[:, :, :, None, :], axis=-1)


class SFTLayer(nn.Module):
    nf: int = 64

    @nn.compact
    def __call__(self, feas, side):
        x_in = jnp.concatenate([feas, side], -1)
        scale = Conv2d(self.nf, 1, name="scale1")(
            jax.nn.leaky_relu(Conv2d(self.nf, 1, name="scale0")(x_in), 0.1))
        shift = Conv2d(self.nf, 1, name="shift1")(
            jax.nn.leaky_relu(Conv2d(self.nf, 1, name="shift0")(x_in), 0.1))
        return feas * (scale + 1) + shift


class ResBlockSFT(nn.Module):
    nf: int = 64

    @nn.compact
    def __call__(self, feas, side):
        fea = SFTLayer(self.nf, name="sft0")(feas, side)
        fea = nn.relu(Conv2d(self.nf, 3, name="conv0")(fea))
        fea = SFTLayer(self.nf, name="sft1")(fea, side)
        fea = Conv2d(self.nf, 3, name="conv1")(fea)
        return feas + fea


class _WideBlock(nn.Module):
    """Width-4 cross-scale block (SIDECVSR flavour, no context block)."""

    nf: int
    width_multiplier: int = 4

    @nn.compact
    def __call__(self, x_list):
        b0 = Conv2d(self.nf * self.width_multiplier, 3, init_scale=0.1, name="body0")
        b1 = Conv2d(self.nf, 3, init_scale=0.1, name="body1")
        down = Conv2d(self.nf, 1, init_scale=0.1, name="down")
        up = Conv2d(self.nf, 1, init_scale=0.1, name="up")

        def body(x):
            return b1(jax.nn.leaky_relu(b0(x), 0.1))

        res = [body(x) for x in x_list]
        down_res = [res[0]] + [downsample2x_bilinear(down(r)) for r in res[:-1]]
        up_res = [upsample2x_bilinear(up(r)) for r in res[1:]] + [res[-1]]
        return [x + r + d + u for x, r, d, u in zip(x_list, res, down_res, up_res)]


class _SCNetWide(nn.Module):
    nf: int
    groups: int = 4

    @nn.compact
    def __call__(self, x_list):
        res = list(x_list)
        for g in range(self.groups):
            inner = res
            for i in range(3):
                inner = _WideBlock(self.nf, name=f"g{g}_block{i}")(inner)
            conv = Conv2d(self.nf, 3, name=f"g{g}_conv")
            res = [x + conv(r) for x, r in zip(res, inner)]
        return [x + r for x, r in zip(x_list, res)]


class SIDECVSR(nn.Module):
    """x: (B, 7, 1, H, W); mvs: (B, 7, 2, H, W); pms/rms/ufs: (B, 7, 1, H, W).
    Returns (sr (B, 1, 4H, 4W), L1 features (B*7, H, W, nf))."""

    nf: int = 64
    nframes: int = 7
    sc_groups: int = 4

    @nn.compact
    def __call__(self, x, mvs, pms, rms, ufs):
        b, n, c, h, w = x.shape
        nf = self.nf
        center = self.nframes // 2
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        xs = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(b * n, h, w, c)
        x_center = jnp.transpose(x[:, center], (0, 2, 3, 1))

        l1 = lrelu(Conv2d(nf, 3, name="conv_first")(xs))
        sides = jnp.concatenate(
            [jnp.transpose(v, (0, 1, 3, 4, 2)).reshape(b * n, h, w, 1)
             for v in (rms, pms, ufs)], -1)
        side_fea = sides
        for i in range(4):
            side_fea = lrelu(Conv2d(nf // 2, 3, name=f"side{i}")(side_fea))
        for i in range(7):
            l1 = ResBlockSFT(nf, name=f"sft_rb{i}")(l1, side_fea)

        l2 = downsample2x_bilinear(l1)
        l3 = downsample2x_bilinear(l2)
        pyr = [l1, l2, l3]

        mv_attn = MVLocalAttn(nf, name="mv_patch_attn")
        fuse_q = Conv2d(nf, 3, name="attn_q")
        fuse_p = Conv2d(nf, 3, name="attn_p")
        tsa = Conv2d(nf, 1, name="tsa_fusion")
        mvs_hw = jnp.transpose(mvs, (0, 1, 3, 4, 2))  # (B, N, H, W, 2)

        fused_pyr = []
        for lv in range(3):
            hh, ww = h // (2 ** lv), w // (2 ** lv)
            fea_lv = pyr[lv].reshape(b, n, hh, ww, nf)
            if lv == 0:
                mv_lv = mvs_hw
            else:
                flat = mvs_hw.reshape(b * n, h, w, 2)
                mv_lv = resize_bilinear(flat, hh, ww) / (2.0 ** lv)
                mv_lv = mv_lv.reshape(b, n, hh, ww, 2)
            aligned = []
            for i in range(n):
                if i == center:
                    aligned.append(fea_lv[:, i])
                else:
                    aligned.append(mv_attn(fea_lv[:, i], fea_lv[:, center],
                                           mv_lv[:, i]))
            stack = jnp.stack(aligned, 1)  # (B, N, hh, ww, nf)
            # fea_fusion: correlation-sigmoid temporal attention
            emb = fuse_q(stack.reshape(b * n, hh, ww, nf)).reshape(
                b, n, hh, ww, nf)
            emb_ref = fuse_p(emb[:, center])
            cor = jax.nn.sigmoid(jnp.sum(emb * emb_ref[:, None], -1))
            weighted = stack * cor[..., None]
            flat = jnp.transpose(weighted, (0, 2, 3, 1, 4)).reshape(
                b, hh, ww, n * nf)
            fused_pyr.append(lrelu(tsa(flat)))

        out_list = _SCNetWide(nf, self.sc_groups, name="recon_trunk")(fused_pyr)
        out_l3 = lrelu(Conv2d(nf, 1, name="upconv1_L3")(out_list[2]))
        out_l3 = pixel_shuffle(pixel_shuffle(out_l3))
        out_l2 = lrelu(Conv2d(nf, 1, name="upconv1_L2")(out_list[1]))
        out_l2 = pixel_shuffle(out_l2)
        fuse = jnp.concatenate([out_list[0], out_l2, out_l3], -1)
        out = lrelu(pixel_shuffle(Conv2d(nf * 4, 3, name="upconv1")(fuse)))
        out = lrelu(pixel_shuffle(Conv2d(nf * 4, 1, name="upconv2")(out)))
        out = Conv2d(1, 3, name="conv_last")(out)
        base = resize_bilinear(x_center, 4 * h, 4 * w)
        out = out + base
        return jnp.transpose(out, (0, 3, 1, 2)), l1
