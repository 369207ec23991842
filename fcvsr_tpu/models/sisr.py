"""Single-image SR backbone zoo (flax, channels-last).

Capability-parity rebuilds of the remaining mmedit sr_backbones consumed by
the reference configs (SURVEY.md §2.7 "backbone zoo"): EDSR, SRCNN,
MSRResNet, RRDBNet, RDN, and the TOFlow video model.  DUF / DIC / LIIF /
TTSR / GLEAN (face-landmark, implicit-field, reference-based and GAN-prior
SR) are outside the FCVSR benchmark surface and intentionally not rebuilt.

All take/return (B, C, H, W) like the reference API.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bicubic, resize_bilinear
from ..ops.warp import flow_warp
from .basicvsr import MMResidualBlock
from .blocks import Conv2d, pixel_shuffle

__all__ = ["EDSR", "SRCNN", "MSRResNet", "RRDBNet", "RDN", "TOFlow"]


def _nchw_in(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _nchw_out(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class EDSR(nn.Module):
    """mmedit edsr.py:41-140: mean-shifted residual trunk + pixel-shuffle."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4
    res_scale: float = 1.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        x = _nchw_in(x)
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        y = x - mean
        y = Conv2d(self.mid_channels, 3, name="conv_first")(y)
        res = y
        for i in range(self.num_blocks):
            out = Conv2d(self.mid_channels, 3, name=f"block{i}_conv1")(res)
            out = nn.relu(out)
            out = Conv2d(self.mid_channels, 3, name=f"block{i}_conv2")(out)
            res = res + out * self.res_scale
        res = Conv2d(self.mid_channels, 3, name="conv_after_body")(res)
        y = y + res
        up = self.upscale_factor
        i = 0
        while up > 1:
            f = 3 if up % 3 == 0 else 2
            y = Conv2d(self.mid_channels * f * f, 3, name=f"up{i}")(y)
            y = pixel_shuffle(y, f)
            up //= f
            i += 1
        y = Conv2d(self.out_channels, 3, name="conv_last")(y)
        return _nchw_out(y + mean)


class SRCNN(nn.Module):
    """mmedit srcnn.py: bicubic upsample + 9-1-5 conv stack."""

    channels: Sequence[int] = (3, 64, 32, 3)
    kernel_sizes: Sequence[int] = (9, 1, 5)
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        y = _nchw_in(x)
        y = resize_bicubic(y, y.shape[1] * self.upscale_factor,
                           y.shape[2] * self.upscale_factor)
        y = nn.relu(Conv2d(self.channels[1], self.kernel_sizes[0], name="conv1")(y))
        y = nn.relu(Conv2d(self.channels[2], self.kernel_sizes[1], name="conv2")(y))
        y = Conv2d(self.channels[3], self.kernel_sizes[2], name="conv3")(y)
        return _nchw_out(y)


class MSRResNet(nn.Module):
    """mmedit sr_resnet.py: modified SRResNet (16 blocks, pixel-shuffle x4)."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        xin = _nchw_in(x)
        y = jax.nn.leaky_relu(Conv2d(self.mid_channels, 3, name="conv_first")(xin), 0.1)
        res = y
        for i in range(self.num_blocks):
            res = MMResidualBlock(self.mid_channels, name=f"block{i}")(res)
        up = self.upscale_factor
        while up > 1:
            f = 3 if up % 3 == 0 else 2
            res = jax.nn.leaky_relu(
                pixel_shuffle(Conv2d(self.mid_channels * f * f, 3,
                                     name=f"up{up}")(res), f), 0.1)
            up //= f
        res = jax.nn.leaky_relu(Conv2d(64, 3, name="conv_hr")(res), 0.1)
        res = Conv2d(self.out_channels, 3, name="conv_last")(res)
        base = resize_bilinear(xin, xin.shape[1] * self.upscale_factor,
                               xin.shape[2] * self.upscale_factor)
        return _nchw_out(res + base)


class _DenseBlock(nn.Module):
    mid_channels: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        feats = x
        outs = []
        for i in range(5):
            inp = jnp.concatenate([feats] + outs, -1)
            o = Conv2d(self.growth if i < 4 else self.mid_channels, 3,
                       init_scale=0.1, name=f"conv{i+1}")(inp)
            if i < 4:
                o = jax.nn.leaky_relu(o, 0.2)
                outs.append(o)
            else:
                return o * 0.2 + x


class _RRDB(nn.Module):
    mid_channels: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        out = _DenseBlock(self.mid_channels, self.growth, name="rdb1")(x)
        out = _DenseBlock(self.mid_channels, self.growth, name="rdb2")(out)
        out = _DenseBlock(self.mid_channels, self.growth, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """mmedit rrdb_net.py:116+ (ESRGAN generator)."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 23
    growth_channels: int = 32
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        y = _nchw_in(x)
        feat = Conv2d(self.mid_channels, 3, name="conv_first")(y)
        body = feat
        for i in range(self.num_blocks):
            body = _RRDB(self.mid_channels, self.growth_channels,
                         name=f"rrdb{i}")(body)
        body = Conv2d(self.mid_channels, 3, name="conv_body")(body)
        feat = feat + body
        for i in range(self.upscale_factor // 2):
            feat = resize_bilinear(feat, feat.shape[1] * 2, feat.shape[2] * 2)
            feat = jax.nn.leaky_relu(
                Conv2d(self.mid_channels, 3, name=f"up{i}")(feat), 0.2)
        feat = jax.nn.leaky_relu(Conv2d(self.mid_channels, 3, name="conv_hr")(feat), 0.2)
        return _nchw_out(Conv2d(self.out_channels, 3, name="conv_last")(feat))


class RDN(nn.Module):
    """mmedit rdn.py: residual dense network (16 RDBs x 8 layers)."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    num_layers: int = 8
    channel_growth: int = 64
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        y = _nchw_in(x)
        sfe1 = Conv2d(self.mid_channels, 3, name="sfe1")(y)
        sfe2 = Conv2d(self.mid_channels, 3, name="sfe2")(sfe1)
        feats = sfe2
        locals_ = []
        for b in range(self.num_blocks):
            inp = feats
            layer_outs = []
            for l in range(self.num_layers):
                cat = jnp.concatenate([inp] + layer_outs, -1)
                o = nn.relu(Conv2d(self.channel_growth, 3,
                                   name=f"rdb{b}_l{l}")(cat))
                layer_outs.append(o)
            lff = Conv2d(self.mid_channels, 1, name=f"rdb{b}_lff")(
                jnp.concatenate([inp] + layer_outs, -1))
            feats = inp + lff
            locals_.append(feats)
        gff = Conv2d(self.mid_channels, 1, name="gff1")(
            jnp.concatenate(locals_, -1))
        gff = Conv2d(self.mid_channels, 3, name="gff2")(gff)
        feats = gff + sfe1
        up = self.upscale_factor
        while up > 1:
            f = 3 if up % 3 == 0 else 2
            feats = pixel_shuffle(
                Conv2d(self.mid_channels * f * f, 3, name=f"up{up}")(feats), f)
            up //= f
        return _nchw_out(Conv2d(self.out_channels, 3, name="output")(feats))


class TOFlow(nn.Module):
    """mmedit tof.py: task-oriented flow VSR — SPyNet flow, warp neighbours to
    centre, fuse with a small conv net.  (B, 7, 3, H, W) -> (B, 3, H, W)
    (TOFlow operates at HR scale after external upsampling)."""

    @nn.compact
    def __call__(self, lrs):
        from .spynet import SpyNet

        b, t, c, h, w = lrs.shape
        x = jnp.transpose(lrs, (0, 1, 3, 4, 2))
        cf = t // 2
        center = x[:, cf]
        spynet = SpyNet(name="spynet")
        warped = []
        for i in range(t):
            if i == cf:
                warped.append(center)
            else:
                flow = spynet(center, x[:, i])
                warped.append(flow_warp(x[:, i], flow))
        y = jnp.concatenate(warped, -1)
        y = nn.relu(Conv2d(64, 9, name="conv_1")(y))
        y = nn.relu(Conv2d(64, 9, name="conv_2")(y))
        y = nn.relu(Conv2d(64, 1, name="conv_3")(y))
        y = Conv2d(3, 1, name="conv_4")(y)
        return _nchw_out(y + center)
