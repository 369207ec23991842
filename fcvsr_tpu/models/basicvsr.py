"""BasicVSR backbone (flax, scan-based recurrent propagation).

Rebuilds mmedit ``BasicVSRNet`` (mmedit/models/backbones/sr_backbones/
basicvsr_net.py:15-184): SPyNet flow, backward then forward recurrent
propagation with 30 residual blocks each, pixel-shuffle upsampling with a
x4 bilinear base.  TPU-first: the temporal loops are ``nn.scan`` over the
frame axis — one compiled step regardless of clip length, with the hidden
feature as carry (the reference's Python loop re-traces per length).

The mmedit flavours of ResidualBlockNoBN / PixelShufflePack used by the zoo
differ from the CVSR_train ones (plain ReLU residual blocks, no CA;
default-init upsample conv) and are defined here as ``MMResidualBlock`` etc.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops.warp import flow_warp
from .blocks import Conv2d, pixel_shuffle
from .spynet import SpyNet

__all__ = ["BasicVSRNet", "MMResidualBlock", "MMResidualBlocksWithInputConv",
           "MMPixelShufflePack"]


class MMResidualBlock(nn.Module):
    """mmedit ResidualBlockNoBN: conv-ReLU-conv residual, init scale 0.1."""

    mid_channels: int = 64

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.mid_channels, 3, init_scale=0.1, name="conv1")(x)
        out = nn.relu(out)
        out = Conv2d(self.mid_channels, 3, init_scale=0.1, name="conv2")(out)
        return x + out


class MMResidualBlocksWithInputConv(nn.Module):
    out_channels: int = 64
    num_blocks: int = 30

    @nn.compact
    def __call__(self, x):
        y = jax.nn.leaky_relu(Conv2d(self.out_channels, 3, name="input_conv")(x), 0.1)
        for i in range(self.num_blocks):
            y = MMResidualBlock(self.out_channels, name=f"block{i}")(y)
        return y


class MMPixelShufflePack(nn.Module):
    out_channels: int
    scale_factor: int = 2
    upsample_kernel: int = 3

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.out_channels * self.scale_factor ** 2,
                   self.upsample_kernel, name="upsample_conv")(x)
        return pixel_shuffle(y, self.scale_factor)


class _PropStep(nn.Module):
    """One recurrent step: optionally warp the carried feature, concat the
    current frame, run the residual trunk."""

    mid_channels: int
    num_blocks: int

    @nn.compact
    def __call__(self, feat_prop, inputs):
        lr, flow, has_flow = inputs
        warped = flow_warp(feat_prop, flow)
        feat_prop = jnp.where(has_flow, warped, feat_prop)
        feat_prop = MMResidualBlocksWithInputConv(
            self.mid_channels, self.num_blocks, name="resblocks"
        )(jnp.concatenate([lr, feat_prop], -1))
        return feat_prop, feat_prop


def _scan_propagate(step_module, feat0, lrs_t, flows_t, has_flow_t, name):
    scan = nn.scan(
        _PropStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )
    return scan(step_module.mid_channels, step_module.num_blocks, name=name)(
        feat0, (lrs_t, flows_t, has_flow_t)
    )


class BasicVSRNet(nn.Module):
    """(B, T, C=3, H, W) -> (B, T, 3, 4H, 4W); H, W multiples of 32 advised."""

    mid_channels: int = 64
    num_blocks: int = 30

    @nn.compact
    def __call__(self, lrs):
        b, t, c, h, w = lrs.shape
        x = jnp.transpose(lrs, (0, 1, 3, 4, 2))  # (B, T, H, W, C)

        # flows between adjacent frames (both directions) via shared SPyNet
        spynet = SpyNet(name="spynet")
        ref = x[:, :-1].reshape(b * (t - 1), h, w, c)
        supp = x[:, 1:].reshape(b * (t - 1), h, w, c)
        flows_backward = spynet(ref, supp).reshape(b, t - 1, h, w, 2)
        flows_forward = spynet(supp, ref).reshape(b, t - 1, h, w, 2)

        xs_t = jnp.moveaxis(x, 1, 0)  # (T, B, H, W, C)
        zeros_flow = jnp.zeros((1, b, h, w, 2), x.dtype)

        # backward pass: frames t-1..0, flow i used when stepping from i+1 -> i
        bwd_lrs = xs_t[::-1]
        bwd_flows = jnp.concatenate(
            [zeros_flow, jnp.moveaxis(flows_backward, 1, 0)[::-1]], 0)
        has_flow_b = jnp.arange(t) > 0
        feat0 = jnp.zeros((b, h, w, self.mid_channels), x.dtype)
        step_b = _PropStep(self.mid_channels, self.num_blocks)
        _, outs_b = _scan_propagate(step_b, feat0, bwd_lrs, bwd_flows,
                                    has_flow_b, name="backward")
        outs_b = outs_b[::-1]  # (T, B, H, W, mid)

        # forward pass
        fwd_flows = jnp.concatenate(
            [zeros_flow, jnp.moveaxis(flows_forward, 1, 0)], 0)
        _, outs_f = _scan_propagate(step_b, feat0, xs_t, fwd_flows,
                                    has_flow_b, name="forward")

        # per-frame upsampling (vmapped over time via reshape to batch)
        fusion = Conv2d(self.mid_channels, 1, name="fusion")
        up1 = MMPixelShufflePack(self.mid_channels, 2, 3, name="upsample1")
        up2 = MMPixelShufflePack(64, 2, 3, name="upsample2")
        conv_hr = Conv2d(64, 3, name="conv_hr")
        conv_last = Conv2d(3, 3, name="conv_last")

        feats = jnp.concatenate([outs_b, outs_f], -1)  # (T, B, H, W, 2*mid)
        feats = feats.reshape(t * b, h, w, 2 * self.mid_channels)
        out = jax.nn.leaky_relu(fusion(feats), 0.1)
        out = jax.nn.leaky_relu(up1(out), 0.1)
        out = jax.nn.leaky_relu(up2(out), 0.1)
        out = jax.nn.leaky_relu(conv_hr(out), 0.1)
        out = conv_last(out)
        base = resize_bilinear(
            xs_t.reshape(t * b, h, w, c), 4 * h, 4 * w)
        out = out + base
        out = out.reshape(t, b, 4 * h, 4 * w, c)
        return jnp.transpose(out, (1, 0, 4, 2, 3))
