"""DIC — deep face SR with iterative landmark collaboration.

Reference: mmedit sr_backbones/dic_net.py:1-476 and
extractors/feedback_hour_glass.py:1-212.  The feedback recurrence
(``last_hidden`` module state in torch) is expressed functionally: the
`num_steps` loop carries the hidden features / hourglass feedback as loop
values inside one forward, so the module stays stateless and jittable.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .blocks import Conv2d, PReLU

__all__ = ["DICNet", "FeedbackHourglass", "reduce_to_five_heatmaps"]


class ConvTranspose2d(nn.Module):
    """Torch-style transposed conv: out = (in-1)*stride - 2*pad + k.

    Implemented as ``conv_general_dilated`` with lhs dilation (identical
    output geometry; the kernel is a fresh learned weight, so the torch
    flip/transpose convention only matters for checkpoint import — see
    ``tools/export_torch_ckpt.py`` which handles it).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class _HGResBlock(nn.Module):
    """Hourglass ResBlock (feedback_hour_glass.py:8-55)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        r = Conv2d(c // 2, 1, name="conv0")(x)
        r = nn.relu(r)
        r = Conv2d(c // 2, 3, name="conv1")(r)
        r = Conv2d(c, 1, name="conv2")(r)
        if x.shape[-1] != c:
            x = Conv2d(c, 1, name="skip")(x)
        return x + r


class _Hourglass(nn.Module):
    """Recursive hourglass (feedback_hour_glass.py:58-95)."""

    depth: int
    mid_channels: int

    @nn.compact
    def __call__(self, x):
        c = self.mid_channels
        up1 = _HGResBlock(c, name="up1")(x)
        pooled = nn.max_pool(x, (2, 2), strides=(2, 2))
        low1 = _HGResBlock(c, name="low1")(pooled)
        if self.depth == 1:
            low2 = _HGResBlock(c, name="low2")(low1)
        else:
            low2 = _Hourglass(self.depth - 1, c, name="low2")(low1)
        low3 = _HGResBlock(c, name="low3")(low2)
        h, w = low3.shape[1:3]
        up2 = resize_bilinear(low3, 2 * h, 2 * w, align_corners=True)
        return up1 + up2


class FeedbackHourglass(nn.Module):
    """Landmark heatmap estimator with feedback (feedback_hour_glass.py:98-160)."""

    mid_channels: int = 256
    num_keypoints: int = 68

    @nn.compact
    def __call__(self, x, last_hidden=None):
        c = self.mid_channels
        f = Conv2d(c // 4, 7, stride=2, name="pre0")(x)
        f = nn.relu(f)
        f = _HGResBlock(c // 2, name="pre1")(f)
        f = nn.max_pool(f, (2, 2), strides=(2, 2))
        f = _HGResBlock(c // 2, name="pre2")(f)
        f = _HGResBlock(c, name="pre3")(f)

        hidden = f if last_hidden is None else last_hidden
        f = Conv2d(2 * c, 1, name="first_conv")(
            jnp.concatenate([f, hidden], -1))
        f = _Hourglass(4, 2 * c, name="hg")(f)

        first, second = f[..., :c], f[..., c:]
        hm = _HGResBlock(c, name="last0")(first)
        hm = nn.relu(Conv2d(c, 1, name="last1")(hm))
        heatmap = Conv2d(self.num_keypoints, 1, name="last2")(hm)
        return heatmap, second


def reduce_to_five_heatmaps(heatmap: jnp.ndarray,
                            detach: bool = False) -> jnp.ndarray:
    """(B, H, W, N) landmark heatmaps -> (B, H, W, 5) face-part heatmaps
    (feedback_hour_glass.py:163-212; channels-last here)."""
    m = jnp.max(heatmap, axis=(1, 2), keepdims=True)
    heatmap = heatmap / jnp.maximum(m, 0.05)
    n = heatmap.shape[-1]
    if n == 5:
        out = heatmap
    elif n == 68:
        out = jnp.stack([
            heatmap[..., 36:42].sum(-1),
            heatmap[..., 42:48].sum(-1),
            heatmap[..., 27:36].sum(-1),
            heatmap[..., 48:68].sum(-1),
            heatmap[..., :27].sum(-1),
        ], axis=-1)
    elif n == 194:
        idx0 = list(range(134, 153)) + list(range(174, 193))
        idx1 = list(range(114, 133)) + list(range(154, 173))
        out = jnp.stack([
            heatmap[..., idx0].sum(-1),
            heatmap[..., idx1].sum(-1),
            heatmap[..., 41:57].sum(-1),
            heatmap[..., 58:113].sum(-1),
            heatmap[..., 0:40].sum(-1),
        ], axis=-1)
    else:
        raise NotImplementedError(f"landmark count {n} not supported")
    return jax.lax.stop_gradient(out) if detach else out


class _FeedbackBlock(nn.Module):
    """Shared up/down projection ladder (dic_net.py:12-121).

    ``custom`` selects the first-step variant (different conv_first, no
    hidden concatenation); ``heatmap`` switches on the fusion block.
    """

    mid_channels: int
    num_blocks: int
    upscale_factor: int
    custom: bool = False
    num_heatmaps: int = 0
    num_fusion_blocks: int = 0
    prelu_init: float = 0.2

    @nn.compact
    def __call__(self, x, hidden=None, heatmap=None):
        c = self.mid_channels
        stride = self.upscale_factor
        k = self.upscale_factor + 4
        pad = 2

        if self.custom:
            x = Conv2d(c, 1, name="conv_first")(x)
            x = PReLU(self.prelu_init, name="conv_first_act")(x)
        else:
            x = jnp.concatenate([x, hidden], -1)
            x = Conv2d(c, 1, name="conv_first")(x)
            x = PReLU(self.prelu_init, name="conv_first_act")(x)

        if self.num_heatmaps:
            x = _FeatureHeatmapFusing(
                c, self.num_heatmaps, self.num_fusion_blocks,
                name="fusion_block")(x, heatmap)

        lr_features = [x]
        hr_features = []
        for idx in range(self.num_blocks):
            lr = jnp.concatenate(lr_features, -1)
            if idx > 0:
                lr = Conv2d(c, 1, name=f"lr_block{idx - 1}")(lr)
                lr = PReLU(self.prelu_init, name=f"lr_act{idx - 1}")(lr)
            hr = ConvTranspose2d(c, k, stride, pad, name=f"up_block{idx}")(lr)
            hr = PReLU(self.prelu_init, name=f"up_act{idx}")(hr)
            hr_features.append(hr)

            hr = jnp.concatenate(hr_features, -1)
            if idx > 0:
                hr = Conv2d(c, 1, name=f"hr_block{idx - 1}")(hr)
                hr = PReLU(self.prelu_init, name=f"hr_act{idx - 1}")(hr)
            # torch Conv2d(c, c, k, stride=upscale, padding=2): pad explicitly,
            # then a VALID strided conv (Conv2d's default pad would be k//2)
            hr_p = jnp.pad(hr, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            lr = _StridedValidConv(c, k, stride, name=f"down_block{idx}")(hr_p)
            lr = PReLU(self.prelu_init, name=f"down_act{idx}")(lr)
            lr_features.append(lr)

        out = jnp.concatenate(lr_features[1:], -1)
        out = Conv2d(c, 1, name="conv_last")(out)
        out = PReLU(self.prelu_init, name="conv_last_act")(out)
        return out


class _StridedValidConv(nn.Module):
    """Strided conv with no implicit padding (caller pads)."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride), padding="VALID",
                       name="conv")(x)


class _FeatureHeatmapFusing(nn.Module):
    """Group-conv heatmap attention (dic_net.py:172-263)."""

    in_channels: int
    num_heatmaps: int
    num_blocks: int

    @nn.compact
    def __call__(self, feature, heatmap):
        nh = self.num_heatmaps
        c = self.in_channels
        rc = c * nh
        f = Conv2d(rc, 1, name="conv_first")(feature)
        f = jax.nn.leaky_relu(f, 0.2)
        for i in range(self.num_blocks):
            r = Conv2d(rc, 3, groups=nh, name=f"body{i}_0")(f)
            r = jax.nn.leaky_relu(r, 0.2)
            r = Conv2d(rc, 3, groups=nh, name=f"body{i}_1")(r)
            f = f + r
        attn = jax.nn.softmax(heatmap, axis=-1)      # (B, H, W, nh)
        b, h, w, _ = f.shape
        f = f.reshape(b, h, w, nh, c) * attn[..., None]
        return f.sum(axis=3)


class DICNet(nn.Module):
    """(B, 3, H, W) face LR -> ([sr_0..sr_3], [heatmap_0..heatmap_3]).

    Reference dic_net.py:332-476.  Input/output NCHW at the API boundary
    (reference parity); 8x upscale to 128x128 faces.
    """

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 6
    hg_mid_channels: int = 256
    hg_num_keypoints: int = 68
    num_steps: int = 4
    upscale_factor: int = 8
    detach_attention: bool = False
    prelu_init: float = 0.2
    num_heatmaps: int = 5
    num_fusion_blocks: int = 7

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        c = self.mid_channels

        inter_res = resize_bilinear(x, 128, 128)

        f = Conv2d(c * 4, 3, name="conv_first")(x)
        f = PReLU(self.prelu_init, name="conv_first_act")(f)
        # PixelShuffle(2)
        b, h, w, _ = f.shape
        f = f.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        f = f.reshape(b, h * 2, w * 2, c)

        first_block = _FeedbackBlock(
            c, self.num_blocks, self.upscale_factor, custom=True,
            name="first_block")
        block = _FeedbackBlock(
            c, self.num_blocks, self.upscale_factor,
            num_heatmaps=self.num_heatmaps,
            num_fusion_blocks=self.num_fusion_blocks, name="block")
        hour_glass = FeedbackHourglass(
            self.hg_mid_channels, self.hg_num_keypoints, name="hour_glass")

        conv_up = ConvTranspose2d(c, 8, 4, 2, name="conv_up")
        conv_up_act = PReLU(self.prelu_init, name="conv_up_act")
        conv_out = Conv2d(self.out_channels, 3, name="conv_out")

        def conv_last(feat):
            return conv_out(conv_up_act(conv_up(feat)))

        sr_outputs, heatmap_outputs = [], []
        hidden = None
        hg_hidden = None
        heatmap = None
        for step in range(self.num_steps):
            if step == 0:
                feat = first_block(f)
            else:
                hm5 = reduce_to_five_heatmaps(heatmap, self.detach_attention)
                feat = block(f, hidden, hm5)
            hidden = feat
            sr = conv_last(feat) + inter_res
            heatmap, hg_hidden = hour_glass(sr, hg_hidden)
            sr_outputs.append(jnp.transpose(sr, (0, 3, 1, 2)))
            heatmap_outputs.append(jnp.transpose(heatmap, (0, 3, 1, 2)))

        return sr_outputs, heatmap_outputs
