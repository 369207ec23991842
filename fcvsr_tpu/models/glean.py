"""GLEAN — generative latent bank SR (reference sr_backbones/glean_styleganv2.py).

RRDB encoder -> latent codes + multi-scale features; frozen StyleGAN2
synthesis layers consume the codes with encoder-feature fusion; a
pixel-shuffle decoder mixes encoder and generator features back to the
output image.  Uses the stylegan2 components from models/stylegan2.py.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import Conv2d
from .blocks_ext import PixelShufflePack
from .sisr import _RRDB
from .stylegan2 import ModulatedStyleConv, ToRGB, gen_channels

__all__ = ["GLEANStyleGANv2", "RRDBFeatureExtractor"]


class RRDBFeatureExtractor(nn.Module):
    """ESRGAN trunk without the upsampler (glean_styleganv2.py:289-331)."""

    mid_channels: int = 64
    num_blocks: int = 23
    growth_channels: int = 32

    @nn.compact
    def __call__(self, x):
        feat = Conv2d(self.mid_channels, 3, name="conv_first")(x)
        body = feat
        for i in range(self.num_blocks):
            body = _RRDB(self.mid_channels, self.growth_channels,
                         name=f"rrdb{i}")(body)
        return feat + Conv2d(self.mid_channels, 3, name="conv_body")(body)


class GLEANStyleGANv2(nn.Module):
    """(B, 3, in_size, in_size) -> (B, 3, out_size, out_size), NCHW boundary.

    Reference forward: glean_styleganv2.py:196-280.
    """

    in_size: int = 32
    out_size: int = 256
    img_channels: int = 3
    rrdb_channels: int = 64
    num_rrdbs: int = 23
    style_channels: int = 512
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, lq):
        x = jnp.transpose(lq, (0, 2, 3, 1))
        b, h, w, _ = x.shape
        if h != self.in_size or w != self.in_size:
            raise ValueError(f"input must be {self.in_size}px, got {h}x{w}")

        ch = gen_channels(self.channel_multiplier)
        log_out = int(math.log2(self.out_size))
        num_styles = log_out * 2 - 2
        encoder_res = [2 ** i
                       for i in range(int(math.log2(self.in_size)), 1, -1)]

        # ----- encoder -----
        feat = RRDBFeatureExtractor(self.rrdb_channels, self.num_rrdbs,
                                    name="rrdb_extractor")(x)
        feat = jax.nn.leaky_relu(
            Conv2d(ch[self.in_size], 3, name="enc_first")(feat), 0.2)
        encoder_features = [feat]
        for i, res in enumerate(encoder_res):
            if res > 4:
                feat = jax.nn.leaky_relu(
                    Conv2d(ch[res // 2], 3, stride=2, name=f"enc{i}_0")(feat),
                    0.2)
                feat = jax.nn.leaky_relu(
                    Conv2d(ch[res // 2], 3, name=f"enc{i}_1")(feat), 0.2)
            else:
                feat = jax.nn.leaky_relu(
                    Conv2d(ch[res], 3, name=f"enc{i}_0")(feat), 0.2)
                feat = feat.reshape(b, -1)
                feat = nn.Dense(num_styles * self.style_channels,
                                name=f"enc{i}_latent")(feat)
            encoder_features.append(feat)
        encoder_features = encoder_features[::-1]

        latent = encoder_features[0].reshape(b, -1, self.style_channels)
        encoder_features = encoder_features[1:]  # high res ... low res? no:
        # list was [rrdb_out(in_size), ..., 8px, latent]; reversed ->
        # [latent, 8px, ..., in_size]; after dropping latent the entries run
        # small -> large, matching generator resolution order.

        # ----- stylegan2 synthesis with fusion -----
        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.tile(const, (b, 1, 1, 1))
        out = ModulatedStyleConv(ch[4], name="g_conv1")(out, latent[:, 0])
        skip = ToRGB(self.img_channels, name="g_to_rgb1")(out, latent[:, 1])

        fusion_index = 0
        generator_features = []
        idx = 1
        for i in range(3, log_out + 1):
            res = 2 ** i
            if out.shape[1] <= self.in_size:
                f = encoder_features[fusion_index]
                out = Conv2d(out.shape[-1], 3, name=f"fusion_out{fusion_index}")(
                    jnp.concatenate([out, f], -1))
                skip = Conv2d(self.img_channels, 3,
                              name=f"fusion_skip{fusion_index}")(
                    jnp.concatenate([skip, f], -1))
                fusion_index += 1

            out = ModulatedStyleConv(ch[res], upsample=True,
                                     name=f"g_conv_up{i}")(out, latent[:, idx])
            out = ModulatedStyleConv(ch[res], name=f"g_conv{i}")(
                out, latent[:, idx + 1])
            skip = ToRGB(self.img_channels, name=f"g_to_rgb{i}")(
                out, latent[:, idx + 2], skip)

            if out.shape[1] > self.in_size:
                generator_features.append(out)
            idx += 2

        # ----- decoder -----
        hr = encoder_features[-1]
        decoder_res = [2 ** i for i in range(int(math.log2(self.in_size)),
                                             log_out + 1)]
        for i, res in enumerate(decoder_res):
            if i > 0:
                hr = jnp.concatenate([hr, generator_features[i - 1]], -1)
            if res < self.out_size:
                hr = PixelShufflePack(ch[res * 2], 2, name=f"dec{i}")(hr)
            else:
                hr = jax.nn.leaky_relu(
                    Conv2d(64, 3, name=f"dec{i}_0")(hr), 0.2)
                hr = Conv2d(self.img_channels, 3, name=f"dec{i}_1")(hr)
        return jnp.transpose(hr, (0, 3, 1, 2))
