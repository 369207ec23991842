"""StyleGAN2 generator/discriminator components (for GLEAN).

Reference: mmedit components/stylegan2/{modules,generator_discriminator}.py
(mmgen port, ~1.5 kLoC).  TPU-native reimplementation in flax, channels-last:

* per-sample weight modulation/demodulation is folded into input scaling +
  per-sample output demod factors (the StyleGAN2 paper's grouped-conv
  equivalence) so convs stay plain NHWC convs on the MXU;
* the upfirdn upsample-blur is a lhs-dilated conv followed by the
  normalized [1,3,3,1] separable blur.  Output sizes match the reference
  (4x4 -> out_size); the sub-pixel phase convention may differ by half a
  pixel from mmgen's upfirdn padding, which only matters for importing
  externally-trained checkpoints (not bundled with the reference either).

Noise injections are fixed per-layer buffers (a ``noises`` variable
collection), matching mmgen's registered ``injected_noise_*`` buffers.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EqualLinear", "ModulatedStyleConv", "ToRGB",
           "StyleGAN2Generator", "StyleGAN2Discriminator", "gen_channels"]


def gen_channels(channel_multiplier: int = 2) -> dict:
    cm = channel_multiplier
    return {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
            128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}


_BLUR_K = np.array([1.0, 3.0, 3.0, 1.0])
_BLUR_2D = np.outer(_BLUR_K, _BLUR_K)
_BLUR_2D = _BLUR_2D / _BLUR_2D.sum()


def _blur(x: jnp.ndarray, pad: tuple, gain: float = 1.0) -> jnp.ndarray:
    """Depthwise 4-tap blur; ``pad`` = (lo, hi) per spatial dim."""
    c = x.shape[-1]
    k = jnp.asarray(_BLUR_2D * gain, x.dtype)
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), (pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class EqualLinear(nn.Module):
    """Equalized-lr linear: runtime weight scale 1/sqrt(fan_in) * lr_mul."""

    features: int
    lr_mul: float = 1.0
    use_bias: bool = True
    activate: bool = False  # fused leaky-relu * sqrt(2)

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("weight",
                       lambda k, s: jax.random.normal(k, s) / self.lr_mul,
                       (fan_in, self.features))
        scale = (1.0 / math.sqrt(fan_in)) * self.lr_mul
        y = x @ (w * scale)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b * self.lr_mul
        if self.activate:
            y = jax.nn.leaky_relu(y, 0.2) * math.sqrt(2.0)
        return y


class _ModulatedConv(nn.Module):
    """Modulated (optionally demodulated / upsampling) conv."""

    features: int
    kernel_size: int = 3
    demodulate: bool = True
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features))
        scale = 1.0 / math.sqrt(cin * k * k)
        s = EqualLinear(cin, name="style")(style) + 1.0  # bias init 0 -> +1

        xs = x * s[:, None, None, :]
        if self.demodulate:
            wmod = (w * scale)[None] * s[:, None, None, :, None]
            demod = jax.lax.rsqrt(
                jnp.sum(wmod * wmod, axis=(1, 2, 3)) + 1e-8)  # (B, out)
        if self.upsample:
            y = jax.lax.conv_general_dilated(
                xs, w * scale, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = _blur(y, (2, 1), gain=4.0)
        else:
            pad = k // 2
            y = jax.lax.conv_general_dilated(
                xs, w * scale, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.demodulate:
            y = y * demod[:, None, None, :]
        return y


class ModulatedStyleConv(nn.Module):
    """Modulated conv + fixed noise injection + fused bias/leaky-relu."""

    features: int
    kernel_size: int = 3
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style, noise=None):
        y = _ModulatedConv(self.features, self.kernel_size,
                           upsample=self.upsample, name="conv")(x, style)
        noise_w = self.param("noise_weight", nn.initializers.zeros, ())
        if noise is None:
            noise = self.variable(
                "noises", "noise",
                lambda: jax.random.normal(
                    jax.random.PRNGKey(int(y.shape[1])),
                    (1, y.shape[1], y.shape[2], 1))).value
        y = y + noise_w * noise
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return jax.nn.leaky_relu(y + bias, 0.2) * math.sqrt(2.0)


class ToRGB(nn.Module):
    """1x1 modulated conv (no demod) to image space, with skip upsample."""

    out_channels: int = 3

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = _ModulatedConv(self.out_channels, 1, demodulate=False,
                           name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = y + bias
        if skip is not None:
            h, w = skip.shape[1:3]
            up = jnp.zeros((skip.shape[0], 2 * h, 2 * w, skip.shape[-1]),
                           skip.dtype)
            up = up.at[:, ::2, ::2].set(skip)
            skip = _blur(up, (2, 1), gain=4.0)
            y = y + skip
        return y


class StyleGAN2Generator(nn.Module):
    """Style mapping + synthesis network.

    ``__call__(z or styles)`` runs full synthesis; GLEAN drives the
    individual submodules instead (same parameter tree).
    """

    out_size: int = 256
    style_channels: int = 512
    num_mlps: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    out_channels: int = 3

    @property
    def channels(self):
        return gen_channels(self.channel_multiplier)

    @property
    def log_size(self):
        return int(math.log2(self.out_size))

    @property
    def num_latents(self):
        return self.log_size * 2 - 2

    @property
    def num_injected_noises(self):
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        ch = self.channels
        self.style_mlp = [
            EqualLinear(self.style_channels, lr_mul=self.lr_mlp,
                        activate=True, name=f"mlp{i}")
            for i in range(self.num_mlps)
        ]
        self.constant_input = self.param(
            "constant_input", nn.initializers.normal(1.0), (1, 4, 4, ch[4]))
        self.conv1 = ModulatedStyleConv(ch[4], name="conv1")
        self.to_rgb1 = ToRGB(self.out_channels, name="to_rgb1")

        convs, to_rgbs = [], []
        in_ch = ch[4]
        for i in range(3, self.log_size + 1):
            out_ch = ch[2 ** i]
            convs.append(ModulatedStyleConv(out_ch, upsample=True,
                                            name=f"conv_up{i}"))
            convs.append(ModulatedStyleConv(out_ch, name=f"conv{i}"))
            to_rgbs.append(ToRGB(self.out_channels, name=f"to_rgb{i}"))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def map_style(self, z):
        x = z / jnp.maximum(
            jnp.sqrt(jnp.mean(z * z, axis=-1, keepdims=True)), 1e-8)
        for layer in self.style_mlp:
            x = layer(x)
        return x

    def __call__(self, z, input_is_latent: bool = False):
        """z: (B, style_channels) -> (B, out_size, out_size, out_channels)."""
        latent = z if input_is_latent else self.map_style(z)
        latent = jnp.repeat(latent[:, None], self.num_latents, axis=1)

        out = jnp.tile(self.constant_input, (z.shape[0], 1, 1, 1))
        out = self.conv1(out, latent[:, 0])
        skip = self.to_rgb1(out, latent[:, 1])

        idx = 1
        for up_conv, conv, to_rgb in zip(self.convs[::2], self.convs[1::2],
                                         self.to_rgbs):
            out = up_conv(out, latent[:, idx])
            out = conv(out, latent[:, idx + 1])
            skip = to_rgb(out, latent[:, idx + 2], skip)
            idx += 2
        return skip


class StyleGAN2Discriminator(nn.Module):
    """Residual discriminator with minibatch stddev (mmgen layout)."""

    in_size: int = 256
    channel_multiplier: int = 2
    in_channels: int = 3
    mbstd_group: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, in_size, in_size, C) -> (B, 1) logits."""
        ch = gen_channels(self.channel_multiplier)
        log_size = int(math.log2(self.in_size))

        def econv(y, feats, k, name, down=False):
            w = self.param(f"{name}_w", nn.initializers.normal(1.0),
                           (k, k, y.shape[-1], feats))
            scale = 1.0 / math.sqrt(y.shape[-1] * k * k)
            if down:
                # blur pad p = (blur_len - factor) + (k - 1), split hi/lo —
                # keeps the stride-2 conv output at exactly in/2 (mmgen
                # ConvDownLayer arithmetic)
                p = 2 + (k - 1)
                y = _blur(y, ((p + 1) // 2, p // 2))
                out = jax.lax.conv_general_dilated(
                    y, w * scale, (2, 2), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                pad = k // 2
                out = jax.lax.conv_general_dilated(
                    y, w * scale, (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            b = self.param(f"{name}_b", nn.initializers.zeros, (feats,))
            return jax.nn.leaky_relu(out + b, 0.2) * math.sqrt(2.0)

        y = econv(x, ch[self.in_size], 1, "from_rgb")
        for i in range(log_size, 2, -1):
            out_ch = ch[2 ** (i - 1)]
            skip_w = self.param(f"skip{i}_w", nn.initializers.normal(1.0),
                                (1, 1, y.shape[-1], out_ch))
            skip_scale = 1.0 / math.sqrt(y.shape[-1])
            skip = _blur(y, (1, 1))  # p = (4-2) + (1-1) = 2 -> (1, 1)
            skip = jax.lax.conv_general_dilated(
                skip, skip_w * skip_scale, (2, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = econv(y, ch[2 ** i], 3, f"conv{i}_1")
            y = econv(y, out_ch, 3, f"conv{i}_2", down=True)
            y = (y + skip) / math.sqrt(2.0)

        # minibatch stddev
        b, h, w, c = y.shape
        g = min(self.mbstd_group, b)
        g = b // (b // g)  # largest divisor <= group
        grp = y.reshape(g, b // g, h, w, c)
        std = jnp.sqrt(grp.var(axis=0) + 1e-8).mean(
            axis=(1, 2, 3), keepdims=True)
        std = jnp.tile(std, (g, h, w, 1))
        y = jnp.concatenate([y, std], axis=-1)

        y = econv(y, ch[4], 3, "final_conv")
        y = y.reshape(b, -1)
        y = EqualLinear(ch[4], activate=True, name="final_linear1")(y)
        return EqualLinear(1, name="final_linear2")(y)
