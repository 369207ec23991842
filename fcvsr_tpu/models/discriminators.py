"""Discriminators for the GAN restorers.

* ModifiedVGG — the 128x128 SRGAN/ESRGAN discriminator
  (mmedit components/discriminators/modified_vgg.py).
* UNetDiscriminatorWithSpectralNorm — RealBasicVSR's U-Net discriminator
  (components/discriminators/unet_disc.py), spectral norm via
  flax.linen.SpectralNorm (power iteration state in ``batch_stats``).

Both take NHWC input.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

__all__ = ["ModifiedVGG", "UNetDiscriminatorWithSpectralNorm"]


class ModifiedVGG(nn.Module):
    """(B, 128, 128, C) -> (B, 1) logits (modified_vgg.py:10-110)."""

    in_channels: int = 3
    mid_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = self.mid_channels

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train, name=name)(y)

        def down(y, feats, name, use_bn=True):
            # torch Conv2d(k=4, stride=2, padding=1)
            y = nn.Conv(feats, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=name)(y)
            if use_bn:
                y = bn(y, f"{name}_bn")
            return jax.nn.leaky_relu(y, 0.2)

        def same(y, feats, name):
            y = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, name=name)(y)
            return jax.nn.leaky_relu(bn(y, f"{name}_bn"), 0.2)

        y = jax.nn.leaky_relu(
            nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)), name="conv0_0")(x),
            0.2)
        y = down(y, m, "conv0_1")            # 64
        y = same(y, m * 2, "conv1_0")
        y = down(y, m * 2, "conv1_1")        # 32
        y = same(y, m * 4, "conv2_0")
        y = down(y, m * 4, "conv2_1")        # 16
        y = same(y, m * 8, "conv3_0")
        y = down(y, m * 8, "conv3_1")        # 8
        y = same(y, m * 8, "conv4_0")
        y = down(y, m * 8, "conv4_1")        # 4

        y = y.reshape(y.shape[0], -1)
        y = jax.nn.leaky_relu(nn.Dense(100, name="linear1")(y), 0.2)
        return nn.Dense(1, name="linear2")(y)


class UNetDiscriminatorWithSpectralNorm(nn.Module):
    """(B, H, W, C) -> (B, H, W, 1) patch logits (unet_disc.py:11-110)."""

    in_channels: int = 3
    mid_channels: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, img, update_stats: bool = False):
        m = self.mid_channels

        def sn_conv(y, feats, k, stride, name, use_bias=False):
            conv = nn.Conv(feats, (k, k), strides=(stride, stride),
                           padding=((k // 2 - (stride - 1), k // 2 - (stride - 1)),) * 2
                           if k == 4 else ((k // 2, k // 2),) * 2,
                           use_bias=use_bias, name=name)
            return nn.SpectralNorm(conv)(y, update_stats=update_stats)

        lrelu = lambda y: jax.nn.leaky_relu(y, 0.2)

        x0 = lrelu(nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)),
                           name="conv_0")(img))
        x1 = lrelu(sn_conv(x0, m * 2, 4, 2, "conv_1"))
        x2 = lrelu(sn_conv(x1, m * 4, 4, 2, "conv_2"))
        x3 = lrelu(sn_conv(x2, m * 8, 4, 2, "conv_3"))

        def up(y):
            return resize_bilinear(y, y.shape[1] * 2, y.shape[2] * 2)

        x4 = lrelu(sn_conv(up(x3), m * 4, 3, 1, "conv_4"))
        if self.skip_connection:
            x4 = x4 + x2
        x5 = lrelu(sn_conv(up(x4), m * 2, 3, 1, "conv_5"))
        if self.skip_connection:
            x5 = x5 + x1
        x6 = lrelu(sn_conv(up(x5), m, 3, 1, "conv_6"))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(sn_conv(x6, m, 3, 1, "conv_7"))
        out = lrelu(sn_conv(out, m, 3, 1, "conv_8"))
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_9")(out)


class MaxFeature(nn.Module):
    """Max-feature-map conv/linear (components/discriminators/light_cnn.py:
    10-62): produce 2x channels, take the elementwise max of the halves."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    filter_type: str = "conv2d"

    @nn.compact
    def __call__(self, x):
        if self.filter_type == "conv2d":
            k, s = self.kernel_size, self.stride
            pad = 2 if k == 5 else (1 if k == 3 else 0)
            y = nn.Conv(2 * self.out_channels, (k, k), strides=(s, s),
                        padding=((pad, pad), (pad, pad)), name="filter")(x)
        else:
            y = nn.Dense(2 * self.out_channels, name="filter")(x)
        a, b = jnp.split(y, 2, axis=-1)
        return jnp.maximum(a, b)


class LightCNN(nn.Module):
    """LightCNN discriminator / feature net (light_cnn.py:65-110), used to
    train DICGAN.  (B, 128, 128, C) -> (B, 1) logits; ``features_only``
    stops after the conv trunk (LightCNNFeatureLoss's extractor)."""

    in_channels: int = 3

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        def pool(y):  # ceil_mode max pool
            h, w = y.shape[1:3]
            if h % 2 or w % 2:
                y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                            constant_values=-jnp.inf)
            return nn.max_pool(y, (2, 2), strides=(2, 2))

        y = MaxFeature(48, 5, name="mf0")(x)
        y = pool(y)
        y = MaxFeature(48, 1, name="mf1")(y)
        y = MaxFeature(96, 3, name="mf2")(y)
        y = pool(y)
        y = MaxFeature(96, 1, name="mf3")(y)
        y = MaxFeature(192, 3, name="mf4")(y)
        y = pool(y)
        y = MaxFeature(192, 1, name="mf5")(y)
        y = MaxFeature(128, 3, name="mf6")(y)
        y = MaxFeature(128, 1, name="mf7")(y)
        y = MaxFeature(128, 3, name="mf8")(y)
        y = pool(y)
        if features_only:
            return y
        y = y.reshape(y.shape[0], -1)
        y = MaxFeature(256, filter_type="linear", name="fc0")(y)
        y = jax.nn.leaky_relu(y, 0.2)
        return nn.Dense(1, name="fc1")(y)


def light_cnn_feature_loss(model: LightCNN, params, pred, gt,
                           loss_weight: float = 1.0,
                           criterion: str = "l1"):
    """DICGAN feature loss (losses/feature_loss.py:53-95), NHWC images."""
    pf = model.apply(params, pred, features_only=True)
    gf = jax.lax.stop_gradient(model.apply(params, gt, features_only=True))
    if criterion == "l1":
        loss = jnp.abs(pf - gf).mean()
    else:
        loss = ((pf - gf) ** 2).mean()
    return loss * loss_weight
