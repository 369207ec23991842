"""TTSR — texture transformer reference-based SR.

Reference: mmedit sr_backbones/ttsr_net.py:1-439 (main net),
extractors/lte.py (VGG19 texture extractor), and
transformers/search_transformer.py (relevance embedding + hard/soft
attention).

TPU-native notes:
* unfold/fold become shifted pads/slices (no gathers); the k=3*2^i stride-2^i
  value unfolds are decomposed into 3x3 block shifts of s x s sub-tiles.
* the relevance embedding is one big (HW x Ck^2) @ (Ck^2 x HW) matmul — pure
  MXU; the hard-attention gather is a single take_along_axis per level.
* VGG19 texture weights initialize randomly here (torchvision absent, env);
  pass an .npz of ``features.N.weight/bias`` arrays to load pretrained ones.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bicubic
from .blocks import Conv2d
from .blocks_ext import PixelShufflePack

__all__ = ["LTE", "SearchTransformer", "TTSRNet", "TTSR"]


# ----------------------------- LTE ------------------------------------------


class LTE(nn.Module):
    """Learnable texture extractor: first 3 VGG19 stages (lte.py:13-90).

    Input (B, H, W, 3) in [0, 1]; returns [level3 (C=256, /4),
    level2 (128, /2), level1 (64, /1)].
    """

    pixel_range: float = 1.0

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray((0.485, 0.456, 0.406), x.dtype) * self.pixel_range
        std = jnp.asarray((0.229, 0.224, 0.225), x.dtype) * self.pixel_range
        x = (x - mean) / std

        x = nn.relu(Conv2d(64, 3, name="conv1_1")(x))
        lv1 = x
        x = nn.relu(Conv2d(64, 3, name="conv1_2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(Conv2d(128, 3, name="conv2_1")(x))
        lv2 = x
        x = nn.relu(Conv2d(128, 3, name="conv2_2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(Conv2d(256, 3, name="conv3_1")(x))
        lv3 = x
        return [lv3, lv2, lv1]


# ------------------------- search transformer --------------------------------


def _unfold(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, L, C*k*k) patch rows, torch unfold channel-major
    layout (c*k*k + ky*k + kx)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    taps = jnp.stack([
        xp[:, ky : ky + oh * stride : stride, kx : kx + ow * stride : stride]
        for ky in range(k) for kx in range(k)
    ], axis=-1)  # (B, oh, ow, C, k*k)
    return taps.reshape(b, oh * ow, c * k * k)


def _fold(patches: jnp.ndarray, out_hw: tuple, c: int, k: int, stride: int,
          pad: int) -> jnp.ndarray:
    """Overlap-add inverse of ``_unfold`` (torch F.fold)."""
    b, l, _ = patches.shape
    h, w = out_hw
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    p = patches.reshape(b, oh, ow, c, k, k)
    out = jnp.zeros((b, h + 2 * pad, w + 2 * pad, c), patches.dtype)
    for ky in range(k):
        for kx in range(k):
            out = out.at[:, ky : ky + oh * stride : stride,
                         kx : kx + ow * stride : stride].add(p[..., ky, kx])
    return out[:, pad : pad + h, pad : pad + w]


class SearchTransformer(nn.Module):
    """Relevance embedding + hard/soft attention (search_transformer.py)."""

    def __call__(self, lq_up, ref_downup, refs):
        """All inputs channels-last.  lq_up/ref_downup: (B, H, W, C);
        refs: [(B, H, W, C), (B, 2H, 2W, C/2), (B, 4H, 4W, C/4)].

        Returns (soft_attention (B, H, W, 1), textures list like refs).
        """
        levels = len(refs)
        b, h, w, _ = lq_up.shape

        query = _unfold(lq_up, 3, 1, 1)        # (B, HW, Ck2)
        key = _unfold(ref_downup, 3, 1, 1)     # (B, HW, Ck2)

        query = query / jnp.maximum(
            jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
        key = key / jnp.maximum(
            jnp.linalg.norm(key, axis=-1, keepdims=True), 1e-12)

        rel = jnp.einsum("blc,bmc->blm", key, query,
                         precision=jax.lax.Precision.HIGHEST)  # (B, K, Q)
        max_val = jnp.max(rel, axis=1)        # (B, HW)
        max_idx = jnp.argmax(rel, axis=1)     # (B, HW)

        textures = []
        for i in range(levels):
            s = 2 ** i
            k = 3 * s
            ci = refs[i].shape[-1]
            vals = _unfold(refs[i], k, s, s)  # (B, HW, ci*k*k)
            got = jnp.take_along_axis(vals, max_idx[..., None], axis=1)
            folded = _fold(got, (h * s, w * s), ci, k, s, s) / 9.0
            textures.append(folded)

        soft = max_val.reshape(b, h, w, 1)
        return soft, textures


# ------------------------------ main net -------------------------------------


def _res_blocks(x, n, c, res_scale, name):
    for i in range(n):
        out = Conv2d(c, 3, name=f"{name}_b{i}_conv1")(x)
        out = nn.relu(out)
        out = Conv2d(c, 3, name=f"{name}_b{i}_conv2")(out)
        x = x + out * res_scale
    return x


def _up_bicubic(x, factor):
    return resize_bicubic(x, x.shape[1] * factor, x.shape[2] * factor)


class TTSRNet(nn.Module):
    """Main texture-transformer SR net (ttsr_net.py:228-439), channels-last.

    x: (B, H, W, in_channels); soft_attention: (B, H, W, 1);
    textures: [(B,H,W,4t), (B,2H,2W,2t), (B,4H,4W,t)] -> (B, 4H, 4W, out).
    """

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    texture_channels: int = 64
    num_blocks: Sequence[int] = (16, 16, 8, 4)
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, soft_attention, textures):
        c = self.mid_channels

        # SFE
        x1 = nn.relu(Conv2d(c, 3, name="sfe_first")(x))
        t = _res_blocks(x1, self.num_blocks[0], c, self.res_scale, "sfe")
        x1 = Conv2d(c, 3, name="sfe_last")(t) + x1

        # stage 1
        res = Conv2d(c, 3, name="conv_first1")(
            jnp.concatenate([x1, textures[0]], -1))
        x1 = x1 + res * soft_attention
        res = _res_blocks(x1, self.num_blocks[1], c, self.res_scale, "rb1")
        x1 = x1 + Conv2d(c, 3, name="conv_last1")(res)

        # stage 2
        x21 = x1
        x22 = nn.relu(PixelShufflePack(c, 2, name="up1")(x1))
        res = Conv2d(c, 3, name="conv_first2")(
            jnp.concatenate([x22, textures[1]], -1))
        x22 = x22 + res * _up_bicubic(soft_attention, 2)

        # CSFI2
        x12 = nn.relu(Conv2d(c, 1, name="csfi2_1to2")(_up_bicubic(x21, 2)))
        x21r = nn.relu(Conv2d(c, 3, stride=2, name="csfi2_2to1")(x22))
        x21r = nn.relu(Conv2d(c, 3, name="csfi2_merge1")(
            jnp.concatenate([x21, x21r], -1)))
        x22r = nn.relu(Conv2d(c, 3, name="csfi2_merge2")(
            jnp.concatenate([x22, x12], -1)))
        x21r = _res_blocks(x21r, self.num_blocks[2], c, self.res_scale, "rb2_1")
        x22r = _res_blocks(x22r, self.num_blocks[2], c, self.res_scale, "rb2_2")
        x21 = x21 + Conv2d(c, 3, name="conv_last2_1")(x21r)
        x22 = x22 + Conv2d(c, 3, name="conv_last2_2")(x22r)

        # stage 3
        x31, x32 = x21, x22
        x33 = nn.relu(PixelShufflePack(c, 2, name="up2")(x22))
        res = Conv2d(c, 3, name="conv_first3")(
            jnp.concatenate([x33, textures[2]], -1))
        x33 = x33 + res * _up_bicubic(soft_attention, 4)

        # CSFI3
        x12 = nn.relu(Conv2d(c, 1, name="csfi3_1to2")(_up_bicubic(x31, 2)))
        x14 = nn.relu(Conv2d(c, 1, name="csfi3_1to4")(_up_bicubic(x31, 4)))
        x21r = nn.relu(Conv2d(c, 3, stride=2, name="csfi3_2to1")(x32))
        x24 = nn.relu(Conv2d(c, 1, name="csfi3_2to4")(_up_bicubic(x32, 2)))
        x41 = nn.relu(Conv2d(c, 3, stride=2, name="csfi3_4to1_1")(x33))
        x41 = nn.relu(Conv2d(c, 3, stride=2, name="csfi3_4to1_2")(x41))
        x42 = nn.relu(Conv2d(c, 3, stride=2, name="csfi3_4to2")(x33))

        x31r = nn.relu(Conv2d(c, 3, name="csfi3_merge1")(
            jnp.concatenate([x31, x21r, x41], -1)))
        x32r = nn.relu(Conv2d(c, 3, name="csfi3_merge2")(
            jnp.concatenate([x32, x12, x42], -1)))
        x33r = nn.relu(Conv2d(c, 3, name="csfi3_merge4")(
            jnp.concatenate([x33, x14, x24], -1)))

        x31r = _res_blocks(x31r, self.num_blocks[3], c, self.res_scale, "rb3_1")
        x32r = _res_blocks(x32r, self.num_blocks[3], c, self.res_scale, "rb3_2")
        x33r = _res_blocks(x33r, self.num_blocks[3], c, self.res_scale, "rb3_3")
        x31 = x31 + Conv2d(c, 3, name="conv_last3_1")(x31r)
        x32 = x32 + Conv2d(c, 3, name="conv_last3_2")(x32r)
        x33 = x33 + Conv2d(c, 3, name="conv_last3_3")(x33r)

        # merge
        x14 = nn.relu(Conv2d(c, 1, name="merge_1to4")(_up_bicubic(x31, 4)))
        x24 = nn.relu(Conv2d(c, 1, name="merge_2to4")(_up_bicubic(x32, 2)))
        out = nn.relu(Conv2d(c, 3, name="merge_conv")(
            jnp.concatenate([x33, x14, x24], -1)))
        out = Conv2d(c // 2, 3, name="merge_last1")(out)
        out = Conv2d(self.out_channels, 1, name="merge_last2")(out)
        return jnp.clip(out, -1, 1)


class TTSR(nn.Module):
    """End-to-end TTSR: LTE features -> search transformer -> main net.

    lq: (B, 3, h, w); ref: (B, 3, 4h, 4w) NCHW at the boundary (reference
    restorer parity, restorers/ttsr.py).  Returns (B, 3, 4h, 4w).
    """

    mid_channels: int = 64
    texture_channels: int = 64
    num_blocks: Sequence[int] = (16, 16, 8, 4)

    @nn.compact
    def __call__(self, lq, ref):
        lq_nhwc = jnp.transpose(lq, (0, 2, 3, 1))
        ref_nhwc = jnp.transpose(ref, (0, 2, 3, 1))
        h, w = lq_nhwc.shape[1:3]

        lq_up = _up_bicubic(lq_nhwc, 4)
        ref_down = resize_bicubic(ref_nhwc, h, w)
        ref_downup = _up_bicubic(ref_down, 4)

        lte = LTE(name="extractor")
        q_feats = lte(lq_up)
        k_feats = lte(ref_downup)
        v_feats = lte(ref_nhwc)

        soft, textures = SearchTransformer(name="transformer")(
            q_feats[0], k_feats[0], v_feats)
        # transformer works at level-3 resolution (h, w == lq size when
        # upscale=4): q_feats[0] is (B, h, w, 256)
        sr = TTSRNet(mid_channels=self.mid_channels,
                     texture_channels=self.texture_channels,
                     num_blocks=tuple(self.num_blocks),
                     name="generator")(lq_nhwc, soft, textures)
        return jnp.transpose(sr, (0, 3, 1, 2))
