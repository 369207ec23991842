"""EDVR (flax): PCD alignment + TSA fusion.

Rebuilds mmedit ``EDVRNet`` (mmedit/models/backbones/sr_backbones/
edvr_net.py:15-445): pyramid cascading deformable alignment and temporal-
spatial attention fusion.  TPU-first: the per-neighbour-frame PCD loop is
``vmap``-batched — all T alignments run as one batched program against the
broadcast reference pyramid.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dcn import modulated_deform_conv2d
from ..ops.resize import resize_bilinear, upsample2x_bilinear
from .basicvsr import MMPixelShufflePack, MMResidualBlock
from .blocks import Conv2d

__all__ = ["EDVRNet", "PCDAlignment", "TSAFusion", "ModulatedDCNPack"]


class ModulatedDCNPack(nn.Module):
    """DCNv2 whose offsets/mask come from a separate feature
    (edvr_net.py:15-59); offset conv zero-initialised."""

    out_channels: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, extra_feat):
        dg = self.deform_groups
        out = Conv2d(dg * 27, 3, init_scale=0.0, name="conv_offset")(extra_feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], -1)
        mask = jax.nn.sigmoid(mask)
        kernel = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (3, 3, x.shape[-1], self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return modulated_deform_conv2d(x, offset, mask, kernel, bias,
                                       padding=1, deform_groups=dg)


class PCDAlignment(nn.Module):
    """Pyramid cascading deformable alignment (edvr_net.py:61-188)."""

    mid_channels: int = 64
    deform_groups: int = 8

    @nn.compact
    def __call__(self, neighbor_feats, ref_feats):
        c = self.mid_channels
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        up_off, up_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            lv = f"l{i}"
            offset = jnp.concatenate([neighbor_feats[i - 1], ref_feats[i - 1]], -1)
            offset = lrelu(Conv2d(c, 3, name=f"offset_conv1_{lv}")(offset))
            if i == 3:
                offset = lrelu(Conv2d(c, 3, name=f"offset_conv2_{lv}")(offset))
            else:
                offset = lrelu(Conv2d(c, 3, name=f"offset_conv2_{lv}")(
                    jnp.concatenate([offset, up_off], -1)))
                offset = lrelu(Conv2d(c, 3, name=f"offset_conv3_{lv}")(offset))
            feat = ModulatedDCNPack(c, self.deform_groups,
                                    name=f"dcn_pack_{lv}")(
                neighbor_feats[i - 1], offset)
            if i == 3:
                feat = lrelu(feat)
            else:
                feat = Conv2d(c, 3, name=f"feat_conv_{lv}")(
                    jnp.concatenate([feat, up_feat], -1))
                if i == 2:
                    feat = lrelu(feat)
            if i > 1:
                up_off = upsample2x_bilinear(offset) * 2.0
                up_feat = upsample2x_bilinear(feat)

        offset = jnp.concatenate([feat, ref_feats[0]], -1)
        offset = lrelu(Conv2d(c, 3, name="cas_offset_conv1")(offset))
        offset = lrelu(Conv2d(c, 3, name="cas_offset_conv2")(offset))
        return lrelu(ModulatedDCNPack(c, self.deform_groups,
                                      name="cas_dcnpack")(feat, offset))


def _max_pool_3s2(x):
    return nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))


def _avg_pool_3s2(x):
    """AvgPool2d(3, 2, 1) with count_include_pad=True (torch default)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.avg_pool(xp, (3, 3), (2, 2))


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (edvr_net.py:190-297).
    aligned: (B, T, H, W, C) -> (B, H, W, C)."""

    mid_channels: int = 64
    num_frames: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned):
        b, t, h, w, c = aligned.shape
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        emb_ref = Conv2d(c, 3, name="temporal_attn1")(
            aligned[:, self.center_frame_idx])
        emb = Conv2d(c, 3, name="temporal_attn2")(
            aligned.reshape(b * t, h, w, c)).reshape(b, t, h, w, c)
        corr = jnp.sum(emb * emb_ref[:, None], -1)  # (B, T, H, W)
        prob = jax.nn.sigmoid(corr)[..., None]
        weighted = (aligned * prob).transpose(0, 2, 3, 1, 4).reshape(
            b, h, w, t * c)

        feat = lrelu(Conv2d(c, 1, name="feat_fusion")(weighted))

        attn = lrelu(Conv2d(c, 1, name="spatial_attn1")(weighted))
        attn = jnp.concatenate([_max_pool_3s2(attn), _avg_pool_3s2(attn)], -1)
        attn = lrelu(Conv2d(c, 1, name="spatial_attn2")(attn))
        attn_level = lrelu(Conv2d(c, 1, name="spatial_attn_l1")(attn))
        attn_level = jnp.concatenate(
            [_max_pool_3s2(attn_level), _avg_pool_3s2(attn_level)], -1)
        attn_level = lrelu(Conv2d(c, 3, name="spatial_attn_l2")(attn_level))
        attn_level = lrelu(Conv2d(c, 3, name="spatial_attn_l3")(attn_level))
        attn_level = upsample2x_bilinear(attn_level)
        attn = lrelu(Conv2d(c, 3, name="spatial_attn3")(attn)) + attn_level
        attn = lrelu(Conv2d(c, 1, name="spatial_attn4")(attn))
        attn = upsample2x_bilinear(attn)
        attn = Conv2d(c, 3, name="spatial_attn5")(attn)
        attn_add = Conv2d(c, 1, name="spatial_attn_add2")(
            lrelu(Conv2d(c, 1, name="spatial_attn_add1")(attn)))
        attn = jax.nn.sigmoid(attn)
        return feat * attn * 2 + attn_add


class EDVRNet(nn.Module):
    """(B, T, C, H, W) -> SR centre frame (B, C, 4H, 4W).  H, W % 4 == 0."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_frames: int = 5
    deform_groups: int = 8
    num_blocks_extraction: int = 5
    num_blocks_reconstruction: int = 10
    center_frame_idx: int = 2
    with_tsa: bool = True

    @nn.compact
    def __call__(self, x):
        b, t, c, h, w = x.shape
        mid = self.mid_channels
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        xs = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(b * t, h, w, c)
        center = jnp.transpose(x[:, self.center_frame_idx], (0, 2, 3, 1))

        l1 = lrelu(Conv2d(mid, 3, name="conv_first")(xs))
        for i in range(self.num_blocks_extraction):
            l1 = MMResidualBlock(mid, name=f"extract{i}")(l1)
        l2 = lrelu(Conv2d(mid, 3, stride=2, name="feat_l2_conv1")(l1))
        l2 = lrelu(Conv2d(mid, 3, name="feat_l2_conv2")(l2))
        l3 = lrelu(Conv2d(mid, 3, stride=2, name="feat_l3_conv1")(l2))
        l3 = lrelu(Conv2d(mid, 3, name="feat_l3_conv2")(l3))

        l1 = l1.reshape(b, t, h, w, mid)
        l2 = l2.reshape(b, t, h // 2, w // 2, mid)
        l3 = l3.reshape(b, t, h // 4, w // 4, mid)
        refs = [l1[:, self.center_frame_idx], l2[:, self.center_frame_idx],
                l3[:, self.center_frame_idx]]

        pcd = PCDAlignment(mid, self.deform_groups, name="pcd_alignment")

        def align_one(n1, n2, n3):
            return pcd([n1, n2, n3], refs)

        aligned = nn.vmap(
            lambda mdl, n1, n2, n3: mdl([n1, n2, n3], refs),
            variable_axes={"params": None},
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(pcd, l1, l2, l3)  # (B, T, H, W, mid)

        if self.with_tsa:
            feat = TSAFusion(mid, self.num_frames, self.center_frame_idx,
                             name="fusion")(aligned)
        else:
            feat = Conv2d(mid, 1, name="fusion")(
                aligned.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * mid))

        out = feat
        for i in range(self.num_blocks_reconstruction):
            out = MMResidualBlock(mid, name=f"recon{i}")(out)
        out = lrelu(MMPixelShufflePack(mid, 2, 3, name="upsample1")(out))
        out = lrelu(MMPixelShufflePack(64, 2, 3, name="upsample2")(out))
        out = lrelu(Conv2d(64, 3, name="conv_hr")(out))
        out = Conv2d(self.out_channels, 3, name="conv_last")(out)
        base = resize_bilinear(center, 4 * h, 4 * w)
        out = out + base
        return jnp.transpose(out, (0, 3, 1, 2))
