"""IconVSR and TDAN (flax).

IconVSR (mmedit iconvsr.py:17-267): BasicVSR propagation + EDVR-based
keyframe information-refill.  Keyframe indices are static under jit, so the
temporal loop stays a Python loop with shared modules (clips are short); the
EDVR refill extractor is the EDVR trunk up to TSA fusion (iconvsr.py:269-382).

TDAN (mmedit tdan_net.py:15-176): DCNv1-based temporal alignment of each
neighbour to the centre frame, then reconstruction from the aligned LR stack.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dcn import deform_conv2d
from ..ops.resize import resize_bilinear
from ..ops.warp import flow_warp
from .basicvsr import (
    MMPixelShufflePack,
    MMResidualBlock,
    MMResidualBlocksWithInputConv,
)
from .blocks import Conv2d
from .edvr import PCDAlignment, TSAFusion
from .spynet import SpyNet

__all__ = ["IconVSR", "TDANNet", "EDVRFeatureExtractor"]


class EDVRFeatureExtractor(nn.Module):
    """EDVR trunk to TSA fusion: (B, T, H, W, 3) -> (B, H, W, mid)."""

    mid_channels: int = 64
    num_frames: int = 5
    deform_groups: int = 8
    num_blocks_extraction: int = 5

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        mid = self.mid_channels
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        xs = x.reshape(b * t, h, w, c)
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
        cf = self.num_frames // 2
        refs = [l1[:, cf], l2[:, cf], l3[:, cf]]
        pcd = PCDAlignment(mid, self.deform_groups, name="pcd_alignment")
        aligned = nn.vmap(
            lambda mdl, n1, n2, n3: mdl([n1, n2, n3], refs),
            variable_axes={"params": None},
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(pcd, l1, l2, l3)
        return TSAFusion(mid, self.num_frames, cf, name="fusion")(aligned)


class IconVSR(nn.Module):
    """(B, T, 3, H, W) -> (B, T, 3, 4H, 4W); H, W >= 64."""

    mid_channels: int = 64
    num_blocks: int = 30
    keyframe_stride: int = 5
    padding: int = 2

    @nn.compact
    def __call__(self, lrs):
        b, t, c, h_in, w_in = lrs.shape
        mid = self.mid_channels
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        x = jnp.transpose(lrs, (0, 1, 3, 4, 2))
        # spatial padding to /4 (reflect)
        ph = (4 - h_in % 4) % 4
        pw = (4 - w_in % 4) % 4
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
        h, w = x.shape[2:4]

        keyframes = list(range(0, t, self.keyframe_stride))
        if keyframes[-1] != t - 1:
            keyframes.append(t - 1)
        keyset = set(keyframes)

        spynet = SpyNet(name="spynet")
        ref = x[:, :-1].reshape(b * (t - 1), h, w, c)
        supp = x[:, 1:].reshape(b * (t - 1), h, w, c)
        flows_backward = spynet(ref, supp).reshape(b, t - 1, h, w, 2)
        flows_forward = spynet(supp, ref).reshape(b, t - 1, h, w, 2)

        # keyframe refill: mirror-pad the clip (iconvsr.py:277-289)
        pad = self.padding
        if pad == 2:
            clip = jnp.concatenate([x[:, [4, 3]], x, x[:, [-4, -5]]], 1)
        elif pad == 3:
            clip = jnp.concatenate([x[:, [6, 5, 4]], x, x[:, [-5, -6, -7]]], 1)
        else:
            raise ValueError("padding must be 2 or 3")
        edvr = EDVRFeatureExtractor(mid, 2 * pad + 1, name="edvr")
        refill = {i: edvr(clip[:, i : i + 2 * pad + 1]) for i in keyframes}

        bwd_fusion = Conv2d(mid, 3, name="backward_fusion")
        fwd_fusion = Conv2d(mid, 3, name="forward_fusion")
        bwd_blocks = MMResidualBlocksWithInputConv(mid, self.num_blocks,
                                                   name="backward_resblocks")
        fwd_blocks = MMResidualBlocksWithInputConv(mid, self.num_blocks,
                                                   name="forward_resblocks")
        up1 = MMPixelShufflePack(mid, 2, 3, name="upsample1")
        up2 = MMPixelShufflePack(64, 2, 3, name="upsample2")
        conv_hr = Conv2d(64, 3, name="conv_hr")
        conv_last = Conv2d(3, 3, name="conv_last")

        outputs = []
        feat_prop = jnp.zeros((b, h, w, mid), x.dtype)
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            if i in keyset:
                feat_prop = bwd_fusion(
                    jnp.concatenate([feat_prop, refill[i]], -1))
            feat_prop = bwd_blocks(jnp.concatenate([x[:, i], feat_prop], -1))
            outputs.append(feat_prop)
        outputs = outputs[::-1]

        results = []
        feat_prop = jnp.zeros_like(feat_prop)
        for i in range(t):
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            if i in keyset:
                feat_prop = fwd_fusion(
                    jnp.concatenate([feat_prop, refill[i]], -1))
            feat_prop = fwd_blocks(
                jnp.concatenate([x[:, i], outputs[i], feat_prop], -1))
            out = lrelu(up1(feat_prop))
            out = lrelu(up2(out))
            out = lrelu(conv_hr(out))
            out = conv_last(out)
            base = resize_bilinear(x[:, i], 4 * h, 4 * w)
            results.append(out + base)
        out = jnp.stack(results, 1)[:, :, : 4 * h_in, : 4 * w_in]
        return jnp.transpose(out, (0, 1, 4, 2, 3))


class _DeformConvPack(nn.Module):
    """mmcv DeformConv2dPack: DCNv1 with offsets from the input itself."""

    out_channels: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x):
        dg = self.deform_groups
        offset = Conv2d(dg * 18, 3, init_scale=0.0, name="conv_offset")(x)
        kernel = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (3, 3, x.shape[-1], self.out_channels),
        )
        return deform_conv2d(x, offset, kernel, None, padding=1,
                             deform_groups=dg)


class _AugmentedDeformConvPack(nn.Module):
    """TDAN AugmentedDeformConv2dPack: DCNv1, offsets from extra features."""

    out_channels: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, extra_feat):
        dg = self.deform_groups
        offset = Conv2d(dg * 18, 3, init_scale=0.0, name="conv_offset")(extra_feat)
        kernel = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (3, 3, x.shape[-1], self.out_channels),
        )
        return deform_conv2d(x, offset, kernel, None, padding=1,
                             deform_groups=dg)


class TDANNet(nn.Module):
    """(B, T=5, 3, H, W) -> (SR centre (B, 3, 4H, 4W), aligned LRs (B, T, 3, H, W))."""

    mid_channels: int = 64
    num_blocks_before_align: int = 5
    num_blocks_after_align: int = 10

    @nn.compact
    def __call__(self, lrs):
        b, t, c, h, w = lrs.shape
        mid = self.mid_channels
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        x = jnp.transpose(lrs, (0, 1, 3, 4, 2))
        center = x[:, t // 2]

        feats = lrelu(Conv2d(mid, 3, name="feat_conv")(
            x.reshape(b * t, h, w, c)))
        for i in range(self.num_blocks_before_align):
            feats = MMResidualBlock(mid, name=f"pre{i}")(feats)
        feats = feats.reshape(b, t, h, w, mid)
        feat_center = feats[:, t // 2]

        agg_conv = Conv2d(mid, 3, name="agg_conv")
        agg_dcn1 = _DeformConvPack(mid, name="agg_dcn1")
        agg_dcn2 = _DeformConvPack(mid, name="agg_dcn2")
        align1 = _AugmentedDeformConvPack(mid, name="align_1")
        align2 = _DeformConvPack(mid, name="align_2")
        to_rgb = Conv2d(3, 3, name="to_rgb")

        aligned = []
        for i in range(t):
            if i == t // 2:
                aligned.append(center)
            else:
                agg = agg_conv(jnp.concatenate([feat_center, feats[:, i]], -1))
                agg = agg_dcn2(agg_dcn1(agg))
                af = align2(align1(feats[:, i], agg))
                aligned.append(to_rgb(af))
        aligned_cat = jnp.concatenate(aligned, -1)

        out = lrelu(Conv2d(mid, 3, name="rec_conv")(aligned_cat))
        for i in range(self.num_blocks_after_align):
            out = MMResidualBlock(mid, name=f"post{i}")(out)
        out = MMPixelShufflePack(mid, 2, 3, name="up1")(out)
        out = MMPixelShufflePack(mid, 2, 3, name="up2")(out)
        out = Conv2d(3, 3, use_bias=False, name="final")(out)
        aligned_lrs = jnp.stack(aligned, 1)
        return (jnp.transpose(out, (0, 3, 1, 2)),
                jnp.transpose(aligned_lrs, (0, 1, 4, 2, 3)))
