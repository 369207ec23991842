"""FTVSR — frequency-transformer video super-resolution (flax).

Rebuilds the reference FTVSR (mmedit .../sr_backbones/ftvsr.py:24-369 and the
restorer-embedded copy): bidirectional recurrent propagation with LTAM
(location-aware sparse temporal attention over cross-scale space-to-depth
features, ftvsr.py:371-468) followed by the FTT frequency transformer over
8x8 DCT coefficients (ftvsr.py:508-702).

TPU notes:
* unfold/fold chains are space-to-depth / patch-grid gathers + adaptive-pool
  matmuls (ops/dct.py) — no im2col materialisation.
* Known reference defect: ``FTTA_layer.forward`` reshapes its 144-channel
  input with ``view(N*64, -1, H, W)``, which is invalid (144 % 64 != 0) and
  crashes the shipped d_model=144 configs.  We use the nearest valid
  frequency grouping (gcd(channel, 64)) so the attention is runnable while
  keeping the intended patch-frequency structure.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dct import (
    adaptive_avg_pool,
    block_dct,
    block_idct,
    pad_images_for_dct,
    patch_grid,
    resize_flow,
    space_to_depth,
)
from ..ops.resize import resize_bilinear
from ..ops.warp import flow_warp
from .basicvsr import MMPixelShufflePack, MMResidualBlocksWithInputConv
from .blocks import Conv2d
from .spynet import SpyNet

__all__ = ["FTVSRNet", "LTAM", "FTTALayer"]


def _l2norm(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


class LTAM(nn.Module):
    """Location-aware sparse temporal attention (ftvsr.py:371-468).

    All buffers are channels-last: sparse/index sets are (B, T, hb, wb, c*s*s)
    space-to-depth features at the s=stride granularity; ``location`` is
    (B, T, hb, wb, 2) tracked block coordinates.
    """

    stride: int = 4

    @nn.compact
    def __call__(self, curr_feat, index_set, anchor_feat, s1, s2, s3, location):
        b, h, w, c = anchor_feat.shape
        s = self.stride
        hb, wb = h // s, w // s
        t = s1.shape[1]

        # nearest-neighbour re-sampling of the buffers at tracked locations
        def sample(buf):
            flat = buf.reshape(b * t, hb, wb, buf.shape[-1])
            px = location[..., 0].reshape(b * t, hb * wb)
            py = location[..., 1].reshape(b * t, hb * wb)
            from ..ops.warp import grid_sample_nearest

            out = grid_sample_nearest(flat, px, py)
            return out.reshape(b, t, hb, wb, buf.shape[-1])

        s1_s = sample(s1)
        s2_s = sample(s2)
        s3_s = sample(s3)
        idx_s = sample(index_set)

        q = _l2norm(space_to_depth(curr_feat, s), axis=-1)       # (B,hb,wb,D)
        k = _l2norm(idx_s, axis=-1)                              # (B,T,hb,wb,D)
        corr = jnp.einsum("bthwd,bhwd->bthw", k, q)
        corr_soft = jnp.max(corr, axis=1)                        # (B,hb,wb)
        corr_idx = jnp.argmax(corr, axis=1)                      # (B,hb,wb)

        def gather_best(buf):
            return jnp.take_along_axis(
                buf, corr_idx[:, None, ..., None], axis=1)[:, 0]

        from ..ops.dct import depth_to_space

        o1 = depth_to_space(gather_best(s1_s), s)
        o2 = depth_to_space(gather_best(s2_s), s)
        o3 = depth_to_space(gather_best(s3_s), s)
        # reference hard-codes 64 = mid_channels here (ftvsr.py:376)
        out = Conv2d(c, 3, name="fusion")(jnp.concatenate([o1, o2, o3], -1))
        soft = jnp.repeat(jnp.repeat(corr_soft, s, 1), s, 2)[..., None]
        return out * soft + anchor_feat


class FTTALayer(nn.Module):
    """Patch-frequency multi-head attention (ftvsr.py:627-702).

    ``freq_groups``: number of channel groups.

    * ``None`` (default) — the gcd(channel, 64) workaround for the reference
      defect: ``FTTA_layer.forward`` reshapes with ``view(N*64, -1, H, W)``,
      which is invalid for the shipped FTVSR channel=144 (144 % 64 != 0) and
      crashes upstream.  gcd grouping keeps the patch-frequency structure
      runnable at any width, but *changes the token geometry and the q/k/v
      projection fan-in* relative to the (crashing) reference formulation.
    * ``64`` — the reference's exact layout; requires channel % 64 == 0
      (e.g. the FTT_encoder default channel=192).  Weight-transplant parity
      with the torch semantics is golden-tested in tests/test_ftta_ltam.py.
    """

    channel: int = 144
    d_model: int = 144
    n_heads: int = 8
    patch: int = 8
    freq_groups: Optional[int] = None

    @nn.compact
    def __call__(self, q, k, v):
        b, h, w, c = q.shape
        p = self.patch
        if self.freq_groups is None:
            g = math.gcd(c, 64)
        else:
            g = self.freq_groups
            if c % g:
                raise ValueError(
                    f"channel {c} not divisible by freq_groups {g} — this is "
                    "the reference FTTA defect; use freq_groups=None for the "
                    "gcd workaround")
        cg = c // g
        d = cg * p * p

        def tokens(x):
            # (B,H,W,C) -> groups of cg channels -> p-patch tokens
            xg = x.reshape(b, h, w, g, cg)
            xg = jnp.transpose(xg, (0, 3, 1, 2, 4))       # (B,g,H,W,cg)
            xg = xg.reshape(b * g, h, w, cg)
            pt = space_to_depth(xg, p)                    # (B*g, hb, wb, cg*p*p)
            hb, wb = pt.shape[1:3]
            return pt.reshape(b, g * hb * wb, d), (hb, wb)

        qs, (hb, wb) = tokens(q)
        ks, _ = tokens(k)
        vs, _ = tokens(v)

        qe = nn.Dense(self.d_model, name="layer_q")(qs)
        ke = nn.Dense(self.d_model, name="layer_k")(ks)
        ve = nn.Dense(self.d_model, name="layer_v")(vs)

        # torch nn.MultiheadAttention applies its own packed input projection
        # before the heads (in_proj) and an output projection after
        qi = nn.Dense(self.d_model, name="in_proj_q")(qe)
        ki = nn.Dense(self.d_model, name="in_proj_k")(ke)
        vi = nn.Dense(self.d_model, name="in_proj_v")(ve)

        nh = self.n_heads
        dh = self.d_model // nh

        def split_heads(x):
            return jnp.transpose(x.reshape(b, -1, nh, dh), (0, 2, 1, 3))

        qh, kh, vh = split_heads(qi), split_heads(ki), split_heads(vi)
        attn = jnp.einsum("bnld,bnmd->bnlm", qh, kh,
                          preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(dh, jnp.float32))
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bnlm,bnmd->bnld", attn, vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, -1, self.d_model)
        out = nn.Dense(self.d_model, name="attn_out")(out)

        out = nn.LayerNorm(name="norm1")(out + ve)
        ff = jax.nn.leaky_relu(nn.Dense(self.d_model, name="linear1")(out), 0.1)
        out = nn.LayerNorm(name="norm2")(ff + out)
        out = nn.Dense(d, name="linear2")(out)

        # tokens back to image
        out = out.reshape(b * g, hb, wb, d)
        from ..ops.dct import depth_to_space

        out = depth_to_space(out, p)                      # (B*g, H, W, cg)
        out = out.reshape(b, g, h, w, cg)
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, c)
        return out


class FTTEncoder(nn.Module):
    """Stack of FTTA layers (restorers/ftvsr.py:612-625 ``FTT_encoder``):
    v = layer0(q, k, v); then v = layer_i(k, v, v)."""

    channel: int = 192
    d_model: int = 144
    n_heads: int = 8
    num_layer: int = 3
    freq_groups: Optional[int] = None

    @nn.compact
    def __call__(self, q, k, v):
        layers = [FTTALayer(self.channel, self.d_model, self.n_heads,
                            freq_groups=self.freq_groups, name=f"layer{i}")
                  for i in range(self.num_layer)]
        v = layers[0](q, k, v)
        for i in range(1, self.num_layer):
            v = layers[i](k, v, v)
        return v


class FTVSRNet(nn.Module):
    """(B, T, 3, H, W) -> (B, T, 3, 4H, 4W).  H, W multiples of 32 advised."""

    mid_channels: int = 64
    num_blocks: int = 72
    stride: int = 4
    keyframe_stride: int = 3
    d_model: int = 144
    n_heads: int = 8
    with_ftt: bool = True  # False => TTVSR (trajectory-attention VSR, no FTT)

    @nn.compact
    def __call__(self, lrs):
        b, t, c, h, w = lrs.shape
        mid = self.mid_channels
        s = self.stride
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        x = jnp.transpose(lrs, (0, 1, 3, 4, 2))

        spynet = SpyNet(name="spynet")

        def flows_of(frames):
            bb, tt, hh, ww, cc = frames.shape
            r = frames[:, :-1].reshape(bb * (tt - 1), hh, ww, cc)
            sp = frames[:, 1:].reshape(bb * (tt - 1), hh, ww, cc)
            fb = spynet(r, sp).reshape(bb, tt - 1, hh, ww, 2)
            ff = spynet(sp, r).reshape(bb, tt - 1, hh, ww, 2)
            return ff, fb

        flows_forward, flows_backward = flows_of(x)
        feats = MMResidualBlocksWithInputConv(mid, 5, name="feat_extractor")(
            x.reshape(b * t, h, w, c)).reshape(b, t, h, w, mid)

        ltam = LTAM(self.stride, name="LTAM")
        resblocks = MMResidualBlocksWithInputConv(mid, self.num_blocks,
                                                  name="resblocks")

        kf_fwd = set(range(0, t, self.keyframe_stride))
        kf_bwd = set(range(t - 1, 0, -self.keyframe_stride))
        hb, wb = h // s, w // s
        gy, gx = jnp.meshgrid(jnp.arange(hb, dtype=x.dtype),
                              jnp.arange(wb, dtype=x.dtype), indexing="ij")
        grid0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (b, hb, wb, 2))

        def cross_scale_feats(feat):
            f1 = space_to_depth(feat, s)
            g2 = patch_grid(feat, int(1.5 * s), s, int(0.25 * s))
            f2 = space_to_depth(adaptive_avg_pool(g2, h, w), s)
            g3 = patch_grid(feat, 2 * s, s, s // 2)
            f3 = space_to_depth(adaptive_avg_pool(g3, h, w), s)
            return f1, f2, f3

        def propagate(order, flows, keyset):
            feat_prop = jnp.zeros((b, h, w, mid), x.dtype)
            locations = [grid0]
            bufs = {"s1": [], "s2": [], "s3": [], "idx": []}
            outs = {}
            prev = None
            for step, i in enumerate(order):
                cur = feats[:, i]
                if step > 0:
                    flow = flows[step - 1]
                    feat_prop = flow_warp(feat_prop, flow, "border")
                    flow_s = adaptive_avg_pool(flow, hb, wb) / s
                    locations = [
                        flow_warp(l, flow_s, "border", "nearest")
                        for l in locations
                    ]
                    feat_prop = ltam(
                        cur,
                        jnp.stack(bufs["idx"], 1),
                        feat_prop,
                        jnp.stack(bufs["s1"], 1),
                        jnp.stack(bufs["s2"], 1),
                        jnp.stack(bufs["s3"], 1),
                        jnp.stack(locations[: len(bufs["s1"])], 1),
                    )
                    if i in keyset:
                        locations.append(grid0)
                feat_prop = resblocks(jnp.concatenate([cur, feat_prop], -1))
                outs[i] = feat_prop
                if i in keyset:
                    f1, f2, f3 = cross_scale_feats(feat_prop)
                    bufs["s1"].append(f1)
                    bufs["s2"].append(f2)
                    bufs["s3"].append(f3)
                    bufs["idx"].append(space_to_depth(cur, s))
            return outs

        outs_back = propagate(list(range(t - 1, -1, -1)),
                              [flows_backward[:, i] for i in range(t - 2, -1, -1)],
                              kf_bwd)
        outs_fwd = propagate(list(range(t)),
                             [flows_forward[:, i] for i in range(t - 1)],
                             kf_fwd)

        fusion = Conv2d(mid, 1, name="fusion")
        up1 = MMPixelShufflePack(mid, 2, 3, name="upsample1")
        up2 = MMPixelShufflePack(64, 2, 3, name="upsample2")
        conv_hr = Conv2d(64, 3, name="conv_hr")
        conv_last = Conv2d(3, 3, name="conv_last")

        hf_frames, bic_frames = [], []
        for i in range(t):
            out = jnp.concatenate([outs_back[i], feats[:, i], outs_fwd[i]], -1)
            out = lrelu(fusion(out))
            out = lrelu(up1(out))
            out = lrelu(up2(out))
            out = lrelu(conv_hr(out))
            out = conv_last(out)
            base = resize_bilinear(x[:, i], 4 * h, 4 * w)
            bic_frames.append(base)
            hf_frames.append(out + base)
        hf = jnp.stack(hf_frames, 1)      # (B, T, 4H, 4W, 3)
        bic = jnp.stack(bic_frames, 1)

        if not self.with_ftt:  # TTVSR head: recurrent trajectory output only
            return jnp.transpose(hf, (0, 1, 4, 2, 3))

        # ---- FTT frequency transformer over DCT coefficients --------------
        bic_p, ph, pw = pad_images_for_dct(bic)
        hf_p, _, _ = pad_images_for_dct(hf)
        hh, ww = bic_p.shape[2:4]
        ff2, fb2 = flows_of(hf_p)

        def flows_small(f):
            fl = f.reshape(b * (t - 1), hh, ww, 2)
            fl = resize_flow(fl, hh // 8, ww // 8)
            return fl.reshape(b, t - 1, hh // 8, ww // 8, 2)

        ff2s, fb2s = flows_small(ff2), flows_small(fb2)

        dct_bic0 = block_dct(bic_p.reshape(b * t, hh, ww, 3))
        dct_hf0 = block_dct(hf_p.reshape(b * t, hh, ww, 3))

        def norm_coeff(d0):
            flat = d0.reshape(b * t, -1, d0.shape[-1])
            # reference normalises over the spatial token axis per channel
            nrm = jnp.maximum(
                jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
            return (flat / nrm).reshape(d0.shape)

        dct_bic = norm_coeff(dct_bic0)
        dct_hf = norm_coeff(dct_hf0)

        conv1 = Conv2d(144, 1, name="conv_layer1")
        ftt_feat = MMResidualBlocksWithInputConv(144, 3, name="ftt_feat")
        ftt_res = MMResidualBlocksWithInputConv(144, 3, name="ftt_res")
        ftta = FTTALayer(144, self.d_model, self.n_heads, name="ftta")
        hb8, wb8 = hh // 8, ww // 8
        bic_fea = ftt_feat(conv1(dct_bic)).reshape(b, t, hb8, wb8, 144)
        hf_fea = ftt_feat(conv1(dct_hf)).reshape(b, t, hb8, wb8, 144)
        dct_hf0 = dct_hf0.reshape(b, t, hb8, wb8, 192)

        def ftt_propagate(order, flows):
            prop = jnp.zeros((b, hb8, wb8, 144), x.dtype)
            outs = {}
            for step, i in enumerate(order):
                bic_i = bic_fea[:, i]
                hf_i = hf_fea[:, i]
                if step > 0:
                    prop = flow_warp(prop, flows[step - 1], "border")
                    hf_ = ftta(bic_i, hf_i, hf_i)
                    prop = ftta(hf_, prop, prop)
                prop = ftt_res(jnp.concatenate([hf_i, prop], -1))
                outs[i] = prop
            return outs

        fb_list = [fb2s[:, i] for i in range(t - 2, -1, -1)]
        ff_list = [ff2s[:, i] for i in range(t - 1)]
        back = ftt_propagate(list(range(t - 1, -1, -1)), fb_list)
        fwd = ftt_propagate(list(range(t)), ff_list)

        fuse0 = Conv2d(144, 1, name="ftt_fusion0")
        fuse1 = Conv2d(144, 1, name="ftt_fusion1")
        conv2 = Conv2d(192, 1, name="conv_layer2")
        finals = []
        for i in range(t):
            o = jnp.concatenate([back[i], hf_fea[:, i], fwd[i]], -1)
            o = fuse1(lrelu(fuse0(o)))
            o = conv2(o) + dct_hf0[:, i]
            img = block_idct(o) + hf_p[:, i]
            finals.append(img[:, : hh - ph if ph else hh,
                              : ww - pw if pw else ww])
        out = jnp.stack(finals, 1)
        return jnp.transpose(out, (0, 1, 4, 2, 3))


def TTVSRNet(**kwargs) -> FTVSRNet:
    """TTVSR (mmedit restorers/ttvsr.py): FTVSR's trajectory-attention
    recurrent core without the FTT frequency transformer."""
    kwargs.setdefault("num_blocks", 60)
    return FTVSRNet(with_ftt=False, **kwargs)
