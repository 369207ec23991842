"""LIIF — local implicit image function SR (reference sr_backbones/liif_net.py).

Continuous-resolution SR: an encoder trunk (EDSR or RDN, upsampler removed)
produces a feature map; an MLP (``imnet``) is queried at arbitrary continuous
coordinates with local ensembling over the 4 surrounding latent codes.

TPU notes: the reference's nearest grid_sample over query coordinates is a
flattened-index gather (like ops/warp); the 3x3 feature unfold is 9 shifted
pads (no gather); the MLP over all queries is a stack of batched matmuls.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import Conv2d

__all__ = ["LIIFEDSR", "LIIFRDN", "MLPRefiner", "make_coord"]


def make_coord(shape, ranges=None, flatten: bool = True) -> jnp.ndarray:
    """Pixel-centre coordinates in [-1, 1] (mmedit pipelines/utils.py).

    Returns (H*W, 2) (or (H, W, 2)) with (y, x) ordering like the reference.
    """
    seqs = []
    for i, n in enumerate(shape):
        lo, hi = (-1.0, 1.0) if ranges is None else ranges[i]
        r = (hi - lo) / (2 * n)
        seqs.append(lo + r + (2 * r) * jnp.arange(n, dtype=jnp.float32))
    gy, gx = jnp.meshgrid(seqs[0], seqs[1], indexing="ij")
    coord = jnp.stack([gy, gx], axis=-1)
    return coord.reshape(-1, 2) if flatten else coord


class MLPRefiner(nn.Module):
    """The LIIF imnet: plain ReLU MLP (mmedit components/refiners/mlp_refiner.py)."""

    in_dim: int
    out_dim: int = 3
    hidden_list: Sequence[int] = (256, 256, 256, 256)

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden_list):
            x = nn.relu(nn.Dense(h, name=f"fc{i}")(x))
        return nn.Dense(self.out_dim, name="fc_out")(x)


def _nearest_sample(feat: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """Nearest grid_sample, align_corners=False, over (y, x) coords in [-1,1].

    feat: (B, H, W, C); coord: (B, Q, 2).  Matches torch grid_sample(mode=
    'nearest', align_corners=False) after the reference's coord.flip(-1)
    (torch grids are (x, y); the reference stores (y, x) and flips).
    """
    b, h, w, c = feat.shape
    py = (coord[..., 0] + 1) * (h / 2) - 0.5
    px = (coord[..., 1] + 1) * (w / 2) - 0.5
    iy = jnp.clip(jnp.floor(py + 0.5).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(jnp.floor(px + 0.5).astype(jnp.int32), 0, w - 1)
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, (iy * w + ix)[..., None], axis=1)


def _unfold3x3(feat: jnp.ndarray) -> jnp.ndarray:
    """Concatenate the 3x3 neighbourhood (zero-padded) along channels.

    Channel layout c*9 + tap, matching torch ``F.unfold(feature, 3,
    padding=1).view(B, C*9, H, W)`` (channel-major, tap-minor) so imported
    checkpoints line up."""
    b, h, w, c = feat.shape
    xp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([xp[:, dy : dy + h, dx : dx + w]
                      for dy in range(3) for dx in range(3)], axis=-1)
    return taps.reshape(b, h, w, c * 9)


class _LIIFBase(nn.Module):
    """Shared query logic (liif_net.py:12-200)."""

    mid_channels: int = 64
    out_dim: int = 3
    local_ensemble: bool = True
    feat_unfold: bool = True
    cell_decode: bool = True
    imnet_hidden: Sequence[int] = (256, 256, 256, 256)

    def gen_feature(self, x):  # pragma: no cover - overridden
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, coord, cell):
        """x: (B, 3, h, w) NCHW; coord/cell: (B, Q, 2) -> (B, Q, out_dim)."""
        feature = self.gen_feature(jnp.transpose(x, (0, 2, 3, 1)))
        b, fh, fw, fc = feature.shape

        if self.feat_unfold:
            feature = _unfold3x3(feature)
        imnet_in = feature.shape[-1] + 2 + (2 if self.cell_decode else 0)
        imnet = MLPRefiner(imnet_in, self.out_dim,
                           tuple(self.imnet_hidden), name="imnet")

        if self.local_ensemble:
            vx_lst, vy_lst, eps = [-1, 1], [-1, 1], 1e-6
        else:
            vx_lst, vy_lst, eps = [0], [0], 0.0

        rx = 1.0 / fh
        ry = 1.0 / fw
        feat_coord = make_coord((fh, fw), flatten=False)  # (fh, fw, 2)
        feat_coord = jnp.broadcast_to(feat_coord[None], (b, fh, fw, 2))

        preds, areas = [], []
        for vx in vx_lst:
            for vy in vy_lst:
                shift = jnp.asarray([vx * rx + eps, vy * ry + eps],
                                    coord.dtype)
                coord_ = jnp.clip(coord + shift, -1 + 1e-6, 1 - 1e-6)
                q_feat = _nearest_sample(feature, coord_)
                q_coord = _nearest_sample(feat_coord, coord_)
                rel = (coord - q_coord) * jnp.asarray([fh, fw], coord.dtype)
                inp = jnp.concatenate([q_feat, rel], axis=-1)
                if self.cell_decode:
                    rel_cell = cell * jnp.asarray([fh, fw], cell.dtype)
                    inp = jnp.concatenate([inp, rel_cell], axis=-1)
                preds.append(imnet(inp))
                areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)

        total = sum(areas)
        if self.local_ensemble:
            areas = areas[::-1]
        out = sum(p * (a / total)[..., None] for p, a in zip(preds, areas))
        return out


class LIIFEDSR(_LIIFBase):
    """LIIF with the EDSR trunk (liif_net.py:205-260)."""

    num_blocks: int = 16
    res_scale: float = 1.0

    def gen_feature(self, y):
        y = Conv2d(self.mid_channels, 3, name="conv_first")(y)
        res = y
        for i in range(self.num_blocks):
            out = Conv2d(self.mid_channels, 3, name=f"block{i}_conv1")(res)
            out = nn.relu(out)
            out = Conv2d(self.mid_channels, 3, name=f"block{i}_conv2")(out)
            res = res + out * self.res_scale
        res = Conv2d(self.mid_channels, 3, name="conv_after_body")(res)
        return res + y


class LIIFRDN(_LIIFBase):
    """LIIF with the RDN trunk (liif_net.py:263-322)."""

    num_blocks: int = 16
    num_layers: int = 8
    channel_growth: int = 64

    def gen_feature(self, y):
        sfe1 = Conv2d(self.mid_channels, 3, name="sfe1")(y)
        sfe2 = Conv2d(self.mid_channels, 3, name="sfe2")(sfe1)
        feats = sfe2
        locals_ = []
        for bi in range(self.num_blocks):
            inp = feats
            layer_outs = []
            for li in range(self.num_layers):
                cat = jnp.concatenate([inp] + layer_outs, -1)
                o = nn.relu(Conv2d(self.channel_growth, 3,
                                   name=f"rdb{bi}_l{li}")(cat))
                layer_outs.append(o)
            lff = Conv2d(self.mid_channels, 1, name=f"rdb{bi}_lff")(
                jnp.concatenate([inp] + layer_outs, -1))
            feats = inp + lff
            locals_.append(feats)
        gff = Conv2d(self.mid_channels, 1, name="gff1")(
            jnp.concatenate(locals_, -1))
        gff = Conv2d(self.mid_channels, 3, name="gff2")(gff)
        return gff + sfe1
