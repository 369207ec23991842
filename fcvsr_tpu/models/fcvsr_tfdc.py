"""FCVSR TFDC variant (CVSR_train/arch/CVSR_freq_S.py:1283-1352 GShiftNet).

Same FCVSR topology but with TFDC (temporal-frequency difference
compensation) replacing MGAA alignment, SpaFreqBlock (Fourier-gate + spatial
attention rounds) replacing MFFR, and the plain width-4 SCNet (3 groups, no
context blocks) as the reconstruction trunk.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .blocks import Conv2d, PReLU, pixel_shuffle
from .blocks_ext import SpaFreqBlock, TFDC
from .sidecvsr import _SCNetWide

__all__ = ["FCVSRTFDCNet"]


class FCVSRTFDCNet(nn.Module):
    """(B, 7, 1, H, W) -> (B, 1, 4H, 4W)."""

    n_feats: int = 64
    sc_groups: int = 3

    @nn.compact
    def __call__(self, x):
        b, t, c, h, w = x.shape
        nf = self.n_feats
        center = jnp.transpose(x[:, t // 2], (0, 2, 3, 1))
        feats = jnp.transpose(x, (0, 3, 4, 1, 2)).reshape(b, h, w, t * c)

        lrelu = PReLU(name="lrelu")
        tfdc = TFDC(nf, name="TFDC")

        feat = Conv2d(t * nf, 3, name="feat_extract")(feats)
        f1 = feat[..., : 3 * nf]
        f2 = feat[..., 3 * nf : 4 * nf]
        f3 = feat[..., 4 * nf :]
        g1 = tfdc(f1)
        g3 = tfdc(f3)
        g2 = tfdc(jnp.concatenate([g1, f2, g3], -1))

        dec = SpaFreqBlock(nf, name="Spa_freqblock0")(g2)
        dec1 = Conv2d(nf, 3, stride=2, name="rconcat1")(dec)
        dec2 = Conv2d(nf, 3, stride=2, name="rconcat2")(dec1)
        l1, l2, l3 = _SCNetWide(nf, self.sc_groups, name="recorb1")(
            [dec, dec1, dec2])

        out_l3 = lrelu(Conv2d(nf, 1, name="upconv1_L3")(l3))
        out_l3_1 = pixel_shuffle(out_l3)
        out_l3_2 = pixel_shuffle(out_l3_1)
        out_l2 = lrelu(Conv2d(nf, 1, name="upconv1_L2")(l2))
        out_l2 = pixel_shuffle(
            out_l2 + Conv2d(nf, 1, name="upconv1_L2_2")(
                jnp.concatenate([out_l2, out_l3_1], -1)))
        fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
        fuse = Conv2d(nf, 3, name="recorb0")(
            Conv2d(nf, 3, name="upconv_fuse")(fuse))
        out = lrelu(pixel_shuffle(Conv2d(nf * 4, 3, name="upconv1")(fuse)))
        out = lrelu(pixel_shuffle(Conv2d(nf * 4, 3, name="upconv2")(out)))
        out = Conv2d(c, 3, name="conv_last0")(out)
        base = resize_bilinear(center, 4 * h, 4 * w)
        return jnp.transpose(out + base, (0, 3, 1, 2))
