"""RealBasicVSR — real-world VSR (reference sr_backbones/real_basicvsr_net.py).

Cleaning module (20 residual blocks + conv) applied up to 3 times with a
data-dependent early stop (mean |residue| < threshold), then BasicVSRNet.
The dynamic repeat count becomes ``lax.cond``-gated unrolled passes (a
``while_loop`` has no reverse-mode derivative and training needs gradients
through the cleaning module), so the whole forward stays one compiled XLA
program (no host round-trips per cleaning pass).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .basicvsr import BasicVSRNet, MMResidualBlocksWithInputConv
from .blocks import Conv2d

__all__ = ["RealBasicVSRNet"]


class _Cleaning(nn.Module):
    mid_channels: int = 64
    num_blocks: int = 20

    @nn.compact
    def __call__(self, x):  # (N, H, W, 3) -> residue (N, H, W, 3)
        feat = MMResidualBlocksWithInputConv(
            self.mid_channels, self.num_blocks, name="blocks")(x)
        return Conv2d(3, 3, name="conv")(feat)


class RealBasicVSRNet(nn.Module):
    """(B, T, 3, H, W) -> (B, T, 3, 4H, 4W) (+ cleaned lqs if requested).

    Reference: real_basicvsr_net.py:14-108.  ``dynamic_refine_thres`` is in
    0-255 units as in the reference (divided by 255 internally).
    """

    mid_channels: int = 64
    num_propagation_blocks: int = 20
    num_cleaning_blocks: int = 20
    dynamic_refine_thres: float = 255.0

    @nn.compact
    def __call__(self, lqs, return_lqs: bool = False):
        n, t, c, h, w = lqs.shape
        thres = self.dynamic_refine_thres / 255.0
        cleaning = _Cleaning(self.mid_channels, self.num_cleaning_blocks,
                             name="image_cleaning")

        frames = jnp.transpose(lqs, (0, 1, 3, 4, 2)).reshape(n * t, h, w, c)

        def clean_once(frames):
            residues = cleaning(frames)
            return frames + residues, jnp.mean(jnp.abs(residues))

        # Up to 3 cleaning passes with the reference's residue early-stop.
        # Expressed as lax.cond-gated unrolled passes (NOT a while_loop,
        # which has no reverse-mode derivative — training needs gradients
        # through the cleaning module).
        frames, res_mean = clean_once(frames)
        cont = res_mean >= thres
        for _ in range(2):
            frames, res_mean = jax.lax.cond(
                cont, clean_once, lambda f: (f, jnp.float32(0)), frames)
            cont = jnp.logical_and(cont, res_mean >= thres)

        cleaned = jnp.transpose(
            frames.reshape(n, t, h, w, c), (0, 1, 4, 2, 3))

        outputs = BasicVSRNet(self.mid_channels, self.num_propagation_blocks,
                              name="basicvsr")(cleaned)
        if return_lqs:
            return outputs, cleaned
        return outputs
