"""RealBasicVSR — real-world VSR (reference sr_backbones/real_basicvsr_net.py).

Cleaning module (20 residual blocks + conv) applied up to 3 times with a
data-dependent early stop (mean |residue| < threshold), then BasicVSRNet.
The dynamic repeat count becomes a ``lax.while_loop`` so the whole forward
stays one compiled XLA program (no host round-trips per cleaning pass).
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

        if self.is_initializing():
            # trace once outside the while_loop so params are created
            frames, _ = clean_once(frames)
        else:
            def cond(state):
                i, _, res_mean = state
                return jnp.logical_and(i < 3, res_mean >= thres)

            def body(state):
                i, fr, _ = state
                fr, res_mean = clean_once(fr)
                return i + 1, fr, res_mean

            # first pass always runs (reference loops then breaks on residue)
            frames, res_mean = clean_once(frames)
            _, frames, _ = jax.lax.while_loop(cond, body,
                                              (jnp.int32(1), frames, res_mean))

        cleaned = jnp.transpose(
            frames.reshape(n, t, h, w, c), (0, 1, 4, 2, 3))

        outputs = BasicVSRNet(self.mid_channels, self.num_propagation_blocks,
                              name="basicvsr")(cleaned)
        if return_lqs:
            return outputs, cleaned
        return outputs
