"""DUF — dynamic upsampling filters (reference sr_backbones/duf.py:1-64).

The reference expands the 3-channel input with an identity ``im2col`` conv
and matmuls against per-pixel generated filters.  TPU-native formulation:
the im2col expansion is a stack of (kh*kw) spatially shifted, zero-padded
copies (pure pads/slices, no gather), and the per-pixel filter application
is a single einsum that rides the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dynamic_upsampling_filter"]


def _shifted_taps(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, C, kh*kw) of zero-padded shifted copies.

    Tap t = dy*kw + dx reads x[h + dy - kh//2, w + dx - kw//2] (zero outside),
    matching a torch conv2d with the identity expansion filter and
    padding (kh//2, kw//2).
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    taps = [
        xp[:, dy : dy + h, dx : dx + w]
        for dy in range(kh)
        for dx in range(kw)
    ]
    return jnp.stack(taps, axis=-1)


def dynamic_upsampling_filter(x: jnp.ndarray, filters: jnp.ndarray,
                              filter_size: tuple = (5, 5)) -> jnp.ndarray:
    """Apply per-pixel dynamic upsampling filters (DUF).

    Args:
        x: (B, H, W, 3) input image (channels-last).
        filters: (B, H, W, kh*kw, up^2) generated filters — the same filters
            are applied to all 3 channels, as in the reference.

    Returns:
        (B, H, W, 3 * up^2) filtered maps, channel-fastest ordering
        ``c * up^2 + u`` matching the reference ``view(n, 3*up2, h, w)``.
    """
    kh, kw = filter_size
    if filters.shape[3] != kh * kw:
        raise ValueError(
            f"filters dim 3 ({filters.shape[3]}) != prod(filter_size) {kh * kw}")
    expanded = _shifted_taps(x, kh, kw)            # (B, H, W, 3, K)
    out = jnp.einsum("bhwck,bhwku->bhwcu", expanded, filters)
    b, h, w, c, u2 = out.shape
    return out.reshape(b, h, w, c * u2)
