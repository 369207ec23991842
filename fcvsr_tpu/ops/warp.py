"""Flow warping via gather-based bilinear sampling.

TPU-native replacement for ``F.grid_sample(align_corners=True,
padding_mode='zeros')`` as used by the reference ``flow_warp``
(/root/reference/CVSR_train/arch/CVSR_freq.py:1188-1227): the normalisation
round-trip there means sampling happens at absolute pixel coordinate
``(x + flow_x, y + flow_y)``, bilinear, with out-of-range corner taps
contributing zero.

We lower this to four masked gathers over a flattened spatial axis (one XLA
gather per corner), which vectorises over batch and channels and keeps the
compute on-chip.  All arrays are channels-last (B, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["flow_warp", "grid_sample_bilinear"]


def _gather_hw(x: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather x[b, iy[b,p], ix[b,p], :] -> (B, P, C).

    ``iy``/``ix`` must already be clipped to valid range.
    """
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    idx = iy * w + ix  # (B, P)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample_bilinear(x: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                         padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample ``x`` (B, H, W, C) at absolute pixel coords ``px``/``py`` (B, P).

    Bilinear, matching torch ``grid_sample(mode='bilinear', align_corners=True)``
    after its pixel-coordinate de-normalisation.  ``padding_mode``: 'zeros'
    (out-of-range corner taps contribute nothing) or 'border' (coordinates
    clamp to the edge, as SPyNet's warp uses).  Returns (B, P, C).
    """
    b, h, w, _ = x.shape
    if padding_mode == "border":
        px = jnp.clip(px, 0.0, w - 1)
        py = jnp.clip(py, 0.0, h - 1)
        src, oy, ox, hs, ws = x, 0, 0, h, w
    else:
        # zeros padding without predicate masks: surround the image with a
        # one-pixel zero ring and clamp gather indices into it — an OOB
        # corner tap lands on the ring (or fully clamps to it) and reads 0.
        # Mask-free keeps bool tensors out of the program entirely (TPU
        # runtimes dislike pred copies) and drops 4 VPU selects per tap.
        src = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        oy, ox, hs, ws = 1, 1, h + 2, w + 2
        # clamp far-out coordinates to land wholly inside the zero ring
        px = jnp.clip(px, -1.5, w + 0.5)
        py = jnp.clip(py, -1.5, h + 0.5)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(jnp.int32) + ox
    y0i = y0.astype(jnp.int32) + oy
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(yi, xi, wgt):
        yc = jnp.clip(yi, 0, hs - 1)
        xc = jnp.clip(xi, 0, ws - 1)
        v = _gather_hw(src, yc, xc)
        return v * wgt[..., None]

    out = corner(y0i, x0i, (1 - fy) * (1 - fx))
    out += corner(y0i, x1i, (1 - fy) * fx)
    out += corner(y1i, x0i, fy * (1 - fx))
    out += corner(y1i, x1i, fy * fx)
    return out


def grid_sample_nearest(x: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                        padding_mode: str = "zeros") -> jnp.ndarray:
    """Nearest-neighbour sampling (torch grid_sample mode='nearest',
    align_corners=True: round-half-to-even like std::nearbyint)."""
    b, h, w, _ = x.shape
    if padding_mode == "border":
        px = jnp.clip(px, 0.0, w - 1)
        py = jnp.clip(py, 0.0, h - 1)
        xi = jnp.round(px).astype(jnp.int32)
        yi = jnp.round(py).astype(jnp.int32)
        return _gather_hw(x, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
    # zeros padding, mask-free: zero ring + clamped indices (see bilinear)
    src = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xi = jnp.round(jnp.clip(px, -1.0, w + 0.0)).astype(jnp.int32) + 1
    yi = jnp.round(jnp.clip(py, -1.0, h + 0.0)).astype(jnp.int32) + 1
    return _gather_hw(src, jnp.clip(yi, 0, h + 1), jnp.clip(xi, 0, w + 1))


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "zeros",
              interpolation: str = "bilinear") -> jnp.ndarray:
    """Warp ``x`` (B, H, W, C) by ``flow`` (B, H, W, 2), flow[..., 0]=dx, [..., 1]=dy.

    Equivalent to the reference ``flow_warp`` (align_corners=True):
    output(y, x) = x_sampled(y + dy, x + dx).
    """
    b, h, w, c = x.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=x.dtype), jnp.arange(w, dtype=x.dtype), indexing="ij"
    )
    px = (gx[None] + flow[..., 0]).reshape(b, h * w)
    py = (gy[None] + flow[..., 1]).reshape(b, h * w)
    if interpolation == "nearest":
        out = grid_sample_nearest(x, px, py, padding_mode)
    else:
        out = grid_sample_bilinear(x, px, py, padding_mode)
    return out.reshape(b, h, w, c)
