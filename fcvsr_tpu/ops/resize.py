"""Exact-semantics spatial resizing as separable matrix products.

The reference pipeline leans on three distinct resize conventions
(see /root/reference/CVSR_train/arch/CVSR_freq.py):

* ``F.interpolate(mode='bilinear', align_corners=False)`` — the x4 bicubic
  base path and the cross-scale exchange in ``BlockRCB`` (CVSR_freq.py:623-632,
  2750).
* ``F.interpolate(mode='bilinear', align_corners=True)`` is *not* used; only
  ``grid_sample(align_corners=True)`` is (handled in ``warp.py``).
* torchvision ``Resize(..., BICUBIC)`` (antialias off for tensors) — the
  frequency-mask resize in ``Split_freq`` (CVSR_freq.py:2078).

Rather than port an interpolation loop, each resize is expressed as two dense
matmuls ``out = A_h @ x @ A_w^T`` with weight matrices precomputed on host.
On TPU this maps straight onto the MXU and fuses with neighbouring ops, and it
is bit-exact because we control every weight.  Weight matrices are cached per
(in_size, out_size, mode) since shapes are static under jit.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear",
    "resize_bicubic",
    "upsample2x_bilinear",
    "downsample2x_bilinear",
]


@functools.lru_cache(maxsize=None)
def _linear_weight_matrix(in_size: int, out_size: int, scale: float | None = None) -> np.ndarray:
    """Row-stochastic (out_size, in_size) matrix for half-pixel bilinear.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False)``: src = (dst + 0.5) * scale - 0.5, clamped.
    ``scale`` defaults to in/out (torch ``size=`` mode); pass it explicitly to
    reproduce torch ``scale_factor=`` mode, which uses the literal factor
    (differs from the ratio when sizes are odd).
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    if scale is None:
        scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    w[dst.astype(np.int64), lo] += 1.0 - frac
    w[dst.astype(np.int64), hi] += frac
    return w.astype(np.float32)


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with a=-0.75 (torch / OpenCV flavour)."""
    at = np.abs(t)
    at2 = at * at
    at3 = at2 * at
    out = np.where(
        at <= 1.0,
        (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0,
        np.where(at < 2.0, a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def _cubic_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix matching torch bicubic, align_corners=False,
    no antialiasing (torchvision tensor-mode ``Resize`` default).

    Coordinate arithmetic is done in float32 like torch's CPU kernel for
    float tensors — at 1024-scale sources the f32 rounding of the source
    coordinate is visible in the weights, and the Split_freq masks must match.
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    scale = np.float32(in_size / out_size)
    dst = np.arange(out_size, dtype=np.float32)
    src = (dst + np.float32(0.5)) * scale - np.float32(0.5)
    base = np.floor(src).astype(np.int64)
    frac = (src - base.astype(np.float32)).astype(np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        kw = _cubic_kernel(tap - frac)
        np.add.at(w, (np.arange(out_size), idx), kw)
    return w.astype(np.float32)


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply per-axis weight matrices to the H and W axes of ``x`` (..., H, W, C)
    or (..., H, W)."""
    import jax

    wh_j = jnp.asarray(wh, dtype=x.dtype)
    ww_j = jnp.asarray(ww, dtype=x.dtype)
    # HIGHEST precision keeps the MXU passes f32-exact — these resizes are
    # parity-critical (mask construction, bicubic base path).
    prec = jax.lax.Precision.HIGHEST
    if x.ndim >= 3:
        # (..., H, W, C): contract over H then W.
        y = jnp.einsum("oh,...hwc->...owc", wh_j, x, precision=prec)
        y = jnp.einsum("pw,...owc->...opc", ww_j, y, precision=prec)
    else:
        y = jnp.einsum("oh,hw->ow", wh_j, x, precision=prec)
        y = jnp.einsum("pw,ow->op", ww_j, y, precision=prec)
    return y


@functools.lru_cache(maxsize=None)
def _linear_weight_matrix_ac(in_size: int, out_size: int) -> np.ndarray:
    """Bilinear weights with align_corners=True: src = dst*(in-1)/(out-1)."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1 or out_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize; half-pixel centres by default (torch
    align_corners=False), or endpoint-aligned with ``align_corners=True``.

    ``x`` is (..., H, W, C) channels-last (or (H, W)).
    """
    h, w = (x.shape[-3], x.shape[-2]) if x.ndim >= 3 else x.shape
    if (h, w) == (out_h, out_w):
        return x
    mk = _linear_weight_matrix_ac if align_corners else _linear_weight_matrix
    return _apply_separable(x, mk(h, out_h), mk(w, out_w))


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic resize (a=-0.75, half-pixel, clamped, no antialias)."""
    h, w = (x.shape[-3], x.shape[-2]) if x.ndim >= 3 else x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, _cubic_weight_matrix(h, out_h), _cubic_weight_matrix(w, out_w))


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample matching torch ``scale_factor=2``, (..., H, W, C)."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(
        x, _linear_weight_matrix(h, h * 2, 0.5), _linear_weight_matrix(w, w * 2, 0.5)
    )


def downsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """0.5x bilinear downsample matching torch ``scale_factor=0.5``
    (floored output size, literal scale 2.0 even for odd inputs)."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(
        x, _linear_weight_matrix(h, h // 2, 2.0), _linear_weight_matrix(w, w // 2, 2.0)
    )
