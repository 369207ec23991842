"""Frequency-domain helpers: rfft feature packing and Gaussian band splitting.

Conventions pinned to the reference (CVSR_freq.py, /root/reference/CVSR_train/arch):

* ``rfft_features`` — MGAA packs ``rfft2(norm='backward')`` as
  concat([imag, real]) along channels (CVSR_freq.py:1452-1465).  NOTE other
  reference modules use real-first packing; callers choose explicitly.
* ``irfft_features`` — MGAA *unpacks* with real-first ``chunk``
  (CVSR_freq.py:1497-1499): the first half is treated as the real part even
  though packing was imag-first.  We mirror that asymmetry faithfully.
* ``gaussian_band_masks`` / ``split_freq`` — the MFFR band split
  (CVSR_freq.py:2008-2101): concentric Gaussian rings built on a 1024x1024
  grid, bicubic-resized to (H, W), applied around an fftshift.  The reference
  loops over 64 channels in Python; here one batched fft2 + K batched ifft2s
  (masks pre-ifftshifted so no explicit shifts are needed at runtime).

All FFTs run in float32/complex64 — parity across QP checkpoints needs f32
spectra; bf16 is reserved for conv compute.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .resize import _cubic_weight_matrix

__all__ = [
    "rfft_features",
    "irfft_features",
    "gaussian_band_masks",
    "split_freq",
]


def rfft_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) real -> (B, H, Wf, 2C) with channels [imag..., real...].

    The optimization barriers keep XLA from fusing the FFT with its
    producers/consumers — the axon TPU runtime has returned UNIMPLEMENTED on
    some fused fft+slice+conv programs (see CLAUDE.md), and the barrier costs
    nothing measurable next to the FFT itself.
    """
    x = jax.lax.optimization_barrier(x.astype(jnp.float32))
    f = jnp.fft.rfft2(x, axes=(1, 2), norm="backward")
    out = jnp.concatenate([f.imag, f.real], axis=-1)
    return jax.lax.optimization_barrier(out).astype(x.dtype)


def irfft_features(xf: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H, Wf, 2C) -> (B, H, W, C): first channel half = real, second = imag
    (the reference's asymmetric unpack), irfft2 with output size (h, w)."""
    c2 = xf.shape[-1]
    xf32 = jax.lax.optimization_barrier(xf.astype(jnp.float32))
    real = xf32[..., : c2 // 2]
    imag = xf32[..., c2 // 2 :]
    f = jax.lax.complex(real, imag)
    out = jnp.fft.irfft2(f, s=(h, w), axes=(1, 2), norm="backward")
    return jax.lax.optimization_barrier(out).astype(xf.dtype)


@functools.lru_cache(maxsize=None)
def _band_masks_1024(num_bands: int, mode: str = "gaussian") -> np.ndarray:
    """(K, 1024, 1024) concentric band masks, fftshift-centred, float32.

    Band k is the k-th Gaussian low-pass minus all previous bands
    (CVSR_freq.py:2031-2049).
    """
    size = 1024
    length = math.sqrt((size / 2) ** 2 + (size / 2) ** 2)
    interval = length / num_bands
    a0 = size // 2
    d2 = (np.arange(size) - a0).astype(np.float64) ** 2
    dist2 = d2[:, None] + d2[None, :]
    bands = []
    for n in range(num_bands):
        if mode == "gaussian":
            pf = np.exp(-dist2 / (2.0 * (interval * (n + 1)) ** 2))
        elif mode == "butterworth":
            dist = np.sqrt(dist2)
            pf = 1.0 / (1.0 + np.power(dist / (interval * (n + 1)), 2 * (n + 1)))
        else:
            raise ValueError(f"unsupported mask mode: {mode}")
        pf = pf.astype(np.float32)
        for prev in bands:
            pf = pf - prev
        bands.append(pf)
    return np.stack(bands, axis=0)


@functools.lru_cache(maxsize=None)
def gaussian_band_masks(num_bands: int, h: int, w: int, mode: str = "gaussian"):
    """Masks resized to (h, w) with torch-bicubic, returned twice (as numpy —
    safe to cache across jax traces):

    (shifted)   (K, h, w) pre-ifftshifted for direct multiplication with fft2
                output — real(ifft2(fft2(x) * m)) == the reference's
                fftshift->mask->ifftshift dance.
    (centered)  (K, h, w) as the reference exposes them (for parity tests).
    """
    masks = _band_masks_1024(num_bands, mode)
    ah = _cubic_weight_matrix(1024, h)
    aw = _cubic_weight_matrix(1024, w)
    centered = np.einsum("oh,khw->kow", ah, masks)
    centered = np.einsum("pw,kow->kop", aw, centered)
    shifted = np.fft.ifftshift(centered, axes=(1, 2))
    return shifted.astype(np.float32), centered.astype(np.float32)


def split_freq(x: jnp.ndarray, num_bands: int, mode: str = "gaussian") -> jnp.ndarray:
    """Split (B, H, W, C) into (K, B, H, W, C) frequency bands.

    Equivalent to the reference per-channel fftn/fftshift/mask loop
    (CVSR_freq.py:2075-2101) but as one batched complex FFT round-trip.
    """
    b, h, w, c = x.shape
    shifted_np, _ = gaussian_band_masks(num_bands, h, w, mode)
    shifted = jnp.asarray(shifted_np)
    xf = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2))
    # (K, B, H, W, C) = ifft2(xf * mask_k)
    prod = xf[None, ...] * shifted[:, None, :, :, None].astype(jnp.complex64)
    out = jnp.fft.ifft2(prod, axes=(2, 3)).real
    return out.astype(x.dtype)
