"""Block DCT and patch-grid utilities (TPU-native matmul formulations).

Rebuilds the reference 8x8 DCT layers (CVSR_train/arch/dct.py:8-68 and the
copy in the mmedit zoo): the strided grouped conv with a fixed cosine basis
becomes space-to-depth + one einsum against the orthonormal DCT matrix — the
exact same arithmetic, but MXU-shaped.  Also provides the unfold/fold
compositions and adaptive average pooling that FTVSR's cross-scale feature
extraction leans on (ftvsr.py:186-260), all as gathers/matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dct_basis",
    "block_dct",
    "block_idct",
    "space_to_depth",
    "depth_to_space",
    "patch_grid",
    "adaptive_avg_pool",
    "pad_images_for_dct",
    "resize_flow",
]


@functools.lru_cache(maxsize=None)
def dct_basis(n: int = 8) -> np.ndarray:
    """(n*n, n, n) orthonormal 2-D DCT-II filters, (u*n+v) indexed
    (dct.py:8-31 semantics)."""
    i = np.arange(n)
    basis_1d = np.cos(np.pi * np.outer(i, i + 0.5) / n) / np.sqrt(n)
    basis_1d[1:] *= np.sqrt(2.0)
    # filters[u, v, i, j] = b1d[u, i] * b1d[v, j]
    filt = np.einsum("ui,vj->uvij", basis_1d, basis_1d)
    return filt.reshape(n * n, n, n).astype(np.float32)


def space_to_depth(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/k, W/k, C*k*k), channel order (c, ky, kx)
    matching torch ``unfold(k, stride=k)``'s (c*kh*kw) layout."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # (B, hb, wb, C, ky, kx)
    return x.reshape(b, h // k, w // k, c * k * k)


def depth_to_space(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    b, hb, wb, ckk = x.shape
    c = ckk // (k * k)
    x = x.reshape(b, hb, wb, c, k, k)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, hb * k, wb * k, c)


def block_dct(x: jnp.ndarray, n: int = 8) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/n, W/n, C*n*n) DCT coefficients, channel order
    (c, u*n+v) — the torch grouped-conv output layout."""
    b, h, w, c = x.shape
    blocks = x.reshape(b, h // n, n, w // n, n, c)
    blocks = jnp.transpose(blocks, (0, 1, 3, 5, 2, 4))  # (B,hb,wb,C,n,n)
    basis = jnp.asarray(dct_basis(n))  # (n*n, n, n)
    coeff = jnp.einsum("bhwcij,kij->bhwck", blocks, basis,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    return coeff.reshape(b, h // n, w // n, c * n * n)


def block_idct(coeff: jnp.ndarray, n: int = 8) -> jnp.ndarray:
    """Inverse block DCT: (B, hb, wb, C*n*n) -> (B, hb*n, wb*n, C)."""
    b, hb, wb, cnn = coeff.shape
    c = cnn // (n * n)
    co = coeff.reshape(b, hb, wb, c, n * n)
    basis = jnp.asarray(dct_basis(n))
    blocks = jnp.einsum("bhwck,kij->bhwcij", co, basis,
                        preferred_element_type=jnp.float32).astype(coeff.dtype)
    blocks = jnp.transpose(blocks, (0, 1, 4, 2, 5, 3))
    return blocks.reshape(b, hb * n, wb * n, c)


def patch_grid(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """torch ``fold(unfold(x, k, pad, stride), out=(k*nb_h, k*nb_w), k, stride=k)``:
    overlapping kxk patches re-laid non-overlapping into a grid image.

    x: (B, H, W, C) -> (B, nb_h*k, nb_w*k, C).
    """
    b, h, w, c = x.shape
    nb_h = (h + 2 * pad - k) // stride + 1
    nb_w = (w + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    rows = (np.arange(nb_h) * stride)[:, None] + np.arange(k)[None]  # (nb_h, k)
    cols = (np.arange(nb_w) * stride)[:, None] + np.arange(k)[None]
    g = xp[:, rows.reshape(-1), :, :]           # (B, nb_h*k, W+2p, C)
    g = g[:, :, cols.reshape(-1), :]            # (B, nb_h*k, nb_w*k, C)
    return g


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch AdaptiveAvgPool windows: [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(..., H, W, C) adaptive average pooling, exact torch semantics."""
    ah = jnp.asarray(_adaptive_pool_matrix(x.shape[-3], out_h))
    aw = jnp.asarray(_adaptive_pool_matrix(x.shape[-2], out_w))
    prec = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hwc->...owc", ah, x, precision=prec)
    return jnp.einsum("pw,...owc->...opc", aw, y, precision=prec)


def pad_images_for_dct(imgs: jnp.ndarray, n: int = 8):
    """FTVSR ``check_and_padding_imgs`` (dct.py:70-93), quirks included:
    only the bottom-right *corner* is replicated (rows beyond it stay zero),
    and if either pad is zero nothing is copied at all.

    imgs: (B, T, H, W, C). Returns (padded, pad_h, pad_w).
    """
    b, t, h, w, c = imgs.shape
    nh = -(-h // n) * n
    nw = -(-w // n) * n
    ph, pw = nh - h, nw - w
    out = jnp.zeros((b, t, nh, nw, c), imgs.dtype)
    out = out.at[:, :, :h, :w].set(imgs)
    if ph > 0 and pw > 0:
        out = out.at[:, :, -ph:, -pw:].set(imgs[:, :, -ph:, -pw:])
    return out, ph, pw


def resize_flow(flow: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear-resize a flow field (B, H, W, 2) and rescale its components
    (mmedit resize_flow, size_type='shape', align_corners=False)."""
    from .resize import resize_bilinear

    h, w = flow.shape[1:3]
    out = resize_bilinear(flow, out_h, out_w)
    scale = jnp.asarray([out_w / w, out_h / h], out.dtype)
    return out * scale
