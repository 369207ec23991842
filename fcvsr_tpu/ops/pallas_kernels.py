"""Pallas TPU kernels for the hot paths.

``sac_fused`` fuses both directional passes of the separable adaptive conv
(the hottest op inside IAC/MGAA — 6 iterations x 3 MGAA calls per forward,
SURVEY.md §3 "hot loops") into one VMEM-resident kernel: the vertical pass
result never round-trips to HBM, and the per-tap multiplies run on the VPU.

Current limitation: the grid is over batch only, so one program holds the
full (H, W, C) slab plus both kernel tensors in VMEM — fine up to roughly
96x128x64 f32, NOT yet at full Kimono shapes (272x480x64 needs ~105 MB).
Production-shape channel/row tiling (halo rows for the vertical taps) is a
round-2 item; until then ``use_pallas=None`` auto-selects the XLA shifted-add
fallback (ops.sac), which XLA fuses well on its own.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .sac import sac as sac_xla

__all__ = ["sac_fused"]


def _sac_kernel(x_ref, kv_ref, kh_ref, out_ref):
    """Blocks: x (1, H, W, C); kv/kh (1, H, W, C, 3); out (1, H, W, C)."""
    x = x_ref[0]
    kv = kv_ref[0]
    kh = kh_ref[0]
    h = x.shape[0]
    w = x.shape[1]

    # vertical pass with replicate padding: out[h] = sum_t x[clamp(h+t-1)]*kv[t]
    top = x[0:1]
    bot = x[h - 1 : h]
    xp = jnp.concatenate([top, x, bot], axis=0)
    acc = (xp[0:h] * kv[..., 0]
           + xp[1 : h + 1] * kv[..., 1]
           + xp[2 : h + 2] * kv[..., 2])

    # horizontal pass on the in-register intermediate
    left = acc[:, 0:1]
    right = acc[:, w - 1 : w]
    ap = jnp.concatenate([left, acc, right], axis=1)
    out_ref[0] = (ap[:, 0:w] * kh[..., 0]
                  + ap[:, 1 : w + 1] * kh[..., 1]
                  + ap[:, 2 : w + 2] * kh[..., 2])


@functools.partial(jax.jit, static_argnames=("kernel1_both", "interpret"))
def _sac_pallas(x, k1, k2, kernel1_both=True, interpret=False):
    from jax.experimental import pallas as pl

    b, h, w, c = x.shape
    kv = k1.reshape(b, h, w, c, 3)
    kh = (k1 if kernel1_both else k2).reshape(b, h, w, c, 3)

    return pl.pallas_call(
        _sac_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w, c, 3), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, w, c, 3), lambda i: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, kv, kh)


def sac_fused(x: jnp.ndarray, kernel1: jnp.ndarray, kernel2: jnp.ndarray,
              ksize: int = 3, kernel1_both: bool = True,
              use_pallas: bool | None = None) -> jnp.ndarray:
    """Separable adaptive conv; Pallas-fused on TPU, XLA elsewhere.

    Same contract as ``ops.sac.sac``.  ``use_pallas=None`` picks the Pallas
    kernel iff the default backend is TPU and ksize == 3.
    """
    if use_pallas is None:
        # VMEM budget: x + 2 kernel tensors (7x the x bytes) must fit ~16MB
        slab_bytes = 8 * x.shape[1] * x.shape[2] * x.shape[3] * x.dtype.itemsize
        use_pallas = (jax.default_backend() == "tpu" and ksize == 3
                      and slab_bytes < 12 * 1024 * 1024)
    if not use_pallas or ksize != 3:
        return sac_xla(x, kernel1, kernel2, ksize, kernel1_both)
    return _sac_pallas(x, kernel1, kernel2, kernel1_both)
