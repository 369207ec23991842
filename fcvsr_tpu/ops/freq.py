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
    "set_fft_impl",
]

# 'fft' uses jnp.fft (native FFT HLO); 'dft' lowers the packed-feature
# transforms to explicit DFT matmuls (pure MXU — sidesteps the axon
# terminal's UNIMPLEMENTED on fft-adjacent fusions, see CLAUDE.md, at a few
# percent extra FLOPs).  'auto' picks 'dft' on TPU backends.
_FFT_IMPL = "auto"
# Cooley-Tukey factored stages on the compute_dtype fast path: 8x fewer
# H-DFT FLOPs at H=272, but 4 small-K einsums + twiddle passes instead of
# one big contraction.  MEASURED CLOSURE (round 4, TPU @272x480x192):
# rfft192_bf16 0.757 ms direct vs 4.016 ms CT — a 5.3x LOSS; the
# small-K (16/17) contractions and twiddle broadcasts are relayout-
# dominated, and the direct bf16 DFT was already near roofline.  Stays
# opt-in (off) as measurement provenance with goldens at 5 sizes.
_DFT_CT = False


def set_fft_impl(impl: str) -> None:
    global _FFT_IMPL
    assert impl in ("fft", "dft", "auto")
    _FFT_IMPL = impl


def set_dft_ct(enabled: bool) -> None:
    """Enable/disable the factored (Cooley-Tukey) fast-path DFT stages."""
    global _DFT_CT
    _DFT_CT = bool(enabled)


def _use_dft() -> bool:
    if _FFT_IMPL == "auto":
        return jax.default_backend() == "tpu"
    return _FFT_IMPL == "dft"


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """cos/sin DFT matrices (n, n): C[k,m]=cos(2πkm/n), S[k,m]=sin(2πkm/n)."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irdft_mats(w: int):
    """(w, wf) matrices for irfft along the last spatial axis:
    x[n] = A_c @ X_re - A_s @ X_im."""
    wf = w // 2 + 1
    k = np.arange(wf)
    n = np.arange(w)
    ang = 2.0 * np.pi * np.outer(n, k) / w
    wgt = np.full(wf, 2.0)
    wgt[0] = 1.0
    if w % 2 == 0:
        wgt[-1] = 1.0
    a_c = (np.cos(ang) * wgt / w).astype(np.float32)
    a_s = (np.sin(ang) * wgt / w).astype(np.float32)
    return a_c, a_s


@functools.lru_cache(maxsize=None)
def _ct_split(n: int):
    """Most balanced factor pair (n1, n2) with n1*n2 = n, or None if prime.
    Numpy-land only (tracer-leak rule does not apply — ints)."""
    best = None
    for a in range(2, int(n ** 0.5) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


@functools.lru_cache(maxsize=None)
def _ct_mats(n: int):
    """Cooley-Tukey two-stage DFT constants for length n = n1*n2:
    (c1, s1) n1-point DFT matrices, twiddle grids (tc, ts) of shape
    (n1, n2) with T[k1, n2] = exp(-2πi k1 n2 / n), and (c2, s2) n2-point
    matrices.  All numpy (cached jnp constants leak tracers — CLAUDE.md)."""
    n1, n2 = _ct_split(n)
    c1, s1 = _dft_mats(n1)
    c2, s2 = _dft_mats(n2)
    ang = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    return (c1, s1, np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32), c2, s2)


def _dft_h_ct(xr, xi, compute_dtype):
    """Complex DFT along axis 1 of (B, H, K, C) via two-stage Cooley-Tukey
    matmuls (H = H1*H2): 8x fewer FLOPs than the direct H x H contraction
    at H=272 (16*17).  Single-pass ``compute_dtype`` with f32 accumulation
    — fast-path only (the parity path keeps the direct HIGHEST matmuls).

    Decimation-in-time over h = H2*h1 + h2 (the natural reshape):
      A[k1, h2]  = Σ_{h1} x[h1, h2] W_{H1}^{h1 k1}
      B[k1, h2]  = A * W_H^{k1 h2}
      X[H1*k2 + k1] = Σ_{h2} B[k1, h2] W_{H2}^{h2 k2}
    so the (k2, k1) output reshape IS the natural frequency order."""
    b, h, kk, c = xr.shape
    h1, h2 = _ct_split(h)
    c1, s1, tc, ts, c2, s2 = (jnp.asarray(m, compute_dtype)
                              for m in _ct_mats(h))

    def ein(spec, a, m):
        return jnp.einsum(spec, a.astype(compute_dtype), m,
                          preferred_element_type=jnp.float32)

    xr_ = xr.reshape(b, h1, h2, kk, c)
    xi_ = xi.reshape(b, h1, h2, kk, c)
    # stage 1: (cos - i sin) @ (xr + i xi) over h1
    ar = ein("bhnkc,mh->bmnkc", xr_, c1) + ein("bhnkc,mh->bmnkc", xi_, s1)
    ai = ein("bhnkc,mh->bmnkc", xi_, c1) - ein("bhnkc,mh->bmnkc", xr_, s1)
    # twiddle (tc - i ts) elementwise over (k1=m, h2=n)
    tcb = tc[None, :, :, None, None]
    tsb = ts[None, :, :, None, None]
    br = ar * tcb + ai * tsb
    bi = ai * tcb - ar * tsb
    # stage 2 over h2; output dims (b, k2, k1, K, C) -> natural H order
    yr = ein("bmnkc,pn->bpmkc", br, c2) + ein("bmnkc,pn->bpmkc", bi, s2)
    yi = ein("bmnkc,pn->bpmkc", bi, c2) - ein("bmnkc,pn->bpmkc", br, s2)
    return (yr.reshape(b, h, kk, c), yi.reshape(b, h, kk, c))


def _dft_w_ct(x, wf, compute_dtype):
    """Real-input DFT along axis 2 of (B, H, W, C) via two-stage
    Cooley-Tukey (W = W1*W2), returning (re, im) sliced to k < wf.
    The full-W second stage plus slice still beats the direct (Wf x W)
    rDFT contraction ~3.5x in FLOPs at W=480.  Fast-path only."""
    b, h, w, c = x.shape
    w1, w2 = _ct_split(w)
    c1, s1, tc, ts, c2, s2 = (jnp.asarray(m, compute_dtype)
                              for m in _ct_mats(w))

    def ein(spec, a, m):
        return jnp.einsum(spec, a.astype(compute_dtype), m,
                          preferred_element_type=jnp.float32)

    x_ = x.reshape(b, h, w1, w2, c)
    ar = ein("bhwnc,mw->bhmnc", x_, c1)
    ai = -ein("bhwnc,mw->bhmnc", x_, s1)
    tcb = tc[None, None, :, :, None]
    tsb = ts[None, None, :, :, None]
    br = ar * tcb + ai * tsb
    bi = ai * tcb - ar * tsb
    yr = ein("bhmnc,pn->bhpmc", br, c2) + ein("bhmnc,pn->bhpmc", bi, s2)
    yi = ein("bhmnc,pn->bhpmc", bi, c2) - ein("bhmnc,pn->bhpmc", br, s2)
    yr = yr.reshape(b, h, w, c)[:, :, :wf]
    yi = yi.reshape(b, h, w, c)[:, :, :wf]
    return yr, yi


def _dft_rfft2(x: jnp.ndarray, compute_dtype=None):
    """(B, H, W, C) real -> (re, im) each (B, H, Wf, C), via MXU matmuls.

    ``compute_dtype=bfloat16`` runs each contraction as a single bf16 MXU
    pass with f32 accumulation (vs ~6 passes for HIGHEST-precision f32) —
    the deployment-path option behind ``MGAA(head_dtype='bf16')``; the
    default stays HIGHEST f32 (checkpoint-parity spectra).
    """
    b, h, w, c = x.shape
    wf = w // 2 + 1
    cw, sw = _dft_mats(w)
    fast = compute_dtype is not None
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST

    def ein(spec, a, m):
        if fast:
            return jnp.einsum(spec, a.astype(compute_dtype),
                              m.astype(compute_dtype), precision=prec,
                              preferred_element_type=jnp.float32)
        return jnp.einsum(spec, a, m, precision=prec)

    # rDFT along W: X[k] = sum_n x[n] (cos - i sin)(2πkn/W), keep k < Wf.
    # Fast path: two-stage Cooley-Tukey when W factors (~3.5x fewer FLOPs
    # at W=480) — bounded-deviation deployment option.
    if fast and _DFT_CT and _ct_split(w) is not None:
        xr, xi = _dft_w_ct(x, wf, compute_dtype)
    else:
        cw = jnp.asarray(cw[:wf])  # (Wf, W)
        sw = jnp.asarray(sw[:wf])
        xr = ein("bhwc,kw->bhkc", x, cw)
        xi = -ein("bhwc,kw->bhkc", x, sw)
    # full DFT along H on complex.  Fast path: two-stage Cooley-Tukey
    # matmuls when H factors (8x fewer FLOPs at H=272) — bounded-deviation
    # deployment option like the rest of the compute_dtype path; the
    # parity path keeps the direct HIGHEST-precision contraction.
    if fast and _DFT_CT and _ct_split(h) is not None:
        return _dft_h_ct(xr, xi, compute_dtype)
    ch, sh = _dft_mats(h)
    ch = jnp.asarray(ch)
    sh = jnp.asarray(sh)
    yr = (ein("bhkc,mh->bmkc", xr, ch) + ein("bhkc,mh->bmkc", xi, sh))
    yi = (ein("bhkc,mh->bmkc", xi, ch) - ein("bhkc,mh->bmkc", xr, sh))
    return yr, yi


def _dft_irfft2(re: jnp.ndarray, im: jnp.ndarray, h: int, w: int,
                compute_dtype=None):
    """(B, H, Wf, C) complex parts -> (B, H, W, C) real, via MXU matmuls.

    ``compute_dtype=bfloat16`` mirrors ``_dft_rfft2``: single bf16 MXU pass
    per contraction with f32 accumulation (deployment option); default stays
    HIGHEST f32 (checkpoint-parity spectra)."""
    fast = compute_dtype is not None
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST

    def ein(spec, a, m):
        if fast:
            return jnp.einsum(spec, a.astype(compute_dtype),
                              m.astype(compute_dtype), precision=prec,
                              preferred_element_type=jnp.float32)
        return jnp.einsum(spec, a, m, precision=prec)

    ch, sh = _dft_mats(h)
    ch = jnp.asarray(ch) / h
    sh = jnp.asarray(sh) / h
    # inverse DFT along H: Z[t] = (1/H) sum_m Y[m] e^{+2πimt/H}
    zr = ein("bmkc,tm->btkc", re, ch) - ein("bmkc,tm->btkc", im, sh)
    zi = ein("bmkc,tm->btkc", im, ch) + ein("bmkc,tm->btkc", re, sh)
    a_c, a_s = _irdft_mats(w)
    return (ein("btkc,nk->btnc", zr, jnp.asarray(a_c))
            - ein("btkc,nk->btnc", zi, jnp.asarray(a_s)))


def rfft_features(x: jnp.ndarray, compute_dtype=None,
                  groups: int = 1) -> jnp.ndarray:
    """(B, H, W, C) real -> (B, H, Wf, 2C) with channels [imag..., real...].

    The optimization barriers keep XLA from fusing the FFT with its
    producers/consumers — the axon TPU runtime has returned UNIMPLEMENTED on
    some fused fft+slice+conv programs (see CLAUDE.md), and the barrier costs
    nothing measurable next to the FFT itself.  On TPU the transform runs as
    explicit DFT matmuls (`set_fft_impl`).

    ``compute_dtype``: if set (DFT path only), the transform runs single-pass
    in that dtype with f32 accumulation and the packed output is stored in it
    — the ``head_dtype='bf16'`` deployment option (bounded deviation).

    ``groups=g``: emit channels group-interleaved —
    ``[imag(C/g), real(C/g)] * g`` — so a consumer treating the input as g
    stacked feature groups (MGAA's three temporal groups) reads each packed
    group as ONE contiguous slice instead of re-concatenating an imag slice
    with a real slice.  Same values per channel, same single concat to
    build; only the channel order differs (g=1 is the classic layout).
    """
    dt = compute_dtype if compute_dtype is not None else x.dtype
    c = x.shape[-1]
    assert c % groups == 0
    g = c // groups

    def pack(im, re):
        if groups == 1:
            return jnp.concatenate([im, re], axis=-1)
        parts = []
        for i in range(groups):
            parts += [im[..., i * g : (i + 1) * g],
                      re[..., i * g : (i + 1) * g]]
        return jnp.concatenate(parts, axis=-1)

    if _use_dft():
        re, im = _dft_rfft2(x.astype(jnp.float32), compute_dtype)
        return pack(im, re).astype(dt)
    x = jax.lax.optimization_barrier(x.astype(jnp.float32))
    f = jnp.fft.rfft2(x, axes=(1, 2), norm="backward")
    out = pack(f.imag, f.real)
    return jax.lax.optimization_barrier(out).astype(dt)


def irfft_features(xf: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H, Wf, 2C) -> (B, H, W, C): first channel half = real, second = imag
    (the reference's asymmetric unpack), irfft2 with output size (h, w)."""
    c2 = xf.shape[-1]
    if _use_dft():
        xf32 = xf.astype(jnp.float32)
        real = xf32[..., : c2 // 2]
        imag = xf32[..., c2 // 2 :]
        # note irfft2 with s=(h, w) implicitly zero-pads/crops the freq grid;
        # FCVSR always passes matching shapes so no padding path is needed.
        out = _dft_irfft2(real, imag, h, w)
        return out.astype(xf.dtype)
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


@functools.lru_cache(maxsize=None)
def _band_masks_halfplane(num_bands: int, h: int, w: int, mode: str):
    """Symmetrized half-plane masks (K, H, Wf) for the rDFT band split.

    The reference keeps only ``ifft2(mask * fft2(x)).real``; for a real input
    that equals an irfft2 with the *negation-symmetrized* mask
    M_eff[q] = (M[q] + M[-q]) / 2 — exactly, including the (bicubic-resize
    induced) half-pixel asymmetry of the masks.
    """
    shifted, _ = gaussian_band_masks(num_bands, h, w, mode)
    flipped = shifted[:, (-np.arange(h)) % h][:, :, (-np.arange(w)) % w]
    sym = 0.5 * (shifted + flipped)
    return np.ascontiguousarray(sym[:, :, : w // 2 + 1]).astype(np.float32)


def split_freq(x: jnp.ndarray, num_bands: int, mode: str = "gaussian",
               compute_dtype=None) -> jnp.ndarray:
    """Split (B, H, W, C) into (K, B, H, W, C) frequency bands.

    Equivalent to the reference per-channel fftn/fftshift/mask loop
    (CVSR_freq.py:2075-2101) but as one batched FFT round-trip.  On TPU the
    round-trip runs as rDFT matmuls on the MXU with symmetrized half-plane
    masks (identical output — the reference discards the imaginary part,
    which is what the symmetrization reproduces; ~4x faster than the native
    complex-FFT path through the axon runtime).

    ``compute_dtype=bfloat16``: single-pass bf16 DFT matmuls with f32
    accumulation AND bf16 storage of the (B, H, Wf, C*K) masked spectra —
    the big intermediate of the batched band split.  Bands come back in
    ``compute_dtype`` (the ``mffr_dtype='bf16'`` deployment option,
    bounded deviation).
    """
    b, h, w, c = x.shape
    dt = compute_dtype if compute_dtype is not None else x.dtype
    if _use_dft():
        m = jnp.asarray(_band_masks_halfplane(num_bands, h, w, mode))
        re, im = _dft_rfft2(x.astype(jnp.float32), compute_dtype)
        # one batched irfft over all K bands: masking is per-(k, h, w) so
        # the K*C channel block shares the two inverse-DFT contractions —
        # identical per-channel math, one big MXU matmul instead of K small
        mt = jnp.transpose(m, (1, 2, 0))               # (H, Wf, K)
        if compute_dtype is not None:
            re = re.astype(compute_dtype)
            im = im.astype(compute_dtype)
            mt = mt.astype(compute_dtype)
        reb = (re[..., None] * mt[None, :, :, None, :]) \
            .reshape(b, h, w // 2 + 1, num_bands * c)  # (B,H,Wf,C*K)
        imb = (im[..., None] * mt[None, :, :, None, :]) \
            .reshape(b, h, w // 2 + 1, num_bands * c)
        out = _dft_irfft2(reb, imb, h, w, compute_dtype)  # (B, H, W, C*K)
        out = out.reshape(b, h, w, c, num_bands)
        return jnp.transpose(out, (4, 0, 1, 2, 3)).astype(dt)
    shifted_np, _ = gaussian_band_masks(num_bands, h, w, mode)
    shifted = jnp.asarray(shifted_np)
    xf = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2))
    # (K, B, H, W, C) = ifft2(xf * mask_k)
    prod = xf[None, ...] * shifted[:, None, :, :, None].astype(jnp.complex64)
    out = jnp.fft.ifft2(prod, axes=(2, 3)).real
    return out.astype(dt)
