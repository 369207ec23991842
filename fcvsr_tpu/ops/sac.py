"""Separable / iterative adaptive convolution (SAC / IAC).

Reference semantics: CVSR_freq.py:1230-1276 (/root/reference/CVSR_train/arch).
SAC applies a per-pixel, per-channel k-tap filter vertically then horizontally.
The reference builds it with ``unfold`` (materialising a (N,H,W,C,k) tensor);
here each pass is a shifted multiply-add over a replicate-padded tensor —
three VPU fmas per pass, no gather, fully fusible by XLA.

Bug compatibility: the reference applies ``kernel1`` in *both* passes
(CVSR_freq.py:1272-1273 — acknowledged in-code; shipped checkpoints were
trained this way).  ``kernel1_both`` preserves that; set it False for the
corrected operator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .warp import flow_warp

__all__ = ["sac", "iac", "set_iac_bwd", "set_iac_chain"]

# Backward used when warp_impl='pallas' routes through the fused IAC chain:
# 'gather' = VJP of the exact gather-path iac at the same primals (re-runs
# the gather forward — why --fast training measured slower for FCVSR);
# 'fused' = the Pallas adjoint kernels (ops/pallas_iac.py::_bwd_kernel —
# the exact adjoint of the FUSED chain, clamps included; f32 only).
_IAC_BWD = "gather"


def set_iac_bwd(bwd: str) -> None:
    global _IAC_BWD
    assert bwd in ("gather", "fused")
    _IAC_BWD = bwd


# Forward chain used when warp_impl='pallas': 'periter' = one fused kernel
# per iteration (the map round-trips HBM 6x); 'resident' = the whole chain
# in one kernel with the map ping-ponging between two VMEM buffers
# (pallas_iac.iac_fused_resident — HBM sees 1 read + 1 write; falls back
# to periter when the buffers don't fit, e.g. f32 at 640x400).
_IAC_CHAIN = "periter"


def set_iac_chain(chain: str) -> None:
    global _IAC_CHAIN
    assert chain in ("periter", "resident")
    _IAC_CHAIN = chain


def _directional_pass(x: jnp.ndarray, k: jnp.ndarray, ksize: int, axis: int,
                      tap_major: bool = False) -> jnp.ndarray:
    """One adaptive-filter pass along H (axis=1) or W (axis=2).

    x: (B, H, W, C);  k: (B, H, W, C*ksize).  Channel layout is
    ``c*ksize + tap`` by default (matching the torch ``view(N, H, W, C,
    ksize)`` of a channels-first conv output); ``tap_major`` selects the
    ``tap*C + c`` layout, whose per-tap slices are contiguous lanes on TPU
    (no strided relayout).  Replicate padding at the borders.
    """
    b, h, w, c = x.shape
    pad = (ksize - 1) // 2
    pad_cfg = [(0, 0)] * 4
    pad_cfg[axis] = (pad, pad)
    xp = jnp.pad(x, pad_cfg, mode="edge")
    kt = None if tap_major else k.reshape(b, h, w, c, ksize)
    out = jnp.zeros_like(x)
    size = h if axis == 1 else w
    for tap in range(ksize):
        sl = [slice(None)] * 4
        sl[axis] = slice(tap, tap + size)
        kk = k[..., tap * c : (tap + 1) * c] if tap_major else kt[..., tap]
        out = out + xp[tuple(sl)] * kk
    return out


def sac(
    x: jnp.ndarray,
    kernel1: jnp.ndarray,
    kernel2: jnp.ndarray,
    ksize: int = 3,
    kernel1_both: bool = True,
    tap_major: bool = False,
) -> jnp.ndarray:
    """Separable adaptive convolution: vertical pass then horizontal pass.

    x: (B, H, W, C); kernel1/kernel2: (B, H, W, C*ksize).
    """
    out = _directional_pass(x, kernel1, ksize, axis=1, tap_major=tap_major)
    k_h = kernel1 if kernel1_both else kernel2
    return _directional_pass(out, k_h, ksize, axis=2, tap_major=tap_major)


def iac(
    feat_in: jnp.ndarray,
    pred_k: jnp.ndarray,
    offsets: jnp.ndarray,
    ac_num: int,
    channels: int,
    ksize: int,
    act_last: bool = True,
    kernel1_both: bool = True,
    k1_only: bool = False,
    warp_impl: str = "gather",
    k_tap_major: bool = False,
    k_rows: bool = False,
    k_parts=None,
) -> jnp.ndarray:
    """Iterative adaptive convolution (CVSR_freq.py:1230-1250).

    feat_in: (B, H, W, C); pred_k: (B, H, W, ac_num*C*ksize*2);
    offsets: (AC, B, H, W, 2) flow fields (dx, dy per pixel).

    Each round: warp current features by offsets[i], filter with the i-th
    predicted separable kernel, add the *original* input as residual, then
    leaky-relu(0.1).

    ``k1_only``: pred_k holds only the kernel1 halves (ac_num*C*ksize
    channels) — valid when ``kernel1_both`` since kernel2 is never applied
    (the reference bug); the caller then skips computing kernel2 entirely.

    ``warp_impl``: 'gather' (bit-exact reference semantics) or 'pallas'
    (``pallas_iac.iac_fused`` — the whole warp+SAC+residual+lrelu iteration
    as one fused VMEM kernel with a per-tile bounded-deviation exactness
    contract, measured 1.25ms vs 2.30ms per iteration on TPU; see
    ops/pallas_iac.py).  The round-2 XLA 'stencil' variant was deleted
    after losing to both (4.3ms; benchmarks/microbench6.py history).
    """
    if k1_only:
        assert kernel1_both, "k1_only pred_k requires the kernel1-both path"
    if k_parts is not None:
        # fused kernel prediction (round 5): pred_k is None and the SAC
        # kernels come from (f0, wsel, bsel).  On the pallas path they are
        # computed IN-KERNEL (pallas_iac.iac_fused_kf — removes the
        # predicted-kernel tensor, the chain's dominant HBM stream);
        # everywhere else (exact path, unsupported configs) they are
        # materialized here and the call proceeds unchanged.
        assert pred_k is None and kernel1_both and k1_only and k_tap_major
        f0, wsel, bsel = k_parts
        b, h, w, _ = feat_in.shape
        if warp_impl == "pallas" and h % 8 == 0 and channels % 8 == 0 \
                and ksize == 3:
            from .pallas_iac import iac_fused_kf

            return iac_fused_kf(feat_in, f0, wsel, bsel, offsets, ac_num,
                                channels, act_last=act_last,
                                interpret=jax.default_backend() == "cpu")
        pred_k = (jnp.einsum("bhwc,ck->bhwk", f0.astype(jnp.float32),
                             wsel.astype(jnp.float32))
                  + bsel.astype(jnp.float32)).astype(feat_in.dtype)
        k_rows = False
    if warp_impl == "pallas":
        b, h, w, _ = feat_in.shape
        if kernel1_both and k1_only and k_tap_major and h % 8 == 0 \
                and channels % 8 == 0 and ksize == 3:
            return _iac_fused_diff(feat_in, pred_k, offsets, ac_num,
                                   channels, act_last, k_rows)
        warp_impl = "gather"  # unsupported configuration: exact fallback
    if k_rows:
        # the caller emitted rows-layout kernels (B, H, AC*ks*C, W) for the
        # fused path; the exact path consumes NHWC tap-major
        pred_k = jnp.transpose(pred_k, (0, 1, 3, 2))

    warp = flow_warp
    if k_tap_major:
        assert k1_only, "tap-major layout is only emitted on the k1 path"
    chunk = channels * ksize * (1 if k1_only else 2)
    feat = feat_in
    for i in range(ac_num):
        ks = pred_k[..., i * chunk : (i + 1) * chunk]
        k1 = ks[..., : channels * ksize]
        k2 = k1 if k1_only else ks[..., channels * ksize :]
        warped = warp(feat, offsets[i])
        feat = sac(warped, k1, k2, ksize, kernel1_both=kernel1_both,
                   tap_major=k_tap_major) + feat_in
        if i < ac_num - 1 or act_last:
            feat = jax.nn.leaky_relu(feat, 0.1)
    return feat


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _iac_fused_diff(feat_in, pred_k, offsets, ac_num, channels, act_last,
                    k_rows=False):
    """Fused Pallas IAC chain with the exact gather-path VJP.

    ``pallas_call`` has no autodiff rule; this makes ``warp_impl='pallas'``
    legal under ``jax.grad`` by pairing the fused forward
    (``pallas_iac.iac_fused``) with the VJP of the exact gather-path
    :func:`iac` at the same primals and flags (kernel1-both, k1-only,
    tap-major — the only configuration the fused kernel supports).  The
    backward re-runs the gather forward internally, so grad-mode cost is
    ``pallas_fwd + gather_fwd + gather_bwd``; the training win is the
    primal forward only.  Gradients are exact-path gradients (for the op
    in isolation, bit-identical to ``warp_impl='gather'``).
    """
    from .pallas_iac import iac_fused, iac_fused_resident

    fwd = iac_fused_resident if _IAC_CHAIN == "resident" else iac_fused
    return fwd(feat_in, pred_k, offsets, ac_num, channels,
               act_last=act_last, k_rows=k_rows,
               interpret=jax.default_backend() == "cpu")


def _iac_fused_diff_fwd(feat_in, pred_k, offsets, ac_num, channels,
                        act_last, k_rows=False):
    out = _iac_fused_diff(feat_in, pred_k, offsets, ac_num, channels,
                          act_last, k_rows)
    return out, (feat_in, pred_k, offsets)


def _iac_fused_diff_bwd(ac_num, channels, act_last, k_rows, res, g):
    feat_in, pred_k, offsets = res

    if _IAC_BWD == "fused" and feat_in.dtype == jnp.float32:
        from .pallas_iac import iac_fused_vjp

        return iac_fused_vjp(
            feat_in, pred_k, offsets, g, ac_num, channels,
            act_last=act_last, k_rows=k_rows,
            interpret=jax.default_backend() == "cpu")

    def exact(fi, pk, off):
        if k_rows:  # gradients flow back through the layout transpose
            pk = jnp.transpose(pk, (0, 1, 3, 2))
        return iac(fi, pk, off, ac_num, channels, 3, act_last=act_last,
                   kernel1_both=True, k1_only=True, warp_impl="gather",
                   k_tap_major=True)

    _, vjp = jax.vjp(exact, feat_in, pred_k, offsets)
    return vjp(g)


_iac_fused_diff.defvjp(_iac_fused_diff_fwd, _iac_fused_diff_bwd)
