"""Deformable convolution v1/v2 (TPU-native gather + matmul).

Equivalent of the reference CUDA extension (CVSR_train/arch/ops/dcn/src/
deform_conv_cuda.cpp + deform_conv_cuda_kernel.cu, ~2.6 kLoC) and the mmcv
``ModulatedDeformConv2d`` consumed by the zoo backbones (EDVR, BasicVSR++,
IconVSR, TDAN).  Instead of a handwritten kernel pair, the sampling step is
expressed as K masked bilinear gathers (deformable im2col) and the reduction
as one ``einsum`` that XLA tiles onto the MXU; the backward pass falls out of
autodiff through the same graph — no custom VJP needed for correctness, and
the gather/matmul split is the layout a Pallas kernel would use too.

Semantics (DCNv2): out(p) = sum_k w_k * m_k(p) * x(p0 + k + dp_k(p)), with
bilinear sampling and zero padding outside the frame; offset channels are
(deform_group, k, [dy, dx]) ordered, mask channels (deform_group, k).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .warp import grid_sample_bilinear

__all__ = ["deform_conv2d", "modulated_deform_conv2d", "set_dcn_impl",
           "set_dcn_bwd"]

# 'gather' = the exact XLA formulation below (differentiable — training uses
# it); 'pallas' routes supported 3x3/stride-1 configs through the fused
# windowed-stencil kernel (ops/pallas_dcn.py, custom-VJP'd — legal under
# jax.grad; measured vs gather in benchmarks/microbench_dcn.py).  Follows
# the set_fft_impl pattern.
_DCN_IMPL = "gather"

# Backward used by the 'pallas' impl: 'gather' = exact gather-path VJP
# (bit-matches gather-impl training for the op in isolation, but re-runs
# the gather forward — the dominant cost of DCN training on TPU);
# 'fused' = the Pallas adjoint kernel (ops/pallas_dcn.py::_bwd_kernel —
# the exact adjoint of the FUSED forward, clamps included).
_DCN_BWD = "gather"


def set_dcn_impl(impl: str) -> None:
    global _DCN_IMPL
    assert impl in ("gather", "pallas")
    _DCN_IMPL = impl


def set_dcn_bwd(bwd: str) -> None:
    global _DCN_BWD
    assert bwd in ("gather", "fused")
    _DCN_BWD = bwd


def _deform_im2col(x, offset, kernel_size, stride, padding, dilation,
                   deform_groups):
    """Gather deformed samples.

    x: (B, H, W, C); offset: (B, Ho, Wo, dg*K*2) with last-dim layout
    (dg, k, [dy, dx]).  Returns (B, Ho, Wo, K, C).
    """
    b, h, w, c = x.shape
    kh, kw = kernel_size
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deform_groups
    cg = c // dg

    off = offset.reshape(b, ho, wo, dg, k, 2)
    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    tap_y = jnp.repeat(jnp.arange(kh) * dilation, kw)
    tap_x = jnp.tile(jnp.arange(kw) * dilation, kh)

    # sample positions: (B, Ho, Wo, dg, K)
    py = (base_y[None, :, None, None, None]
          + tap_y[None, None, None, None, :]
          + off[..., 0])
    px = (base_x[None, None, :, None, None]
          + tap_x[None, None, None, None, :]
          + off[..., 1])

    # TPU gather throughput scales with row width: gather FULL-channel rows
    # at every group's positions and slice each group's channel block
    # afterwards — dg x more logical bytes but wider rows; measured 1.8x
    # (132 -> 73.5ms) at EDVR shape (184x320x64, dg=8) vs per-group
    # small-row gathers.
    pyg = jnp.moveaxis(py, 3, 1).reshape(b, dg * ho * wo * k)
    pxg = jnp.moveaxis(px, 3, 1).reshape(b, dg * ho * wo * k)
    sg = grid_sample_bilinear(x, pxg, pyg)           # (B, dg*P, C)
    sg = sg.reshape(b, dg, ho, wo, k, c)
    sel = [sg[:, g, :, :, :, g * cg : (g + 1) * cg] for g in range(dg)]
    return jnp.concatenate(sel, axis=-1)             # (B, Ho, Wo, K, C)


def modulated_deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """DCNv2 forward.

    x: (B, H, W, Cin); offset: (B, Ho, Wo, dg*K*2); mask: (B, Ho, Wo, dg*K)
    already sigmoided (or None for DCNv1); weight: (kh, kw, Cin//groups, Cout).
    Returns (B, Ho, Wo, Cout).
    """
    if _DCN_IMPL == "pallas":
        return _fused_diff(x, offset, mask, weight, bias, stride, padding,
                           dilation, groups, deform_groups)
    return _gather_forward(x, offset, mask, weight, bias, stride, padding,
                           dilation, groups, deform_groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_diff(x, offset, mask, weight, bias, stride, padding, dilation,
                groups, deform_groups):
    """Fused Pallas forward with a selectable VJP (see ``set_dcn_bwd``).

    ``pallas_call`` has no autodiff rule, so without this wrapper
    ``set_dcn_impl('pallas')`` would be forward-only.  Backward choices:

    * 'gather' (default): the VJP of :func:`_gather_forward` evaluated at
      the same primals — the gradients a training run on the exact path
      would produce (bit-identical for the op in isolation; through a
      composed model the cotangents arriving at this op inherit the fused
      forward's bounded per-tile deviation).  Cost: re-runs the gather
      forward to build its VJP, so grad-mode total is ``pallas_fwd +
      gather_fwd + gather_bwd`` — the gather backward dominates DCN-family
      training time on TPU.
    * 'fused': the Pallas adjoint kernel
      (:func:`..pallas_dcn.modulated_deform_conv2d_fused_vjp`) — the exact
      adjoint of the fused forward (same windows/bases/clamps), at conv
      speed.  Where the two forwards agree (offset deviations within
      ``radius``), its gradients match the gather VJP to fp tolerance.
    """
    from .pallas_dcn import modulated_deform_conv2d_fused

    return modulated_deform_conv2d_fused(
        x, offset, mask, weight, bias, stride, padding, dilation,
        groups, deform_groups, interpret=jax.default_backend() == "cpu")


def _fused_diff_fwd(x, offset, mask, weight, bias, stride, padding,
                    dilation, groups, deform_groups):
    out = _fused_diff(x, offset, mask, weight, bias, stride, padding,
                      dilation, groups, deform_groups)
    return out, (x, offset, mask, weight, bias)


def _fused_diff_bwd(stride, padding, dilation, groups, deform_groups,
                    res, g):
    x, offset, mask, weight, bias = res
    if _DCN_BWD == "fused":
        from .pallas_dcn import modulated_deform_conv2d_fused_vjp

        return modulated_deform_conv2d_fused_vjp(
            x, offset, mask, weight, bias, g, stride, padding, dilation,
            groups, deform_groups,
            interpret=jax.default_backend() == "cpu")
    _, vjp = jax.vjp(
        lambda *a: _gather_forward(*a, stride, padding, dilation, groups,
                                   deform_groups),
        x, offset, mask, weight, bias)
    return vjp(g)


_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def _gather_forward(x, offset, mask, weight, bias=None, stride=1, padding=1,
                    dilation=1, groups=1, deform_groups=1):
    """The exact XLA gather+einsum forward (differentiable)."""
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    cols = _deform_im2col(x, offset, (kh, kw), stride, padding, dilation,
                          deform_groups)  # (B, Ho, Wo, K, Cin)
    if mask is not None:
        b, ho, wo = mask.shape[:3]
        m = mask.reshape(b, ho, wo, deform_groups, k)
        m = jnp.repeat(m, x.shape[-1] // deform_groups, axis=3)
        m = jnp.moveaxis(m, 3, 4).reshape(b, ho, wo, k, x.shape[-1])
        cols = cols * m
    wk = weight.reshape(kh * kw, cin_g, cout)
    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo", cols, wk,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        cin = x.shape[-1]
        cpg = cin // groups
        opg = cout // groups
        cols_g = cols.reshape(cols.shape[:4] + (groups, cpg))
        # weight (kh,kw,cpg,cout) with cout = groups*opg, group g uses
        # out channels [g*opg:(g+1)*opg] and in slice g.
        wk2 = weight.reshape(k, cpg, groups, opg)
        out = jnp.einsum("bhwkgc,kcgo->bhwgo", cols_g, wk2,
                         preferred_element_type=jnp.float32)
        out = out.reshape(out.shape[:3] + (cout,)).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d(x, offset, weight, bias=None, stride=1, padding=1,
                  dilation=1, groups=1, deform_groups=1):
    """DCNv1 (no modulation)."""
    return modulated_deform_conv2d(x, offset, None, weight, bias, stride,
                                   padding, dilation, groups, deform_groups)
