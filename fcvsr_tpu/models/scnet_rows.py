"""Rows-layout (chain-resident Pallas) replay of SCNet for serving.

SCNet is the largest block of FCVSR frame time (117 ms of 256 at 480x272)
and is conv-bound at XLA's ~29 TFLOP/s C_out=64 NHWC rate
(benchmarks/microbench_sol.py).  This module replays the exact SCNet
computation (reference CVSR_freq.py:705-822; flax modules in
models/blocks.py) over the *same parameter pytree* but with activations
resident in the rows layout of ops/pallas_conv.py: every 3x3 conv is the
fused Pallas kernel, 1x1 convs/softmax/resizes are XLA contractions with
lanes = spatial width, and the layout's zero ring makes SAME padding free
across the whole chain — one transpose in, one out per SCNet call.

Numerics: 3x3 convs run single-pass bf16 with f32 accumulation — the same
MXU precision XLA's default conv uses on TPU, so this matches the serving
behaviour of the NHWC path on hardware (CPU goldens compare against a
bf16-cast NHWC mirror).  The bilinear down/up matrices keep HIGHEST
precision like ops/resize.py.

Differentiability: `scnet_rows_diff` pairs this forward with the VJP of
the NHWC `SCNet.apply` at the same primals (the ops/dcn.py custom-VJP
pattern), so `conv_impl='pallas'` stays legal under `jax.grad`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_conv import (COL_OFF, ROW_OFF, conv3x3_pair_rows,
                               conv3x3_quad_rows, conv3x3_rows, pad_to_rows,
                               prep_weight, rows_geometry, rows_to_nhwc)
from ..ops.resize import _linear_weight_matrix

__all__ = ["scnet_rows_apply", "scnet_rows_diff"]

_HI = jax.lax.Precision.HIGHEST


def _k(p):
    return p["Conv_0"]["kernel"]


def _b(p):
    return p["Conv_0"].get("bias")


@functools.lru_cache(maxsize=None)
def _embedded_resize(h, w, h2, w2, tile_rows, scale):
    """(Hp2, Hp) and (Wp2, Wp) bilinear matrices embedded at the data
    offsets — applying them re-establishes the zero ring on the target
    geometry as a side effect."""
    hp, wp = rows_geometry(h, w, tile_rows)
    hp2, wp2 = rows_geometry(h2, w2, tile_rows)
    wh = np.zeros((hp2, hp), np.float32)
    wh[ROW_OFF : ROW_OFF + h2, ROW_OFF : ROW_OFF + h] = \
        _linear_weight_matrix(h, h2, scale)
    ww = np.zeros((wp2, wp), np.float32)
    ww[COL_OFF : COL_OFF + w2, COL_OFF : COL_OFF + w] = \
        _linear_weight_matrix(w, w2, scale)
    # numpy, NOT jnp: caching a traced constant would leak the tracer into
    # later traces (custom_vjp re-traces under a fresh DynamicJaxprTrace)
    return wh, ww


def _resize_rows(x, h, w, h2, w2, tile_rows, scale):
    wh, ww = _embedded_resize(h, w, h2, w2, tile_rows, scale)
    if x.dtype == jnp.bfloat16:
        # bf16 chain: HIGHEST-precision f32 einsums on bf16 data run
        # ~6x slower on the MXU for no precision (the activations are
        # already bf16-rounded); single-pass bf16 is serving precision.
        # Measured: the cross-level glue is 14.7 of the 41 ms chain
        # @480x272, mostly these two contractions (/tmp/block_parts.py).
        wh = jnp.asarray(wh, jnp.bfloat16)
        ww = jnp.asarray(ww, jnp.bfloat16)
        y = jnp.einsum("oh,bhcw->bocw", wh, x,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("pw,bocw->bocp", ww, y.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
    y = jnp.einsum("oh,bhcw->bocw", wh, x, precision=_HI,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("pw,bocw->bocp", ww, y, precision=_HI,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _conv1x1(x, kernel, bias=None):
    y = jnp.einsum("co,bhcw->bhow", kernel[0, 0], x,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        # pollutes the zero ring; callers always follow with a resize
        # whose embedded matrices re-mask it
        y = y + bias[None, None, :, None]
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _valid_mask(h, w, tile_rows):
    hp, wp = rows_geometry(h, w, tile_rows)
    m = np.zeros((hp, wp), np.float32)
    m[ROW_OFF : ROW_OFF + h, COL_OFF : COL_OFF + w] = 1.0
    return m  # numpy (see _embedded_resize: cached jnp constants leak tracers)


def _context_block(cp, x, h, w, tile_rows):
    """ContextBlock (CVSR_freq.py:657-701) in rows layout: spatial softmax
    over the valid region, channel-MLP on the pooled context."""
    vm = _valid_mask(h, w, tile_rows)
    logits = jnp.einsum("bhcw,c->bhw", x, _k(cp["conv_mask"])[0, 0, :, 0])
    neg = jnp.finfo(logits.dtype).min
    lm = jnp.where(vm[None] > 0, logits, neg)
    lm = lm - jnp.max(lm, axis=(1, 2), keepdims=True)
    e = jnp.exp(lm) * vm[None]
    p = e / jnp.sum(e, axis=(1, 2), keepdims=True)
    ctx = jnp.einsum("bhcw,bhw->bc", x, p)
    t = ctx @ _k(cp["add0"])[0, 0]
    t = jnp.where(t >= 0, t, 0.2 * t)
    t = t @ _k(cp["add1"])[0, 0]
    # the broadcast add pollutes the ring; re-mask
    return ((x.astype(jnp.float32) + t[:, None, :, None])
            * vm[None, :, None, :]).astype(x.dtype)


def _pair_mode(mode):
    # the pair kernel supports cat3 + the banded mstack2; the single-conv
    # A/B modes (mstack/cat9) fall back to cat3 inside pairs
    return "mstack2" if mode == "mstack2" else "cat3"


def _rcb(rp, x, h, w, tile_rows, interpret, mode):
    # body0 -> lrelu(0.2) -> body1 fused: the intermediate stays in VMEM
    # (conv3x3_pair_rows — removes an HBM round-trip + DMA serialization
    # point; the chain is DMA-bound, not matmul-bound)
    pm = _pair_mode(mode)
    res = conv3x3_pair_rows(x, prep_weight(_k(rp["body0"]), pm), None,
                            prep_weight(_k(rp["body1"]), pm), None, h=h,
                            w=w, ns1=0.2, tile_rows=tile_rows, mode=pm,
                            interpret=interpret)
    res = _context_block(rp["gcnet"], res, h, w, tile_rows)
    res = jnp.where(res >= 0, res, 0.2 * res)
    return x + res


def _block_rcb(bp, x_list, shapes, tile_rows, interpret, mode,
               fuse: str = "pair", downproj: str = "conv_first"):
    """BlockRCB (CVSR_freq.py:729-777) over the [L1, L2, L3] pyramid.

    ``fuse='quad'``: both conv pairs of the body run as ONE kernel
    (conv3x3_quad_rows) — y never round-trips HBM; bit-matches the pair
    path (same storage rounding at every handoff)."""

    def body(x, hw):
        h, w = hw
        if fuse == "quad":
            rp = bp["rcb"]
            y, res = conv3x3_quad_rows(
                x, prep_weight(_k(bp["body0"])), _b(bp["body0"]),
                prep_weight(_k(bp["body1"])), _b(bp["body1"]),
                prep_weight(_k(rp["body0"])), _b(rp["body0"]),
                prep_weight(_k(rp["body1"])), _b(rp["body1"]),
                h=h, w=w, ns1=0.1, ns3=0.2, tile_rows=tile_rows,
                interpret=interpret)
            res = _context_block(rp["gcnet"], res, h, w, tile_rows)
            res = jnp.where(res >= 0, res, 0.2 * res)
            return y + res
        pm = _pair_mode(mode)
        y = conv3x3_pair_rows(x, prep_weight(_k(bp["body0"]), pm),
                              _b(bp["body0"]),
                              prep_weight(_k(bp["body1"]), pm),
                              _b(bp["body1"]), h=h, w=w, ns1=0.1,
                              tile_rows=tile_rows, mode=pm,
                              interpret=interpret)
        return _rcb(bp["rcb"], y, h, w, tile_rows, interpret, mode)

    res = [body(x, s) for x, s in zip(x_list, shapes)]
    down = [res[0]]
    for r, (h, w), (h2, w2) in zip(res[:-1], shapes[:-1], shapes[1:]):
        if downproj == "resize_first":
            # 1x1 (C axis) and bilinear resize (H/W axes) are linear maps
            # on disjoint axes — they commute exactly; resizing first runs
            # the channel mix on the quarter-size map (~22% less HBM
            # traffic on the down path).  fp accumulation order differs
            # (bounded deviation), so 'conv_first' stays the parity
            # default.  The bias now lands AFTER the ring-re-masking
            # resize, so it must be masked here (the conv_first order got
            # that for free from the resize that followed it).
            # MEASURED CLOSURE (round 4): neutral on TPU — 32.4 vs
            # 32.2 ms scnet10 (microbench_scnet_parts full_rf); the
            # cross-level 5.6 ms is relayout/overhead-bound around the
            # small einsums, not bytes-bound.  Kept as provenance.
            d = _resize_rows(r, h, w, h2, w2, tile_rows, 2.0)
            d = _conv1x1(d, _k(bp["down"]))
            bias = _b(bp["down"])
            if bias is not None:
                vm = _valid_mask(h2, w2, tile_rows)
                d = (d.astype(jnp.float32)
                     + bias[None, None, :, None] * vm[None, :, None, :]
                     ).astype(d.dtype)
        else:
            d = _conv1x1(r, _k(bp["down"]), _b(bp["down"]))
            d = _resize_rows(d, h, w, h2, w2, tile_rows, 2.0)
        down.append(d)
    up = []
    for r, (h, w), (h2, w2) in zip(res[1:], shapes[1:], shapes[:-1]):
        # up keeps conv-first: the 1x1 already runs on the SMALLER map
        u = _conv1x1(r, _k(bp["up"]), _b(bp["up"]))
        up.append(_resize_rows(u, h, w, h2, w2, tile_rows, 0.5))
    up.append(res[-1])
    return [x + r + d + u for x, r, d, u in zip(x_list, res, down, up)]


def scnet_rows_apply(params, x_list, num_groups: int = 10,
                     tile_rows: int = 16, interpret: bool = False,
                     chain_dtype=jnp.float32, mode: str = "cat3",
                     fuse: str = "pair", downproj: str = "conv_first"):
    """Replay SCNet (models/blocks.py::SCNet) on its own param pytree.

    params: the SCNet module's params subtree; x_list: NHWC [L1, L2, L3].
    Returns NHWC outputs identical (at serving precision) to
    ``SCNet.apply``.

    ``mode`` selects the kernel's matmul decomposition (ops/pallas_conv).
    Measured @272x480 (same-process A/B, TPU): the chain is
    DMA-serialization-bound, not matmul-bound — 'mstack' wins the
    *isolated* conv 2.9x (0.117 vs 0.338 ms; double-buffered DMA fully
    hidden when re-reading one buffer) but in-chain, where every window
    DMA waits on the previous conv's freshly-written output, cat3/mstack
    are 60.2/60.5 ms f32 and 41.2/43.4 bf16 — cat3 stays the default.
    """
    shapes = [(int(x.shape[1]), int(x.shape[2])) for x in x_list]
    xs = [pad_to_rows(x, tile_rows).astype(chain_dtype) for x in x_list]
    res = list(xs)
    for i in range(num_groups):
        gp = params[f"group{i}"]
        gin = list(res)
        for j in range(3):
            res = _block_rcb(gp[f"block{j}"], res, shapes, tile_rows,
                             interpret, mode, fuse, downproj)
        wk = prep_weight(_k(gp["conv"]), mode)
        wb = _b(gp["conv"])
        # the group residual rides the conv kernel's fused-res input (one
        # HBM pass instead of conv-out + separate read-modify-write add)
        res = [conv3x3_rows(r, wk, wb, res=x, h=h, w=w, tile_rows=tile_rows,
                            mode=mode, interpret=interpret)
               for x, r, (h, w) in zip(gin, res, shapes)]
    out = [x + r for x, r in zip(xs, res)]
    return [rows_to_nhwc(y, h, w).astype(jnp.float32)
            for y, (h, w) in zip(out, shapes)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def scnet_rows_diff(params, x_list, nf, num_groups, interpret,
                    bf16=False):
    """Rows-layout forward with the exact NHWC-path VJP (exact-path
    gradients; the backward re-runs the NHWC forward internally — the
    training win is the primal forward only).  ``bf16``: carry the chain
    activations as bf16 in HBM (halves the layout's memory traffic; the
    MXU matmuls are single-pass bf16 either way, so the numerics delta is
    storage rounding between ops only)."""
    return tuple(scnet_rows_apply(
        params, x_list, num_groups, interpret=interpret,
        chain_dtype=jnp.bfloat16 if bf16 else jnp.float32))


def _diff_fwd(params, x_list, nf, num_groups, interpret, bf16=False):
    out = scnet_rows_diff(params, x_list, nf, num_groups, interpret, bf16)
    return out, (params, x_list)


def _diff_bwd(nf, num_groups, interpret, bf16, res, g):
    from .blocks import SCNet

    params, x_list = res
    mod = SCNet(nf, num_groups)
    _, vjp = jax.vjp(
        lambda p, xs: tuple(mod.apply({"params": p}, list(xs))),
        params, tuple(x_list))
    return vjp(tuple(g))


scnet_rows_diff.defvjp(_diff_fwd, _diff_bwd)
