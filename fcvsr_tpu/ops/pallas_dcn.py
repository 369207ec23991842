"""Fused Pallas DCNv1/v2 (deformable 3x3 conv) for the EDVR/PCD family.

TPU-native equivalent of the reference CUDA extension
(CVSR_train/arch/ops/dcn/src/deform_conv_cuda_kernel.cu:1-867): the XLA
formulation in ops/dcn.py expresses deformable im2col as per-pixel bilinear
gathers, which run at gather speed (~73.5 ms per L1 EDVR call after the
round-2 full-row rewrite) — two orders of magnitude off conv speed.

This kernel reuses the windowed-stencil design proven by ops/pallas_iac.py:

* one source window per row tile, DMA'd at a per-tile dynamic base offset
  (``round(mean(offsets))`` over the tile — deform offsets are small in
  practice, and per-pixel deviations beyond ``radius`` clamp, with the XLA
  gather path as the bit-exact fallback);
* the 3x3 tap positions are STATIC shifts layered on the stencil slices, so
  all 9 taps share one window;
* deform-group weights repeat across each group's channel block
  ((rows, dg, W) -> (rows, C, W)) so every FMA runs over full-width
  full-channel rows — any C/dg works (EDVR dg=8, BasicVSR++ dg=16);
* the conv reduction is one in-kernel (th*W, K*Cin) x (K*Cin, Cout) matmul
  on the MXU, with DCNv2 modulation masks folded into the stencil weights.

Supported: kernel 3x3, stride 1, dilation 1, groups=1 (the configuration
every zoo consumer uses — EDVR/BasicVSR++/IconVSR/TDAN); anything else
falls back to the XLA path in ops/dcn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["modulated_deform_conv2d_fused",
           "modulated_deform_conv2d_fused_vjp"]

# Mosaic scoped-VMEM capacity is 128M; the kernel's unrolled tap/stencil
# temporaries measure ~256*th*C*Wp bytes (calibrated on hardware: th=16,
# C=128, Wp=384 compiled to 202.1M — BasicVSR++'s deform_align OOM'd
# where EDVR's C=64 fit), plus the 2-level-buffered offset/mask blocks.
_VMEM_BUDGET = 112 * 1024 * 1024


def _pick_tile_rows(c, w, dg, hp8, radius):
    """Largest tile height whose kernel VMEM estimate fits the budget;
    0 when even 4-row tiles cannot fit (caller falls back to gather).
    The (th+2r+3)-row window is double-buffered (DMA lookahead), hence
    the extra 8-bytes-per-element window term."""
    wp = ((w + 2 * (radius + 15) + 127) // 128) * 128
    for th in (16, 8, 4):
        if hp8 % th == 0 and 256 * th * c * wp + 216 * th * dg * w \
                + 8 * (th + 2 * radius + 3) * c * wp <= _VMEM_BUDGET:
            return th
    return 0


def _kernel(rows0_ref, bxs_ref, offy_ref, offx_ref, mask_ref, src_hbm,
            w_ref, out_ref, win2, sems, *, radius, th, h, w, c, cout,
            pad_v, pad_l, bmax_x, wp, has_mask, tiles):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = radius
    dg = offy_ref.shape[3]
    cg = c // dg
    k9 = offy_ref.shape[1]
    wrows = th + 2 * r + 3            # tap extent (+-1) + dev extent (+-r)

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    t0 = ti * th

    # Double-buffered window DMA with a one-step lookahead (same scheme as
    # ops/pallas_iac.py): the per-tile window base rows are scalar-prefetch
    # inputs computed outside the kernel, so step s starts step s+1's
    # window copy before it computes and the DMA latency hides behind the
    # 36-tap stencil.  win2/sems persist across the sequential grid steps.
    step = bi * tiles + ti
    total = pl.num_programs(0) * tiles

    def win_dma(slot, s):
        return pltpu.make_async_copy(
            src_hbm.at[s // tiles, pl.ds(rows0_ref[s], wrows)],
            win2.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _warm():
        win_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _ahead():
        win_dma((step + 1) % 2, step + 1).start()

    def body():
        win_dma(step % 2, step).wait()

        offy = offy_ref[0]            # (K, th, dg, w)
        offx = offx_ref[0]

        # bases precomputed in _fused_call; rows0 = t0 + base_y - r - 1
        # + pad_v, inverted so the stencil weights use the DMA'd window's
        # exact base
        base_y = rows0_ref[step] - t0 + r + 1 - pad_v
        base_x = bxs_ref[step]

        nx = 2 * r + 2
        eps = 1e-4
        a = jnp.clip(offy - base_y.astype(offy.dtype) + r, 0.0, nx - 1 - eps)
        b = jnp.clip(offx - base_x.astype(offx.dtype) + r, 0.0, nx - 1 - eps)
        y0 = jnp.floor(a)
        x0 = jnp.floor(b)
        fy = a - y0
        fx = b - x0

        col0 = base_x - r - 1 + pad_l
        rolled = pltpu.roll(win2[step % 2], wp - col0, axis=2)

        def expand(v):
            """(th, dg, w) group weights -> (th, C, w) channel weights
            (each group's value repeated over its cg channel block)."""
            if cg == 1:
                return v
            return jnp.repeat(v, cg, axis=1)

        # accumulate the conv reduction per tap: 9 (th*W, C)x(C, Cout)
        # MXU matmuls instead of one (th*W, 9C) — materializing the 9-tap
        # token concat (+ its transpose) blew VMEM at dg=16
        out = jnp.zeros((th, w, cout), jnp.float32)
        for k in range(k9):
            ty, tx = k // 3, k % 3    # static tap shifts (dilation 1)
            wy = []
            wx = []
            for e in range(nx):
                # per-group (th, dg, w) form; expand only the per-tap
                # product (storing expanded lists also blew VMEM)
                wy.append(jnp.where(y0[k] == e, 1.0 - fy[k], 0.0)
                          + jnp.where(y0[k] == e - 1, fy[k], 0.0))
                wx.append(jnp.where(x0[k] == e, 1.0 - fx[k], 0.0)
                          + jnp.where(x0[k] == e - 1, fx[k], 0.0))
            col = jnp.zeros((th, c, w), jnp.float32)
            for e in range(nx):
                for f in range(nx):
                    wgt = expand(wy[e] * wx[f])  # (th, C, w)
                    col = col + wgt * \
                        rolled[e + ty : e + ty + th, :, f + tx : f + tx + w]
            if has_mask:
                col = col * expand(mask_ref[0, k])
            out = out + jax.lax.dot_general(
                jnp.swapaxes(col, 1, 2), w_ref[k * c : (k + 1) * c, :],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = out

    body()


@functools.lru_cache(maxsize=None)
def _fused_vmappable(radius, tile_rows, deform_groups, has_mask, interpret):
    """custom_vmap wrapper: the manual-DMA source input cannot be block-
    indexed under vmap (Mosaic requires trivial index maps for HBM-space
    inputs), so a vmapped call folds the mapped axis into the kernel's own
    batch grid instead (EDVR runs its DCNs under nn.vmap over frames)."""

    def base(x, offset, mask, weight):
        return _fused_call(x, offset, mask if has_mask else None, weight,
                           radius, tile_rows, deform_groups, interpret)

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, x, offset, mask, weight):  # noqa: ANN001
        xb, ob, mb, wb = in_batched
        if wb:  # batched weights: no grid folding possible — loop instead
            outs = [base(x[i] if xb else x, offset[i] if ob else offset,
                         mask[i] if mb else mask, weight[i])
                    for i in range(axis_size)]
            return jnp.stack(outs), True

        def bat(a, is_b):
            if is_b:
                return a.reshape((-1,) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape) \
                .reshape((-1,) + a.shape[1:])

        out = base(bat(x, xb), bat(offset, ob), bat(mask, mb), weight)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return wrapped


def _geom(w, radius):
    """Padded-source geometry shared by the forward and backward kernels."""
    pad_v = radius + 15               # vertical base coverage +-(pad_v-r-2)
    wp = ((w + 2 * (radius + 15) + 127) // 128) * 128
    extra = wp - w - 2 * (radius + 15)
    pad_l = radius + 15 + extra // 2
    pad_r = wp - w - pad_l
    bmax_x = min(pad_l, pad_r) - radius - 2
    return pad_v, wp, pad_l, pad_r, bmax_x


def _prep(x, offset, mask, radius, th):
    """Rows-layout source, (B,K,H,dg,W) offsets/mask, and per-tile window
    bases.  Shared by forward and backward: the backward recomputes the
    SAME bases from the same offsets, so it is the exact adjoint of the
    windowed-stencil forward (including its clamps)."""
    b, h, w, c = x.shape
    k9 = 9
    pad_v, wp, pad_l, pad_r, bmax_x = _geom(w, radius)
    src = jnp.transpose(
        jnp.pad(x, ((0, 0), (pad_v, pad_v), (pad_l, pad_r), (0, 0))),
        (0, 1, 3, 2))                 # (B, Hp, C, Wp)

    # offsets (B, H, W, dg*K*2) with (dg, k, [dy, dx]) layout
    dg = offset.shape[-1] // (k9 * 2)
    off = offset.reshape(b, h, w, dg, k9, 2)
    offy = jnp.transpose(off[..., 0], (0, 4, 1, 3, 2))   # (B, K, H, dg, W)
    offx = jnp.transpose(off[..., 1], (0, 4, 1, 3, 2))
    if mask is not None:
        mk = jnp.transpose(mask.reshape(b, h, w, dg, k9), (0, 4, 1, 3, 2))
    else:
        mk = jnp.zeros((b, k9, h, dg, w), x.dtype)  # unused (has_mask=False)

    # per-tile window bases, precomputed for the kernel's DMA lookahead
    # (identical formula to the previous in-kernel round(mean) over each
    # tile's (K, th, dg, W) offset block)
    tiles = h // th
    by = jnp.clip(
        jnp.round(jnp.mean(offy.reshape(b, k9, tiles, th, dg, w),
                           axis=(1, 3, 4, 5))),
        -(pad_v - radius - 2), pad_v - radius - 2).astype(jnp.int32)
    bx = jnp.clip(
        jnp.round(jnp.mean(offx.reshape(b, k9, tiles, th, dg, w),
                           axis=(1, 3, 4, 5))),
        -bmax_x, bmax_x).astype(jnp.int32)                 # (B, tiles)
    t0s = jnp.arange(tiles, dtype=jnp.int32) * th
    rows0 = (t0s[None] + by - radius - 1 + pad_v).reshape(-1)
    bxs = bx.reshape(-1)
    return src, offy, offx, mk, rows0, bxs


@functools.partial(jax.jit, static_argnames=("radius", "tile_rows",
                                             "deform_groups", "interpret"))
def _fused_call(x, offset, mask, weight, radius, tile_rows, deform_groups,
                interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    dg = deform_groups
    k9 = 9
    cout = weight.shape[-1]
    th = tile_rows
    tiles = h // th

    pad_v, wp, pad_l, pad_r, bmax_x = _geom(w, radius)
    src, offy, offx, mk, rows0, bxs = _prep(x, offset, mask, radius, th)

    # weight (3, 3, Cin, Cout) -> (K*Cin, Cout) with k-major token layout
    wmat = weight.reshape(k9 * c, cout)

    wrows = th + 2 * radius + 3
    kern = functools.partial(
        _kernel, radius=radius, th=th, h=h, w=w, c=c, cout=cout,
        pad_v=pad_v, pad_l=pad_l, bmax_x=bmax_x, wp=wp,
        has_mask=mask is not None, tiles=tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows0, bxs
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((k9 * c, cout), lambda bi, ti, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout),
                               lambda bi, ti, *_: (bi, ti, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wrows, c, wp), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows0, bxs, offy, offx, mk, src, wmat)


def modulated_deform_conv2d_fused(
    x, offset, mask, weight, bias=None, stride=1, padding=1, dilation=1,
    groups=1, deform_groups=1, radius=2, tile_rows=0, interpret=False):
    """Fused DCNv2 (or v1 when ``mask`` is None); falls back to the exact
    XLA path for unsupported configurations.  Same signature/semantics as
    ops.dcn.modulated_deform_conv2d."""
    b, h, w, c = x.shape
    kh, kw = weight.shape[:2]
    supported = (kh == 3 and kw == 3 and stride == 1 and padding == 1
                 and dilation == 1 and groups == 1
                 and c % deform_groups == 0 and c % 8 == 0)
    cg = c // deform_groups
    hp8 = -(-h // 8) * 8
    # cg (= C/dg) that is not a sublane multiple (BasicVSR++: dg=16 ->
    # cg=4) forces the per-channel expansion below (dg'=C), whose offset
    # blocks are cg x larger — cap its tiles at 4 rows.
    expand_dg = cg % 8 != 0 and cg > 1
    eff_dg = c if expand_dg else deform_groups
    if not tile_rows:
        tile_rows = _pick_tile_rows(c, w, eff_dg, hp8, radius)
        if expand_dg:
            tile_rows = min(tile_rows, 4)
    if not supported or not tile_rows:
        # call the gather body directly (the public entry would re-route
        # here under set_dcn_impl('pallas') — infinite recursion);
        # tile_rows == 0 means even 4-row tiles exceed the VMEM budget
        from .dcn import _gather_forward

        return _gather_forward(
            x, offset, mask, weight, bias, stride, padding, dilation,
            groups, deform_groups)
    if expand_dg:
        # the in-kernel group->channel repeat cannot share buffers across
        # the unrolled taps and blows VMEM, so expand the offsets/mask to
        # PER-CHANNEL groups outside the kernel instead (dg'=C, cg'=1 —
        # expand() becomes the identity).  Costs C/dg x offset DMA bytes,
        # still orders of magnitude under the gather path.
        k9 = 9
        off6 = offset.reshape(b, h, w, deform_groups, k9, 2)
        offset = jnp.repeat(off6, cg, axis=3).reshape(b, h, w, c * k9 * 2)
        if mask is not None:
            m5 = mask.reshape(b, h, w, deform_groups, k9)
            mask = jnp.repeat(m5, cg, axis=3).reshape(b, h, w, c * k9)
        deform_groups = c
    # non-multiple-of-8 heights (EDVR pyramid levels 92/46): zero-pad rows
    # to the tile grid and slice the extra output rows away.  The padded
    # rows' zero offsets only dilute the last tile's mean base — the same
    # bounded-deviation contract class.
    if hp8 != h:
        rp = hp8 - h
        x = jnp.pad(x, ((0, 0), (0, rp), (0, 0), (0, 0)))
        offset = jnp.pad(offset, ((0, 0), (0, rp), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, rp), (0, 0), (0, 0)))
    fn = _fused_vmappable(radius, tile_rows, deform_groups,
                          mask is not None, interpret)
    out = fn(x, offset,
             mask if mask is not None else jnp.zeros(
                 (b,) + x.shape[1:3] + (deform_groups * 9,), x.dtype),
             weight)
    if hp8 != h:
        out = out[:, :h]
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused backward (the adjoint of the windowed-stencil forward)
# ---------------------------------------------------------------------------
#
# TPU-native analog of the reference's hand-written CUDA backward kernels
# (CVSR_train/arch/ops/dcn/src/deform_conv_cuda_kernel.cu:373-867:
# deformable_col2im / col2im_coord + the weight-grad GEMM).  Without it,
# set_dcn_impl('pallas') training pays pallas_fwd + gather_fwd + gather_bwd
# (the gather forward alone is ~73 ms at EDVR L1) — the backward is the
# dominant cost of DCN-family training on TPU.
#
# All four gradients reuse the forward's window (same DMA, same bases —
# recomputed from the same offsets via _prep, so this is the exact adjoint
# of the forward the primal pass ran, clamps included):
#
#   u_k   = g @ W_k^T                    (MXU, same FLOPs as forward)
#   dW_k  = col_k^T g                    (MXU)
#   dmask = groupsum_c(s_k * u_k)
#   doff  = groupsum_c(v_k * ds/da),  ds/da from the derivative stencil
#           d(wy_e)/da = (y0==e-1) - (y0==e), zeroed where the forward
#           clamp was active (the sample position is constant there)
#   dx    = splat of (wy_e*wx_f*v_k) back into the window: accumulated
#           in VMEM per lane-shift bucket, lane-rolled once per bucket,
#           emitted as one per-tile window slab and overlap-added outside
#           the kernel at the same dynamic rows0 bases (one row-level
#           scatter-add of (C, Wp) rows).
#
# dW is emitted PER BATCH ELEMENT (accumulated over row tiles only) so the
# custom_vmap grid fold stays exact; the wrapper sums over the example axis.


def _bwd_kernel(rows0_ref, bxs_ref, offy_ref, offx_ref, mask_ref, g_ref,
                src_hbm, w_ref, doffy_ref, doffx_ref, dmask_ref, dw_ref,
                dwin_ref, win2, sems, *, radius, th, h, w, c, cout,
                pad_v, pad_l, wp, has_mask, tiles):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = radius
    dg = offy_ref.shape[3]
    cg = c // dg
    k9 = offy_ref.shape[1]
    wrows = th + 2 * r + 3
    nx = 2 * r + 2
    nd = 2 * r + 4                    # stencil slice shift extent (e+ty)

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    t0 = ti * th
    step = bi * tiles + ti
    total = pl.num_programs(0) * tiles

    def win_dma(slot, s):
        return pltpu.make_async_copy(
            src_hbm.at[s // tiles, pl.ds(rows0_ref[s], wrows)],
            win2.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _warm():
        win_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _ahead():
        win_dma((step + 1) % 2, step + 1).start()

    def body():
        win_dma(step % 2, step).wait()

        offy = offy_ref[0]            # (K, th, dg, w)
        offx = offx_ref[0]
        g = g_ref[0].astype(jnp.float32)            # (th, w, cout)

        base_y = rows0_ref[step] - t0 + r + 1 - pad_v
        base_x = bxs_ref[step]

        eps = 1e-4
        rawa = offy - base_y.astype(offy.dtype) + r
        rawb = offx - base_x.astype(offx.dtype) + r
        a = jnp.clip(rawa, 0.0, nx - 1 - eps)
        bb = jnp.clip(rawb, 0.0, nx - 1 - eps)
        y0 = jnp.floor(a)
        x0 = jnp.floor(bb)
        fy = a - y0
        fx = bb - x0
        # where the forward clamp was active, d(sample)/d(offset) = 0
        iay = ((rawa > 0.0) & (rawa < nx - 1 - eps)).astype(jnp.float32)
        ibx = ((rawb > 0.0) & (rawb < nx - 1 - eps)).astype(jnp.float32)

        col0 = base_x - r - 1 + pad_l
        rolled = pltpu.roll(win2[step % 2], wp - col0, axis=2)

        def expand(v):
            if cg == 1:
                return v
            return jnp.repeat(v, cg, axis=1)

        def gsum(v):
            """(th, C, w) -> (th, dg, w) per-deform-group channel sum."""
            if cg == 1:
                return v
            return jnp.concatenate(
                [jnp.sum(v[:, gg * cg : (gg + 1) * cg, :], axis=1,
                         keepdims=True) for gg in range(dg)], axis=1)

        # per-lane-shift window-gradient accumulators (rows indexed in
        # window coordinates; lanes still at output alignment — one roll
        # per bucket at the end instead of one per stencil term)
        wacc = [jnp.zeros((wrows, c, w), jnp.float32) for _ in range(nd)]
        dws = []

        for k in range(k9):
            ty, tx = k // 3, k % 3

            wk = w_ref[k * c : (k + 1) * c, :]          # (c, cout)
            u_twc = jax.lax.dot_general(
                g, wk, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (th, w, c)
            u = jnp.swapaxes(u_twc, 1, 2)               # (th, c, w)
            if has_mask:
                m = expand(mask_ref[0, k])
                v = u * m
            else:
                v = u

            # horizontal stencil weights, hoisted out of the e-loop
            ex = []
            exp_ = []
            for f in range(nx):
                ex.append(expand(
                    jnp.where(x0[k] == f, 1.0 - fx[k], 0.0)
                    + jnp.where(x0[k] == f - 1, fx[k], 0.0)))
                exp_.append(expand(
                    jnp.where(x0[k] == f - 1, 1.0, 0.0)
                    - jnp.where(x0[k] == f, 1.0, 0.0)))

            s = jnp.zeros((th, c, w), jnp.float32)
            dsda = jnp.zeros((th, c, w), jnp.float32)
            dsdb = jnp.zeros((th, c, w), jnp.float32)
            for e in range(nx):
                ey = expand(jnp.where(y0[k] == e, 1.0 - fy[k], 0.0)
                            + jnp.where(y0[k] == e - 1, fy[k], 0.0))
                eyp = expand(jnp.where(y0[k] == e - 1, 1.0, 0.0)
                             - jnp.where(y0[k] == e, 1.0, 0.0))
                vy = ey * v
                t_acc = None
                u_acc = None
                for f in range(nx):
                    sl = rolled[e + ty : e + ty + th, :,
                                f + tx : f + tx + w]
                    t_acc = ex[f] * sl if t_acc is None \
                        else t_acc + ex[f] * sl
                    u_acc = exp_[f] * sl if u_acc is None \
                        else u_acc + exp_[f] * sl
                    # pad+add, not .at[].add: jnp's indexed add always
                    # lowers to scatter-add, which Mosaic TPU lacks
                    wacc[f + tx] = wacc[f + tx] + jnp.pad(
                        ex[f] * vy,
                        ((e + ty, wrows - th - e - ty), (0, 0), (0, 0)))
                s = s + ey * t_acc
                dsda = dsda + eyp * t_acc
                dsdb = dsdb + ey * u_acc

            if has_mask:
                col = s * m
                dmask_ref[0, k] = gsum(s * u).astype(dmask_ref.dtype)
            else:
                col = s
                dmask_ref[0, k] = jnp.zeros((th, dg, w), dmask_ref.dtype)

            doffy_ref[0, k] = (gsum(v * dsda) * iay[k]) \
                .astype(doffy_ref.dtype)
            doffx_ref[0, k] = (gsum(v * dsdb) * ibx[k]) \
                .astype(doffx_ref.dtype)

            # dW_k = sum_t col[t] @ g[t]: per-row 2D matmuls — a single
            # dot_general contracting (th, w) at once fails to lower
            # ('tpu.matmul lhs contracting dims must be of size 1')
            dwk = None
            for t in range(th):
                d = jax.lax.dot_general(
                    col[t], g[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (c, cout)
                dwk = d if dwk is None else dwk + d
            dws.append(dwk)

        # dW: accumulate across this batch element's row tiles
        dwall = jnp.concatenate(dws, axis=0)            # (k9*c, cout)

        @pl.when(ti == 0)
        def _init():
            dw_ref[0] = dwall

        @pl.when(ti != 0)
        def _acc():
            dw_ref[0] = dw_ref[0] + dwall

        # assemble the window-gradient slab: lane-roll each shift bucket
        # into place, then roll the whole slab back to source coordinates
        dwin = jnp.zeros((wrows, c, wp), jnp.float32)
        for sft in range(nd):
            qp = jnp.pad(wacc[sft], ((0, 0), (0, 0), (0, wp - w)))
            dwin = dwin + (qp if sft == 0
                           else pltpu.roll(qp, sft, axis=2))
        dwin_ref[0, 0] = pltpu.roll(dwin, col0, axis=2)

    body()


@functools.partial(jax.jit, static_argnames=("radius", "tile_rows",
                                             "deform_groups", "interpret"))
def _bwd_call(x, offset, mask, g, weight, radius, tile_rows, deform_groups,
              interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    dg = deform_groups
    k9 = 9
    cout = weight.shape[-1]
    th = tile_rows
    tiles = h // th

    pad_v, wp, pad_l, pad_r, bmax_x = _geom(w, radius)
    src, offy, offx, mk, rows0, bxs = _prep(x, offset, mask, radius, th)
    wmat = weight.reshape(k9 * c, cout)
    wrows = th + 2 * radius + 3

    kern = functools.partial(
        _bwd_kernel, radius=radius, th=th, h=h, w=w, c=c, cout=cout,
        pad_v=pad_v, pad_l=pad_l, wp=wp, has_mask=mask is not None,
        tiles=tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows0, bxs
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, th, w, cout),
                         lambda bi, ti, *_: (bi, ti, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((k9 * c, cout), lambda bi, ti, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9, th, dg, w),
                         lambda bi, ti, *_: (bi, 0, ti, 0, 0)),
            pl.BlockSpec((1, k9 * c, cout),
                         lambda bi, ti, *_: (bi, 0, 0)),
            pl.BlockSpec((1, 1, wrows, c, wp),
                         lambda bi, ti, *_: (bi, ti, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wrows, c, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    doffy, doffx, dmask, dw_pe, dwin = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k9, h, dg, w), jnp.float32),
            jax.ShapeDtypeStruct((b, k9, h, dg, w), jnp.float32),
            jax.ShapeDtypeStruct((b, k9, h, dg, w), jnp.float32),
            jax.ShapeDtypeStruct((b, k9 * c, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, tiles, wrows, c, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows0, bxs, offy, offx, mk, g.astype(jnp.float32), src, wmat)

    # overlap-add the per-tile window slabs into the padded source grad
    # (one row-level scatter-add of full (C, Wp) rows at the dynamic
    # per-tile bases the forward's windows were DMA'd from)
    hp = h + 2 * pad_v
    ridx = (rows0.reshape(b, tiles)[:, :, None]
            + jnp.arange(wrows)[None, None, :])         # (b, tiles, wrows)
    bidx = jnp.arange(b)[:, None, None]
    dsrc = jnp.zeros((b, hp, c, wp), jnp.float32)
    dsrc = dsrc.at[bidx, ridx].add(dwin)
    dx = jnp.transpose(dsrc, (0, 1, 3, 2))[
        :, pad_v : pad_v + h, pad_l : pad_l + w, :]

    # (B, K, H, dg, W) -> (B, H, W, dg, K) -> reference channel layouts
    doy = jnp.transpose(doffy, (0, 2, 4, 3, 1))
    dox = jnp.transpose(doffx, (0, 2, 4, 3, 1))
    doff = jnp.stack([doy, dox], axis=-1).reshape(b, h, w, dg * k9 * 2)
    dm = jnp.transpose(dmask, (0, 2, 4, 3, 1)).reshape(b, h, w, dg * k9)
    return dx, doff, dm, dw_pe


@functools.lru_cache(maxsize=None)
def _bwd_vmappable(radius, tile_rows, deform_groups, has_mask, interpret):
    """custom_vmap for the backward: fold a mapped axis into the kernel's
    batch grid (the manual-DMA source input cannot be block-indexed under
    vmap).  dW comes back per example, so the fold is exact."""

    def base(x, offset, mask, g, weight):
        return _bwd_call(x, offset, mask if has_mask else None, g, weight,
                         radius, tile_rows, deform_groups, interpret)

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, x, offset, mask, g, weight):  # noqa: ANN001
        xb, ob, mb, gb, wb = in_batched
        if wb:  # batched weights: no grid folding possible — loop instead
            outs = [base(x[i] if xb else x, offset[i] if ob else offset,
                         mask[i] if mb else mask, g[i] if gb else g,
                         weight[i]) for i in range(axis_size)]
            return tuple(jnp.stack([o[j] for o in outs])
                         for j in range(4)), (True, True, True, True)

        def bat(a, is_b):
            if is_b:
                return a.reshape((-1,) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape) \
                .reshape((-1,) + a.shape[1:])

        dx, doff, dm, dw = base(bat(x, xb), bat(offset, ob), bat(mask, mb),
                                bat(g, gb), weight)

        def unb(a):
            return a.reshape((axis_size, -1) + a.shape[1:])

        return (unb(dx), unb(doff), unb(dm), unb(dw)), \
            (True, True, True, True)

    return wrapped


def modulated_deform_conv2d_fused_vjp(
    x, offset, mask, weight, bias, g, stride=1, padding=1, dilation=1,
    groups=1, deform_groups=1, radius=2, tile_rows=0, interpret=False):
    """Gradients of :func:`modulated_deform_conv2d_fused` — the exact
    adjoint of the fused forward (same windows, same bases, same clamps).

    Returns ``(dx, doffset, dmask_or_None, dweight, dbias_or_None)``.
    Unsupported configurations (mirroring the forward's support check, so
    the pair stays consistent) fall back to the exact gather-path VJP.
    """
    b, h, w, c = x.shape
    kh, kw = weight.shape[:2]
    supported = (kh == 3 and kw == 3 and stride == 1 and padding == 1
                 and dilation == 1 and groups == 1
                 and c % deform_groups == 0 and c % 8 == 0)
    cg = c // deform_groups
    hp8 = -(-h // 8) * 8
    expand_dg = cg % 8 != 0 and cg > 1
    eff_dg = c if expand_dg else deform_groups
    if not tile_rows:
        tile_rows = _pick_tile_rows_bwd(c, w, eff_dg, hp8, radius)
    if not supported or not tile_rows:
        from .dcn import _gather_forward

        _, vjp = jax.vjp(
            lambda *a: _gather_forward(*a, stride, padding, dilation,
                                       groups, deform_groups),
            x, offset, mask, weight, bias)
        return vjp(g)

    dbias = g.sum(axis=(0, 1, 2)).astype(bias.dtype) \
        if bias is not None else None

    dgq = deform_groups
    offset_e, mask_e = offset, mask
    if expand_dg:
        off6 = offset.reshape(b, h, w, dgq, 9, 2)
        offset_e = jnp.repeat(off6, cg, axis=3).reshape(b, h, w, c * 18)
        if mask is not None:
            m5 = mask.reshape(b, h, w, dgq, 9)
            mask_e = jnp.repeat(m5, cg, axis=3).reshape(b, h, w, c * 9)
        eff_deform_groups = c
    else:
        eff_deform_groups = dgq
    x_e, g_e = x, g
    if hp8 != h:
        rp = hp8 - h
        pad4 = ((0, 0), (0, rp), (0, 0), (0, 0))
        x_e = jnp.pad(x_e, pad4)
        offset_e = jnp.pad(offset_e, pad4)
        if mask_e is not None:
            mask_e = jnp.pad(mask_e, pad4)
        g_e = jnp.pad(g_e, pad4)

    fn = _bwd_vmappable(radius, tile_rows, eff_deform_groups,
                        mask is not None, interpret)
    dx, doff_e, dm_e, dw_pe = fn(
        x_e, offset_e,
        mask_e if mask_e is not None else jnp.zeros(
            (b,) + x_e.shape[1:3] + (eff_deform_groups * 9,), x.dtype),
        g_e, weight)

    dw = dw_pe.sum(axis=0).reshape(weight.shape).astype(weight.dtype)
    if hp8 != h:
        dx, doff_e = dx[:, :h], doff_e[:, :h]
        dm_e = dm_e[:, :h]
    if expand_dg:
        doff = doff_e.reshape(b, h, w, dgq, cg, 9, 2).sum(axis=4) \
            .reshape(b, h, w, dgq * 18)
        dm = dm_e.reshape(b, h, w, dgq, cg, 9).sum(axis=4) \
            .reshape(b, h, w, dgq * 9)
    else:
        doff, dm = doff_e, dm_e
    return (dx.astype(x.dtype), doff.astype(offset.dtype),
            dm.astype(mask.dtype) if mask is not None else None,
            dw, dbias)


def _pick_tile_rows_bwd(c, w, dg, hp8, radius):
    """Backward tile height: the bwd kernel's live set adds the per-shift
    window-gradient accumulators, the hoisted horizontal stencil lists,
    and the dwin output block on top of the forward's temporaries —
    start at 8 rows and halve.  (Coefficients are the forward's
    hardware-calibrated estimate scaled ~2x; recalibrate on TPU.)"""
    wp = ((w + 2 * (radius + 15) + 127) // 128) * 128
    nd = 2 * radius + 4
    for th in (8, 4):
        wrows = th + 2 * radius + 3
        est = (512 * th * c * wp
               + 432 * th * dg * w
               + 4 * nd * wrows * c * w
               + 12 * wrows * c * wp)
        if hp8 % th == 0 and est <= _VMEM_BUDGET:
            return th
    return 0
