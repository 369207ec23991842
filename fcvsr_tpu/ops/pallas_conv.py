"""Chain-resident rows-layout 3x3 conv kernel (Pallas) for SCNet.

XLA's NHWC conv at C_out=64 runs ~29 TFLOP/s on this chip while the same
conv at C_out=128 runs ~72 (benchmarks/microbench_sol.py): with channels in
the lane dimension a 64-channel output half-fills the 128-wide MXU and
every post-op runs at 50% lane occupancy.  SCNet — the largest block of
FCVSR frame time (117 ms of 256 at 480x272, docs/PERFORMANCE.md) — is
almost entirely such convs (reference CVSR_freq.py:705-822).

This kernel transposes the problem instead of the data path: activations
are carried as ``(B, Hp, C, Wp)`` rows layout — rows outermost, C in
sublanes, W in lanes — and each output row is built from three
accumulating MXU matmuls

    out_r (C_out, Wp) += W_dy (C_out, 3*C_in) @ cat3_{r+dy} (3*C_in, Wp)

so the lane dimension carries *spatial width* (fully occupied) and C_out
only sets the cheap M dimension.  The im2col block is one concat of three
lane-rotated window copies (``pltpu.roll``, as in ops/pallas_iac.py);
nothing but activations moves through HBM, and the window DMA is
double-buffered across grid steps.  Matmuls run single-pass bf16 with f32
accumulation — the same precision XLA's default conv uses on this chip.

Layout contract (`rows geometry`): data rows live at ``[ROW_OFF,
ROW_OFF+H)`` and data columns at ``[1, W+1)``; everything outside is zero
and the kernel re-zeroes it on every call (row/col masks), so the zero
padding ring a SAME conv needs is maintained *for free* across a chain of
calls — a whole SCNet runs with one transpose in and one out.  Measured
@272x480: 64->64 0.208 ms vs 0.295 XLA (in-chain the XLA alternative also
pays two transposes; the kernel then wins every SCNet shape).

Mosaic toolchain notes (found by bisection, round 3): pltpu.roll on bf16
(16-sublane tiling) and reshapes merging the outer dim into sublanes both
crash the terminal's compile helper — bf16 windows therefore shift via
static slice+concat (`_lane_shift`, verified on hardware), f32 via roll;
cat3 concat stands in for a zero-copy merged-dims contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_rows", "conv3x3_pair_rows", "conv3x3_rows_nhwc",
           "pad_to_rows", "rows_to_nhwc", "prep_weight", "rows_geometry",
           "ROW_OFF"]

ROW_OFF = 16        # zero rows above the data (one 16-row tile)
COL_OFF = 1         # zero columns left of the data


def rows_geometry(h: int, w: int, tile_rows: int = 16):
    """(Hp, Wp) for a (H, W) feature map in rows layout.

    Hp places the data at [ROW_OFF, ROW_OFF+h) with at least one zero halo
    row below and keeps the last data tile's (t0 - 1) DMA base clampable
    without a shift; Wp fits the data at [1, w+1) plus a zero halo column.
    """
    assert ROW_OFF % tile_rows == 0 or tile_rows <= ROW_OFF
    hp = ((ROW_OFF + h - 1) // tile_rows + 2) * tile_rows
    wp = -(-(w + 2) // 128) * 128
    return hp, wp


def _lane_shift(x, dx):
    """Shift +-1 along the lane (last) axis with wrap, dtype-preserving.

    pltpu.roll is 32-bit-only on this toolchain ('Rotate with non-32-bit
    data'); for bf16 a static +-1 shift lowers fine as slice+concat —
    which for the bf16 chain dtype removes the widen-to-f32 + roll +
    cast-back dance entirely (the wrapped lane only ever lands in the
    masked zero ring, same as the roll's wraparound).
    """
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    if x.dtype == jnp.float32:
        return pltpu.roll(x, dx % x.shape[-1], axis=x.ndim - 1)
    if dx == 1:
        return jnp.concatenate([x[..., -1:], x[..., :-1]], axis=-1)
    return jnp.concatenate([x[..., 1:], x[..., :1]], axis=-1)


def _rolled3(full):
    """[shift+1, identity, shift-1] as bf16 — the dx=0,1,2 window taps."""
    import jax.numpy as jnp

    if full.dtype == jnp.float32:
        return [_lane_shift(full, 1).astype(jnp.bfloat16),
                full.astype(jnp.bfloat16),
                _lane_shift(full, -1).astype(jnp.bfloat16)]
    return [_lane_shift(full, 1), full, _lane_shift(full, -1)]


def _pair_rhs(cat, pi):
    """Banded pair-row rhs (12c, wp) for output-row pair ``pi``: rows
    2pi..2pi+3 of the cat3 tensor concatenated along sublanes.  Built
    from contiguous single-row slices — stride-2 outer-dim slices lower
    to an unsupported gather on this Mosaic toolchain ('Only 2D gather
    is supported', measured round 5)."""
    import jax.numpy as jnp

    return jnp.concatenate([cat[2 * pi + j] for j in range(4)], axis=0)


def _kernel(src_hbm, w_ref, b_ref, *rest, th, c, cout, wp, h, w, act,
            neg_slope, mode, tiles, nb, has_res):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_res:
        res_ref, out_ref, win, sems = rest
    else:
        out_ref, win, sems = rest
        res_ref = None

    ti = pl.program_id(1)
    bi = pl.program_id(0)
    g = bi * tiles + ti                 # global sequential step
    hp = tiles * th

    def dma(step, slot):
        # window rows [t0-1, t0+th+1) (clamped; the clamp can only shift
        # tiles whose outputs are fully row-masked, see rows_geometry)
        sb = step // tiles
        st = step - sb * tiles
        base = jnp.clip(st * th - 1, 0, hp - (th + 2))
        return pltpu.make_async_copy(
            src_hbm.at[sb, pl.ds(base, th + 2)], win.at[slot],
            sems.at[slot])

    # double-buffered window pipeline: warm-up on the first step, then
    # each step prefetches the next step's window before computing its own
    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < nb * tiles)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    wmat = w_ref[...].astype(jnp.bfloat16)
    # valid-region mask: data cols [1, w+1) x data rows [ROW_OFF, ROW_OFF+h)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cout, wp), 1)
    colmask = ((lane >= COL_OFF) & (lane < COL_OFF + w)).astype(jnp.float32)
    t0 = ti * th
    dma(g, g % 2).wait()

    # rolled[dx] lane l = input col l + (dx-1), so output col ow reads
    # input cols ow-1..ow+1 — output columns stay aligned with input
    # columns (the chain contract).  The wraparound lanes only ever land
    # in the masked ring.  bf16 windows shift natively via slice+concat
    # (_lane_shift); f32 windows use pltpu.roll and cast after.
    rolled = _rolled3(win[g % 2])

    if mode == "cat9":
        # one big sublane-concat: rhs (th, 9c, wp); k = (dy*3+dx)*c+ci.
        # Simple but VPU-copy-bound (benchmarks/microbench_conv2.py: the
        # assembly costs ~4x the matmul stream) — kept for A/B timing.
        slabs = [rolled[dx][dy : dy + th] for dy in range(3)
                 for dx in range(3)]
        rhs = jnp.concatenate(slabs, axis=1)
    else:
        # 'cat3'/'mstack'/'mstack2': concat the three dx-rolls once
        # (th+2, 3c, wp); matmuls index rows through the outer dim.
        cat = jnp.concatenate(rolled, axis=1)        # (th+2, 3c, wp)

    acc = [None] * th
    if mode == "mstack2":
        # banded pair-row layout (VERDICT r4 #8): one matmul per OUTPUT
        # ROW PAIR against the 4 input rows both rows read.  At c=cout=64
        # the operand is (128, 768)x(768, wp) — M exactly 1 MXU tile and
        # K exactly 6 (vs mstack's 192x192 = 1.5x1.5 tiles padded to 2x2,
        # 56% pad efficiency — which matches the measured 103/186 TF/s
        # ratio exactly).  The band carries 25% structural zeros, so the
        # analytic ceiling is 75% of the stream rate if (and only if)
        # MXU pass time follows the PADDED operand; the A/B against
        # mstack decides which cost model the hardware follows.
        for pi in range(th // 2):
            p = jax.lax.dot_general(
                wmat, _pair_rhs(cat, pi),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (2*cout, wp)
            acc[2 * pi] = p[:cout]
            acc[2 * pi + 1] = p[cout:]
    if mode == "mstack":
        # One (3*cout, 3c) matmul per INPUT row, scatter-accumulated into
        # the <=3 output rows it feeds (out[r] += w_dy @ cat[r+dy] means
        # cat row rin contributes to out rows rin-2..rin).  Per-output-row
        # MXU tile-passes at c=cout=64: ceil(192/128)*ceil(192/128)*(th+2)
        # = 4*(th+2) vs cat3's 3*ceil(64/128)*ceil(192/128)*th = 6*th —
        # ~1.4x fewer 128x128 weight-tile loads, same VPU work.
        for rin in range(th + 2):
            p = jax.lax.dot_general(
                wmat, cat[rin],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (3*cout, wp)
            for dy in range(3):
                r = rin - dy
                if 0 <= r < th:
                    blk = p[dy * cout : (dy + 1) * cout]
                    acc[r] = blk if acc[r] is None else acc[r] + blk

    for r in range(th):
        if mode == "cat9":
            o = jax.lax.dot_general(
                wmat, rhs[r],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (cout, wp)
        elif mode in ("mstack", "mstack2"):
            o = acc[r]
        else:
            o = None
            for dy in range(3):
                d = jax.lax.dot_general(
                    wmat[dy], cat[r + dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = d if o is None else o + d
        o = o + b_ref[...]
        if has_res:
            # fused residual: saves a separate HBM read-modify-write pass
            # over the (B, Hp, Cout, Wp) output (~3x40MB at L1 bench size)
            o = o + res_ref[0, r].astype(jnp.float32)
        if act:
            o = jnp.where(o >= 0, o, neg_slope * o)
        gr = t0 + r
        rowvalid = jnp.logical_and(gr >= ROW_OFF, gr < ROW_OFF + h)
        out_ref[0, r] = jnp.where(rowvalid, o * colmask,
                                  0.0).astype(out_ref.dtype)


def _pair_kernel(src_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, win,
                 sems, *, th, c, c1, cout, wp, h, w, ns1, tiles, nb,
                 mode="cat3"):
    """Two chained 3x3 convs per tile: the intermediate lives in VMEM.

    out = conv2(lrelu_ns1(conv1(window) + b1)) + b2, both cat3-style.
    The window covers th+4 input rows; th+2 intermediate rows are
    computed (the conv2 halo is recomputed per tile — 2 rows of overlap
    beats an HBM round-trip of the whole intermediate, which is what the
    chain pays when the convs run as two kernels: every window DMA then
    serializes on the previous conv's freshly-written output)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ti = pl.program_id(1)
    bi = pl.program_id(0)
    g = bi * tiles + ti
    hp = tiles * th

    def dma(step, slot):
        sb = step // tiles
        st = step - sb * tiles
        # input rows [t0-2, t0+th+2); the clamp can only shift the first
        # and last tiles, whose outputs are fully row-masked (see
        # rows_geometry: data ends at least one full tile above hp)
        base = jnp.clip(st * th - 2, 0, hp - (th + 4))
        return pltpu.make_async_copy(
            src_hbm.at[sb, pl.ds(base, th + 4)], win.at[slot],
            sems.at[slot])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < nb * tiles)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    w1 = w1_ref[...].astype(jnp.bfloat16)
    w2 = w2_ref[...].astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    colmask = ((lane >= COL_OFF) &
               (lane < COL_OFF + w)).astype(jnp.float32)
    t0 = ti * th
    dma(g, g % 2).wait()

    rolled_w = _rolled3(win[g % 2])                  # 3x (th+4, c, wp)

    def stage_raw(rolled, wmat, co, nrows):
        """Raw matmul outputs for nrows consecutive output rows."""
        cat = jnp.concatenate(rolled, axis=1)        # (nrows+2, 3ci, wp)
        if mode == "mstack2":
            # banded pair-row matmul (see _kernel): exact-tile operands
            raws = []
            for pi in range(nrows // 2):
                p = jax.lax.dot_general(
                    wmat, _pair_rhs(cat, pi),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (2co, wp)
                raws += [p[:co], p[co:]]
            return raws
        raws = []
        for r in range(nrows):
            o = None
            for dy in range(3):
                d = jax.lax.dot_general(
                    wmat[dy], cat[r + dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = d if o is None else o + d
            raws.append(o)
        return raws

    # ---- conv1: th+2 intermediate rows [t0-1, t0+th+1), masked like a
    # chain output so conv2 sees the zero ring ----
    mids = []
    for r, o in enumerate(stage_raw(rolled_w, w1, c1, th + 2)):
        o = o + b1_ref[...]
        o = jnp.where(o >= 0, o, ns1 * o)
        gr = t0 - 1 + r
        rowvalid = jnp.logical_and(gr >= ROW_OFF, gr < ROW_OFF + h)
        mids.append(jnp.where(rowvalid, o * colmask, 0.0)
                    .astype(jnp.bfloat16))
    # bf16 intermediate (same storage rounding as the unfused chain) —
    # halves the stack + shift volume and feeds the matmuls directly
    mid = jnp.stack(mids)                            # (th+2, c1, wp) bf16

    # ---- conv2: th output rows ----
    for r, o in enumerate(stage_raw(_rolled3(mid), w2, cout, th)):
        o = o + b2_ref[...]
        gr = t0 + r
        rowvalid = jnp.logical_and(gr >= ROW_OFF, gr < ROW_OFF + h)
        out_ref[0, r] = jnp.where(rowvalid, o * colmask,
                                  0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "ns1", "tile_rows",
                                             "mode", "out_dtype",
                                             "interpret"))
def conv3x3_pair_rows(x_rows, w1, b1, w2, b2, *, h: int, w: int,
                      ns1: float = 0.2, tile_rows: int = 16,
                      mode: str = "cat3", out_dtype=None,
                      interpret: bool = False):
    """conv2(leaky_relu(conv1(x))) on rows-layout activations, one kernel.

    The SCNet chain's body0->body1 pairs (12 of the 13 convs per
    group-level, models/scnet_rows.py) are back-to-back 3x3s with only a
    leaky-relu between: fusing them keeps the intermediate in VMEM and
    removes one full HBM write+read+DMA-serialization point per pair.

    w1/w2: ``prep_weight`` layout matching ``mode`` — cat3
    (3, Cmid, 3*Cin)/(3, Cout, 3*Cmid) or mstack2 (2*Cmid, 12*Cin)/
    (2*Cout, 12*Cmid); b1/b2: (Cmid,)/(Cout,) or None.  ``ns1``: conv1's
    leaky-relu slope (conv1's activation is always applied; pass the
    pair's slope).  conv2 output has NO activation (callers apply
    ContextBlock etc. after).
    Semantics == two ``conv3x3_rows`` calls with act=True on the first.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = x_rows.shape
    assert (hp, wp) == rows_geometry(h, w, tile_rows), \
        (hp, wp, rows_geometry(h, w, tile_rows))
    if mode == "mstack2":
        assert tile_rows % 2 == 0, tile_rows
        c1 = w1.shape[0] // 2
        assert w1.shape == (2 * c1, 12 * c)
        cout = w2.shape[0] // 2
        assert w2.shape == (2 * cout, 12 * c1)
        w1spec = pl.BlockSpec((2 * c1, 12 * c), lambda bi, ti: (0, 0))
        w2spec = pl.BlockSpec((2 * cout, 12 * c1), lambda bi, ti: (0, 0))
    else:
        assert w1.ndim == 3 and w1.shape[0] == 3 and w1.shape[2] == 3 * c
        c1 = w1.shape[1]
        assert w2.shape == (3, w2.shape[1], 3 * c1)
        cout = w2.shape[1]
        w1spec = pl.BlockSpec((3, c1, 3 * c), lambda bi, ti: (0, 0, 0))
        w2spec = pl.BlockSpec((3, cout, 3 * c1), lambda bi, ti: (0, 0, 0))
    assert wp % 128 == 0 and c % 16 == 0 and c1 % 16 == 0
    tiles = hp // tile_rows
    b1v = jnp.zeros((c1, 1), jnp.float32) if b1 is None \
        else b1.reshape(c1, 1).astype(jnp.float32)
    b2v = jnp.zeros((cout, 1), jnp.float32) if b2 is None \
        else b2.reshape(cout, 1).astype(jnp.float32)

    kern = functools.partial(_pair_kernel, th=tile_rows, c=c, c1=c1,
                             cout=cout, wp=wp, h=h, w=w, ns1=ns1,
                             tiles=tiles, nb=b, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            w1spec,
            pl.BlockSpec((c1, 1), lambda bi, ti: (0, 0)),
            w2spec,
            pl.BlockSpec((cout, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, cout, wp),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, cout, wp),
                                       out_dtype or x_rows.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 4, c, wp), x_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_rows, w1, b1v, w2, b2v)


def _quad_kernel(src_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 w4_ref, b4_ref, y_ref, out_ref, win, sems, *, th, c, c1, c2,
                 c3, cout, wp, h, w, ns1, ns3, tiles, nb):
    """Four chained 3x3 convs per tile (a whole BlockRCB conv body).

    y   = conv2(lrelu_ns1(conv1(window) + b1)) + b2     (the block pair)
    out = conv4(lrelu_ns3(conv3(y) + b3)) + b4          (the RCB pair)

    Both y and out are emitted (the caller's RCB residual needs y).  The
    window covers th+8 input rows; intermediates shrink by one halo row
    per conv (th+6 / th+4 / th+2 rows — halo recompute per tile instead
    of an HBM round-trip of y between the two pair kernels).  Every
    intermediate is ring-masked and stored bf16, bit-matching the
    two-pair chain (the unfused y is written/re-read as the bf16 chain
    dtype; recomputed halo rows run the identical dot_generals)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ti = pl.program_id(1)
    bi = pl.program_id(0)
    g = bi * tiles + ti
    hp = tiles * th

    def dma(step, slot):
        sb = step // tiles
        st = step - sb * tiles
        # input rows [t0-4, t0+th+4); the clamp can only shift tiles whose
        # outputs are fully row-masked (rows_geometry: the data region is
        # preceded by ROW_OFF >= tile_rows ring rows and followed by at
        # least one full ring tile)
        base = jnp.clip(st * th - 4, 0, hp - (th + 8))
        return pltpu.make_async_copy(
            src_hbm.at[sb, pl.ds(base, th + 8)], win.at[slot],
            sems.at[slot])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < nb * tiles)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    colmask = ((lane >= COL_OFF) &
               (lane < COL_OFF + w)).astype(jnp.float32)
    t0 = ti * th
    dma(g, g % 2).wait()

    def stage(cat, wmat, bref, rows, base_off, slope, out_cast):
        """One conv over ``rows`` output rows whose first row sits at
        global row t0+base_off; mask + optional lrelu.

        ``out_cast``: the storage dtype of this intermediate.  Intra-pair
        mids are bf16 (the pair kernel's storage rounding); the y handoff
        uses the chain dtype (what the unfused chain writes to HBM); the
        final stage stays f32 until the output write."""
        wm = wmat[...].astype(jnp.bfloat16)
        outs = []
        for r in range(rows):
            o = None
            for dy in range(3):
                d = jax.lax.dot_general(
                    wm[dy], cat[r + dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = d if o is None else o + d
            o = o + bref[...]
            if slope is not None:
                o = jnp.where(o >= 0, o, slope * o)
            gr = t0 + base_off + r
            rowvalid = jnp.logical_and(gr >= ROW_OFF, gr < ROW_OFF + h)
            outs.append(jnp.where(rowvalid, o * colmask, 0.0)
                        .astype(out_cast))
        return jnp.stack(outs)

    chain_dt = y_ref.dtype
    cat0 = jnp.concatenate(_rolled3(win[g % 2]), axis=1)   # (th+8, 3c, wp)
    m1 = stage(cat0, w1_ref, b1_ref, th + 6, -3, ns1, jnp.bfloat16)
    cat1 = jnp.concatenate(_rolled3(m1), axis=1)
    m2 = stage(cat1, w2_ref, b2_ref, th + 4, -2, None, chain_dt)
    for r in range(th):
        y_ref[0, r] = m2[r + 2]
    cat2 = jnp.concatenate(_rolled3(m2), axis=1)
    m3 = stage(cat2, w3_ref, b3_ref, th + 2, -1, ns3, jnp.bfloat16)
    cat3 = jnp.concatenate(_rolled3(m3), axis=1)
    m4 = stage(cat3, w4_ref, b4_ref, th, 0, None, jnp.float32)
    for r in range(th):
        out_ref[0, r] = m4[r].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "ns1", "ns3",
                                             "tile_rows", "out_dtype",
                                             "interpret"))
def conv3x3_quad_rows(x_rows, w1, b1, w2, b2, w3, b3, w4, b4, *, h: int,
                      w: int, ns1: float = 0.1, ns3: float = 0.2,
                      tile_rows: int = 16, out_dtype=None,
                      interpret: bool = False):
    """(y, out) = the two chained conv pairs of a BlockRCB body, one kernel.

    y   = conv2(lrelu_ns1(conv1(x)))   — the block body0/body1 pair
    out = conv4(lrelu_ns3(conv3(y)))   — the RCB body0/body1 pair

    Weights in cat3 ``prep_weight`` layout; biases optional.  Semantics ==
    ``conv3x3_pair_rows(x, w1, b1, w2, b2, ns1)`` followed by
    ``conv3x3_pair_rows(y, w3, b3, w4, b4, ns3)`` with y stored in the
    chain dtype between — but y never round-trips HBM (read 1.5x of x
    instead of 2x full reads + one intermediate write, and one kernel
    boundary instead of two).

    MEASURED CLOSURE (round 4): LOSES in the real SCNet chain — 35.1 vs
    32.2 ms scnet10 bf16 @480x272 (benchmarks/microbench_scnet_parts.py
    full_quad).  The backbone is compute-rate-bound at the kernel's
    ~103 TFLOP/s, so the +18.75% halo-recompute FLOPs (four stages off a
    th+8 window at th=16) cost more than the saved round-trip; boundaries
    were never the cost (~5 us/call).  Kept behind
    ``scnet_rows_apply(fuse='quad')`` with bit-exact goldens as
    measurement provenance."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = x_rows.shape
    assert (hp, wp) == rows_geometry(h, w, tile_rows), \
        (hp, wp, rows_geometry(h, w, tile_rows))
    ws = [w1, w2, w3, w4]
    cs = [c]
    for wm in ws:
        assert wm.ndim == 3 and wm.shape[0] == 3 and \
            wm.shape[2] == 3 * cs[-1], (wm.shape, cs[-1])
        cs.append(wm.shape[1])
    c1, c2, c3, cout = cs[1:]
    assert wp % 128 == 0 and all(x % 16 == 0 for x in cs)
    tiles = hp // tile_rows

    def bvec(bias, n):
        return jnp.zeros((n, 1), jnp.float32) if bias is None \
            else bias.reshape(n, 1).astype(jnp.float32)

    kern = functools.partial(_quad_kernel, th=tile_rows, c=c, c1=c1, c2=c2,
                             c3=c3, cout=cout, wp=wp, h=h, w=w, ns1=ns1,
                             ns3=ns3, tiles=tiles, nb=b)
    dt = out_dtype or x_rows.dtype
    wspec = [
        (pl.BlockSpec((3, cc, 3 * ci), lambda bi, ti: (0, 0, 0)),
         pl.BlockSpec((cc, 1), lambda bi, ti: (0, 0)))
        for ci, cc in zip(cs[:-1], cs[1:])
    ]
    return pl.pallas_call(
        kern,
        grid=(b, tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [s for pair in wspec for s in pair],
        out_specs=[pl.BlockSpec((1, tile_rows, c2, wp),
                                lambda bi, ti: (bi, ti, 0, 0)),
                   pl.BlockSpec((1, tile_rows, cout, wp),
                                lambda bi, ti: (bi, ti, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, hp, c2, wp), dt),
                   jax.ShapeDtypeStruct((b, hp, cout, wp), dt)],
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 8, c, wp), x_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_rows, w1, bvec(b1, c1), w2, bvec(b2, c2), w3, bvec(b3, c3),
      w4, bvec(b4, cout))


def prep_weight(weight: jnp.ndarray, mode: str = "cat3") -> jnp.ndarray:
    """HWIO (3, 3, Cin, Cout) -> the kernel's weight layout.

    'cat9': (Cout, 9*Cin) with k = (dy*3+dx)*Cin+cin.
    'cat3': (3, Cout, 3*Cin) — split by dy, k = dx*Cin+cin per slab
    (matching the in-kernel dx-roll concat order).
    'mstack': (3*Cout, 3*Cin) — the cat3 slabs stacked dy-major along M
    (one matmul per input row, scatter-accumulated).
    'mstack2': (2*Cout, 12*Cin) — banded pair-row matrix: row block 0
    (output row r) = [w0 w1 w2 0], row block 1 (row r+1) = [0 w0 w1 w2]
    over the 4 input-row K blocks (one matmul per output-row pair; at
    Cin=Cout=64 both operand dims are exact MXU-tile multiples).
    """
    kh, kw, cin, cout = weight.shape
    assert kh == 3 and kw == 3
    if mode == "cat9":
        return jnp.transpose(weight, (3, 0, 1, 2)).reshape(cout, 9 * cin)
    w3 = jnp.transpose(weight, (0, 3, 1, 2)).reshape(3, cout, 3 * cin)
    if mode == "mstack":
        return w3.reshape(3 * cout, 3 * cin)
    if mode == "mstack2":
        z = jnp.zeros((cout, 3 * cin), weight.dtype)
        top = jnp.concatenate([w3[0], w3[1], w3[2], z], axis=1)
        bot = jnp.concatenate([z, w3[0], w3[1], w3[2]], axis=1)
        return jnp.concatenate([top, bot], axis=0)   # (2*cout, 12*cin)
    return w3


def pad_to_rows(x: jnp.ndarray, tile_rows: int = 16) -> jnp.ndarray:
    """(B, H, W, C) NHWC -> rows layout (B, Hp, C, Wp), zeros outside the
    data region (rows [ROW_OFF, ROW_OFF+H), cols [1, W+1))."""
    b, h, w, c = x.shape
    hp, wp = rows_geometry(h, w, tile_rows)
    xt = jnp.transpose(x, (0, 1, 3, 2))            # (B, H, C, W)
    return jnp.pad(xt, ((0, 0), (ROW_OFF, hp - ROW_OFF - h), (0, 0),
                        (COL_OFF, wp - COL_OFF - w)))


def rows_to_nhwc(y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Rows layout (B, Hp, C, Wp) -> (B, H, W, C)."""
    return jnp.transpose(
        y[:, ROW_OFF : ROW_OFF + h, :, COL_OFF : COL_OFF + w], (0, 1, 3, 2))


@functools.partial(jax.jit, static_argnames=("h", "w", "act", "neg_slope",
                                             "tile_rows", "mode",
                                             "out_dtype", "interpret"))
def conv3x3_rows(x_rows, wmat, bias=None, res=None, *, h: int, w: int,
                 act: bool = False, neg_slope: float = 0.2,
                 tile_rows: int = 16, mode: str = "cat3",
                 out_dtype=None, interpret: bool = False):
    """3x3 SAME conv on rows-layout activations (chain-resident).

    x_rows: (B, Hp, C, Wp) from :func:`pad_to_rows` or a previous call;
    wmat: from :func:`prep_weight` (same ``mode``); h/w: the data-region
    size.  Returns (B, Hp, Cout, Wp) in the same layout with the zero
    ring re-established (so calls chain without repadding).  ``act``
    fuses leaky_relu(neg_slope).  ``res``: an optional (B, Hp, Cout, Wp)
    rows tensor added to the conv output *before* the activation — fusing
    a residual add that would otherwise be a separate full-tensor HBM
    read-modify-write pass.  Activations may be bf16 (the HBM-halving
    chain dtype — matmuls are single-pass bf16 regardless, so the only
    numerics change is bf16 *storage* rounding between convs);
    ``out_dtype`` defaults to the input dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = x_rows.shape
    assert (hp, wp) == rows_geometry(h, w, tile_rows), \
        (hp, wp, rows_geometry(h, w, tile_rows))
    if mode == "cat9":
        cout = wmat.shape[0]
        assert wmat.shape[1] == 9 * c
        wspec = pl.BlockSpec((cout, 9 * c), lambda bi, ti: (0, 0))
    elif mode == "mstack":
        cout = wmat.shape[0] // 3
        assert wmat.shape == (3 * cout, 3 * c)
        wspec = pl.BlockSpec((3 * cout, 3 * c), lambda bi, ti: (0, 0))
    elif mode == "mstack2":
        cout = wmat.shape[0] // 2
        assert wmat.shape == (2 * cout, 12 * c)
        assert tile_rows % 2 == 0, tile_rows
        wspec = pl.BlockSpec((2 * cout, 12 * c), lambda bi, ti: (0, 0))
    else:
        cout = wmat.shape[1]
        assert wmat.shape == (3, cout, 3 * c)
        wspec = pl.BlockSpec((3, cout, 3 * c), lambda bi, ti: (0, 0, 0))
    assert wp % 128 == 0, wp
    assert c % 16 == 0, c       # bf16 sublane tile
    tiles = hp // tile_rows
    bvec = jnp.zeros((cout, 1), jnp.float32) if bias is None \
        else bias.reshape(cout, 1).astype(jnp.float32)

    kern = functools.partial(_kernel, th=tile_rows, c=c, cout=cout, wp=wp,
                             h=h, w=w, act=act, neg_slope=neg_slope,
                             mode=mode, tiles=tiles, nb=b,
                             has_res=res is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        wspec,
        pl.BlockSpec((cout, 1), lambda bi, ti: (0, 0)),
    ]
    args = [x_rows, wmat, bvec]
    if res is not None:
        assert res.shape == (b, hp, cout, wp), (res.shape, (b, hp, cout, wp))
        in_specs.append(pl.BlockSpec((1, tile_rows, cout, wp),
                                     lambda bi, ti: (bi, ti, 0, 0)))
        args.append(res)
    return pl.pallas_call(
        kern,
        grid=(b, tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_rows, cout, wp),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, cout, wp),
                                       out_dtype or x_rows.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 2, c, wp), x_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.lru_cache(maxsize=None)
def _nhwc_vmappable(mode, interpret):
    """custom_vmap folding a mapped axis into the kernel's batch grid: the
    manual-DMA source input cannot be block-indexed under vmap (same
    pattern as ops/pallas_iac.py; ETC mode vmaps the whole forward)."""

    def base(x, kernel, bias):
        h, w = x.shape[1], x.shape[2]
        y = conv3x3_rows(pad_to_rows(x), prep_weight(kernel, mode), bias,
                         h=h, w=w, mode=mode, interpret=interpret)
        return rows_to_nhwc(y, h, w)

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, x, kernel, bias):  # noqa: ANN001
        xb, kb, bb = in_batched
        assert xb and not kb, "only activation batching is supported"
        assert bias is None or not bb
        out = base(x.reshape((-1,) + x.shape[2:]), kernel, bias)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return wrapped


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_rows_nhwc(x, kernel, bias, mode="mstack", interpret=False):
    """One NHWC 3x3 SAME conv served by the rows kernel (pad/transpose in,
    kernel, transpose out).

    The payoff case is a lane-hostile output width: ``conv_last0`` — 3x3
    at (4H, 4W), C_out=1 (reference CVSR_freq.py:2566/2644) — runs at
    0.33 TFLOP/s under XLA's NHWC layout (C_out occupies the lane dim),
    7.3 ms of the 21 ms upsampling tail at 480x272.  In rows layout
    C_out only sets the matmul M dim and width fills the lanes.
    ``mode='mstack'`` re-uses each DMA'd input row across its <=3 output
    rows with one (3*Cout, 3*Cin) matmul — the measured f32 winner
    (0.160 vs 0.359 ms cat3 at 64->64; M tiny here makes it matter more).

    Differentiable: the VJP is the exact XLA conv backward at the same
    primals (ops/dcn.py custom-VJP pattern) — serving-path forward,
    exact-path gradients.

    x: (B, H, W, Cin); kernel: HWIO (3, 3, Cin, Cout); bias: (Cout,) or
    None.  Numerics match the NHWC conv at TPU serving precision (the
    MXU runs single-pass bf16 either way); CPU comparisons see bf16
    rounding.
    """
    return _nhwc_vmappable(mode, interpret)(x, kernel, bias)


def _nhwc_ref(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if bias is None else y + bias


def _rows_nhwc_fwd(x, kernel, bias, mode="mstack", interpret=False):
    return _nhwc_vmappable(mode, interpret)(x, kernel, bias), \
        (x, kernel, bias)


def _rows_nhwc_bwd(mode, interpret, res, g):
    x, kernel, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda a, k: _nhwc_ref(a, k, None), x, kernel)
        gx, gk = vjp(g)
        return gx, gk, None
    _, vjp = jax.vjp(_nhwc_ref, x, kernel, bias)
    return vjp(g)


conv3x3_rows_nhwc.defvjp(_rows_nhwc_fwd, _rows_nhwc_bwd)
