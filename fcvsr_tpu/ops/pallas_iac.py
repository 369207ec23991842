"""Fused IAC iteration (flow-warp + SAC + residual + leaky-relu) in Pallas.

The IAC chain is FCVSR's hottest loop (6 iterations x 2 directions x 3 MGAA
calls per forward; reference CVSR_freq.py:1230-1276).  Round-1 ran it as an
XLA gather-based warp + shifted-add SAC; the gather dominates (1.27 ms per
warp at 272x480x64, ~26 GB/s effective — benchmarks/microbench.py).

This kernel processes a row tile per program and keeps everything in VMEM:

* the bilinear warp is a **static separable stencil** over a source window
  DMA'd from HBM at a per-tile dynamic base offset.  The base is
  ``round(mean(flow))`` over the tile, so arbitrarily large smooth flows
  stay exact; per-pixel deviations from the base are representable up to
  ``radius`` pixels (beyond that they clamp — the XLA gather path remains
  the bit-exact fallback for unbounded flows, ``ops.sac.iac``).
* zero padding (reference grid_sample semantics) comes from the zero ring
  of the padded rows layout; SAC's replicate borders from first/last-row
  duplication inside the kernel; both SAC passes use kernel1 (the
  reference bug — the fused path only implements the shipped
  kernel1-both behaviour).
* kernels arrive tap-major ((tap, c) channel layout) so in-kernel tap slices
  are contiguous (MGAA's predictor emits this layout directly via
  ``out_select`` — a free permutation of conv output channels).

**Rows-resident chaining** (round 3): the kernel consumes AND produces the
padded rows layout ``(B, Hp, C, Wp)`` — C in sublanes, W in lanes, a zero
ring giving both the warp's zero padding and SAME-style geometry for free.
A chained call (``iac_fused``) therefore pays ONE NHWC->rows transpose on
entry and one rows->NHWC on exit instead of a pad+transpose per iteration
(measured 1.65 ms/iteration chained vs 1.14 standalone before the rework —
the glue was ~1/3 of chained cost).  The grid covers the padded rows too:
tiles fully inside the vertical ring just rewrite zeros, keeping the output
a valid warp source for the next iteration.  SAC runs natively in
(rows, C, W) — vertical taps are row shifts, horizontal taps are lane
shifts — which also removes the old in-kernel (rows,C,W)->(rows,W,C)
transpose; predicted kernels are pre-transposed ONCE per chain to
``(B, H, AC*3C, W)`` and block-sliced per iteration inside the BlockSpec
(no per-iteration copies).

Grid = (batch, padded-row-tiles); all stencil slices are static; only the
window DMA start is dynamic.

**Double-buffered window DMA** (round 3): the per-tile window base rows are
scalar-prefetch inputs computed outside the kernel, so each grid step starts
the NEXT step's window copy before computing its own — the manual DMA gets
the same 2-deep pipelining Mosaic gives BlockSpec inputs.  Before this the
start+wait round-trip inside each step serialized compute behind HBM:
standalone iteration 1.14 -> 0.65 ms, 6-iteration chain 9.87 -> 2.88 ms
(3.4x) at 272x480x64.

Status (round 3): RUNS ON HARDWARE.  The terminal upgrade unblocked Mosaic
compiles; three real-lowering constraints interpret mode never surfaced
were fixed (tile-aligned ref slices -> pre-tiled flow halo blocks;
128-multiple lane dims on manual-DMA arrays -> rows layout with full-width
row DMAs + a dynamic lane rotate for the horizontal base; scoped-VMEM 16M
default -> CompilerParams).  Golden tests run in interpret mode on CPU
(tests/test_pallas_iac.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["iac_fused", "iac_fused_kf", "iac_fused_resident",
           "warp_sac_fused", "iac_fused_vjp"]


def _geometry(h, w, radius):
    """Padded rows-layout geometry shared by every call in a chain."""
    pad_v = radius + 14  # covers |tile-mean vertical flow| up to 13px
    # Horizontal: the window DMA moves full-width rows (a column slice of
    # an HBM ref cannot be lane-aligned for arbitrary bases), so Wp must be
    # a lane multiple; spare width becomes extra horizontal base coverage.
    wp = ((w + 2 * (radius + 14) + 127) // 128) * 128
    extra = wp - w - 2 * (radius + 14)
    pad_l = radius + 14 + extra // 2
    pad_r = wp - w - pad_l
    bmax_x = min(pad_l, pad_r) - radius - 1
    return pad_v, pad_l, pad_r, wp, bmax_x


def _to_rows(feat, pad_v, pad_l, pad_r):
    """(B, H, W, C) -> padded rows layout (B, Hp, C, Wp)."""
    return jnp.transpose(
        jnp.pad(feat, ((0, 0), (pad_v, pad_v), (pad_l, pad_r), (0, 0))),
        (0, 1, 3, 2))


def _from_rows(rows, h, w, pad_v, pad_l):
    """(B, Hp, C, Wp) -> (B, H, W, C)."""
    return jnp.transpose(
        rows[:, pad_v : pad_v + h, :, pad_l : pad_l + w], (0, 1, 3, 2))


def _kernel(rows0_ref, bxs_ref, fxt_ref, fyt_ref, src_hbm, k_ref, *rest,
            radius, th, h, w, c, pad_v, pad_l, bmax_x, wp, act, tiles,
            tiles_p, kf=False):
    """One fused IAC iteration per (batch, padded-tile) grid step.

    ``kf`` (fused kernel prediction, round 5): ``k_ref`` is the PREDICTOR
    FEATURE block f0 (1, th, c0, w) instead of the predicted kernels —
    two extra inputs follow it (Wsel^T (3c, c0) per-iteration slice and
    its bias (3c, 1)) and the per-pixel SAC kernels are computed
    in-kernel as one thin matmul per row: ``k_slab[r] = Wsel^T @ f0[r]
    + b``.  This replaces the chain's dominant HBM stream (the
    predicted-kernel tensor, ~50 MB/iteration bf16 at 480x272) with the
    3x-smaller f0 stream and removes F1's 300 MB/chain emission
    entirely; the matmul itself is ~0.1 GFLOP/tile on an otherwise
    MXU-idle kernel.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if kf:
        kw_ref, kb_ref, fin_ref, out_ref, win2, sems = rest
    else:
        fin_ref, out_ref, win2, sems = rest
        kw_ref = kb_ref = None

    r = radius
    wh = th + 2                       # warped rows incl. SAC halo
    wrows = wh + 2 * r + 1            # source window rows
    pvt = pad_v // th                 # tiles inside the vertical ring

    bi = pl.program_id(0)
    tip = pl.program_id(1)            # tile index over PADDED rows
    ti = tip - pvt                    # data-tile index (may be outside)
    is_data = jnp.logical_and(ti >= 0, ti < tiles)
    t0 = jnp.clip(ti, 0, tiles - 1) * th
    fr0 = jnp.clip(t0 - 1, 0, h - wh)  # first warped (absolute) row
    m0 = t0 - fr0                      # tile row offset inside warped rows

    # ---- double-buffered window DMA with a one-step lookahead ----
    # The per-tile window base rows (scalar-prefetch ``rows0``, one entry
    # per flattened grid step) are computed OUTSIDE the kernel, so step s
    # can start step s+1's window DMA before it computes — the DMA
    # round-trip latency (previously start+wait inside each step) hides
    # behind the stencil.  win2/sems are persistent scratch (grid steps
    # run sequentially on the core), giving the manual DMA the same
    # 2-deep pipelining the BlockSpec inputs already get.
    step = bi * tiles_p + tip
    total = pl.num_programs(0) * tiles_p

    def win_dma(slot, s):
        return pltpu.make_async_copy(
            src_hbm.at[s // tiles_p, pl.ds(rows0_ref[s], wrows)],
            win2.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _warm():
        win_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _ahead():
        win_dma((step + 1) % 2, step + 1).start()

    def body():
        # every started DMA must be waited exactly once, ring tiles
        # included (their rows0 entry is 0 — a harmless top-rows read)
        win_dma(step % 2, step).wait()

        @pl.when(jnp.logical_not(is_data))
        def _ring():
            # vertical zero ring: keeps the output a valid warp source
            out_ref[0] = jnp.zeros((th, c, wp), out_ref.dtype)

        @pl.when(is_data)
        def _data():
            # ---- flow rows [fr0, fr0+wh): pre-tiled halo blocks ----
            # Mosaic requires tile-aligned slices on the tiled dims of a
            # ref, so the overlapping halo rows are assembled OUTSIDE the
            # kernel (flow is (H, W, 2) — tiny) and pipelined in as
            # ordinary (1, 1, wh, w) blocks, one per (batch, tile).
            # rows0 = fr0 + base_y - r + pad_v, inverted in the helper so
            # the stencil weights use exactly the DMA'd window's base.
            if kf:
                # fused kernel prediction: k_slab[r] = Wsel^T @ f0[r] + b
                # matmul dtype follows the chain storage dtype: bf16
                # deployment runs single-pass bf16 (like the XLA conv it
                # replaces); the f32 path keeps true-f32 operands so the
                # exact-vs-fused comparison stays tight
                f0 = k_ref[0]                              # (th, c0, w)
                wk = kw_ref[0].astype(f0.dtype)            # (3c, c0)
                rows_k = [jax.lax.dot_general(
                    wk, f0[rr],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + kb_ref[0]
                    for rr in range(th)]
                k_slab = jnp.stack(rows_k)                 # (th, 3c, w) f32
            else:
                k_slab = k_ref[0]
            out = _tile_stencil_sac(
                win2[step % 2], fxt_ref[0, 0], fyt_ref[0, 0],
                rows0_ref[step] - fr0 + r - pad_v, bxs_ref[step],
                k_slab, fin_ref[0], m0, radius=r, th=th, wh=wh, c=c,
                w=w, wp=wp, pad_l=pad_l)
            if act:
                out = jnp.where(out >= 0, out, 0.1 * out)
            out_ref[0] = out.astype(out_ref.dtype)

    body()


def _tile_stencil_sac(full, fx, fy, base_y, base_x, k_slab, fin_slab, m0,
                      *, radius, th, wh, c, w, wp, pad_l):
    """One tile's warp stencil + SAC (kernel1 both) + residual, f32 out.

    full: (wrows, c, wp) source window (any storage dtype); fx/fy: the
    tile's (wh, w) flow halos; base_y/base_x: scalar base offsets the
    window was DMA'd at; k_slab: (th, 3c, w) tap-major kernels; fin_slab:
    (th, c, wp) residual rows.  Shared by the per-iteration kernel
    (_kernel) and the VMEM-resident chain kernel (_chain_kernel) — the
    math is identical, only the window source differs.
    """
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    r = radius

    # ---- stencil weights (independent of the window) ----
    nx = 2 * r + 2
    eps = 1e-4
    a = jnp.clip(fy - base_y.astype(fy.dtype) + r, 0.0, nx - 1 - eps)
    b = jnp.clip(fx - base_x.astype(fx.dtype) + r, 0.0, nx - 1 - eps)
    y0 = jnp.floor(a)
    x0 = jnp.floor(b)
    fyf = a - y0
    fxf = b - x0

    # ---- align window columns: rotate lanes so col
    # (base_x - r + pad_l) lands on lane 0; taps then use static
    # slices.  No wraparound reads: max used lane =
    # (w-1) + (nx-1) + col0_max < wp by padding choice.
    # bf16 storage: widen BEFORE the roll (pltpu.roll on bf16
    # 16-sublane tiling crashes the Mosaic compile helper — same
    # constraint as ops/pallas_conv.py).
    col0 = base_x - r + pad_l
    if full.dtype != jnp.float32:
        full = full.astype(jnp.float32)
    rolled = pltpu.roll(full, wp - col0, axis=2)

    # ---- separable bilinear stencil: (2r+2)^2 static shifted
    # fmas, accumulated directly in the rows (rows, C, W) layout.
    # NOTE: keep the lane slices INSIDE the tap loop — Mosaic fuses
    # slice+fma; hoisting the nx distinct column windows into
    # materialized arrays measured 23x SLOWER (16.6 -> 385 ms on
    # the bf16 MGAA), not faster.
    warped = jnp.zeros((wh, c, w), jnp.float32)
    wy = []
    wx = []
    for e in range(nx):
        wy.append(jnp.where(y0 == e, 1.0 - fyf, 0.0)
                  + jnp.where(y0 == e - 1, fyf, 0.0))
        wx.append(jnp.where(x0 == e, 1.0 - fxf, 0.0)
                  + jnp.where(x0 == e - 1, fxf, 0.0))
    for e in range(nx):
        for f in range(nx):
            wgt = wy[e] * wx[f]
            warped = warped + wgt[:, None, :] * \
                rolled[e : e + wh, :, f : f + w]

    # ---- SAC (kernel1 both passes) in rows layout ----
    # replicate borders: duplicated first/last warped rows
    wpad = jnp.concatenate(
        [warped[0:1], warped, warped[wh - 1 : wh]], 0)
    kts = [k_slab[:, tap * c : (tap + 1) * c, :].astype(jnp.float32)
           for tap in range(3)]  # (th, c, w) each

    # m0 is 1 on interior tiles, 0/2 on the first/last tile;
    # dynamic slicing is unavailable in this TPU lowering, so take
    # the three static variants and select (the vertical pass is
    # cheap vs the stencil).
    def vpass(m):
        acc = jnp.zeros((th, c, w), jnp.float32)
        for tap in range(3):
            acc = acc + kts[tap] * wpad[m + tap : m + tap + th]
        return acc

    v = jnp.where(m0 == 0, vpass(0),
                  jnp.where(m0 == 2, vpass(2), vpass(1)))
    hpad = jnp.concatenate(
        [v[:, :, 0:1], v, v[:, :, w - 1 : w]], 2)
    out = jnp.zeros((th, c, w), jnp.float32)
    for tap in range(3):
        out = out + kts[tap] * hpad[:, :, tap : tap + w]

    # embed at the lane offset, add the (ring-zero) residual —
    # the ring stays zero through the add and the leaky relu
    out = jnp.pad(out, ((0, 0), (0, 0), (pad_l, wp - pad_l - w)))
    return out + fin_slab.astype(jnp.float32)


def _tile_flow(flow, h, tile_rows):
    """Pre-tiled flow halos for every leading axis at once.

    flow: (..., H, W, 2) -> (fxt, fyt), each (..., tiles, wh, W).  The
    halo gather AND the x/y channel split run ONCE here for a whole
    offsets stack: the round-4 device profile (benchmarks/
    profile_mgaa_head.py) showed ~24 per-iteration (H, W, 2)->(H, W, 1)
    strided slice-DMAs per MGAA call clogging the copy queue — hoisting
    them to one gather + two slices per chain removes that glue.
    """
    wh = tile_rows + 2
    tiles = h // tile_rows
    w = flow.shape[-2]
    fr0 = jnp.clip(jnp.arange(tiles) * tile_rows - 1, 0, h - wh)
    rows = (fr0[:, None] + jnp.arange(wh)[None, :]).ravel()
    t = jnp.take(flow, rows, axis=flow.ndim - 3)
    t = t.reshape(flow.shape[:-3] + (tiles, wh, w, 2))
    return t[..., 0], t[..., 1]


@functools.partial(
    jax.jit, static_argnames=("chunk", "h", "w", "radius", "tile_rows",
                              "act", "interpret"))
def _rows_call(src, fxt, fyt, ktr, fin_rows, chunk, h, w, radius,
               tile_rows, act, interpret, kparts=None):
    """One fused iteration, rows layout in -> rows layout out.

    src/fin_rows: (B, Hp, C, Wp); fxt/fyt: pre-tiled flow halos
    (B, tiles, wh, W) from :func:`_tile_flow`; ktr: rows-transposed
    tap-major kernels (B, H, AC*3C, W) — ``chunk`` selects the iteration's
    3C-channel block inside the BlockSpec (no per-iteration slicing copy).

    ``kparts``: fused kernel prediction — (f0_rows (B, H, C0, W),
    wsel_t (AC, 3C, C0), bsel (AC, 3C, 1)); ``ktr`` is ignored and the
    SAC kernels are computed in-kernel (see ``_kernel`` kf notes).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = src.shape
    pad_v, pad_l, pad_r, wp2, bmax_x = _geometry(h, w, radius)
    assert wp2 == wp and hp == h + 2 * pad_v
    th = tile_rows
    tiles = h // th
    tiles_p = hp // th
    pvt = pad_v // th
    wh = th + 2
    fr0 = jnp.clip(jnp.arange(tiles) * tile_rows - 1, 0, h - wh)

    def data_tile(tip):
        return jnp.clip(tip - pvt, 0, tiles - 1)

    # Per-tile window bases, precomputed so the kernel can start the NEXT
    # step's window DMA one step ahead (see the kernel's lookahead note).
    # Identical formula to the old in-kernel computation: round(mean) of
    # the tile's (wh, W) flow halo, clipped to what the padding covers.
    bmax_y = pad_v - radius - 1
    by = jnp.clip(jnp.round(jnp.mean(fyt, axis=(2, 3))), -bmax_y,
                  bmax_y).astype(jnp.int32)                # (B, tiles)
    bx = jnp.clip(jnp.round(jnp.mean(fxt, axis=(2, 3))), -bmax_x,
                  bmax_x).astype(jnp.int32)
    row0 = fr0[None] + by - radius + pad_v                 # (B, tiles)
    # ring tiles read rows [0, wrows) — harmless, keeps one DMA per step
    rows0 = jnp.zeros((b, tiles_p), jnp.int32) \
        .at[:, pvt : pvt + tiles].set(row0).reshape(-1)
    bxs = jnp.zeros((b, tiles_p), jnp.int32) \
        .at[:, pvt : pvt + tiles].set(bx).reshape(-1)

    wrows = wh + 2 * radius + 1
    kern = functools.partial(_kernel, radius=radius, th=th, h=h, w=w, c=c,
                             pad_v=pad_v, pad_l=pad_l, bmax_x=bmax_x, wp=wp,
                             act=act, tiles=tiles, tiles_p=tiles_p,
                             kf=kparts is not None)
    if kparts is None:
        k_specs = [pl.BlockSpec(
            (1, th, 3 * c, w),
            lambda bi, tip, *_: (bi, data_tile(tip), chunk, 0))]
        k_args = [ktr]
    else:
        f0_rows, wsel_t, bsel = kparts
        c0 = f0_rows.shape[2]
        k_specs = [
            pl.BlockSpec((1, th, c0, w),
                         lambda bi, tip, *_: (bi, data_tile(tip), 0, 0)),
            pl.BlockSpec((1, 3 * c, c0), lambda bi, tip, *_: (chunk, 0, 0)),
            pl.BlockSpec((1, 3 * c, 1), lambda bi, tip, *_: (chunk, 0, 0)),
        ]
        k_args = [f0_rows, wsel_t, bsel]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows0, bxs
        grid=(b, tiles_p),
        in_specs=[
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, tip, *_: (bi, data_tile(tip), 0, 0)),
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, tip, *_: (bi, data_tile(tip), 0, 0)),
            # padded source stays in HBM for the manual window DMA (an ANY
            # input small enough to be VMEM-promoted makes the dynamic
            # slices illegal — VMEM slices must be tile-aligned).
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            *k_specs,
            pl.BlockSpec((1, th, c, wp), lambda bi, tip, *_: (bi, tip, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, c, wp),
                               lambda bi, tip, *_: (bi, tip, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wrows, c, wp), src.dtype),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        # storage dtype follows the source: bf16 inputs keep the whole
        # chain (src window DMA + kernels + residual + output) at half
        # HBM traffic; all arithmetic stays f32 in-kernel
        out_shape=jax.ShapeDtypeStruct((b, hp, c, wp), src.dtype),
        # the 36-tap stencil's temporaries push past the 16M default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows0, bxs, fxt, fyt, src, *k_args, fin_rows)


def _chain_kernel(rows0_ref, bxs_ref, fxt_ref, fyt_ref, src_hbm, k_ref,
                  fin_ref, out_ref, bufs, win2, tmp, sems, wsem, *, radius,
                  th, h, w, c, pad_v, pad_l, bmax_x, wp, ac, act_last,
                  tiles, tiles_p):
    """The WHOLE ac-iteration IAC chain in one kernel, VMEM-resident.

    VERDICT r4 #3: the per-iteration chain ran at ~209 GB/s effective vs
    the chip's ~660 GB/s serial-DMA probe — the per-iteration kernel
    boundary (6 HBM round-trips of the full feature map + 6 launches) was
    the gap.  Iterations cannot be pipelined against each other (each
    warp's reads are globally flow-displaced into the previous
    iteration's output), but the TPU grid executes sequentially — so with
    grid (batch, iteration, tile) the iteration axis IS the barrier, and
    the feature map can ping-pong between two whole-map VMEM scratch
    buffers instead of round-tripping HBM: iteration 0 window-DMAs from
    the HBM source, everything after reads/writes VMEM only, and only the
    last iteration's tiles stream back out.  HBM traffic drops from
    6 reads + 6 writes of the map to 1 read + 1 write (the per-iteration
    kernels' blocks — k slabs, flow halos, residual — stream unchanged).

    Scratch discipline: tile outputs go through ``tmp`` + a local async
    copy into the write buffer at the tile's row offset (dynamic outer-dim
    stores on VMEM refs are not trusted on this toolchain; local DMA with
    a dynamic outer base is the same mechanism the window reads use).  The
    window-DMA one-step lookahead stops at iteration boundaries: step s+1
    of a new iteration reads the buffer step s is still writing, so the
    first tile of each iteration >= 1 does an inline start+wait — cheap,
    as those copies are VMEM->VMEM.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = radius
    wh = th + 2
    wrows = wh + 2 * r + 1
    pvt = pad_v // th

    bi = pl.program_id(0)
    it = pl.program_id(1)
    tip = pl.program_id(2)
    is_data = jnp.logical_and(tip >= pvt, tip < pvt + tiles)
    t0 = jnp.clip(tip - pvt, 0, tiles - 1) * th
    fr0 = jnp.clip(t0 - 1, 0, h - wh)
    m0 = t0 - fr0

    step = (bi * ac + it) * tiles_p + tip
    total = pl.num_programs(0) * ac * tiles_p

    def start(slot, s):
        # source: HBM on iteration 0, else the previous iteration's
        # VMEM buffer.  All copies move identical (wrows, c, wp) bytes
        # through the same semaphore, so any shape-alike descriptor can
        # wait.  Descriptors are built only inside their taken branch
        # (an unused built descriptor trips a Pallas tracing error).
        s_it = (s // tiles_p) % ac
        s_bi = s // (tiles_p * ac)

        @pl.when(s_it == 0)
        def _():
            pltpu.make_async_copy(
                src_hbm.at[s_bi, pl.ds(rows0_ref[s], wrows)],
                win2.at[slot], sems.at[slot]).start()

        for p in range(2):
            @pl.when(jnp.logical_and(s_it > 0, (s_it - 1) % 2 == p))
            def _(p=p):
                pltpu.make_async_copy(
                    bufs.at[p, pl.ds(rows0_ref[s], wrows)],
                    win2.at[slot], sems.at[slot]).start()

    def wait_win(slot, s):
        pltpu.make_async_copy(
            src_hbm.at[s // (tiles_p * ac), pl.ds(rows0_ref[s], wrows)],
            win2.at[slot], sems.at[slot]).wait()

    def wdesc(s):
        # write-copy descriptor for step s; the dst ref is only used for
        # its byte count on wait, so the buffer index can be static
        s_tip = s % tiles_p
        return pltpu.make_async_copy(
            tmp.at[s % 2], bufs.at[0, pl.ds(s_tip * th, th)],
            wsem.at[s % 2])

    # ---- deferred-write pipeline: step s waits step s-1's buffer-write
    # copy (so writes overlap the next tile's compute instead of stalling
    # inline), THEN starts windows.  Cross-iteration ordering: the first
    # step of an iteration waits the previous step's write here, and all
    # earlier writes were waited by their successors — so every prior
    # write has landed before any window of the new iteration starts.
    prev_wrote = jnp.logical_and(
        step > 0, ((step - 1) // tiles_p) % ac < ac - 1)

    @pl.when(prev_wrote)
    def _wait_prev_write():
        wdesc(step - 1).wait()

    first_of_it = tip == 0

    @pl.when(jnp.logical_or(step == 0, first_of_it))
    def _own_window():
        start(step % 2, step)

    # one-step lookahead, only within the iteration (the next iteration's
    # windows read the buffer this iteration is still writing)
    @pl.when(jnp.logical_and(step + 1 < total,
                             (step + 1) % tiles_p != 0))
    def _ahead():
        start((step + 1) % 2, step + 1)

    wait_win(step % 2, step)

    wbuf = it % 2
    out = jnp.zeros((th, c, wp), jnp.float32)
    # ring tiles rewrite zeros — keeps the buffer a valid warp source

    def compute():
        o = _tile_stencil_sac(
            win2[step % 2], fxt_ref[0, 0], fyt_ref[0, 0],
            rows0_ref[step] - fr0 + r - pad_v, bxs_ref[step],
            k_ref[0], fin_ref[0], m0, radius=r, th=th, wh=wh, c=c,
            w=w, wp=wp, pad_l=pad_l)
        act_now = jnp.logical_or(it < ac - 1, act_last)
        return jnp.where(jnp.logical_and(act_now, o < 0), 0.1 * o, o)

    out = jnp.where(is_data, compute(), out)

    @pl.when(it < ac - 1)
    def _to_buf():
        tmp[step % 2] = out.astype(tmp.dtype)
        for p in range(2):
            @pl.when(wbuf == p)
            def _(p=p):
                pltpu.make_async_copy(
                    tmp.at[step % 2],
                    bufs.at[p, pl.ds(tip * th, th)],
                    wsem.at[step % 2]).start()

    @pl.when(it == ac - 1)
    def _to_out():
        out_ref[0] = out.astype(out_ref.dtype)

    # no end-of-grid drain is needed: the final grid step always runs
    # iteration ac-1, which never writes a buffer (its tiles go to
    # out_ref), and every earlier write was waited by its successor


def _chain_call(src, flows, ktr, fin_rows, h, w, radius, tile_rows, ac,
                act_last, interpret):
    """The whole IAC chain as one VMEM-resident kernel call.

    src/fin_rows: (B, Hp, C, Wp); flows: (AC, B, H, W, 2); ktr:
    (B, H, AC*3C, W).  Returns (B, Hp, C, Wp) after ``ac`` iterations.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = src.shape
    pad_v, pad_l, pad_r, wp2, bmax_x = _geometry(h, w, radius)
    assert wp2 == wp and hp == h + 2 * pad_v
    th = tile_rows
    tiles = h // th
    tiles_p = hp // th
    pvt = pad_v // th
    wh = th + 2
    wrows = wh + 2 * radius + 1

    # per-iteration pre-tiled flow halos + window bases (same formulas as
    # _rows_call, with an iteration axis)
    fr0 = jnp.clip(jnp.arange(tiles) * th - 1, 0, h - wh)
    fxt_a, fyt_a = _tile_flow(flows, h, th)            # (AC,B,tiles,wh,W)
    fxt = jnp.transpose(fxt_a, (1, 0, 2, 3, 4))        # (B,AC,tiles,wh,W)
    fyt = jnp.transpose(fyt_a, (1, 0, 2, 3, 4))
    bmax_y = pad_v - radius - 1
    by = jnp.clip(jnp.round(jnp.mean(fyt, axis=(3, 4))), -bmax_y,
                  bmax_y).astype(jnp.int32)                # (B, AC, tiles)
    bx = jnp.clip(jnp.round(jnp.mean(fxt, axis=(3, 4))), -bmax_x,
                  bmax_x).astype(jnp.int32)
    row0 = fr0[None, None] + by - radius + pad_v
    rows0 = jnp.zeros((b, ac, tiles_p), jnp.int32) \
        .at[:, :, pvt : pvt + tiles].set(row0).reshape(-1)
    bxs = jnp.zeros((b, ac, tiles_p), jnp.int32) \
        .at[:, :, pvt : pvt + tiles].set(bx).reshape(-1)

    fxt = fxt.reshape(b * ac, tiles, wh, w)
    fyt = fyt.reshape(b * ac, tiles, wh, w)

    def data_tile(tip):
        return jnp.clip(tip - pvt, 0, tiles - 1)

    kern = functools.partial(_chain_kernel, radius=radius, th=th, h=h, w=w,
                             c=c, pad_v=pad_v, pad_l=pad_l, bmax_x=bmax_x,
                             wp=wp, ac=ac, act_last=act_last, tiles=tiles,
                             tiles_p=tiles_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows0, bxs
        grid=(b, ac, tiles_p),
        in_specs=[
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, it, tip, *_:
                         (bi * ac + it, data_tile(tip), 0, 0)),
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, it, tip, *_:
                         (bi * ac + it, data_tile(tip), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, th, 3 * c, w),
                         lambda bi, it, tip, *_:
                         (bi, data_tile(tip), it, 0)),
            pl.BlockSpec((1, th, c, wp),
                         lambda bi, it, tip, *_: (bi, tip, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, c, wp),
                               lambda bi, it, tip, *_: (bi, tip, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hp, c, wp), src.dtype),     # ping-pong maps
            pltpu.VMEM((2, wrows, c, wp), src.dtype),  # window 2-slot
            pltpu.VMEM((2, th, c, wp), src.dtype),     # write relay 2-slot
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, c, wp), src.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(rows0, bxs, fxt, fyt, src, ktr, fin_rows)


@functools.lru_cache(maxsize=None)
def _rows_vmappable(chunk, h, w, radius, tile_rows, act, interpret):
    """custom_vmap wrapper around :func:`_rows_call`: the manual-DMA source
    input cannot be block-indexed under vmap (Mosaic requires trivial index
    maps for HBM-space inputs), so a vmapped call folds the mapped axis
    into the kernel's own batch grid instead (ETC mode vmaps the whole
    forward over sliding windows; same pattern as ops/pallas_dcn.py)."""

    def base(src, fxt, fyt, ktr, fin):
        return _rows_call(src, fxt, fyt, ktr, fin, chunk, h, w, radius,
                          tile_rows, act, interpret)

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, src, fxt, fyt, ktr, fin):  # noqa: ANN001
        def bat(a, is_b):
            if is_b:
                return a.reshape((-1,) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape) \
                .reshape((-1,) + a.shape[1:])

        out = base(*(bat(a, ib)
                     for a, ib in zip((src, fxt, fyt, ktr, fin),
                                      in_batched)))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return wrapped


@functools.lru_cache(maxsize=None)
def _rows_vmappable_kf(chunk, h, w, radius, tile_rows, act, interpret):
    """custom_vmap wrapper for the fused-kernel-prediction iteration —
    same batch-fold rule as :func:`_rows_vmappable` (the HBM manual-DMA
    source cannot be block-indexed under vmap; ETC mode vmaps the whole
    forward), with the (f0, Wsel, bias) kernel parts in place of ktr.
    wsel/bias have no batch dim and broadcast-fold like any unbatched
    operand; a folded wsel stays identical across the folded batch, so
    the kernel's per-iteration chunk slice still reads the right block.
    """

    def base(src, fxt, fyt, f0r, wst, bst, fin):
        return _rows_call(src, fxt, fyt, None, fin, chunk, h, w, radius,
                          tile_rows, act, interpret,
                          kparts=(f0r, wst, bst))

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, src, fxt, fyt, f0r, wst, bst, fin):  # noqa: ANN001
        def bat(a, is_b):
            if is_b:
                return a.reshape((-1,) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape) \
                .reshape((-1,) + a.shape[1:])

        # wsel/bias are per-iteration constants: folding them along batch
        # would break the chunk BlockSpec (its dim-0 index selects the
        # ITERATION, not the batch) — they must stay unbatched
        assert not in_batched[4] and not in_batched[5], \
            "kernel-prediction weights cannot carry a vmapped axis"
        out = base(*(bat(a, ib) for a, ib in
                     zip((src, fxt, fyt, f0r), in_batched[:4])),
                   wst, bst,
                   bat(fin, in_batched[6]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return wrapped


def _auto_tile_rows(h, pad_v):
    # bigger tiles amortize the window halo (measured 1.14 vs 1.25 ms per
    # iteration at 272x480x64 for 16 vs 8); the ring tiles require
    # pad_v % tile_rows == 0 (pad_v = radius + 14 = 16 for the default
    # radius 2, so 16/8/4 all divide it).  h >= th + 2 keeps the warped-
    # halo geometry valid: fr0 = clip(t0 - 1, 0, h - wh) needs h >= wh =
    # th + 2, else the first tile reads wrapped flow-halo rows and its
    # frame-border output is WRONG (h == th == 16 measured 3.2 max dev on
    # row 0 — latent until the backward goldens ran default tiles; the
    # forward goldens had always pinned tile_rows=8).
    for th in (16, 8, 4):
        if h % th == 0 and pad_v % th == 0 and h >= th + 2:
            return th
    raise ValueError(f"no valid tile height for H={h} (need H % th == 0, "
                     f"pad_v={pad_v} % th == 0, H >= th + 2)")


def warp_sac_fused(feat, flow, k1_tap_major, feat_in, radius: int = 2,
                   tile_rows: int = 0, act: bool = True,
                   interpret: bool = False):
    """One fused IAC iteration (NHWC in/out convenience wrapper).

    feat/feat_in: (B, H, W, C); flow: (B, H, W, 2); k1_tap_major:
    (B, H, W, 3*C) with channel layout tap*C + c.  H must divide by
    ``tile_rows``.  Returns leaky_relu(sac(warp(feat, flow), k1) + feat_in)
    (activation skipped when ``act`` is False).
    """
    b, h, w, c = feat.shape
    if c % 8:
        raise ValueError(f"C={c} must be a multiple of 8 (sublane tiling)")
    pad_v, pad_l, pad_r, wp, _ = _geometry(h, w, radius)
    if not tile_rows:
        tile_rows = _auto_tile_rows(h, pad_v)
    if h % tile_rows or pad_v % tile_rows or h < tile_rows + 2:
        raise ValueError(f"H={h}/pad_v={pad_v} not divisible by "
                         f"tile_rows={tile_rows} (or H < tile_rows + 2)")
    src = _to_rows(feat, pad_v, pad_l, pad_r)
    fin = _to_rows(feat_in, pad_v, pad_l, pad_r)
    ktr = jnp.transpose(k1_tap_major, (0, 1, 3, 2))  # (B, H, 3C, W)
    fxt, fyt = _tile_flow(flow, h, tile_rows)
    out = _rows_vmappable(0, h, w, radius, tile_rows, act,
                          interpret)(src, fxt, fyt, ktr, fin)
    return _from_rows(out, h, w, pad_v, pad_l)


def iac_fused(feat_in, pred_k_tap_major, offsets, ac_num: int, channels: int,
              act_last: bool = True, radius: int = 2, tile_rows: int = 0,
              k_rows: bool = False, interpret: bool = False):
    """Fused IAC chain (kernel1-both semantics only), rows-resident:
    one NHWC->rows transpose in, one rows->NHWC out; iterations chain in
    the padded rows layout.

    pred_k_tap_major: (B, H, W, ac_num*3*C), iteration chunks of tap-major
    kernels; offsets: (AC, B, H, W, 2).  ``k_rows``: the kernels already
    arrive rows-transposed as (B, H, ac_num*3*C, W) — MGAA's predictor
    emits this directly (Conv2d out_layout='rows'), skipping a transpose
    whose full-shape tensor is ~600MB.

    Storage dtype follows the inputs: bf16 ``feat_in``/``pred_k`` halve
    the chain's HBM traffic (window DMAs, kernel blocks, residual, chained
    outputs); all in-kernel arithmetic stays f32 and the MXU-free stencil
    is unchanged, so the only numerics change is bf16 storage rounding
    between iterations (the MGAA ``iac_dtype='bf16'`` deployment flag).
    """
    b, h, w, c = feat_in.shape
    if c % 8:
        raise ValueError(f"C={c} must be a multiple of 8 (sublane tiling)")
    if feat_in.dtype == jnp.bfloat16 and c % 16:
        raise ValueError(f"C={c} must be a multiple of 16 for bf16 storage")
    pad_v, pad_l, pad_r, wp, _ = _geometry(h, w, radius)
    if not tile_rows:
        tile_rows = _auto_tile_rows(h, pad_v)
    fin = _to_rows(feat_in, pad_v, pad_l, pad_r)
    ktr = (pred_k_tap_major if k_rows
           else jnp.transpose(pred_k_tap_major, (0, 1, 3, 2)))
    assert ktr.shape == (b, h, ac_num * 3 * channels, w), ktr.shape
    # one halo gather + one x/y split for the WHOLE chain (see _tile_flow)
    fxt_all, fyt_all = _tile_flow(offsets, h, tile_rows)
    cur = fin
    for i in range(ac_num):
        cur = _rows_vmappable(i, h, w, radius, tile_rows,
                              i < ac_num - 1 or act_last,
                              interpret)(cur, fxt_all[i], fyt_all[i], ktr,
                                         fin)
    return _from_rows(cur, h, w, pad_v, pad_l)


def iac_fused_kf(feat_in, f0, wsel, bsel, offsets, ac_num: int,
                 channels: int, act_last: bool = True, radius: int = 2,
                 tile_rows: int = 0, interpret: bool = False):
    """``iac_fused`` with FUSED KERNEL PREDICTION (round 5).

    Instead of materializing F1's predicted-kernel tensor (the chain's
    dominant HBM stream: AC*3C channels at full resolution, ~300 MB/chain
    bf16 at 480x272 — written once by F1 and re-read once per iteration),
    the kernel computes each tile's SAC kernels in-kernel from the
    predictor feature ``f0`` and F1's selected weight slice:

        k = Wsel^T @ f0 + b      (per pixel; Wsel = F1.kernel[0,0][:, sel])

    f0: (B, H, W, C0) (the F0 output); wsel: (C0, AC*3C) — F1's kernel
    columns in the tap-major ``sel`` order; bsel: (AC*3C,).  Exact same
    function as F1-then-iac_fused up to matmul accumulation order (the
    in-kernel matmul is single-pass bf16 with f32 accumulate, like the
    XLA conv it replaces).  Inference-only: under autodiff use the
    materialized-kernel routing in ``ops.sac``.
    """
    b, h, w, c = feat_in.shape
    if c % 8:
        raise ValueError(f"C={c} must be a multiple of 8 (sublane tiling)")
    pad_v, pad_l, pad_r, wp, _ = _geometry(h, w, radius)
    if not tile_rows:
        tile_rows = _auto_tile_rows(h, pad_v)
    c0 = f0.shape[-1]
    assert wsel.shape == (c0, ac_num * 3 * channels), wsel.shape
    fin = _to_rows(feat_in, pad_v, pad_l, pad_r)
    f0_rows = jnp.transpose(f0, (0, 1, 3, 2)).astype(feat_in.dtype)
    wsel_t = jnp.transpose(
        wsel.reshape(c0, ac_num, 3 * channels), (1, 2, 0)) \
        .astype(feat_in.dtype)                       # (AC, 3C, C0)
    bsel_t = bsel.reshape(ac_num, 3 * channels, 1).astype(jnp.float32)
    fxt_all, fyt_all = _tile_flow(offsets, h, tile_rows)
    cur = fin
    for i in range(ac_num):
        cur = _rows_vmappable_kf(i, h, w, radius, tile_rows,
                                 i < ac_num - 1 or act_last, interpret)(
            cur, fxt_all[i], fyt_all[i], f0_rows, wsel_t, bsel_t, fin)
    return _from_rows(cur, h, w, pad_v, pad_l)


# scratch ceiling for the resident chain: the two whole-map buffers plus
# window/relay/pipeline buffers must fit the 120M vmem_limit with margin
# for the stencil's scoped temporaries and BlockSpec pipeline buffers.
# Calibrated on hardware (round 5): f32 @480x272 (88M estimate) fails the
# terminal compile; bf16 (44M) compiles and runs — the margin the scoped
# temporaries + pipelines need is ~55M, so the ceiling sits at 64M
# (bf16 480x272 in; f32 and 640x400 fall back to the per-iteration chain).
_RESIDENT_BUDGET = 64 * 1024 * 1024


def iac_fused_resident(feat_in, pred_k_tap_major, offsets, ac_num: int,
                       channels: int, act_last: bool = True,
                       radius: int = 2, tile_rows: int = 0,
                       k_rows: bool = False, interpret: bool = False):
    """``iac_fused`` with the whole chain in ONE VMEM-resident kernel.

    Same signature and semantics as :func:`iac_fused` (kernel1-both,
    bounded-deviation warp, storage dtype follows the inputs) but the
    feature map ping-pongs between two whole-map VMEM buffers across the
    ``ac_num`` iterations — HBM sees one read and one write of the map
    instead of six of each (see ``_chain_kernel``).  Falls back to the
    per-iteration chain when the two maps don't fit the VMEM budget
    (e.g. f32 at 640x400).  Forward/deployment only — under autodiff use
    ``ops.sac.iac`` routing, which pairs the per-iteration forward with
    its custom VJP.
    """
    b, h, w, c = feat_in.shape
    if c % 8:
        raise ValueError(f"C={c} must be a multiple of 8 (sublane tiling)")
    pad_v, pad_l, pad_r, wp, _ = _geometry(h, w, radius)
    if not tile_rows:
        tile_rows = _auto_tile_rows(h, pad_v)
    hp = h + 2 * pad_v
    itemsize = jnp.dtype(feat_in.dtype).itemsize
    scratch = (2 * hp + 2 * (tile_rows + 2 * radius + 3)
               + 2 * tile_rows) * c * wp * itemsize
    if scratch > _RESIDENT_BUDGET:
        return iac_fused(feat_in, pred_k_tap_major, offsets, ac_num,
                         channels, act_last, radius, tile_rows, k_rows,
                         interpret)
    fin = _to_rows(feat_in, pad_v, pad_l, pad_r)
    ktr = (pred_k_tap_major if k_rows
           else jnp.transpose(pred_k_tap_major, (0, 1, 3, 2)))
    assert ktr.shape == (b, h, ac_num * 3 * channels, w), ktr.shape
    out = _chain_call(fin, offsets, ktr, fin, h, w, radius, tile_rows,
                      ac_num, act_last, interpret)
    return _from_rows(out, h, w, pad_v, pad_l)


# ---------------------------------------------------------------------------
# Fused backward (the adjoint of one fused IAC iteration)
# ---------------------------------------------------------------------------
#
# Same design as ops/pallas_dcn.py's backward: all gradients reuse the
# forward's window (same DMA, same bases — recomputed from the same flow,
# so this is the exact adjoint of the fused forward, clamps included).
# Given gz (the POST-activation-adjoint cotangent, computed outside):
#
#   SAC2 (horizontal, replicate): dk2[tap] = gz * hpad_tap;
#     dv = k1*gz + shifted k0*gz / k2*gz with the border folds
#   SAC1 (vertical, replicate, m0-variant select like the forward):
#     dk1[tap] = dv * wpad_tap; dwarped via row pads + border folds
#   warp: P_ef = sum_c(dwarped * window_ef) shared by dfx/dfy (the flow
#     weights are spatial), derivative stencils zeroed where the forward
#     clamp was active; dsrc splatted into per-lane-shift VMEM buckets,
#     one roll per bucket, emitted as a per-tile window slab and
#     overlap-added outside at the same dynamic rows0 bases.
#
# The residual (dfin += gz) and activation mask are cheap elementwise XLA
# outside the kernel; the chain backward (iac_fused_vjp) re-runs the fused
# forward to rebuild the per-iteration activations (cheaper than one
# gather forward) and walks the iterations in reverse.


def _bwd_kernel(rows0_ref, bxs_ref, fxt_ref, fyt_ref, src_hbm, k_ref,
                gz_ref, dk_ref, dfx_ref, dfy_ref, dwin_ref, win2, sems, *,
                radius, th, h, w, c, pad_v, pad_l, wp, tiles, tiles_p):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = radius
    wh = th + 2
    wrows = wh + 2 * r + 1
    nx = 2 * r + 2
    pvt = pad_v // th

    bi = pl.program_id(0)
    tip = pl.program_id(1)
    ti = tip - pvt
    is_data = jnp.logical_and(ti >= 0, ti < tiles)
    t0 = jnp.clip(ti, 0, tiles - 1) * th
    fr0 = jnp.clip(t0 - 1, 0, h - wh)
    m0 = t0 - fr0

    step = bi * tiles_p + tip
    total = pl.num_programs(0) * tiles_p

    def win_dma(slot, s):
        return pltpu.make_async_copy(
            src_hbm.at[s // tiles_p, pl.ds(rows0_ref[s], wrows)],
            win2.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _warm():
        win_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _ahead():
        win_dma((step + 1) % 2, step + 1).start()

    def body():
        win_dma(step % 2, step).wait()

        @pl.when(jnp.logical_not(is_data))
        def _ring():
            # forward ring tiles write constants -> zero gradients
            dk_ref[0, 0] = jnp.zeros((th, 3 * c, w), dk_ref.dtype)
            dfx_ref[0, 0] = jnp.zeros((wh, w), dfx_ref.dtype)
            dfy_ref[0, 0] = jnp.zeros((wh, w), dfy_ref.dtype)
            dwin_ref[0, 0] = jnp.zeros((wrows, c, wp), dwin_ref.dtype)

        @pl.when(is_data)
        def _data():
            fx = fxt_ref[0, 0]
            fy = fyt_ref[0, 0]
            gz = gz_ref[0].astype(jnp.float32)          # (th, c, wp)
            g2 = gz[:, :, pad_l : pad_l + w]            # embed adjoint

            base_y = rows0_ref[step] - fr0 + r - pad_v
            base_x = bxs_ref[step]

            eps = 1e-4
            rawa = fy - base_y.astype(fy.dtype) + r
            rawb = fx - base_x.astype(fx.dtype) + r
            a = jnp.clip(rawa, 0.0, nx - 1 - eps)
            b = jnp.clip(rawb, 0.0, nx - 1 - eps)
            y0 = jnp.floor(a)
            x0 = jnp.floor(b)
            fyf = a - y0
            fxf = b - x0
            iay = ((rawa > 0.0) & (rawa < nx - 1 - eps)) \
                .astype(jnp.float32)
            ibx = ((rawb > 0.0) & (rawb < nx - 1 - eps)) \
                .astype(jnp.float32)

            col0 = base_x - r + pad_l
            full = win2[step % 2]
            if full.dtype != jnp.float32:
                full = full.astype(jnp.float32)
            rolled = pltpu.roll(full, wp - col0, axis=2)

            wy = []
            wx = []
            wyp = []
            wxp = []
            for e in range(nx):
                wy.append(jnp.where(y0 == e, 1.0 - fyf, 0.0)
                          + jnp.where(y0 == e - 1, fyf, 0.0))
                wx.append(jnp.where(x0 == e, 1.0 - fxf, 0.0)
                          + jnp.where(x0 == e - 1, fxf, 0.0))
                wyp.append(jnp.where(y0 == e - 1, 1.0, 0.0)
                           - jnp.where(y0 == e, 1.0, 0.0))
                wxp.append(jnp.where(x0 == e - 1, 1.0, 0.0)
                           - jnp.where(x0 == e, 1.0, 0.0))

            # ---- recompute the forward intermediates this tile needs ----
            warped = jnp.zeros((wh, c, w), jnp.float32)
            for e in range(nx):
                for f in range(nx):
                    wgt = wy[e] * wx[f]
                    warped = warped + wgt[:, None, :] * \
                        rolled[e : e + wh, :, f : f + w]
            wpad = jnp.concatenate(
                [warped[0:1], warped, warped[wh - 1 : wh]], 0)
            kts = [k_ref[0, :, tap * c : (tap + 1) * c, :]
                   .astype(jnp.float32) for tap in range(3)]

            def vpass(m):
                acc = jnp.zeros((th, c, w), jnp.float32)
                for tap in range(3):
                    acc = acc + kts[tap] * wpad[m + tap : m + tap + th]
                return acc

            v = jnp.where(m0 == 0, vpass(0),
                          jnp.where(m0 == 2, vpass(2), vpass(1)))
            hpad = jnp.concatenate(
                [v[:, :, 0:1], v, v[:, :, w - 1 : w]], 2)

            # ---- SAC2 adjoint (horizontal, replicate borders) ----
            q0 = kts[0] * g2
            q1 = kts[1] * g2
            q2 = kts[2] * g2
            dk2 = [g2 * hpad[:, :, tap : tap + w] for tap in range(3)]
            dv = q1 \
                + jnp.concatenate([q0[:, :, 1:], jnp.zeros_like(
                    q0[:, :, :1])], 2) \
                + jnp.concatenate([jnp.zeros_like(q2[:, :, :1]),
                                   q2[:, :, :-1]], 2) \
                + jnp.pad(q0[:, :, :1], ((0, 0), (0, 0), (0, w - 1))) \
                + jnp.pad(q2[:, :, w - 1 :], ((0, 0), (0, 0), (w - 1, 0)))

            # ---- SAC1 adjoint (vertical, m0-variant select) ----
            def vadj(m):
                dwpad = jnp.zeros((wh + 2, c, w), jnp.float32)
                dk1m = []
                for tap in range(3):
                    q = kts[tap] * dv
                    dwpad = dwpad + jnp.pad(
                        q, ((m + tap, wh + 2 - th - m - tap), (0, 0),
                            (0, 0)))
                    dk1m.append(dv * wpad[m + tap : m + tap + th])
                dw = dwpad[1 : wh + 1]
                dw = dw + jnp.pad(dwpad[0:1], ((0, wh - 1), (0, 0), (0, 0)))
                dw = dw + jnp.pad(dwpad[wh + 1 : wh + 2],
                                  ((wh - 1, 0), (0, 0), (0, 0)))
                return dw, dk1m

            dw0, dk10 = vadj(0)
            dw1, dk11 = vadj(1)
            dw2, dk12 = vadj(2)
            dwarped = jnp.where(m0 == 0, dw0,
                                jnp.where(m0 == 2, dw2, dw1))
            dk1 = [jnp.where(m0 == 0, dk10[t],
                             jnp.where(m0 == 2, dk12[t], dk11[t]))
                   for t in range(3)]

            dk_ref[0, 0] = jnp.concatenate(
                [dk1[t] + dk2[t] for t in range(3)], axis=1) \
                .astype(dk_ref.dtype)

            # ---- warp adjoint ----
            dfy_acc = jnp.zeros((wh, w), jnp.float32)
            dfx_acc = jnp.zeros((wh, w), jnp.float32)
            wacc = [jnp.zeros((wrows, c, w), jnp.float32)
                    for _ in range(nx)]
            for e in range(nx):
                ge = wy[e]
                gep = wyp[e]
                for f in range(nx):
                    sl = rolled[e : e + wh, :, f : f + w]
                    pef = jnp.sum(dwarped * sl, axis=1)  # (wh, w)
                    dfy_acc = dfy_acc + (gep * wx[f]) * pef
                    dfx_acc = dfx_acc + (ge * wxp[f]) * pef
                    # pad+add, not .at[].add: jnp's indexed add always
                    # lowers to scatter-add, which Mosaic TPU lacks
                    wacc[f] = wacc[f] + jnp.pad(
                        (ge * wx[f])[:, None, :] * dwarped,
                        ((e, wrows - wh - e), (0, 0), (0, 0)))
            dfy_ref[0, 0] = (dfy_acc * iay).astype(dfy_ref.dtype)
            dfx_ref[0, 0] = (dfx_acc * ibx).astype(dfx_ref.dtype)

            dwin = jnp.zeros((wrows, c, wp), jnp.float32)
            for f in range(nx):
                qp = jnp.pad(wacc[f], ((0, 0), (0, 0), (0, wp - w)))
                dwin = dwin + (qp if f == 0
                               else pltpu.roll(qp, f, axis=2))
            dwin_ref[0, 0] = pltpu.roll(dwin, col0, axis=2) \
                .astype(dwin_ref.dtype)

    body()


@functools.partial(
    jax.jit, static_argnames=("chunk", "h", "w", "radius", "tile_rows",
                              "interpret"))
def _rows_bwd_call(src, flow, ktr, gz, chunk, h, w, radius, tile_rows,
                   interpret):
    """Adjoint of one fused iteration.  src: the iteration's warp source
    (rows layout); gz: the post-activation-adjoint cotangent (rows).
    Returns (dsrc_rows, dflow, dk_chunk_rows) — the residual/activation
    adjoints are the caller's (cheap elementwise XLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = src.shape
    pad_v, pad_l, pad_r, wp2, bmax_x = _geometry(h, w, radius)
    assert wp2 == wp and hp == h + 2 * pad_v
    th = tile_rows
    tiles = h // th
    tiles_p = hp // th
    pvt = pad_v // th
    wh = th + 2

    fr0 = jnp.clip(jnp.arange(tiles) * tile_rows - 1, 0, h - wh)
    rows = fr0[:, None] + jnp.arange(wh)[None, :]
    flow_t = flow[:, rows]
    fxt, fyt = flow_t[..., 0], flow_t[..., 1]

    def data_tile(tip):
        return jnp.clip(tip - pvt, 0, tiles - 1)

    bmax_y = pad_v - radius - 1
    by = jnp.clip(jnp.round(jnp.mean(fyt, axis=(2, 3))), -bmax_y,
                  bmax_y).astype(jnp.int32)
    bx = jnp.clip(jnp.round(jnp.mean(fxt, axis=(2, 3))), -bmax_x,
                  bmax_x).astype(jnp.int32)
    row0 = fr0[None] + by - radius + pad_v
    rows0 = jnp.zeros((b, tiles_p), jnp.int32) \
        .at[:, pvt : pvt + tiles].set(row0).reshape(-1)
    bxs = jnp.zeros((b, tiles_p), jnp.int32) \
        .at[:, pvt : pvt + tiles].set(bx).reshape(-1)

    wrows = wh + 2 * radius + 1
    kern = functools.partial(_bwd_kernel, radius=radius, th=th, h=h, w=w,
                             c=c, pad_v=pad_v, pad_l=pad_l, wp=wp,
                             tiles=tiles, tiles_p=tiles_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, tiles_p),
        in_specs=[
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, tip, *_: (bi, data_tile(tip), 0, 0)),
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, tip, *_: (bi, data_tile(tip), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, th, 3 * c, w),
                         lambda bi, tip, *_: (bi, data_tile(tip), chunk, 0)),
            pl.BlockSpec((1, th, c, wp), lambda bi, tip, *_: (bi, tip, 0, 0)),
        ],
        out_specs=[
            # ring tiles write zeros to their OWN padded slots (a clipped
            # data_tile index map would let trailing ring tiles clobber
            # the last data tile's gradient)
            pl.BlockSpec((1, 1, th, 3 * c, w),
                         lambda bi, tip, *_: (bi, tip, 0, 0, 0)),
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, tip, *_: (bi, tip, 0, 0)),
            pl.BlockSpec((1, 1, wh, w),
                         lambda bi, tip, *_: (bi, tip, 0, 0)),
            pl.BlockSpec((1, 1, wrows, c, wp),
                         lambda bi, tip, *_: (bi, tip, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wrows, c, wp), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dk_t, dfx_t, dfy_t, dwin = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, tiles_p, th, 3 * c, w), jnp.float32),
            jax.ShapeDtypeStruct((b, tiles_p, wh, w), jnp.float32),
            jax.ShapeDtypeStruct((b, tiles_p, wh, w), jnp.float32),
            jax.ShapeDtypeStruct((b, tiles_p, wrows, c, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows0, bxs, fxt, fyt, src, ktr, gz)

    # dsrc: overlap-add the per-tile window slabs at the dynamic bases
    ridx = (rows0.reshape(b, tiles_p)[:, :, None]
            + jnp.arange(wrows)[None, None, :])
    bidx = jnp.arange(b)[:, None, None]
    dsrc = jnp.zeros((b, hp, c, wp), jnp.float32)
    dsrc = dsrc.at[bidx, ridx].add(dwin)

    # dflow: un-tile the overlapping halo blocks (adjoint of flow[:, rows])
    dfx = jnp.zeros((b, h, w), jnp.float32) \
        .at[:, rows].add(dfx_t[:, pvt : pvt + tiles])
    dfy = jnp.zeros((b, h, w), jnp.float32) \
        .at[:, rows].add(dfy_t[:, pvt : pvt + tiles])
    dflow = jnp.stack([dfx, dfy], axis=-1)

    dk = dk_t[:, pvt : pvt + tiles].reshape(b, h, 3 * c, w)
    return dsrc.astype(src.dtype), dflow, dk


@functools.lru_cache(maxsize=None)
def _rows_bwd_vmappable(chunk, h, w, radius, tile_rows, interpret):
    """custom_vmap: fold a mapped axis into the kernel batch grid (same
    pattern as the forward; every output is per-example)."""

    def base(src, flow, ktr, gz):
        return _rows_bwd_call(src, flow, ktr, gz, chunk, h, w, radius,
                              tile_rows, interpret)

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, src, flow, ktr, gz):  # noqa: ANN001
        def bat(a, is_b):
            if is_b:
                return a.reshape((-1,) + a.shape[2:])
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape) \
                .reshape((-1,) + a.shape[1:])

        outs = base(*(bat(a, ib)
                      for a, ib in zip((src, flow, ktr, gz), in_batched)))
        return tuple(o.reshape((axis_size, -1) + o.shape[1:])
                     for o in outs), (True, True, True)

    return wrapped


def iac_fused_vjp(feat_in, pred_k_tap_major, offsets, g, ac_num: int,
                  channels: int, act_last: bool = True, radius: int = 2,
                  tile_rows: int = 0, k_rows: bool = False,
                  interpret: bool = False):
    """Gradients of :func:`iac_fused` — the exact adjoint of the fused
    chain (same windows/bases/clamps).  Re-runs the fused forward to
    rebuild the per-iteration activations (cheaper than one gather
    forward), then walks the iterations in reverse.

    Returns ``(dfeat_in, dpred_k, doffsets)`` (matching iac_fused's
    differentiable inputs).  f32 only — the bf16 chain is a deployment
    path; callers fall back to the gather VJP for bf16 training.
    """
    b, h, w, c = feat_in.shape
    assert feat_in.dtype == jnp.float32, "fused IAC backward is f32-only"
    pad_v, pad_l, pad_r, wp, _ = _geometry(h, w, radius)
    if not tile_rows:
        tile_rows = _auto_tile_rows(h, pad_v)
    fin = _to_rows(feat_in, pad_v, pad_l, pad_r)
    ktr = (pred_k_tap_major if k_rows
           else jnp.transpose(pred_k_tap_major, (0, 1, 3, 2)))

    # forward re-run, keeping every iteration's input
    fxt_all, fyt_all = _tile_flow(offsets, h, tile_rows)
    cur = [fin]
    for i in range(ac_num):
        cur.append(_rows_vmappable(i, h, w, radius, tile_rows,
                                   i < ac_num - 1 or act_last,
                                   interpret)(cur[i], fxt_all[i],
                                              fyt_all[i], ktr, fin))

    g_cur = _to_rows(g.astype(jnp.float32), pad_v, pad_l, pad_r)
    dfin = jnp.zeros_like(g_cur)
    dks = [None] * ac_num
    dffs = [None] * ac_num
    for i in reversed(range(ac_num)):
        if i < ac_num - 1 or act_last:
            gz = g_cur * jnp.where(cur[i + 1] >= 0, 1.0, 0.1)
        else:
            gz = g_cur
        dfin = dfin + gz
        g_cur, dffs[i], dks[i] = _rows_bwd_vmappable(
            i, h, w, radius, tile_rows, interpret)(
                cur[i], offsets[i], ktr, gz)
    dfin = dfin + g_cur  # iteration 0 warps feat_in itself

    dfeat_in = _from_rows(dfin, h, w, pad_v, pad_l).astype(feat_in.dtype)
    dktr = jnp.concatenate(dks, axis=2)              # (B, H, AC*3C, W)
    dpred = (dktr if k_rows
             else jnp.transpose(dktr, (0, 1, 3, 2))) \
        .astype(pred_k_tap_major.dtype)
    doff = jnp.stack(dffs).astype(offsets.dtype)     # (AC, B, H, W, 2)
    return dfeat_in, dpred, doff
