"""Channels-as-M 3x3 conv kernel (Pallas) for the SCNet conv wall.

XLA's NHWC conv at C_out=64 runs ~29 TFLOP/s on this chip while the same
conv at C_out=128 runs ~72 (benchmarks/microbench_sol.py): with channels in
the lane dimension a 64-channel output half-fills the 128-wide MXU and
every post-op runs at 50% lane occupancy.  SCNet — the largest block of
FCVSR frame time (117 ms of 256 at 480x272, docs/PERFORMANCE.md) — is
almost entirely such convs (reference CVSR_freq.py:705-822).

This kernel transposes the problem instead of the data path: activations
are carried as ``(H, C, W)`` (rows outermost, C in sublanes, W in lanes)
and each output row is one MXU matmul

    out_r (C_out, Wp) = W (C_out, 9*C_in) @ im2col_r (9*C_in, Wp)

so the lane dimension carries *spatial width* (Wp = 128-multiple, fully
occupied) and C_out only sets the cheap M dimension.  The im2col block is
built entirely in VMEM from three lane-rotated copies of the row window
(the same ``pltpu.roll`` trick as ops/pallas_iac.py); nothing but the
activations moves through HBM.  Matmuls run as single-pass bf16 with f32
accumulation — the same precision XLA's default conv uses on this chip
(CLAUDE.md round-2 notes).

Layout contract: callers keep activations in CHW-row layout across a chain
of calls (one transpose in, one out per SCNet, amortized over ~80 convs);
`conv3x3_chw` also exposes NHWC round-trip helpers for standalone use and
goldens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_chw", "nhwc_to_rows", "rows_to_nhwc", "prep_weight"]


def _kernel(src_hbm, w_ref, b_ref, out_ref, win, sems, *, th, c, cout, wp,
            act, neg_slope, mode, tiles, nb):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ti = pl.program_id(1)
    bi = pl.program_id(0)
    g = bi * tiles + ti                 # global sequential step

    def dma(step, slot):
        # rows [ti*th, ti*th + th + 2) of the zero-padded (Hp, C, Wp)
        # source for that step
        sb = step // tiles
        st = step - sb * tiles
        return pltpu.make_async_copy(
            src_hbm.at[sb, pl.ds(st * th, th + 2)], win.at[slot],
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
    dma(g, g % 2).wait()

    # roll in f32 and cast after: pltpu.roll on bf16 (16-sublane tiling)
    # crashes the Mosaic compile helper on this toolchain
    full = win[g % 2]
    rolled = [full.astype(jnp.bfloat16)]            # dx = 0
    for dx in (1, 2):
        rolled.append(
            pltpu.roll(full, wp - dx, axis=2).astype(jnp.bfloat16))

    if mode == "cat9":
        # one big sublane-concat: rhs (th, 9c, wp); k = (dy*3+dx)*c+ci.
        # Simple but VPU-copy-bound (benchmarks/microbench_conv2.py:
        # the assembly costs ~4x the matmul stream).
        slabs = [rolled[dx][dy : dy + th] for dy in range(3)
                 for dx in range(3)]
        rhs = jnp.concatenate(slabs, axis=1)
        for r in range(th):
            o = jax.lax.dot_general(
                wmat, rhs[r],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (cout, wp)
            o = o + b_ref[...]
            if act:
                o = jnp.where(o >= 0, o, neg_slope * o)
            out_ref[0, r] = o
    else:
        # 'cat3': one small sublane-concat of the three dx-rolls
        # (th+2, 3c, wp), then per output row three accumulating K=3c
        # matmuls indexed by dy through the outer row dim — no per-row
        # copies.  (A zero-copy 'direct' variant contracting
        # rolled[dx][r:r+3] as merged (3, c) sublanes crashes the Mosaic
        # compile helper — the merged outer+sublane reshape is not
        # lowerable; the cat3 concat is 5x less copy traffic than cat9.)
        cat = jnp.concatenate(rolled, axis=1)        # (th+2, 3c, wp)
        for r in range(th):
            o = None
            for dy in range(3):
                d = jax.lax.dot_general(
                    wmat[dy], cat[r + dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = d if o is None else o + d
            o = o + b_ref[...]
            if act:
                o = jnp.where(o >= 0, o, neg_slope * o)
            out_ref[0, r] = o


def prep_weight(weight: jnp.ndarray, mode: str = "cat3") -> jnp.ndarray:
    """HWIO (3, 3, Cin, Cout) -> the kernel's weight layout.

    'cat9': (Cout, 9*Cin) with k = (dy*3+dx)*Cin+cin.
    'cat3': (3, Cout, 3*Cin) — split by dy, k = dx*Cin+cin per slab
    (matching the in-kernel dx-roll concat order).
    """
    kh, kw, cin, cout = weight.shape
    assert kh == 3 and kw == 3
    if mode == "cat9":
        return jnp.transpose(weight, (3, 0, 1, 2)).reshape(cout, 9 * cin)
    return jnp.transpose(weight, (0, 3, 1, 2)).reshape(3, cout, 3 * cin)


def nhwc_to_rows(x: jnp.ndarray, wp: int) -> jnp.ndarray:
    """(B, H, W, C) -> zero-padded (B, H+2, C, Wp) rows layout.

    Data columns live at [1, W+1); column 0 and W+1 are the zero ring; the
    remaining lanes up to Wp are slack (their outputs are sliced away).
    """
    b, h, w, c = x.shape
    xt = jnp.transpose(x, (0, 1, 3, 2))            # (B, H, C, W)
    return jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (1, wp - w - 1)))


def rows_to_nhwc(y: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, Cout, Wp) kernel output -> (B, H, W, Cout)."""
    return jnp.transpose(y[..., :w], (0, 1, 3, 2))


@functools.partial(jax.jit, static_argnames=("act", "neg_slope", "tile_rows",
                                             "mode", "interpret"))
def conv3x3_chw(x_rows, wmat, bias=None, act: bool = False,
                neg_slope: float = 0.2, tile_rows: int = 0,
                mode: str = "cat3", interpret: bool = False):
    """3x3 SAME conv on rows-layout activations.

    x_rows: (B, H+2, C, Wp) from :func:`nhwc_to_rows` (or a previous call's
    output re-padded); wmat: from :func:`prep_weight` with the same
    ``mode``; returns (B, H, Cout, Wp) with valid columns [1, W+1) matching
    the input's data columns.  ``act`` fuses leaky_relu(neg_slope).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = x_rows.shape
    h = hp - 2
    if mode == "cat9":
        cout = wmat.shape[0]
        assert wmat.shape[1] == 9 * c
        wspec = pl.BlockSpec((cout, 9 * c), lambda bi, ti: (0, 0))
    else:
        cout = wmat.shape[1]
        assert wmat.shape == (3, cout, 3 * c)
        wspec = pl.BlockSpec((3, cout, 3 * c), lambda bi, ti: (0, 0, 0))
    assert wp % 128 == 0, wp
    assert c % 16 == 0, c       # bf16 sublane tile
    if not tile_rows:
        tile_rows = 16 if h % 16 == 0 else 8
    if h % tile_rows:
        raise ValueError(f"H={h} not divisible by tile_rows={tile_rows}")
    tiles = h // tile_rows
    bvec = jnp.zeros((cout, 1), jnp.float32) if bias is None \
        else bias.reshape(cout, 1).astype(jnp.float32)

    kern = functools.partial(_kernel, th=tile_rows, c=c, cout=cout, wp=wp,
                             act=act, neg_slope=neg_slope, mode=mode,
                             tiles=tiles, nb=b)
    return pl.pallas_call(
        kern,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            wspec,
            pl.BlockSpec((cout, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, cout, wp),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, cout, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 2, c, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_rows, wmat, bvec)
