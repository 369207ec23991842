"""MEASURED CLOSURE — VMEM-resident BlockRCB megakernel: LOSES, not wired.

Hypothesis (round 3): the SCNet rows chain was DMA-serialization-bound,
so fusing one whole per-level BlockRCB body (4 convs + ContextBlock +
residual, reference CVSR_freq.py:729-777) into a single pallas_call with
the full ~20 MB bf16 activation resident in VMEM should approach pure
matmul time.

Measured @272x480x64 bf16 (TPU v5e, loop-on-device, min-of-3):
  fused megakernel              0.579 ms
  unfused (2 pair kernels +
    XLA ContextBlock + add)     0.419 ms      <- the shipped path wins

Why it loses: the pair kernels' double-buffered window DMA already hides
the HBM traffic (the DMA-bound model was wrong at this size — decomposing
the real chain showed the 40.7 ms was ~15 ms cross-level XLA glue at
HIGHEST precision, fixed separately in models/scnet_rows.py), so the
megakernel's only structural change that matters is swapping the
statically-unrolled tiled grid for an in-kernel fori_loop with dynamic
slices — which Mosaic pipelines worse.  The conv bodies were ALREADY at
the isolated-conv rate (~0.1 ms/conv); there was nothing left to win.

Kept here as a self-contained benchmark (kernel + A/B harness) so the
closure is reproducible; interpret-mode golden vs the unfused path was
green before the kernel was unwired (max dev 2% of scale, bit-identical
batch loop).  Run: python benchmarks/microbench_blockrcb_kernel.py

---- original design notes ----

models/scnet_rows.py already runs every SCNet 3x3 conv through the rows
kernels of ops/pallas_conv.py, but the chain remains DMA-serialization
bound: each pair kernel's window DMA waits on the previous kernel's
freshly-written HBM output, and the ContextBlock + residual adds between
them are further full-tensor XLA passes.  At 272x480x64 bf16 one level's
activation is ~20 MB — the *entire* per-level BlockRCB body (reference
CVSR_freq.py:729-777: body0->body1 pair, RCB pair, ContextBlock softmax
pooling + channel MLP, leaky-relu, residual) fits in VMEM at once.

This kernel runs that whole body as one ``pallas_call``: x is read from
HBM once, four chained convs ping-pong between resident VMEM scratch
buffers (no halos — neighbours are always resident), the ContextBlock's
spatial-softmax logits are accumulated into a small f32 scratch *during*
the last conv pass, and the pooled-context MLP + final combine write the
result back in a single output pass.  Per block-level this removes two
kernel round-trips plus two full-tensor XLA passes — the only HBM traffic
left is one read of x and one write of the result.

Activations are bf16 (an f32-resident chain would need 4x40 MB and blow
VMEM); matmuls are single-pass bf16 with f32 accumulation — identical
serving precision to the pair-kernel path, and the ContextBlock reads the
bf16-*stored* conv output exactly like the unfused chain does.

Layout/semantics contract is ops/pallas_conv.py's rows geometry: data
rows at [ROW_OFF, ROW_OFF+h), data cols at [COL_OFF, COL_OFF+w), zero
ring re-established on output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcvsr_tpu.ops.pallas_conv import (COL_OFF, ROW_OFF, _rolled3,
                                       rows_geometry)

__all__ = ["block_rcb_rows"]


def _block_kernel(x_ref, wb0_ref, bb0_ref, wb1_ref, bb1_ref, wr0_ref,
                  wr1_ref, wm_ref, a0_ref, a1_ref, out_ref, buf_a, buf_y,
                  logit_ref, *, th, c, wp, h, w, ns_body, tiles):
    from jax.experimental import pallas as pl

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    colmask = ((lane >= COL_OFF) &
               (lane < COL_OFF + w)).astype(jnp.float32)
    hp = tiles * th
    neg = jnp.float32(-1e30)

    def conv_pass(read, write, w3, bias, ns, logits):
        """One resident 3x3 conv sweep: write[t] = mask(act(conv(read)))
        tile by tile.  ``read``/``write`` index VMEM refs; ``logits``
        additionally accumulates the ContextBlock mask logits (valid
        positions only, -1e30 elsewhere) into ``logit_ref``."""
        wmat = w3[...].astype(jnp.bfloat16)
        bvec = None if bias is None else bias[...]
        mw = wm_ref[...] if logits else None    # (c, 1) f32

        def body(ti, carry):
            t0 = ti * th
            base = jnp.clip(t0 - 1, 0, hp - (th + 2))
            win = read(base, th + 2)            # (th+2, c, wp) bf16
            cat = jnp.concatenate(_rolled3(win), axis=1)
            rows = []
            lrows = []
            for r in range(th):
                o = None
                for dy in range(3):
                    d = jax.lax.dot_general(
                        wmat[dy], cat[r + dy],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o = d if o is None else o + d
                if bvec is not None:
                    o = o + bvec
                if ns is not None:
                    o = jnp.where(o >= 0, o, ns * o)
                gr = t0 + r
                rowvalid = jnp.logical_and(gr >= ROW_OFF, gr < ROW_OFF + h)
                o = jnp.where(rowvalid, o * colmask, 0.0)
                ob = o.astype(jnp.bfloat16)
                rows.append(ob)
                if logits:
                    # ContextBlock conv_mask logits from the bf16-STORED
                    # value (matches the unfused chain, which reads the
                    # written tensor back); invalid positions get -1e30 so
                    # exp() underflows to exactly 0 after the max shift
                    lg = jnp.sum(ob.astype(jnp.float32) * mw, axis=0,
                                 keepdims=True)          # (1, wp)
                    valid = jnp.logical_and(rowvalid, colmask > 0)
                    lrows.append(jnp.where(valid, lg, neg))
            write(t0, jnp.stack(rows))
            if logits:
                logit_ref[pl.ds(t0, th)] = jnp.concatenate(lrows, axis=0)
            return carry

        jax.lax.fori_loop(0, tiles, body, jnp.int32(0))

    def rd(ref):
        return lambda base, n: ref[pl.ds(base, n)]

    def wr(ref):
        def _w(t0, val):
            ref[pl.ds(t0, th)] = val
        return _w

    # body0 -> lrelu(ns_body) -> body1 (the BlockRCB entry pair)
    conv_pass(lambda base, n: x_ref[0, pl.ds(base, n)], wr(buf_a),
              wb0_ref, bb0_ref, ns_body, False)
    conv_pass(rd(buf_a), wr(buf_y), wb1_ref, bb1_ref, None, False)
    # RCB pair: body0 -> lrelu(0.2) -> body1; last pass also banks the
    # ContextBlock logits
    conv_pass(rd(buf_y), wr(buf_a), wr0_ref, None, 0.2, False)
    conv_pass(rd(buf_a), lambda t0, v: out_ref.__setitem__(
        (0, pl.ds(t0, th)), v), wr1_ref, None, None, True)

    # ---- ContextBlock softmax pooling (reference CVSR_freq.py:657-701):
    # spatial softmax over the valid region, pooled context vector ----
    logits = logit_ref[...]                      # (hp, wp) f32
    m = jnp.max(logits)
    inv_s = 1.0 / jnp.sum(jnp.exp(logits - m))

    def pool_body(ti, acc):
        t0 = ti * th
        p = jnp.exp(logit_ref[pl.ds(t0, th)] - m) * inv_s   # (th, wp)
        r = out_ref[0, pl.ds(t0, th)].astype(jnp.float32)   # (th, c, wp)
        return acc + jnp.sum(r * p[:, None, :], axis=(0, 2))[None, :]

    ctx = jax.lax.fori_loop(0, tiles, pool_body,
                            jnp.zeros((1, c), jnp.float32))  # (1, c)

    # channel MLP: add0 -> lrelu(0.2) -> add1 (f32 — tiny)
    t = jax.lax.dot_general(ctx, a0_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = jnp.where(t >= 0, t, 0.2 * t)
    t = jax.lax.dot_general(t, a1_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    tcol = t.reshape(c, 1)

    # ---- final combine: out = y + lrelu_0.2((r + t) * valid_mask) ----
    def fin_body(ti, carry):
        t0 = ti * th
        r = out_ref[0, pl.ds(t0, th)].astype(jnp.float32)
        rv = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) + t0
        rowvalid = jnp.logical_and(rv >= ROW_OFF, rv < ROW_OFF + h)
        o = (r + tcol) * jnp.where(rowvalid, colmask, 0.0)
        o = jnp.where(o >= 0, o, 0.2 * o)
        y = buf_y[pl.ds(t0, th)].astype(jnp.float32)
        out_ref[0, pl.ds(t0, th)] = (y + o).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, tiles, fin_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("h", "w", "ns_body",
                                             "tile_rows", "interpret"))
def block_rcb_rows(x_rows, wb0, bb0, wb1, bb1, wr0, wr1, w_mask, w_add0,
                   w_add1, *, h: int, w: int, ns_body: float = 0.1,
                   tile_rows: int = 16, interpret: bool = False):
    """One BlockRCB level body as a single VMEM-resident kernel.

    Computes (models/scnet_rows.py::_block_rcb.body):

        y   = conv_b1(lrelu_{ns_body}(conv_b0(x) + bb0) ) + bb1
        r   = conv_r1(lrelu_{0.2}(conv_r0(y)))
        out = y + lrelu_{0.2}(ContextBlock(r))

    x_rows: (B, Hp, C, Wp) bf16 rows layout; wb0/wb1/wr0/wr1: cat3
    ``prep_weight`` layout (3, C, 3C); bb0/bb1: (C,) or None; w_mask:
    (C,) conv_mask 1x1 weights; w_add0/w_add1: (C, C) MLP matrices.
    Returns (B, Hp, C, Wp) in the same layout, zero ring re-established.

    bf16-only: an f32-resident chain would need 4x the VMEM.  Batches run
    as sequential single-image calls (resident buffers leave no VMEM for
    grid double-buffering).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, c, wp = x_rows.shape
    assert x_rows.dtype == jnp.bfloat16, "resident chain is bf16-only"
    assert (hp, wp) == rows_geometry(h, w, tile_rows), \
        (hp, wp, rows_geometry(h, w, tile_rows))
    for wmat in (wb0, wb1, wr0, wr1):
        assert wmat.shape == (3, c, 3 * c), wmat.shape
    assert wp % 128 == 0 and c % 16 == 0
    tiles = hp // tile_rows

    bb0v = jnp.zeros((c, 1), jnp.float32) if bb0 is None \
        else bb0.reshape(c, 1).astype(jnp.float32)
    bb1v = jnp.zeros((c, 1), jnp.float32) if bb1 is None \
        else bb1.reshape(c, 1).astype(jnp.float32)
    wmv = w_mask.reshape(c, 1).astype(jnp.float32)

    kern = functools.partial(_block_kernel, th=tile_rows, c=c, wp=wp,
                             h=h, w=w, ns_body=ns_body, tiles=tiles)
    call = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, hp, c, wp), lambda bi: (0, 0, 0, 0)),
            pl.BlockSpec((3, c, 3 * c), lambda bi: (0, 0, 0)),
            pl.BlockSpec((c, 1), lambda bi: (0, 0)),
            pl.BlockSpec((3, c, 3 * c), lambda bi: (0, 0, 0)),
            pl.BlockSpec((c, 1), lambda bi: (0, 0)),
            pl.BlockSpec((3, c, 3 * c), lambda bi: (0, 0, 0)),
            pl.BlockSpec((3, c, 3 * c), lambda bi: (0, 0, 0)),
            pl.BlockSpec((c, 1), lambda bi: (0, 0)),
            pl.BlockSpec((c, c), lambda bi: (0, 0)),
            pl.BlockSpec((c, c), lambda bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, c, wp), lambda bi: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, hp, c, wp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((hp, c, wp), jnp.bfloat16),
            pltpu.VMEM((hp, c, wp), jnp.bfloat16),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )
    outs = [call(x_rows[i : i + 1], wb0, bb0v, wb1, bb1v, wr0, wr1, wmv,
                 w_add0, w_add1) for i in range(b)]
    return outs[0] if b == 1 else jnp.concatenate(outs, axis=0)


def _ab_main():
    import time

    import numpy as np

    from fcvsr_tpu.models.scnet_rows import _context_block
    from fcvsr_tpu.ops.pallas_conv import (conv3x3_pair_rows, pad_to_rows,
                                           prep_weight)

    h, w, c = 272, 480, 64
    rng = np.random.default_rng(0)
    arr = lambda *s: jnp.asarray(rng.normal(0, 0.2, s), jnp.float32)
    x = pad_to_rows(jnp.asarray(rng.uniform(-1, 1, (1, h, w, c)),
                                jnp.bfloat16))
    P = dict(wb0=prep_weight(arr(3, 3, c, c)), bb0=arr(c),
             wb1=prep_weight(arr(3, 3, c, c)), bb1=arr(c),
             wr0=prep_weight(arr(3, 3, c, c)),
             wr1=prep_weight(arr(3, 3, c, c)),
             wm=arr(c), a0=arr(c, c), a1=arr(c, c))

    def fused(v, p):
        return block_rcb_rows(v, p["wb0"], p["bb0"], p["wb1"], p["bb1"],
                              p["wr0"], p["wr1"], p["wm"], p["a0"],
                              p["a1"], h=h, w=w)

    def unfused(v, p):
        y = conv3x3_pair_rows(v, p["wb0"], p["bb0"], p["wb1"], p["bb1"],
                              h=h, w=w, ns1=0.1)
        r = conv3x3_pair_rows(y, p["wr0"], None, p["wr1"], None,
                              h=h, w=w, ns1=0.2)
        gc = {"conv_mask": {"Conv_0": {"kernel":
                                       p["wm"].reshape(1, 1, -1, 1)}},
              "add0": {"Conv_0": {"kernel": p["a0"][None, None]}},
              "add1": {"Conv_0": {"kernel": p["a1"][None, None]}}}
        r = _context_block(gc, r, h, w, 16)
        r = jnp.where(r >= 0, r, 0.2 * r)
        return y + r

    for name, fn in [("fused", fused), ("unfused", unfused)]:
        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(v, p, k, fn=fn):
            def body(i, a):
                # decay+offset keeps 100 self-feeding iterations finite
                return (fn(a, p) * 0.001 + 0.01).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, k, body, v)

        np.asarray(run_n(x, P, 1)[0, 20, 0, :4].astype(jnp.float32))

        def timed(k):
            t0 = time.perf_counter()
            v = np.asarray(run_n(x, P, k)[0, 20, 0, :4]
                           .astype(jnp.float32))
            assert np.isfinite(v).all()
            return time.perf_counter() - t0

        base = min(timed(1) for _ in range(3))
        tot = min(timed(101) for _ in range(3))
        print(name, "%.3f ms" % ((tot - base) / 100 * 1e3), flush=True)


if __name__ == "__main__":
    _ab_main()
