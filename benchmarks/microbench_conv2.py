"""Decompose the CHW conv kernel's time: matmul stream vs im2col assembly.

pal_64_64 ties XLA (0.347 vs 0.359 ms) at 272x480x64 even though the
matmul FLOPs alone should take ~25us at any reasonable MXU rate.  These
diagnostics isolate the two candidate sinks (each kernel does the same
grid traversal as the real one):

  mm_stream   — 16 dot_generals (64,576)x(576,512) per tile on a fixed
                pre-built bf16 RHS; no rolls, no concat, no DMA.
  mm_stream3  — 3 x K=192 accumulating dot_generals per row (the cat3
                variant's matmul shape).
  im2col_only — window DMA + rolls + concat building the (th,576,512)
                RHS, then a single cheap reduce to defeat DCE.
  dma_only    — just the window DMA + a reduce.

Usage: python benchmarks/microbench_conv2.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TH = 16
C = 64
WP = 512
TILES = 17


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interp = args.cpu

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    rhs_fix = jnp.asarray(
        rng.uniform(-1, 1, (TH, 9 * C, WP)), jnp.bfloat16)
    wmat = jnp.asarray(rng.uniform(-1, 1, (C, 9 * C)), jnp.float32)
    src = jnp.asarray(
        rng.uniform(-1, 1, (1, TH * TILES + 2, C, WP)), jnp.float32)

    def mm_stream_kernel(rhs_ref, w_ref, out_ref):
        wm = w_ref[...].astype(jnp.bfloat16)
        for r in range(TH):
            out_ref[r] = jax.lax.dot_general(
                wm, rhs_ref[r], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    def mm_stream(rhs):
        return pl.pallas_call(
            mm_stream_kernel,
            grid=(TILES,),
            in_specs=[pl.BlockSpec((TH, 9 * C, WP), lambda t: (0, 0, 0)),
                      pl.BlockSpec((C, 9 * C), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((TH, C, WP), lambda t: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((TH, C, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(rhs, wmat)

    def mm_stream3_kernel(rhs_ref, w_ref, out_ref):
        wm = w_ref[...].astype(jnp.bfloat16)
        for r in range(TH):
            acc = jnp.zeros((C, WP), jnp.float32)
            for dy in range(3):
                acc = acc + jax.lax.dot_general(
                    wm[:, dy * 3 * C : (dy + 1) * 3 * C],
                    rhs_ref[r, dy * 3 * C : (dy + 1) * 3 * C],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[r] = acc

    def mm_stream3(rhs):
        return pl.pallas_call(
            mm_stream3_kernel,
            grid=(TILES,),
            in_specs=[pl.BlockSpec((TH, 9 * C, WP), lambda t: (0, 0, 0)),
                      pl.BlockSpec((C, 9 * C), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((TH, C, WP), lambda t: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((TH, C, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(rhs, wmat)

    def im2col_kernel(src_hbm, out_ref):
        ti = pl.program_id(0)

        def body(win, sem):
            cp = pltpu.make_async_copy(
                src_hbm.at[0, pl.ds(ti * TH, TH + 2)], win, sem)
            cp.start()
            cp.wait()
            full = win[...]
            rolled = [full.astype(jnp.bfloat16)]
            for dx in (1, 2):
                rolled.append(
                    pltpu.roll(full, WP - dx, axis=2).astype(jnp.bfloat16))
            slabs = [rolled[dx][dy : dy + TH] for dy in range(3)
                     for dx in range(3)]
            rhs = jnp.concatenate(slabs, axis=1)
            out_ref[...] = jnp.sum(rhs.astype(jnp.float32), axis=1)

        pl.run_scoped(body, pltpu.VMEM((TH + 2, C, WP), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    def im2col_only(s):
        return pl.pallas_call(
            im2col_kernel,
            grid=(TILES,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((TH, WP), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TH, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(s)

    def dma_kernel(src_hbm, out_ref):
        ti = pl.program_id(0)

        def body(win, sem):
            cp = pltpu.make_async_copy(
                src_hbm.at[0, pl.ds(ti * TH, TH + 2)], win, sem)
            cp.start()
            cp.wait()
            out_ref[...] = jnp.sum(win[...], axis=1)

        pl.run_scoped(body, pltpu.VMEM((TH + 2, C, WP), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    def dma_only(s):
        return pl.pallas_call(
            dma_kernel,
            grid=(TILES,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((TH + 2, WP), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TH + 2, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(s)

    bench = {
        "mm_stream": (mm_stream, rhs_fix,
                      2 * TILES * TH * 9 * C * C * WP),
        "mm_stream3": (mm_stream3, rhs_fix,
                       2 * TILES * TH * 9 * C * C * WP),
        "im2col_only": (im2col_only, src, 0),
        "dma_only": (dma_only, src, 0),
    }

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    for name, (fn, inp, flops) in bench.items():
        if only and name not in only:
            continue

        @functools.partial(jax.jit, static_argnums=(1,))
        def run_n(v, kk, fn=fn):
            def body(i, acc):
                return acc + jnp.mean(jnp.abs(fn(v * (1.0 + 1e-6 * i))))
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        try:
            t0 = time.perf_counter()
            np.asarray(run_n(inp, 1))
            compile_s = time.perf_counter() - t0
            np.asarray(run_n(inp, n))

            def timed(kk):
                t0 = time.perf_counter()
                val = np.asarray(run_n(inp, kk))
                assert np.isfinite(val)
                return time.perf_counter() - t0

            base = min(timed(1) for _ in range(2))
            total = min(timed(n) for _ in range(2))
            ms = (total - base) / (n - 1) * 1e3
            rec = {"op": name, "ms": round(ms, 4),
                   "compile_s": round(compile_s, 1)}
            if flops:
                rec["tflops"] = round(flops / ms / 1e9, 1)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"op": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
