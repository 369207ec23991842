"""HBM->VMEM window-DMA rate probe for the rows-layout kernels.

microbench_conv2 shows dma_only = 0.208 ms for 17 serial 2.4MB slab
copies (~190 GB/s — a quarter of HBM read peak), while the matmul stream
is 0.066 ms: the chain kernels are window-DMA-bound.  This isolates
whether that cost is per-DMA latency (fix: fewer/larger tiles) or a raw
slab-read rate limit (fix: layout/dtype):

  one_shot   — a single (TILES*TH+2, C, WP) copy, one DMA
  serial     — 17 x (TH+2)-row slabs, start+wait each (no overlap)
  dbuf       — the real kernels' schedule: double-buffered slabs,
               trivial compute (one vector add per tile)
  *_bf16     — same with a bf16 source

Usage: python benchmarks/microbench_dma.py [--iters 50]
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
    ap.add_argument("--iters", type=int, default=50)
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
    rows = TH * TILES + 2
    src_f32 = jnp.asarray(rng.uniform(-1, 1, (1, rows, C, WP)), jnp.float32)
    src_bf16 = src_f32.astype(jnp.bfloat16)

    def one_shot(src):
        def kern(src_hbm, out_ref, win, sem):
            cp = pltpu.make_async_copy(src_hbm.at[0], win, sem)
            cp.start()
            cp.wait()
            out_ref[...] = win[:1, :1].astype(jnp.float32)

        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((1, 1, WP), lambda t: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1, WP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, C, WP), src.dtype),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interp,
        )(src)

    def serial(src):
        def kern(src_hbm, out_ref, win, sem):
            ti = pl.program_id(0)
            cp = pltpu.make_async_copy(
                src_hbm.at[0, pl.ds(ti * TH, TH + 2)], win, sem)
            cp.start()
            cp.wait()
            out_ref[...] = win[:1, :1].astype(jnp.float32)

        return pl.pallas_call(
            kern,
            grid=(TILES,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((1, 1, WP), lambda t: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1, WP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TH + 2, C, WP), src.dtype),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(src)

    def dbuf(src):
        def kern(src_hbm, out_ref, win, sems):
            ti = pl.program_id(0)

            def dma(step, slot):
                return pltpu.make_async_copy(
                    src_hbm.at[0, pl.ds(step * TH, TH + 2)], win.at[slot],
                    sems.at[slot])

            @pl.when(ti == 0)
            def _():
                dma(0, 0).start()

            @pl.when(ti + 1 < TILES)
            def _():
                dma(ti + 1, (ti + 1) % 2).start()

            dma(ti, ti % 2).wait()
            out_ref[...] = win[ti % 2, :1, :1].astype(jnp.float32)

        return pl.pallas_call(
            kern,
            grid=(TILES,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((1, 1, WP), lambda t: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1, WP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, TH + 2, C, WP), src.dtype),
                            pltpu.SemaphoreType.DMA((2,)),],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(src)

    bench = {
        "one_shot": (one_shot, src_f32),
        "serial": (serial, src_f32),
        "dbuf": (dbuf, src_f32),
        "one_shot_bf16": (one_shot, src_bf16),
        "serial_bf16": (serial, src_bf16),
        "dbuf_bf16": (dbuf, src_bf16),
    }

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    out = {}
    for name, (fn, src) in bench.items():
        if only and name not in only:
            continue

        @functools.partial(jax.jit, static_argnums=(1,))
        def run_n(v, k, fn=fn):
            # loop-dependence via a single-element in-place update: a full
            # `v * scale` would add an HBM read+write stream per iteration
            # and mask the DMA rate being measured
            def body(i, carry):
                acc, u = carry
                u = u.at[0, 0, 0, 0].add(jnp.asarray(1e-6, u.dtype))
                return acc + jnp.sum(fn(u)), u
            return jax.lax.fori_loop(0, k, body, (jnp.float32(0), v))[0]

        try:
            t0 = time.perf_counter()
            np.asarray(run_n(src, 1))
            compile_s = time.perf_counter() - t0

            def timed(k):
                t0 = time.perf_counter()
                val = np.asarray(run_n(src, k))
                assert np.isfinite(val)
                return time.perf_counter() - t0

            timed(n)
            base = min(timed(1) for _ in range(2))
            total = min(timed(n) for _ in range(2))
            ms = (total - base) / (n - 1) * 1e3
            gb = src.nbytes * 1e-9
            print(json.dumps({"op": name, "ms": round(ms, 4),
                              "gbps": round(gb / (ms * 1e-3), 1),
                              "compile_s": round(compile_s, 1)}),
                  flush=True)
            out[name] = ms
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED {type(e).__name__}: {e}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
