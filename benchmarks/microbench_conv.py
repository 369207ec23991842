"""CHW Pallas conv3x3 vs XLA NHWC conv at the SCNet shapes (272x480).

Entries:
  xla_64_64 / xla_64_128 / xla_128_64  — XLA lax.conv (default precision)
  pal_64_64 / pal_64_128 / pal_128_64  — conv3x3_chw on resident rows layout
  pal_64_64_rt                         — incl. NHWC round-trip transposes

Usage: python benchmarks/microbench_conv.py [--cpu] [--iters 30]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default="")
    ap.add_argument("--tile-rows", type=int, default=16)
    ap.add_argument("--mode", default="cat3")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interp = args.cpu

    import jax.numpy as jnp
    from jax import lax

    from fcvsr_tpu.ops.pallas_conv import (conv3x3_rows, pad_to_rows,
                                           prep_weight, rows_to_nhwc)

    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    h, w = 272, 480
    m = h * w

    def conv(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn)

    bench = {}
    for cin, cout in ((64, 64), (64, 128), (128, 64)):
        x = arr(1, h, w, cin)
        k = arr(3, 3, cin, cout) * 0.2
        flops = 2 * m * 9 * cin * cout
        bench[f"xla_{cin}_{cout}"] = (
            functools.partial(lambda v, k=k: conv(v, k)), x, flops)
        rows = pad_to_rows(x, args.tile_rows)
        wm = prep_weight(k, args.mode)
        bench[f"pal_{cin}_{cout}"] = (
            functools.partial(
                lambda v, wm=wm: conv3x3_rows(
                    v, wm, h=h, w=w, act=True, tile_rows=args.tile_rows,
                    mode=args.mode, interpret=interp)),
            rows, flops)
    # bf16 HBM-resident chain dtype: same kernel, half the window/output
    # DMA bytes (the matmuls are single-pass bf16 either way)
    x = arr(1, h, w, 64)
    k = arr(3, 3, 64, 64) * 0.2
    wm = prep_weight(k, args.mode)
    bench["pal_64_64_bf16"] = (
        functools.partial(
            lambda v, wm=wm: conv3x3_rows(
                v, wm, h=h, w=w, act=True, tile_rows=args.tile_rows,
                mode=args.mode, interpret=interp)),
        pad_to_rows(x, args.tile_rows).astype(jnp.bfloat16),
        2 * m * 9 * 64 * 64)
    bench["pal_64_64_rt"] = (
        functools.partial(
            lambda v, wm=wm: rows_to_nhwc(
                conv3x3_rows(pad_to_rows(v, args.tile_rows), wm, h=h, w=w,
                             act=True, tile_rows=args.tile_rows,
                             mode=args.mode, interpret=interp), h, w)),
        x, 2 * m * 9 * 64 * 64)

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
            print(json.dumps({"op": name, "ms": round(ms, 4),
                              "tflops": round(flops / ms / 1e9, 1),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
