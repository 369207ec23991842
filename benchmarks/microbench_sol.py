"""Speed-of-light probe for the SCNet conv wall (round 3).

SCNet is ~93% pure conv time at a measured ~32-35 TFLOP/s (round-2
microbenches); the open question is whether that rate is XLA being lazy or
the chip's actual ceiling at these shapes.  The dominant convs are 3x3 at
272x480 with C in {64->64, 64->128, 128->64} — as im2col matmuls these are
(M=130560, K=576..1152, N=64..128), and N=64 fills only half the 128-wide
MXU.  This benchmark measures, on the real chip:

  * big square matmul (4096^3) — the chip's practical matmul peak at the
    default (bf16-pass) precision;
  * the conv-shaped matmuls — how much of that peak survives N=64/128;
  * the XLA convs themselves — how close XLA's conv lowering gets to its
    own matmul rate at the same shape.

If conv ~= matmul(same shape), a hand Pallas conv has no headroom and the
SCNet wall is a genuine N=64 hardware limit (closure); if conv is well
below, an im2col Pallas kernel is worth building.

Usage: python benchmarks/microbench_sol.py [--cpu] [--iters 30]
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
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    h, w = 272, 480
    m = h * w  # 130560

    dimnums = lax.conv_dimension_numbers((1, h, w, 64), (3, 3, 64, 64),
                                         ("NHWC", "HWIO", "NHWC"))

    def conv(x, k):
        return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dimnums)

    # (name, fn(v), input, flops-per-call) — flops counted as 2*M*K*N.
    bench = {}

    a4k, b4k = arr(4096, 4096), arr(4096, 4096)
    bench["mm_4096"] = (lambda v: v @ b4k, a4k, 2 * 4096**3)

    w64 = arr(576, 64)
    bench["mm_conv64"] = (lambda v: v @ w64, arr(m, 576), 2 * m * 576 * 64)
    w128 = arr(576, 128)
    bench["mm_conv128"] = (lambda v: v @ w128, arr(m, 576), 2 * m * 576 * 128)
    wk1152 = arr(1152, 64)
    bench["mm_conv64_k1152"] = (lambda v: v @ wk1152, arr(m, 1152),
                                2 * m * 1152 * 64)

    x64 = arr(1, h, w, 64)
    k64 = arr(3, 3, 64, 64)
    bench["conv3x3_64_64"] = (lambda v: conv(v, k64), x64, 2 * m * 576 * 64)
    k64_128 = arr(3, 3, 64, 128)
    bench["conv3x3_64_128"] = (lambda v: conv(v, k64_128), x64,
                               2 * m * 576 * 128)
    x128 = arr(1, h, w, 128)
    k128_64 = arr(3, 3, 128, 64)
    bench["conv3x3_128_64"] = (lambda v: conv(v, k128_64), x128,
                               2 * m * 1152 * 64)
    # batch-2: does batching recover MXU occupancy for N=64?
    x64b2 = arr(2, h, w, 64)
    bench["conv3x3_64_64_b2"] = (lambda v: conv(v, k64), x64b2,
                                 2 * 2 * m * 576 * 64)

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    for name, (fn, inp, flops) in bench.items():
        if only and name not in only:
            continue

        @functools.partial(jax.jit, static_argnums=(1,))
        def run_n(v, k, fn=fn):
            def body(i, acc):
                return acc + jnp.mean(fn(v * (1.0 + 1e-6 * i)))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        try:
            t0 = time.perf_counter()
            np.asarray(run_n(inp, 1))
            compile_s = time.perf_counter() - t0
            np.asarray(run_n(inp, n))

            def timed(k):
                t0 = time.perf_counter()
                val = np.asarray(run_n(inp, k))
                assert np.isfinite(val)
                return time.perf_counter() - t0

            base = min(timed(1) for _ in range(2))
            total = min(timed(n) for _ in range(2))
            ms = (total - base) / (n - 1) * 1e3
            print(json.dumps({"op": name, "ms": round(ms, 4),
                              "tflops": round(flops / ms / 1e9, 1),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
