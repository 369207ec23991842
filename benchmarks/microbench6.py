"""Stencil vs gather warp at the Kimono shape (see ops/warp.py)."""

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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fcvsr_tpu.ops.sac import sac
    from fcvsr_tpu.ops.warp import flow_warp  # stencil variant deleted r3

    h, w, c = 272, 480, 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    x = arr(1, h, w, c)
    fin = arr(1, h, w, c)
    flow = arr(1, h, w, 2) * 2.0
    k1 = arr(1, h, w, c * 3)

    def iter_(warp):
        def f(v):
            out = sac(warp(v, flow), k1, k1, 3, kernel1_both=True) + fin
            return jax.nn.leaky_relu(out, 0.1)
        return f

    bench = {
        "warp_gather": (lambda v: flow_warp(v, flow), x),
    }

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    for name, (fn, inp) in bench.items():
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
            print(json.dumps({"op": name, "ms": round(ms, 3),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
