"""SCNet at the full bench shape: XLA NHWC vs rows-layout Pallas replay.

scnet10_xla  — models/blocks.py::SCNet (NHWC lax.conv path, r2: ~117 ms)
scnet10_rows — SCNet(impl='rows'): chain-resident rows-layout Pallas convs
               (models/scnet_rows.py over ops/pallas_conv.py)
scnet4_*     — the FCVSR-S group count at the same spatial shape

Usage: python benchmarks/microbench_scnet.py [--cpu] [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fcvsr_tpu.models.blocks import SCNet

    h, w, c = 272, 480, 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    x = arr(1, h, w, c)
    d1 = arr(1, h // 2, w // 2, c)
    d2 = arr(1, h // 4, w // 4, c)

    bench = {}
    for g in (10, 4):
        p = SCNet(c, g).init(jax.random.PRNGKey(0), [x, d1, d2])
        for impl in ("xla", "rows", "rows_bf16"):
            mod = SCNet(c, g, impl=impl)
            bench[f"scnet{g}_{impl}"] = (
                functools.partial(
                    lambda v, mod=mod, p=p: mod.apply(p, [v, d1, d2])[0]), x)
        # direct scnet_rows_apply entries: A/B the conv matmul
        # decomposition in-chain (post cross-level-glue fix).
        # Measured on TPU (round 3, scnet10 @272x480x64 bf16 chain):
        # rows_bf16 31.85 ms / cat3 31.91 / mstack 32.53 — the matmul
        # decomposition is NOT the bottleneck in-chain; CLOSED, default
        # cat3 stays.
        from fcvsr_tpu.models.scnet_rows import scnet_rows_apply

        # mstack2 (r5): banded pair-row matmul — (128, 768) operands are
        # exact MXU-tile multiples (mstack's 192x192 pads to 2x2 tiles)
        for mode in ("cat3", "mstack", "mstack2"):
            bench[f"scnet{g}_bf16_{mode}"] = (
                functools.partial(
                    lambda v, g=g, p=p, mode=mode: scnet_rows_apply(
                        p["params"], [v, d1, d2], g,
                        chain_dtype=jnp.bfloat16, mode=mode)[0]), x)

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    out = {}
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
            out[name] = round(ms, 3)
            print(f"{name:18s} {ms:9.3f} ms   (compile {compile_s:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)
            out[name] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
