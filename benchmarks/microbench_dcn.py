"""On-TPU validation + timing for the fused Pallas DCN (EDVR L1 shape).

One op per process (CLAUDE.md tunnel rules).  Usage:
  python benchmarks/microbench_dcn.py golden|fused|xla [--h 184 --w 320]
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
    ap.add_argument("op")
    ap.add_argument("--h", type=int, default=184)
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--dg", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcvsr_tpu.ops.dcn import modulated_deform_conv2d
    from fcvsr_tpu.ops.pallas_dcn import modulated_deform_conv2d_fused

    rng = np.random.default_rng(0)
    b, h, w, c, dg = 1, args.h, args.w, args.c, args.dg
    k = 9
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    offset = jnp.asarray(rng.uniform(-1.2, 1.2, (b, h, w, dg * k * 2)),
                         jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, dg * k)), jnp.float32)
    weight = jnp.asarray(0.1 * rng.standard_normal((3, 3, c, c)), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal((c,)), jnp.float32)

    if args.op == "golden":
        t0 = time.perf_counter()
        got = np.asarray(modulated_deform_conv2d_fused(
            x, offset, mask, weight, bias, deform_groups=dg))
        compile_s = time.perf_counter() - t0
        ref = np.asarray(jax.jit(functools.partial(
            modulated_deform_conv2d, deform_groups=dg))(
                x, offset, mask, weight, bias))
        dev = float(np.abs(got - ref).max())
        rel = dev / float(np.abs(ref).max())
        # both paths reduce with bf16 MXU passes in different orders on
        # real hardware, so compare relative to output scale
        print(json.dumps({"op": "golden", "max_dev": dev,
                          "rel_dev": round(rel, 6),
                          "compile_s": round(compile_s, 1),
                          "ok": bool(rel < 5e-3)}), flush=True)
        return

    if args.op == "fused":
        fn = lambda v: modulated_deform_conv2d_fused(
            v, offset, mask, weight, bias, deform_groups=dg)
    else:
        fn = lambda v: modulated_deform_conv2d(
            v, offset, mask, weight, bias, deform_groups=dg)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_n(v, n):
        def body(i, acc):
            return acc + jnp.mean(fn(v * (1.0 + 1e-6 * i)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    n = args.iters
    t0 = time.perf_counter()
    val = np.asarray(run_n(x, 1))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(val)
    np.asarray(run_n(x, n))

    def timed(m):
        t0 = time.perf_counter()
        v = np.asarray(run_n(x, m))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    base = min(timed(1) for _ in range(2))
    total = min(timed(n) for _ in range(2))
    print(json.dumps({"op": args.op,
                      "ms": round((total - base) / (n - 1) * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
