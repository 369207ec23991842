"""On-TPU validation + timing for the fused Pallas IAC kernel.

Round 3: the axon terminal was upgraded and Pallas compiles now run
(tools/tpu_probe.py) — this measures ops/pallas_iac.py at the bench shape
for the first time.  One op per process (a failed TPU call poisons the
process and can wedge the tunnel — CLAUDE.md), timing on-device via
lax.fori_loop with a loop-dependent input and np.asarray as the sync.

Usage: python benchmarks/microbench_pallas.py <op> [--h 272 --w 480 --c 64]
  ops: golden_small | golden_bench | iter_pallas | iter_xla | chain_pallas
       | chain_xla
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


def tap_major(k_c_major, c):
    import jax.numpy as jnp
    b, h, w, _ = k_c_major.shape
    k = k_c_major.reshape(b, h, w, c, 3)
    return jnp.moveaxis(k, -1, -2).reshape(b, h, w, 3 * c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("op")
    ap.add_argument("--h", type=int, default=272)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile-rows", type=int, default=8)
    ap.add_argument("--radius", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcvsr_tpu.ops.pallas_iac import iac_fused, warp_sac_fused
    from fcvsr_tpu.ops.sac import iac, sac
    from fcvsr_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(0)

    def ref_iter(feat, flow, k1, fin):
        out = sac(flow_warp(feat, flow), k1, k1, 3, kernel1_both=True) + fin
        return jax.nn.leaky_relu(out, 0.1)

    if args.op in ("golden_small", "golden_bench"):
        if args.op == "golden_small":
            b, h, w, c = 1, 16, 128, 8
        else:
            b, h, w, c = 1, args.h, args.w, args.c
        feat = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        fin = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        flow = jnp.asarray(rng.uniform(-1.4, 1.4, (b, h, w, 2)), jnp.float32)
        k1 = jnp.asarray(0.2 * rng.standard_normal((b, h, w, c * 3)),
                         jnp.float32)
        t0 = time.perf_counter()
        got = np.asarray(warp_sac_fused(feat, flow, tap_major(k1, c), fin,
                                        radius=2, tile_rows=args.tile_rows))
        compile_s = time.perf_counter() - t0
        ref = np.asarray(jax.jit(ref_iter)(feat, flow, k1, fin))
        dev = float(np.abs(got - ref).max())
        print(json.dumps({"op": args.op, "max_dev": dev,
                          "compile_s": round(compile_s, 1),
                          "ok": bool(dev < 2e-4)}), flush=True)
        return

    b, h, w, c = 1, args.h, args.w, args.c
    feat = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    fin = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1.4, 1.4, (b, h, w, 2)), jnp.float32)
    k1 = jnp.asarray(0.2 * rng.standard_normal((b, h, w, c * 3)), jnp.float32)
    k1t = tap_major(k1, c)
    ac = 6
    pred_k = jnp.asarray(
        0.2 * rng.standard_normal((b, h, w, ac * c * 3)), jnp.float32)
    pred_kt = jnp.concatenate(
        [tap_major(pred_k[..., i * c * 3 : (i + 1) * c * 3], c)
         for i in range(ac)], axis=-1)
    offsets = jnp.asarray(rng.uniform(-1.2, 1.2, (ac, b, h, w, 2)),
                          jnp.float32)

    fns = {
        "iter_pallas": (lambda v: warp_sac_fused(
            v, flow, k1t, fin, radius=args.radius,
            tile_rows=args.tile_rows), feat),
        "iter_xla": (lambda v: ref_iter(v, flow, k1, fin), feat),
        "chain_pallas": (lambda v: iac_fused(
            v, pred_kt, offsets, ac, c, radius=2,
            tile_rows=args.tile_rows), fin),
        "chain_xla": (lambda v: iac(v, pred_k, offsets, ac, c, 3,
                                    kernel1_both=True, k1_only=True), fin),
    }
    fn, inp = fns[args.op]

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_n(v, k):
        def body(i, acc):
            return acc + jnp.mean(fn(v * (1.0 + 1e-6 * i)))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    n = args.iters
    t0 = time.perf_counter()
    val = np.asarray(run_n(inp, 1))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(val), "non-finite"
    np.asarray(run_n(inp, n))

    def timed(k):
        t0 = time.perf_counter()
        v = np.asarray(run_n(inp, k))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    base = min(timed(1) for _ in range(2))
    total = min(timed(n) for _ in range(2))
    ms = (total - base) / (n - 1) * 1e3
    print(json.dumps({"op": args.op, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1),
                      "tile_rows": args.tile_rows, "radius": args.radius}), flush=True)


if __name__ == "__main__":
    main()
