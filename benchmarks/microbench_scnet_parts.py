"""SCNet rows-chain decomposition: where do 31.9 ms @480x272 actually go?

The shipped chain (models/scnet_rows.py) runs ~78 TFLOP/s average while the
isolated conv matmul stream runs 186-212 (docs/PERFORMANCE.md) — VERDICT r3
#4 asks for per-boundary timings before any new kernel.  Each op runs the
REAL scnet_rows_apply with one component ablated (monkeypatched), so the
deltas are in-chain marginal costs, not isolated-op guesses:

  full          — shipped chain (scnet10 rows_bf16; r3 measured 31.85 ms)
  no_ctx        — _context_block -> identity: Δ = all ContextBlock cost
                  (logits einsum + softmax + pooled-ctx einsum + masked add)
  no_crosslevel — BlockRCB down/up projections+resizes dropped (body and
                  4-way combine keep running): Δ = cross-level glue
  no_groupres   — group conv's fused res= input dropped (plain conv):
                  Δ (negative = the fusion's win) sanity-checks res fusion
  pairs_only    — no_ctx + no_crosslevel: the pure kernel backbone; the
                  gap between its FLOP-rate and the stream rate is
                  boundary/launch overhead
  callchain     — N dependent conv3x3_rows calls at the L1 shape: marginal
                  in-chain ms/call; compare vs the 9.6 GFLOP matmul time
                  (~0.05 ms at stream rate) => per-call overhead
  callchain_l3  — same at the L3 shape (68x120): overhead-dominated limit
  full_th32 / callchain_th32 — tile_rows=32 with ROW_OFF patched to 32
                  (the th=16 halo overhead is (th+4)/th = 1.25x window
                  reads for the pair kernel; th=32 trades it for 2 extra
                  pad tiles of compute — measured, not guessed)

One op per process (CLAUDE.md tunnel rules).  Usage:
  python benchmarks/microbench_scnet_parts.py <op> [--cpu] [--groups 10]
      [--iters 10] [--calls 40]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--groups", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--calls", type=int, default=40)
    ap.add_argument("--h", type=int, default=272)
    ap.add_argument("--w", type=int, default=480)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import fcvsr_tpu.models.scnet_rows as sr
    from fcvsr_tpu.models.blocks import SCNet
    from fcvsr_tpu.ops.pallas_conv import (conv3x3_rows, pad_to_rows,
                                           prep_weight, rows_geometry)

    h, w, nf = args.h, args.w, 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-0.5, 0.5, shape), jnp.float32)

    import fcvsr_tpu.ops.pallas_conv as pc

    fuse, tile_rows, downproj = "pair", 16, "conv_first"
    for _ in range(3):  # suffixes compose in any order
        if args.op.endswith("_rf"):
            # down projections resize before the 1x1 (bounded deviation)
            downproj = "resize_first"
            args.op = args.op[: -len("_rf")]
        if args.op.endswith("_quad"):
            # both conv pairs of each BlockRCB body as ONE kernel
            # (conv3x3_quad_rows — bit-exact vs the pair chain)
            fuse = "quad"
            args.op = args.op[: -len("_quad")]
        if args.op.endswith("_th32"):
            # ROW_OFF=32 keeps the first tile fully inside the zero ring
            # (the DMA base clamp's correctness argument); both modules
            # bind the constant at import, so patch both.
            pc.ROW_OFF = 32
            sr.ROW_OFF = 32
            tile_rows = 32
            args.op = args.op[: -len("_th32")]

    # ---- ablation patches ----
    orig_ctx = sr._context_block
    orig_block = sr._block_rcb

    def ctx_identity(cp, x, hh, ww, tile_rows):
        return x

    def block_no_crosslevel(bp, x_list, shapes, tile_rows, interpret, mode):
        def body(x, hw):
            hh, ww = hw
            y = sr.conv3x3_pair_rows(
                x, sr.prep_weight(sr._k(bp["body0"])), sr._b(bp["body0"]),
                sr.prep_weight(sr._k(bp["body1"])), sr._b(bp["body1"]),
                h=hh, w=ww, ns1=0.1, tile_rows=tile_rows,
                interpret=interpret)
            return sr._rcb(bp["rcb"], y, hh, ww, tile_rows, interpret, mode)

        res = [body(x, s) for x, s in zip(x_list, shapes)]
        # keep the 4-way combine's arithmetic volume comparable: reuse res
        return [x + r + r + r for x, r in zip(x_list, res)]

    name = args.op
    if name in ("full", "no_ctx", "no_crosslevel", "no_groupres",
                "pairs_only"):
        if name in ("no_ctx", "pairs_only"):
            sr._context_block = ctx_identity
        if name in ("no_crosslevel", "pairs_only"):
            sr._block_rcb = block_no_crosslevel

        mod = SCNet(nf, args.groups)
        xs = [arr(1, h, w, nf), arr(1, h // 2, w // 2, nf),
              arr(1, h // 4, w // 4, nf)]
        params = mod.init(jax.random.PRNGKey(0), xs)["params"]

        if name == "no_groupres":
            real_conv = sr.conv3x3_rows

            def conv_no_res(x_rows, wmat, bias=None, res=None, **kw):
                y = real_conv(x_rows, wmat, bias, None, **kw)
                return y + res.astype(y.dtype) if res is not None else y

            sr.conv3x3_rows = conv_no_res

        interp = bool(args.cpu)  # pallas kernels need interpret off-TPU

        def fn(ys):
            out = sr.scnet_rows_apply(params, ys, args.groups,
                                      tile_rows=tile_rows,
                                      interpret=interp,
                                      chain_dtype=jnp.bfloat16, fuse=fuse,
                                      downproj=downproj)
            return sum(jnp.mean(o) for o in out)

        @functools.partial(jax.jit, static_argnums=(1,))
        def run_n(vs, k):
            def body(i, acc):
                return acc + fn([v * (1.0 + 1e-6 * i) for v in vs])
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        example = xs
    elif name.startswith("callchain"):
        if name.endswith("_l3"):
            h, w = h // 4, w // 4
        x = pc.pad_to_rows(arr(1, h, w, nf), tile_rows).astype(jnp.bfloat16)
        wmat = prep_weight(arr(3, 3, nf, nf) * 0.05)
        ncalls = args.calls

        interp = bool(args.cpu)

        def fn(v):
            y = v
            for _ in range(ncalls):
                y = conv3x3_rows(y, wmat, h=h, w=w, tile_rows=tile_rows,
                                 interpret=interp)
            return jnp.mean(y.astype(jnp.float32))

        @functools.partial(jax.jit, static_argnums=(1,))
        def run_n(v, k):
            def body(i, acc):
                return acc + fn(v * (1.0 + 1e-6 * i))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        example = x
    else:
        raise SystemExit(f"unknown op {name}")

    n = args.iters
    t0 = time.perf_counter()
    v = np.asarray(run_n(example, 1))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), "non-finite"
    np.asarray(run_n(example, n))

    def timed(k):
        t0 = time.perf_counter()
        vv = np.asarray(run_n(example, k))
        assert np.isfinite(vv)
        return time.perf_counter() - t0

    base = min(timed(1) for _ in range(3))
    total = min(timed(n) for _ in range(3))
    ms = (total - base) / (n - 1) * 1e3
    out = {"op": name, "ms": round(ms, 3), "compile_s": round(compile_s, 1)}
    if name.startswith("callchain"):
        out["ms_per_call"] = round(ms / args.calls, 4)
        gflop = h * w * 9 * nf * nf * 2 / 1e9
        out["tflops"] = round(gflop * args.calls / ms, 1)
    print(json.dumps(out), flush=True)

    sr._context_block = orig_ctx
    sr._block_rcb = orig_block


if __name__ == "__main__":
    main()
