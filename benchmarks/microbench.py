"""Per-op TPU micro-benchmarks for the FCVSR hot path.

Times the MGAA/SCNet building blocks in isolation at the Kimono1 benchmark
shape (272x480, 64 feats) so the round-2 optimization effort lands on the
actual sink (round-1 breakdown: 3xMGAA 158ms, SCNet 127ms of 367ms/frame —
but not *which op inside MGAA*).

Axon quirks (CLAUDE.md): timing loops on-device via lax.fori_loop with a
loop-dependent input; sync via np.asarray of a scalar; one TPU client at a
time.  Prints one JSON line per component as it completes so partial results
survive a timeout.

Usage: python benchmarks/microbench.py [--cpu] [--iters 30] [--only warp,sac]
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
    ap.add_argument("--h", type=int, default=272)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fcvsr_tpu.models.blocks import SCNet
    from fcvsr_tpu.ops.corr import corr_lookup
    from fcvsr_tpu.ops.freq import rfft_features
    from fcvsr_tpu.ops.sac import iac, sac
    from fcvsr_tpu.ops.warp import flow_warp

    h, w, c = args.h, args.w, args.c
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    x = arr(1, h, w, c)
    flow = arr(1, h, w, 2) * 3.0
    k1 = arr(1, h, w, c * 3)
    pred_k = arr(1, h, w, 6 * c * 3)
    offsets = arr(6, 1, h, w, 2) * 3.0
    wf = w // 2 + 1
    xf_pair = (arr(1, h, wf, 2 * c), arr(1, h, wf, 2 * c))
    x192 = arr(1, h, w, 3 * c)

    bench = {}
    bench["warp"] = (lambda v: flow_warp(v, flow), x)
    bench["sac"] = (lambda v: sac(v, k1, k1), x)
    bench["iac6"] = (
        lambda v: iac(v, pred_k, offsets, 6, c, 3, kernel1_both=True,
                      k1_only=True), x)
    bench["rfft192"] = (lambda v: rfft_features(v), x192)
    bench["corr"] = (lambda v: corr_lookup(v, xf_pair[1], 4), xf_pair[0])

    import flax.linen as nn

    conv = nn.Conv(c, (3, 3), padding="SAME")
    conv_p = conv.init(jax.random.PRNGKey(0), x)
    bench["conv3x3"] = (lambda v: conv.apply(conv_p, v), x)

    scnet = SCNet(c, 10)
    dec1 = arr(1, h // 2, w // 2, c)
    dec2 = arr(1, h // 4, w // 4, c)
    sc_p = scnet.init(jax.random.PRNGKey(0), [x, dec1, dec2])
    bench["scnet10"] = (
        lambda v: scnet.apply(sc_p, [v, dec1, dec2])[0], x)

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
        except Exception as e:  # keep going; later ops may still work
            print(json.dumps({"op": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
