"""SCNet-internals TPU timing: where do 125ms go?

Round-2 question: scnet10 measures 125ms but its ~2.4 TFLOP of convs at the
observed 32 TFLOP/s conv rate only explain ~75ms.  Time the pieces.
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

    import flax.linen as nn
    import jax.numpy as jnp

    from fcvsr_tpu.models.blocks import (BlockRCB, ContextBlock, RCB, SCGroup)
    from fcvsr_tpu.ops.resize import downsample2x_bilinear, upsample2x_bilinear

    h, w, c = 272, 480, 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    x = arr(1, h, w, c)
    d1 = arr(1, h // 2, w // 2, c)
    d2 = arr(1, h // 4, w // 4, c)

    bench = {}

    rcb = RCB(c, init_scale=0.1)
    rcb_p = rcb.init(jax.random.PRNGKey(0), x)
    bench["rcb_l1"] = (lambda v: rcb.apply(rcb_p, v), x)

    ctx = ContextBlock(c, init_scale=0.1)
    ctx_p = ctx.init(jax.random.PRNGKey(0), x)
    bench["ctx_l1"] = (lambda v: ctx.apply(ctx_p, v), x)

    blk = BlockRCB(c)
    blk_p = blk.init(jax.random.PRNGKey(0), [x, d1, d2])
    bench["blockrcb"] = (lambda v: blk.apply(blk_p, [v, d1, d2])[0], x)

    grp = SCGroup(c)
    grp_p = grp.init(jax.random.PRNGKey(0), [x, d1, d2])
    bench["scgroup"] = (lambda v: grp.apply(grp_p, [v, d1, d2])[0], x)

    conv_a = nn.Conv(2 * c, (3, 3), padding="SAME")
    conv_b = nn.Conv(c, (3, 3), padding="SAME")
    pa = conv_a.init(jax.random.PRNGKey(0), x)
    pb = conv_b.init(jax.random.PRNGKey(0), arr(1, h, w, 2 * c))
    bench["body_l1"] = (
        lambda v: conv_b.apply(pb, jax.nn.leaky_relu(conv_a.apply(pa, v), 0.1)),
        x)

    bench["resize_pair"] = (
        lambda v: upsample2x_bilinear(downsample2x_bilinear(v)), x)

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
            print(json.dumps({"op": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
