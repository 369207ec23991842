"""Round-2 TPU experiments: matmul precision tiers, warp formulations, corr.

Findings feed the optimization flags in fcvsr_tpu (see CLAUDE.md).  Prints
one JSON line per experiment as it completes.
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

    from fcvsr_tpu.models.blocks import SCNet
    from fcvsr_tpu.ops.corr import corr_lookup
    from fcvsr_tpu.ops.warp import flow_warp

    h, w, c = 272, 480, 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    x = arr(1, h, w, c)
    flow = arr(1, h, w, 2) * 3.0
    wf = w // 2 + 1
    xf_pair = (arr(1, h, wf, 2 * c), arr(1, h, wf, 2 * c))

    conv = nn.Conv(c, (3, 3), padding="SAME")
    conv_p = conv.init(jax.random.PRNGKey(0), x)

    scnet = SCNet(c, 10)
    dec1 = arr(1, h // 2, w // 2, c)
    dec2 = arr(1, h // 4, w // 4, c)
    sc_p = scnet.init(jax.random.PRNGKey(0), [x, dec1, dec2])

    def prec_fn(p):
        def f(v):
            with jax.default_matmul_precision(p):
                return conv.apply(conv_p, v)
        return f

    def warp_packed(v):
        # all 4 corner gathers in ONE take_along_axis call
        b, hh, ww, cc = v.shape
        gy, gx = jnp.meshgrid(jnp.arange(hh, dtype=v.dtype),
                              jnp.arange(ww, dtype=v.dtype), indexing="ij")
        px = (gx[None] + flow[..., 0]).reshape(b, hh * ww)
        py = (gy[None] + flow[..., 1]).reshape(b, hh * ww)
        src = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        px = jnp.clip(px, -1.5, ww + 0.5)
        py = jnp.clip(py, -1.5, hh + 0.5)
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        fx = px - x0; fy = py - y0
        x0i = x0.astype(jnp.int32) + 1
        y0i = y0.astype(jnp.int32) + 1
        ws2, hs2 = ww + 2, hh + 2
        flat = src.reshape(b, hs2 * ws2, cc)
        idx = jnp.stack([
            jnp.clip(y0i, 0, hs2 - 1) * ws2 + jnp.clip(x0i, 0, ws2 - 1),
            jnp.clip(y0i, 0, hs2 - 1) * ws2 + jnp.clip(x0i + 1, 0, ws2 - 1),
            jnp.clip(y0i + 1, 0, hs2 - 1) * ws2 + jnp.clip(x0i, 0, ws2 - 1),
            jnp.clip(y0i + 1, 0, hs2 - 1) * ws2 + jnp.clip(x0i + 1, 0, ws2 - 1),
        ], axis=1)  # (b, 4, P)
        g = jnp.take_along_axis(flat[:, None], idx[..., None], axis=2)
        wgt = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                         fy * (1 - fx), fy * fx], axis=1)
        return (g * wgt[..., None]).sum(axis=1).reshape(b, hh, ww, cc)

    bench = {
        "conv_bf16": (prec_fn("bfloat16"), x),
        "conv_bf16x3": (prec_fn("bfloat16_3x"), x),
        "conv_f32": (prec_fn("float32"), x),
        "warp_packed": (warp_packed, x),
        "corr_corner": (lambda v: corr_lookup(v, xf_pair[1], 4), xf_pair[0]),
        "scnet10_bf16prec": (
            lambda v: jax.tree.leaves(
                jax.tree.map(lambda a: a,
                             _scnet_prec(jax, scnet, sc_p, v, dec1, dec2)))[0],
            x),
        "warp_c192": (lambda v: flow_warp(jnp.tile(v, (1, 1, 1, 3)),
                                          flow)[..., :1], x),
    }

    def _scnet_prec(jax_, model, p, v, d1, d2):
        with jax_.default_matmul_precision("bfloat16"):
            return model.apply(p, [v, d1, d2])[0]

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
