"""Post-fix TPU breakdown: MGAA / SCNet / chained blocks / kernel predictor."""

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

    from fcvsr_tpu.models.blocks import BlockRCB, SCNet
    from fcvsr_tpu.models.fcvsr import MFFR, MGAA

    h, w, c = 272, 480, 64
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    x = arr(1, h, w, c)
    x3 = arr(1, h, w, 3 * c)
    d1 = arr(1, h // 2, w // 2, c)
    d2 = arr(1, h // 4, w // 4, c)

    bench = {}

    mgaa = MGAA(dim=c)
    mgaa_p = mgaa.init(jax.random.PRNGKey(0), x3)
    bench["mgaa"] = (lambda v: mgaa.apply(mgaa_p, v), x3)

    mffr = MFFR(dim=c)
    mffr_p = mffr.init(jax.random.PRNGKey(0), x)
    bench["mffr"] = (lambda v: mffr.apply(mffr_p, v), x)

    # mffr_dtype='bf16' deployment option: bf16 band split + DivEnh chain
    mffr_bf = MFFR(dim=c, dtype="bf16")
    bench["mffr_bf16"] = (lambda v: mffr_bf.apply(mffr_p, v), x)

    scnet = SCNet(c, 10)
    sc_p = scnet.init(jax.random.PRNGKey(0), [x, d1, d2])
    bench["scnet10"] = (lambda v: scnet.apply(sc_p, [v, d1, d2])[0], x)

    class _Chain3(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, xs):
            for i in range(3):
                xs = BlockRCB(c, name=f"b{i}")(xs)
            return xs[0]

    ch = _Chain3()
    ch_p = ch.init(jax.random.PRNGKey(0), [x, d1, d2])
    bench["blockrcb_x3"] = (lambda v: ch.apply(ch_p, [v, d1, d2]), x)

    import flax.linen as nn

    f1 = nn.Conv(6 * c * 3, (1, 1))  # MGAA kernel predictor (k1-only half)
    f1_p = f1.init(jax.random.PRNGKey(0), x)
    bench["predictor_f1"] = (lambda v: f1.apply(f1_p, v), x)

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
