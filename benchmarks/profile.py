"""Profiling harness (replaces the reference FPS scripts + thop cost dump).

Covers SURVEY.md §5 "tracing/profiling": wall-clock FPS over the reference
benchmark shapes, analytic cost via jax AOT (FLOPs + bytes from the compiled
HLO), and optional jax.profiler traces for xprof.

Usage:
  python benchmarks/profile.py --model fcvsr --shape 272x480
  python benchmarks/profile.py --model fcvsr_s --trace /tmp/trace
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


SHAPES = {
    # the reference FPS sequences (test_LD_freqCVSR_FPS.py:82-91)
    "640x400": (400, 640),    # PeopleOnStreet
    "320x184": (184, 320),    # Johnny
    "480x272": (272, 480),    # Kimono1
    "64x64": (64, 64),
}


def build(model_name: str, in_channels: int = 1):
    from fcvsr_tpu.models import FCVSRNet
    from fcvsr_tpu.models.fcvsr_tfdc import FCVSRTFDCNet

    if model_name == "fcvsr":
        return FCVSRNet(in_channels=in_channels)
    if model_name == "fcvsr_s":
        return FCVSRNet.small(in_channels=in_channels)
    if model_name == "fcvsr_tfdc":
        return FCVSRTFDCNet()
    raise ValueError(model_name)


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fcvsr")
    ap.add_argument("--shape", default="480x272")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    h, w = SHAPES.get(args.shape) or tuple(map(int, args.shape.split("x")[::-1]))
    model = build(args.model)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 7, 1, h, w)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    n_params = sum(v.size for v in jax.tree.leaves(params))

    fwd = jax.jit(lambda p, v: model.apply(p, v))

    # analytic cost from the compiled executable
    lowered = fwd.lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else (cost or {})
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_n(p, v, n):
        def body(i, acc):
            return acc + jnp.mean(model.apply(p, v * (1.0 + 1e-6 * i)))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    np.asarray(run_n(params, x, 1))
    np.asarray(run_n(params, x, args.iters))

    if args.trace:
        with jax.profiler.trace(args.trace):
            np.asarray(run_n(params, x, args.iters))

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(run_n(params, x, n))
        return time.perf_counter() - t0

    base = min(timed(1) for _ in range(2))
    total = min(timed(args.iters) for _ in range(2))
    fps = (args.iters - 1) / (total - base)

    print(json.dumps({
        "model": args.model,
        "shape": f"{w}x{h}",
        "params": n_params,
        "gflops_per_frame": round(flops / 1e9, 2) if flops == flops else None,
        "gbytes_per_frame": round(bytes_ / 1e9, 2) if bytes_ == bytes_ else None,
        "fps": round(fps, 3),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
