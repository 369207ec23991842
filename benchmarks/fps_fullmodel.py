"""Full-model FPS for one FCVSRNet flag combination, plus bf16-chain delta.

Times the deployment-path question the bench ladder can't ask per-variant:
what does the full model run at under a given (warp_impl, scnet_impl,
batch_mgaa) combination, and how far does the bf16-storage SCNet chain
move the output vs the f32 rows chain.

Usage:
  python benchmarks/fps_fullmodel.py --scnet rows            # f32 chain
  python benchmarks/fps_fullmodel.py --scnet rows_bf16       # bf16 chain
  python benchmarks/fps_fullmodel.py --scnet rows_bf16 --delta
      # also run the rows (f32) model on the same input and report the
      # output max/mean abs deviation and PSNR-between-variants

Timing protocol matches bench.py: on-device fori_loop with a
loop-dependent input (axon's block_until_ready is not a sync point),
min-of-2, (N-1)-difference to cancel dispatch latency.
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
    ap.add_argument("--model", default="fcvsr", choices=["fcvsr", "fcvsr_s"])
    ap.add_argument("--h", type=int, default=272)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--warp", default="pallas")
    ap.add_argument("--scnet", default="rows")
    ap.add_argument("--tail", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--iac", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--head", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--mffr", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--tail-impl", default="xla",
                    choices=["xla", "folded", "folded_pb"])
    ap.add_argument("--no-batch-mgaa", action="store_true")
    ap.add_argument("--iac-chain", default="periter",
                    choices=["periter", "resident"],
                    help="resident = whole-chain VMEM kernel "
                         "(ops.sac.set_iac_chain)")
    ap.add_argument("--kf", action="store_true",
                    help="fused kernel prediction (MGAA k_fused — the SAC "
                         "kernels are computed inside the IAC kernel)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--delta", action="store_true",
                    help="compare output vs the rows/f32 variant")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcvsr_tpu.models import FCVSRNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, args.h, args.w)), jnp.float32)

    def build(scnet_impl, tail_dtype="f32", iac_dtype="f32",
              tail_impl="xla", head_dtype="f32", mffr_dtype="f32"):
        cls = FCVSRNet.small if args.model == "fcvsr_s" else FCVSRNet
        return cls(in_channels=1, warp_impl=args.warp,
                   batch_mgaa=not args.no_batch_mgaa,
                   scnet_impl=scnet_impl, tail_dtype=tail_dtype,
                   iac_dtype=iac_dtype, tail_impl=tail_impl,
                   head_dtype=head_dtype, mffr_dtype=mffr_dtype,
                   k_fused=args.kf)

    from fcvsr_tpu.ops.sac import set_iac_chain

    set_iac_chain(args.iac_chain)
    model = build(args.scnet, args.tail, args.iac, args.tail_impl,
                  args.head, args.mffr)
    params = model.init(jax.random.PRNGKey(0), x)
    out = {"model": args.model, "warp": args.warp, "scnet": args.scnet,
           "tail": args.tail, "iac": args.iac, "tail_impl": args.tail_impl,
           "head": args.head, "mffr": args.mffr, "shape": [args.h, args.w],
           "iac_chain": args.iac_chain, "kf": args.kf}

    if args.delta:
        # jit both applies: eager through the axon tunnel is ~0.3s/dispatch
        y_var = np.asarray(jax.jit(model.apply)(params, x))
        y_ref = np.asarray(jax.jit(build("rows").apply)(params, x))
        d = np.abs(y_var - y_ref)
        mse = float(np.mean((y_var - y_ref) ** 2))
        out["delta_max"] = float(d.max())
        out["delta_mean"] = float(d.mean())
        out["psnr_between"] = float(10 * np.log10(1.0 / mse)) if mse else 99.0

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_n(p, v, n):
        def body(i, acc):
            return acc + jnp.mean(model.apply(p, v * (1.0 + 1e-6 * i)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def timed(n):
        t0 = time.perf_counter()
        val = np.asarray(run_n(params, x, n))
        assert np.isfinite(val), "non-finite output"
        return time.perf_counter() - t0

    n = args.iters
    timed(1)
    timed(n)
    base = min(timed(1) for _ in range(2))
    total = min(timed(n) for _ in range(2))
    out["fps"] = round((n - 1) / (total - base), 3)
    out["ms_per_frame"] = round((total - base) / (n - 1) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
