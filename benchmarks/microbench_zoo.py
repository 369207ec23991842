"""Zoo end-to-end fps: BasicVSR++ and TDAN, gather vs fused-Pallas DCN.

Round-3 banked EDVR (0.6 -> 12.5 fps via ops/pallas_dcn.py); this measures
the other two DCN-bearing families end-to-end on the TPU so zoo perf parity
is tracked, not assumed (VERDICT r2 weakness #8).

- BasicVSR++ (models/basicvsr_pp.py, ref mmedit basicvsr_pp.py): T=7 clip at
  192x320 (SPyNet needs /32 dims); recurrent model => fps counts all T
  output frames per forward.
- TDAN (models/iconvsr.py::TDANNet, ref tdan_net.py): T=5 at 184x320, one
  centre SR frame per forward.

Usage: python benchmarks/microbench_zoo.py [--cpu] [--iters 5] [--only ...]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fcvsr_tpu.models.basicvsr_pp import BasicVSRPlusPlus
    from fcvsr_tpu.models.iconvsr import TDANNet
    from fcvsr_tpu.ops.dcn import set_dcn_impl

    rng = np.random.default_rng(0)
    cases = {
        "bpp": (BasicVSRPlusPlus(), (1, 7, 3, 192, 320), 7),
        "tdan": (TDANNet(), (1, 5, 3, 184, 320), 1),
    }

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    out = {}
    for key, (model, shape, frames_per_fwd) in cases.items():
        x = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        params = None
        for impl in ("gather", "pallas"):
            name = f"{key}_{impl}"
            if only and name not in only:
                continue
            set_dcn_impl(impl)
            if params is None:
                # init under the CURRENT impl: the gather DCN's
                # take_along_axis temps OOM 16G HBM at the BasicVSR++
                # shape, so init itself must be guarded per-impl (the
                # param tree is impl-independent).
                try:
                    params = model.init(jax.random.PRNGKey(0), x)
                except Exception as e:  # noqa: BLE001
                    print(f"{name:14s} FAILED(init) "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                    out[name] = None
                    continue

            def fwd(p, v, model=model):
                y = model.apply(p, v)
                y = y[0] if isinstance(y, tuple) else y
                return jnp.mean(y)

            @functools.partial(jax.jit, static_argnums=(2,))
            def run_n(p, v, k, fwd=fwd):
                def body(i, acc):
                    return acc + fwd(p, v * (1.0 + 1e-6 * i))
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            try:
                t0 = time.perf_counter()
                val = np.asarray(run_n(params, x, 1))
                assert np.isfinite(val), "non-finite output"
                compile_s = time.perf_counter() - t0
                np.asarray(run_n(params, x, n))

                def timed(k):
                    t0 = time.perf_counter()
                    v = np.asarray(run_n(params, x, k))
                    assert np.isfinite(v)
                    return time.perf_counter() - t0

                base = min(timed(1) for _ in range(2))
                total = min(timed(n) for _ in range(2))
                sec_per_fwd = (total - base) / (n - 1)
                fps = frames_per_fwd / sec_per_fwd
                out[name] = round(fps, 3)
                print(f"{name:14s} {fps:8.3f} fps  "
                      f"({sec_per_fwd * 1e3:8.1f} ms/fwd, compile "
                      f"{compile_s:.1f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:14s} FAILED {type(e).__name__}: {e}", flush=True)
                out[name] = None
    set_dcn_impl("gather")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
