"""On-TPU validation + timing for the fused Pallas DCN BACKWARD.

Times jax.grad of a vdot loss through modulated_deform_conv2d at the EDVR
L1 shape under three routings:

  gather       exact XLA impl, autodiff backward (the training default)
  pallas_gb    fused forward + gather-path VJP (re-runs the gather fwd)
  pallas_fb    fused forward + fused adjoint kernel (set_dcn_bwd('fused'))

plus ``golden``: on-hardware gradient agreement fused-vs-gather (the
interpret-mode goldens in tests/test_pallas_dcn.py, re-checked on TPU).

One op per process (CLAUDE.md tunnel rules).  Usage:
  python benchmarks/microbench_dcn_bwd.py golden|gather|pallas_gb|pallas_fb
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcvsr_tpu.ops import dcn as dcn_mod
    from fcvsr_tpu.ops.dcn import modulated_deform_conv2d

    rng = np.random.default_rng(0)
    b, h, w, c, dg = 1, args.h, args.w, args.c, args.dg
    k = 9
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    offset = jnp.asarray(rng.uniform(-1.2, 1.2, (b, h, w, dg * k * 2)),
                         jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, dg * k)), jnp.float32)
    weight = jnp.asarray(0.1 * rng.standard_normal((3, 3, c, c)), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal((c,)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    impl, bwd = {"gather": ("gather", "gather"),
                 "pallas_gb": ("pallas", "gather"),
                 "pallas_fb": ("pallas", "fused"),
                 "golden": ("pallas", "fused")}[args.op]

    # The flags stay set for the whole process (one op per process): a
    # finally-reset inside the traced loss would run at forward-trace
    # time, BEFORE the custom_vjp bwd rule is traced, silently restoring
    # the gather backward.
    dcn_mod.set_dcn_impl(impl)
    dcn_mod.set_dcn_bwd(bwd)

    def loss(xx, oo, mm, ww):
        out = modulated_deform_conv2d(xx, oo, mm, ww, bias,
                                      deform_groups=dg)
        return jnp.vdot(out, v)

    grad_fn = jax.grad(loss, (0, 1, 2, 3))

    if args.op == "golden":
        t0 = time.perf_counter()
        g_fus = [np.asarray(a) for a in jax.jit(grad_fn)(
            x, offset, mask, weight)]
        compile_s = time.perf_counter() - t0
        dcn_mod.set_dcn_impl("gather")
        dcn_mod.set_dcn_bwd("gather")
        g_ref = [np.asarray(a) for a in jax.jit(jax.grad(
            lambda *a: jnp.vdot(modulated_deform_conv2d(
                *a, bias, deform_groups=dg), v), (0, 1, 2, 3)))(
                    x, offset, mask, weight)]
        rels = [float(np.abs(gf - gr).max() / (np.abs(gr).max() + 1e-12))
                for gf, gr in zip(g_fus, g_ref)]
        print(json.dumps({"op": "golden",
                          "rel_dev": [round(r, 6) for r in rels],
                          "compile_s": round(compile_s, 1),
                          "ok": bool(max(rels) < 5e-3)}), flush=True)
        return

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_n(xv, n):
        def body(i, acc):
            gs = grad_fn(xv * (1.0 + 1e-6 * i), offset, mask, weight)
            return acc + jnp.mean(gs[0]) + jnp.mean(gs[3])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    n = args.iters
    t0 = time.perf_counter()
    val = np.asarray(run_n(x, 1))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(val)
    np.asarray(run_n(x, n))

    def timed(m):
        t0 = time.perf_counter()
        vv = np.asarray(run_n(x, m))
        assert np.isfinite(vv)
        return time.perf_counter() - t0

    base = min(timed(1) for _ in range(2))
    total = min(timed(n) for _ in range(2))
    print(json.dumps({"op": args.op,
                      "ms": round((total - base) / (n - 1) * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
