"""FCVSR-S train-step timing under the three IAC gradient routings.

  gather     exact gather warp, autodiff backward (the training default;
             bench.py fcvsr_s_train_step_ms — 28.9 ms r3 @64px b2)
  pallas_gb  fused IAC forward + gather-path VJP (re-runs the gather
             forward; measured 31.3 ms r3 — why --fast keeps the exact
             warp for FCVSR)
  pallas_fb  fused IAC forward + fused adjoint kernels
             (set_iac_bwd('fused') — the train.py --warp-impl pallas
             routing)

plus ``golden``: one-step gradient agreement pallas_fb-vs-gather on TPU.

One op per process (CLAUDE.md tunnel rules).  Usage:
  python benchmarks/microbench_train_fast.py gather|pallas_gb|pallas_fb|golden
"""

from __future__ import annotations

import argparse
import functools
import importlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("op")
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcvsr_tpu.models import FCVSRNet
    from fcvsr_tpu.train import cosine_restart, create_train_state, \
        make_train_step

    sac_mod = importlib.import_module("fcvsr_tpu.ops.sac")

    impl, bwd = {"gather": ("gather", "gather"),
                 "pallas_gb": ("pallas", "gather"),
                 "pallas_fb": ("pallas", "fused"),
                 "golden": ("pallas", "fused")}[args.op]
    # flags stay set for the whole process: the custom_vjp bwd rule reads
    # them at ITS trace time, after the forward trace returns
    sac_mod.set_iac_bwd(bwd)

    rng = np.random.default_rng(0)
    b, h, w = args.batch, args.h, args.w
    x = jnp.asarray(rng.uniform(0, 1, (b, 7, 1, h, w)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (b, 1, 4 * h, 4 * w)), jnp.float32)

    model = FCVSRNet.small(in_channels=1, warp_impl=impl)
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               cosine_restart(2e-4, [600000], [1.0]))

    if args.op == "golden":
        import jax.tree_util as jtu

        from fcvsr_tpu.train.trainer import charbonnier

        def loss_fn(m):
            def f(p):
                return charbonnier(m.apply(p, x), gt)
            return f

        ref_model = FCVSRNet.small(in_channels=1, warp_impl="gather")
        t0 = time.perf_counter()
        g_fus = jax.jit(jax.grad(loss_fn(model)))(state.params)
        g_fus = jtu.tree_map(np.asarray, g_fus)
        compile_s = time.perf_counter() - t0
        sac_mod.set_iac_bwd("gather")
        g_ref = jtu.tree_map(np.asarray, jax.jit(
            jax.grad(loss_fn(ref_model)))(state.params))
        # Flip-aware metrics: lrelu mask flips between the fp-different
        # forwards (fused vs gather) give sparse O(1) element deviations
        # that are valid subgradient disagreements, not bugs (see
        # tests/test_pallas_iac.py::test_iac_fused_bwd_chain_flip_aware —
        # the op-level composed golden is the strict check).  A wiring bug
        # (wrong routing/layout/iteration) deviates densely and tanks the
        # cosine; flips keep cosine ~1 and the deviating fraction tiny.
        rels = jtu.tree_map(
            lambda a, bb: float(np.abs(a - bb).max()
                                / (np.abs(bb).max() + 1e-12)), g_fus, g_ref)
        worst = max(jtu.tree_leaves(rels))

        def cos(a, bb):
            na = float(np.linalg.norm(a.ravel()))
            nb = float(np.linalg.norm(bb.ravel()))
            if na == 0.0 and nb == 0.0:
                return 1.0
            return float(np.vdot(a.ravel(), bb.ravel()) / (na * nb + 1e-30))

        def frac(a, bb):
            sc = np.abs(bb).max() + 1e-12
            return float((np.abs(a - bb) > 1e-3 * sc).mean())

        worst_cos = min(jtu.tree_leaves(jtu.tree_map(cos, g_fus, g_ref)))
        worst_frac = max(jtu.tree_leaves(jtu.tree_map(frac, g_fus, g_ref)))
        ok = worst < 2e-2 or (worst_cos > 0.999 and worst_frac < 1e-3)
        print(json.dumps({"op": "golden", "worst_rel_dev": round(worst, 6),
                          "worst_cos": round(worst_cos, 6),
                          "worst_dev_frac": round(worst_frac, 6),
                          "compile_s": round(compile_s, 1),
                          "ok": bool(ok)}), flush=True)
        return

    step = make_train_step(model, "charbonnier_mean", donate=False)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_n(s0, n):
        def body(i, s):
            s2, _ = step(s, x * (1.0 + 1e-6 * i), gt)
            return s2
        leaves = jax.tree_util.tree_leaves(
            jax.lax.fori_loop(0, n, body, s0).params)
        return leaves[0].ravel()[0]

    n = args.iters
    t0 = time.perf_counter()
    v = np.asarray(run_n(state, 1))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v)
    np.asarray(run_n(state, n))

    def timed(m):
        t0 = time.perf_counter()
        vv = np.asarray(run_n(state, m))
        assert np.isfinite(vv)
        return time.perf_counter() - t0

    base = min(timed(1) for _ in range(2))
    total = min(timed(n) for _ in range(2))
    print(json.dumps({"op": args.op,
                      "ms": round((total - base) / (n - 1) * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
