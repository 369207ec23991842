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
                 # bf16-storage model flags under training (VERDICT r4 #7
                 # bf16 sweep: 'train-step compute dtype' row) — the same
                 # deployment dtypes the --fast inference path uses, all
                 # differentiable (flax dtype casts + rows_bf16 custom_vjp)
                 "gather_bf16": ("gather", "gather"),
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

    if args.op == "gather_bf16":
        model = FCVSRNet.small(in_channels=1, warp_impl=impl,
                               scnet_impl="rows_bf16", head_dtype="bf16",
                               mffr_dtype="bf16")
    else:
        model = FCVSRNet.small(in_channels=1, warp_impl=impl)
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               cosine_restart(2e-4, [600000], [1.0]))

    if args.op == "golden":
        # SAME-FORWARD comparison: the fused primal is held fixed and only
        # the backward routing varies (fused adjoint kernels vs the exact
        # gather-path VJP on the identical primal).  Identical primal ->
        # identical lrelu masks -> the two VJPs must agree to
        # fp-accumulation noise if the adjoints are correct.  Comparing
        # across warp_impl='pallas' vs 'gather' FORWARDS instead measures
        # fp-different-primal amplification through 36 chained iterations
        # (lrelu mask flips; measured 29% rel dev on TPU) — a property of
        # the model, not of the kernels.  A spy asserts the fused VJP
        # actually executed (see the flag-scoping trap in CLAUDE.md).
        import jax.tree_util as jtu

        import fcvsr_tpu.ops.pallas_iac as piac
        from fcvsr_tpu.train.trainer import charbonnier

        def loss(p):
            return charbonnier(model.apply(p, x), gt)

        calls = {"n": 0}
        orig = piac.iac_fused_vjp

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        sac_mod.set_iac_bwd("fused")
        piac.iac_fused_vjp = spy
        t0 = time.perf_counter()
        try:
            g_fus = jtu.tree_map(np.asarray,
                                 jax.jit(jax.grad(loss))(state.params))
        finally:
            piac.iac_fused_vjp = orig
        compile_s = time.perf_counter() - t0
        assert calls["n"] >= 1, "fused IAC VJP was never traced"

        sac_mod.set_iac_bwd("gather")
        jax.clear_caches()
        g_ref = jtu.tree_map(np.asarray,
                             jax.jit(jax.grad(loss))(state.params))
        rels = jtu.tree_map(
            lambda a, bb: float(np.abs(a - bb).max()
                                / (np.abs(bb).max() + 1e-12)), g_fus, g_ref)
        worst = max(jtu.tree_leaves(rels))
        print(json.dumps({"op": "golden", "worst_rel_dev": round(worst, 6),
                          "compile_s": round(compile_s, 1),
                          "ok": bool(worst < 2e-2)}), flush=True)
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
