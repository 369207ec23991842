"""One-hot-einsum flow-warp experiment (VERDICT r2 item 2) — closure record.

The corr_lookup 8x win came from converting small-index gathers into
one-hot einsums that ride the MXU.  The suggestion was to do the same for
``flow_warp`` as "two one-hot-weighted contractions (row pass, column
pass)".  This script builds that variant and characterizes it:

1. EXACTNESS: true bilinear warp is NOT separable for spatially varying
   flow.  out(y,x) samples I at (y+dy(y,x), x+dx(y,x)); a vertical pass
   computed per column X uses dy(y,X), but the horizontal pass then needs
   the vertical interpolation at the OUTPUT pixel's dy(y,x).  The two are
   equal only when dy is constant along rows (and symmetrically dx along
   columns).  So 'onehot' can never be wired into the parity path — the
   gather stays the exact implementation and the fused Pallas kernel
   (ops/pallas_iac.py, on-hardware since round 3) the fast one.

2. SPEED: the one-hot weight tensors are (B, W, H, H) + (B, H, W, W) —
   ~390 MB at the bench shape.  Materializing them costs more HBM traffic
   than the gather it replaces, so even the MXU-riding contraction loses.

Run on TPU: python benchmarks/microbench_onehot.py [--cpu]
Prints one JSON line per measurement (gather vs onehot ms + max devs).
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


def flow_warp_onehot(x, flow):
    """Separable 'row pass, column pass' one-hot warp (APPROXIMATE —
    exact only for flows whose dy is x-independent and dx y-independent)."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = x.shape
    gy = jnp.arange(h, dtype=x.dtype)
    gx = jnp.arange(w, dtype=x.dtype)
    py = gy[None, :, None] + flow[..., 1]          # (B, H, W)
    px = gx[None, None, :] + flow[..., 0]          # (B, H, W)

    # vertical pass, batched over columns: Av (B, W, Hout, Hsrc) 2-sparse
    py_c = jnp.clip(py, -1.0, h + 0.0)
    y0 = jnp.floor(py_c)
    fy = py_c - y0
    src_rows = jnp.arange(h, dtype=x.dtype)
    pyT = jnp.transpose(py_c, (0, 2, 1))           # (B, W, Hout)
    y0T = jnp.transpose(y0, (0, 2, 1))
    fyT = jnp.transpose(fy, (0, 2, 1))
    Av = (jnp.where(y0T[..., None] == src_rows, 1.0 - fyT[..., None], 0.0)
          + jnp.where(y0T[..., None] + 1 == src_rows, fyT[..., None], 0.0))
    xT = jnp.transpose(x, (0, 2, 1, 3))            # (B, W, Hsrc, C)
    v = jnp.einsum("bwyY,bwYc->bwyc", Av, xT)      # (B, W, Hout, C)
    v = jnp.transpose(v, (0, 2, 1, 3))             # (B, Hout, W, C)

    # horizontal pass, batched over rows: Ah (B, H, Wout, Wsrc)
    px_c = jnp.clip(px, -1.0, w + 0.0)
    x0 = jnp.floor(px_c)
    fx = px_c - x0
    src_cols = jnp.arange(w, dtype=x.dtype)
    Ah = (jnp.where(x0[..., None] == src_cols, 1.0 - fx[..., None], 0.0)
          + jnp.where(x0[..., None] + 1 == src_cols, fx[..., None], 0.0))
    return jnp.einsum("bhxX,bhXc->bhxc", Ah, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--h", type=int, default=272)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcvsr_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(0)
    h, w, c = args.h, args.w, args.c
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)

    # correctness characterization (small shapes, CPU-ok semantics)
    flows = {
        "row_const_dy": jnp.broadcast_to(
            jnp.stack([jnp.zeros(h), jnp.linspace(-2, 2, h)], -1)[None, :, None, :],
            (1, h, w, 2)).astype(jnp.float32) * 1.0,
        "spatially_varying": jnp.asarray(
            rng.uniform(-2, 2, (1, h, w, 2)), jnp.float32),
    }
    for name, fl in flows.items():
        # 'zeros' padding comparison only in-range: keep flows small & interior
        ref = flow_warp(x, fl)
        got = flow_warp_onehot(x, fl)
        interior = (slice(None), slice(4, h - 4), slice(4, w - 4), slice(None))
        dev = float(jnp.max(jnp.abs(ref[interior] - got[interior])))
        print(json.dumps({"flow": name, "max_dev_interior": dev}), flush=True)

    flow = flows["spatially_varying"]
    for name, fn in (("gather", lambda v: flow_warp(v, flow)),
                     ("onehot", lambda v: flow_warp_onehot(v, flow))):
        @functools.partial(jax.jit, static_argnums=(1,))
        def run_n(v, k, fn=fn):
            def body(i, acc):
                return acc + jnp.mean(fn(v * (1.0 + 1e-6 * i)))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        n = args.iters
        t0 = time.perf_counter()
        np.asarray(run_n(x, 1))
        compile_s = time.perf_counter() - t0
        np.asarray(run_n(x, n))

        def timed(k):
            t0 = time.perf_counter()
            val = np.asarray(run_n(x, k))
            assert np.isfinite(val)
            return time.perf_counter() - t0

        base = min(timed(1) for _ in range(2))
        total = min(timed(n) for _ in range(2))
        ms = (total - base) / (n - 1) * 1e3
        print(json.dumps({"op": f"warp_{name}", "ms": round(ms, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
