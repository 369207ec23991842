"""Modest-length FCVSR-S training on synthetic compressed clips: fused-
adjoint (--fast) vs exact gradient routing, with loss/PSNR curves.

VERDICT r3 #6: one-step gradient agreement (rel 2.7e-3) plus a 300-step
overfit on the exact path is thin evidence that the fused Pallas adjoint
kernels stay numerically healthy over a real optimization trajectory.  This
runner trains ~2k steps on deterministic synthetic compressed clips
(moving band-limited patterns, 4x area-downsampled + uint8 quantization +
light blur as the LD-compression stand-in) and logs loss + held-out PSNR,
so the two routings' curves can be compared directly (reference recipe
being approximated: fcvsr_redsLD_QP37.py:92-105, 600k iters).

Steps run in fori_loop chunks of --eval-every so the axon tunnel's ~0.3 s
dispatch latency amortizes (chunk=1 = plain python loop, used by the CPU
test).  Writes a CSV curve artifact + one summary JSON line.

Usage:
  python benchmarks/train_curve.py --mode fast|exact [--steps 2000]
      [--eval-every 100] [--cpu] [--h 64] [--w 64] [--batch 2]
      [--out benchmarks/artifacts/train_curve_<mode>.csv]
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


def synthetic_pool(n_clips, t, h, w, seed=0):
    """Deterministic learnable clips: smooth moving patterns.

    gt: (n, 1, 4h, 4w) in [0,1]; lr: (n, t, 1, h, w) — each frame is the
    gt pattern translated (linear motion), 4x area-downsampled, lightly
    blurred and uint8-quantized (compression stand-in).  The mapping
    lr->gt is consistent across clips, so PSNR can actually improve.
    """
    rng = np.random.default_rng(seed)
    gh, gw = 4 * h, 4 * w
    yy, xx = np.mgrid[0:gh, 0:gw].astype(np.float64)
    gts, lrs = [], []
    for _ in range(n_clips):
        # 4 random low-frequency plane waves
        ph = []
        for _ in range(4):
            fy, fx = rng.uniform(-3, 3, 2)
            p0 = rng.uniform(0, 2 * np.pi)
            a = rng.uniform(0.5, 1.0)
            ph.append((fy, fx, p0, a))
        vy, vx = rng.uniform(-6, 6, 2)  # gt-scale pixels/frame
        frames = []
        for k in range(t):
            dy, dx = vy * (k - t // 2), vx * (k - t // 2)
            img = np.zeros((gh, gw))
            for fy, fx, p0, a in ph:
                img += a * np.sin(2 * np.pi * (fy * (yy - dy) / gh
                                               + fx * (xx - dx) / gw) + p0)
            img = (img - img.min()) / (np.ptp(img) + 1e-9)
            small = img.reshape(h, 4, w, 4).mean((1, 3))  # 4x area down
            blur = small.copy()
            blur[1:-1] = 0.25 * small[:-2] + 0.5 * small[1:-1] \
                + 0.25 * small[2:]
            q = np.round(blur * 255.0) / 255.0  # uint8 quantization
            frames.append(q)
        img = np.zeros((gh, gw))
        for fy, fx, p0, a in ph:
            img += a * np.sin(2 * np.pi * (fy * yy / gh + fx * xx / gw) + p0)
        img = (img - img.min()) / (np.ptp(img) + 1e-9)
        gts.append(img[None].astype(np.float32))
        lrs.append(np.stack(frames)[:, None].astype(np.float32))
    return np.stack(lrs), np.stack(gts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fast", "exact"], required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fcvsr_tpu.models import FCVSRNet
    from fcvsr_tpu.train import cosine_restart, create_train_state, \
        make_train_step

    if args.mode == "fast":
        from fcvsr_tpu.ops.sac import set_iac_bwd
        set_iac_bwd("fused")
        model = FCVSRNet.small(in_channels=1, warp_impl="pallas")
    else:
        model = FCVSRNet.small(in_channels=1)

    t = 7
    lrs, gts = synthetic_pool(args.clips + 1, t, args.h, args.w, args.seed)
    # last clip held out for PSNR
    ev_lr = jnp.asarray(lrs[-1:])
    ev_gt = jnp.asarray(gts[-1:])
    pool_lr = jnp.asarray(lrs[:-1])
    pool_gt = jnp.asarray(gts[:-1])
    n_pool = args.clips

    x0 = pool_lr[: args.batch]
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), x0,
        cosine_restart(args.lr, [600000], [1.0]))
    step = make_train_step(model, "charbonnier_mean", donate=False)

    def batch_at(i):
        idx = (i * args.batch + jnp.arange(args.batch)) % n_pool
        return pool_lr[idx], pool_gt[idx]

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_chunk(s0, i0, k):
        def body(j, carry):
            s, acc = carry
            bx, bg = batch_at(i0 + j)
            s2, metrics = step(s, bx, bg)
            return s2, acc + metrics["loss"]
        s, acc = jax.lax.fori_loop(0, k, body, (s0, jnp.float32(0)))
        return s, acc / k

    @jax.jit
    def eval_psnr(p):
        sr = model.apply(p, ev_lr)
        mse = jnp.mean((sr - ev_gt) ** 2)
        return -10.0 * jnp.log10(mse + 1e-12)

    chunk = max(1, args.eval_every)
    rows = []
    t_start = time.perf_counter()
    i = 0
    p0 = float(np.asarray(eval_psnr(state.params)))
    rows.append((0, float("nan"), p0, 0.0, 0))
    print(f"step 0  psnr {p0:.3f}", flush=True)
    while i < args.steps:
        k = min(chunk, args.steps - i)
        t0 = time.perf_counter()
        state, loss = run_chunk(state, jnp.int32(i), k)
        loss = float(np.asarray(loss))
        dt = time.perf_counter() - t0
        i += k
        psnr = float(np.asarray(eval_psnr(state.params)))
        rows.append((i, loss, psnr, dt, k))
        print(f"step {i}  loss {loss:.5f}  psnr {psnr:.3f}  "
              f"({dt / k * 1e3:.1f} ms/step incl dispatch)", flush=True)

    total_s = time.perf_counter() - t_start
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"train_curve_{args.mode}.csv")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("step,loss,psnr,chunk_secs,chunk_steps\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")

    # steady-state ms/step from the last half of the chunks; divide by the
    # ACTUAL steps run per chunk (the final chunk may hold fewer than
    # eval_every steps when steps % eval_every != 0 — ADVICE r4)
    half = [r for r in rows[1:] if r[0] > args.steps // 2]
    ms_step = (sum(r[3] for r in half)
               / max(sum(r[4] for r in half), 1) * 1e3)
    print(json.dumps({
        "mode": args.mode, "steps": args.steps,
        "final_loss": round(rows[-1][1], 6),
        "final_psnr": round(rows[-1][2], 3),
        "psnr_gain_db": round(rows[-1][2] - p0, 3),
        "ms_per_step_steady": round(ms_step, 2),
        "total_secs": round(total_s, 1), "curve": out_path}), flush=True)


if __name__ == "__main__":
    main()
