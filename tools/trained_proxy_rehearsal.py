"""Trained-proxy rehearsal for released-checkpoint PSNR parity (VERDICT r4 #6).

The reference's released FCVSR weights are Baidu-pan-only and this
environment has zero egress, so the real ≤0.01 dB comparison
(BASELINE.md; ckpt table `/root/reference/CVSR_train/test_LD_freqCVSR.py:
179-184`) cannot be executed.  This tool exercises the *identical*
machinery on the strongest available proxy: a torch-side FCVSR-S
(`tests/torch_mirror.py`, reference state_dict keys) **trained for N
steps** on synthetic clips — not random weights — then

1. saved with ``torch.save(model.state_dict())`` exactly as CVSR_train
   releases weights,
2. evaluated torch-side with the same sliding-window loop + MATLAB-Y PSNR
   that ``test.py::evaluate_sequence`` uses (the shared pieces — dataset
   iterator, padding, metric — are imported; only the model forward is
   torch), and
3. fed through ``tools/validate_released_ckpt.py`` (torch.load -> key
   conversion -> full JAX eval CLI) with ``--expected-psnr`` set to the
   torch-side number and the real ≤0.01 dB tolerance.

A PASS means the converter + eval + threshold machinery reproduces a
*trained* torch model's evaluated PSNR within the release tolerance — the
whole pipeline short of the unreachable weights file.

Usage:
    python tools/trained_proxy_rehearsal.py [--steps 300] [--seed 0]
        [--tolerance 0.01] [--lr-size 24,32] [--frames 10] [--seqs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_clips(root: str, rng: np.random.Generator, n_seqs: int,
                n_frames: int, lh: int, lw: int) -> None:
    """Synthetic paired clips: smooth drifting GT, LR = exact 4x4 area mean.

    Smooth content + a learnable downsample relation make N training steps
    actually move PSNR (the rehearsal must run on a non-trivial model).
    """
    from PIL import Image

    for s in range(n_seqs):
        lr_dir = os.path.join(root, "lr", f"seq_{s}")
        gt_dir = os.path.join(root, "gt", f"seq_{s}")
        os.makedirs(lr_dir), os.makedirs(gt_dir)
        base = rng.uniform(0, 255, (lh + 8, lw + 8, 3)).astype(np.float32)
        # band-limit by box-blurring the random field a few times
        for _ in range(3):
            base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                    + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5.0
        for i in range(n_frames):
            crop = base[i % 4: i % 4 + lh, i % 3: i % 3 + lw]
            gt = np.kron(crop, np.ones((4, 4, 1), np.float32))
            gt += rng.uniform(-3, 3, gt.shape).astype(np.float32)
            gt = np.clip(gt, 0, 255)
            lr = gt.reshape(lh, 4, lw, 4, 3).mean((1, 3))
            Image.fromarray(gt.astype(np.uint8)).save(
                os.path.join(gt_dir, f"{i:08d}.png"))
            Image.fromarray(lr.astype(np.uint8)).save(
                os.path.join(lr_dir, f"{i:08d}.png"))


def train_mirror(mirror, ds, rng: np.random.Generator, steps: int,
                 lr_patch: int, batch: int, lr: float = 1e-4):
    """Adam + Charbonnier(mean) on random crops — the mmedit REDS recipe
    shape (utils/config.py reds branch) at proxy scale."""
    import torch

    opt = torch.optim.Adam(mirror.parameters(), lr=lr)
    mirror.train()
    first = last = None
    for it in range(steps):
        xs, ys = [], []
        for _ in range(batch):
            x, y = ds.sample_train_window(rng, lr_patch=lr_patch)
            xs.append(np.transpose(x, (0, 3, 1, 2)))
            ys.append(np.transpose(y, (2, 0, 1)))
        xb = torch.from_numpy(np.stack(xs))
        yb = torch.from_numpy(np.stack(ys))
        opt.zero_grad()
        sr = mirror(xb)
        loss = torch.sqrt((sr - yb) ** 2 + 1e-12).mean()
        loss.backward()
        opt.step()
        lval = float(loss.detach())
        if first is None:
            first = lval
        last = lval
        if it % 50 == 0:
            print(f"  torch step {it}: loss {lval:.5f}", flush=True)
    return first, last


def torch_eval_psnr(mirror, ds, seqs, convert_to="Y") -> float:
    """test.py::evaluate_sequence with the model forward swapped to torch —
    same window iterator, same pad_to_multiple, same MATLAB-Y PSNR."""
    import torch

    import test as test_cli
    from fcvsr_tpu.metrics import calculate_psnr

    mirror.eval()
    psnrs = []
    for seq in seqs:
        for _i, window, gt in ds.iter_test_windows(seq):
            window, (h, w) = test_cli.pad_to_multiple(window)
            x = torch.from_numpy(np.transpose(
                window.astype(np.float32) / 255.0, (0, 3, 1, 2))[None])
            with torch.no_grad():
                sr = mirror(x)[0].numpy()
            sr = np.transpose(sr, (1, 2, 0))[: h * 4, : w * 4]
            sr255 = np.clip(sr * 255.0, 0, 255)
            conv = convert_to if sr255.shape[-1] == 3 else None
            psnrs.append(calculate_psnr(sr255, gt.astype(np.float32), 0,
                                        conv, "rgb"))
    return float(np.mean(psnrs))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tolerance", type=float, default=0.01)
    ap.add_argument("--lr-size", default="24,32")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--lr-patch", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args(argv)

    import torch

    from fcvsr_tpu.data import ClipFolderDataset
    from tests.torch_mirror import FCVSRTorchMirror

    lh, lw = (int(v) for v in args.lr_size.split(","))
    rng = np.random.default_rng(args.seed)
    torch.manual_seed(args.seed)

    with tempfile.TemporaryDirectory() as td:
        build_clips(td, rng, args.seqs, args.frames, lh, lw)
        lr_root, gt_root = os.path.join(td, "lr"), os.path.join(td, "gt")
        ds = ClipFolderDataset(lr_root=lr_root, gt_root=gt_root, window=7,
                               grayscale=False, padding="replicate")

        # S-width RGB mirror == the fcvsr_s_redsLD_QP37 preset topology
        mirror = FCVSRTorchMirror(ac_num=3, freq_inv=4, sc_groups=4,
                                  up_ksize=1, in_channels=3)
        t0 = time.perf_counter()
        loss0, loss1 = train_mirror(mirror, ds, rng, args.steps,
                                    args.lr_patch, args.batch)
        train_s = time.perf_counter() - t0
        print(f"torch-trained {args.steps} steps in {train_s:.0f}s: "
              f"loss {loss0:.5f} -> {loss1:.5f}", flush=True)

        pth = os.path.join(td, "FCVSR_S_trained_proxy.pth")
        torch.save(mirror.state_dict(), pth)

        expected = torch_eval_psnr(mirror, ds, [f"seq_{i}"
                                                for i in range(args.seqs)])
        print(f"torch-side eval PSNR: {expected:.4f} dB", flush=True)

        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "validate_released_ckpt",
            os.path.join(REPO, "tools", "validate_released_ckpt.py"))
        tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tool)
        rc = tool.main([pth, "--preset", "fcvsr_s_redsLD_QP37",
                        "--lr-root", lr_root, "--gt-root", gt_root,
                        "--expected-psnr", f"{expected:.6f}",
                        "--tolerance", str(args.tolerance)])

    out = {"trained_proxy_rehearsal": {
        "steps": args.steps, "torch_loss_first": round(loss0, 5),
        "torch_loss_last": round(loss1, 5),
        "torch_psnr_db": round(expected, 4), "tolerance_db": args.tolerance,
        "parity_rc": rc, "pass": rc == 0}}
    print(json.dumps(out), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
