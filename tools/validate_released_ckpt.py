"""One-command PSNR-parity validation against a released reference checkpoint.

The reference distributes trained FCVSR weights via Baidu pan only
(`/root/reference/README.md`), which is unreachable from this zero-egress
environment — so end-to-end *metric* parity (the ≤0.01 dB target,
`/root/reference/CVSR_train/test_LD_freqCVSR.py:179-184`, BASELINE.md) has
never been run, even though forward-pass parity is proven at 2.4e-7
(`tests/test_parity_torch.py`) and the key converter round-trips every model
width (`tests/test_checkpoint_roundtrip.py`).

This tool closes the gap the moment a weights file appears: point it at the
`.pth` (torch) or `.npz` checkpoint plus the REDS4/CVCP10 LD-compressed
clips and it runs the full TPU eval pipeline and prints the PSNR/SSIM/tOF
table, optionally asserting the ≤ tolerance delta against an expected value.

Usage:
    python tools/validate_released_ckpt.py FCVSR_REDS_LD37.pth \
        --lr-root /data/REDS4_LD37/lr --gt-root /data/REDS4/gt \
        [--preset fcvsr_redsLD_QP37] [--expected-psnr 30.51]
        [--tolerance 0.01] [--seqs 000,011,015,020] [--fast]

Accepted weight containers: a raw ``state_dict`` (``torch.save(model.
state_dict())``, the CVSR_train release format), an mmedit checkpoint dict
(``{'state_dict': ..., 'meta': ...}``, ``generator.``-prefixed keys — the
converter strips the prefix), or an ``.npz`` of numpy arrays with the same
key namespace.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_state_dict(path: str) -> dict:
    """Weights file -> flat {torch_key: np.ndarray} dict."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # mmedit checkpoints wrap the weights; CVSR_train saves the bare dict
    for wrapper in ("state_dict", "model", "params"):
        if isinstance(obj, dict) and wrapper in obj \
                and isinstance(obj[wrapper], dict):
            obj = obj[wrapper]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="validate a released reference checkpoint on TPU")
    ap.add_argument("weights", help=".pth/.pt torch checkpoint or .npz")
    ap.add_argument("--preset", default="fcvsr_redsLD_QP37")
    ap.add_argument("--lr-root", required=True)
    ap.add_argument("--gt-root", required=True)
    ap.add_argument("--seqs", default="",
                    help="comma-separated sequence subset (default: all)")
    ap.add_argument("--expected-psnr", type=float, default=None,
                    help="reference-side PSNR to compare against")
    ap.add_argument("--tolerance", type=float, default=0.01,
                    help="max |delta| dB for a PASS (BASELINE.md target)")
    ap.add_argument("--save-dir", default="")
    ap.add_argument("--fast", action="store_true",
                    help="deployment path (fused Pallas kernels, bf16 "
                         "storage) — NOT for the ≤0.01 dB check; the exact "
                         "path is the parity surface")
    args = ap.parse_args(argv)

    if not os.path.exists(args.weights):
        print(f"weights file not found: {args.weights}\n"
              "The reference releases them via Baidu pan only "
              "(QZ1-boy/FCVSR README); download out-of-band, then re-run. "
              "Either the raw CVSR_train state_dict (.pth) or an mmedit "
              "checkpoint works.", file=sys.stderr)
        return 2

    state = load_state_dict(args.weights)
    print(f"loaded {len(state)} tensors from {args.weights}", flush=True)

    import test as test_cli

    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "weights.npz")
        np.savez(npz, **state)
        cli = ["--preset", args.preset, "--torch-checkpoint", npz,
               "--lr-root", args.lr_root, "--gt-root", args.gt_root]
        if args.seqs:
            cli += ["--seqs", args.seqs]
        if args.save_dir:
            cli += ["--save-dir", args.save_dir]
        if args.fast:
            cli += ["--fast"]
        summary = test_cli.main(cli)

    psnr = summary["average"]["psnr"]
    verdict = {"psnr": round(psnr, 4)}
    if args.expected_psnr is not None:
        delta = psnr - args.expected_psnr
        verdict.update(expected=args.expected_psnr, delta_db=round(delta, 4),
                       tolerance=args.tolerance,
                       parity=bool(abs(delta) <= args.tolerance))
        print(json.dumps({"checkpoint_validation": verdict}))
        return 0 if verdict["parity"] else 1
    print(json.dumps({"checkpoint_validation": verdict}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
