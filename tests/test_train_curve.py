"""Fused-adjoint vs exact training-trajectory agreement (VERDICT r3 #6).

Runs benchmarks/train_curve.py's machinery for a short trajectory in both
gradient routings on the CPU mesh (fused kernels in interpret mode) and
asserts the loss/PSNR curves track: not just one-step gradient deltas, but
N optimizer steps of accumulated divergence stay within noise.  The
TPU-scale 2k-step run is benchmarks/artifacts/train_curve_{fast,exact}.csv.
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_mode(mode, tmp_path, steps=12):
    out = tmp_path / f"curve_{mode}.csv"
    # own process: set_iac_bwd routing is process-global state
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "train_curve.py"),
         "--mode", mode, "--steps", str(steps), "--eval-every", "4",
         "--h", "16", "--w", "16", "--batch", "2", "--clips", "4",
         "--cpu", "--out", str(out)],
        capture_output=True, text=True, timeout=1500, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    rows = [l.split(",") for l in out.read_text().splitlines()[1:]]
    return summary, rows


@pytest.mark.slow
def test_fast_and_exact_curves_track(tmp_path):
    s_fast, r_fast = _run_mode("fast", tmp_path)
    s_exact, r_exact = _run_mode("exact", tmp_path)

    # both optimize (PSNR above the step-0 value)
    assert s_fast["psnr_gain_db"] > 0.2
    assert s_exact["psnr_gain_db"] > 0.2
    # trajectories agree within noise: final PSNR within 0.5 dB and
    # per-chunk losses within 10% relative
    assert abs(s_fast["final_psnr"] - s_exact["final_psnr"]) < 0.5
    for (sa, la, *_), (sb, lb, *_) in zip(r_fast[1:], r_exact[1:]):
        la, lb = float(la), float(lb)
        assert abs(la - lb) / max(abs(lb), 1e-6) < 0.1, (sa, la, lb)
