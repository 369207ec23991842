"""VMAF via ffmpeg libvmaf (gated subprocess).

The reference shells out to ``ffmpeg -filter_complex libvmaf`` over PNG frame
directories (CVSR_train/test_LD_freqCVSR.py:118-133).  This environment has
no ffmpeg, so the wrapper probes for the binary and raises a clear error
when absent; when present it reproduces the reference invocation.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

__all__ = ["ffmpeg_available", "calculate_vmaf"]


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def calculate_vmaf(dist_dir: str, ref_dir: str, width: int, height: int,
                   fps: int = 25, pattern: str = "%08d.png") -> float:
    """Mean VMAF of the PNG sequence in ``dist_dir`` against ``ref_dir``."""
    if not ffmpeg_available():
        raise RuntimeError(
            "ffmpeg with libvmaf is required for VMAF but was not found on "
            "PATH; install ffmpeg or skip the VMAF metric.")
    with tempfile.TemporaryDirectory() as tmp:
        log = os.path.join(tmp, "vmaf.json")
        cmd = [
            "ffmpeg", "-nostdin", "-r", str(fps),
            "-i", os.path.join(dist_dir, pattern),
            "-r", str(fps), "-i", os.path.join(ref_dir, pattern),
            "-filter_complex",
            f"libvmaf=log_fmt=json:log_path={log}",
            "-f", "null", "-",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(log) as f:
            data = json.load(f)
        return float(data["pooled_metrics"]["vmaf"]["mean"])
