"""Argv-level VMAF tests (VERDICT r4 #9).

ffmpeg is absent from this image, so the first real VMAF run must not also
be the first test: these mock the subprocess layer and assert the EXACT
ffmpeg command lines and score parsing — the JSON-log path for the native
wrapper, and the reference's three-command mkv + 'VMAF score:' stdout
scrape (CVSR_train/test_LD_freqCVSR.py:118-133) for the parity wrapper.
No jax involved.
"""

import json
import subprocess

import pytest

from fcvsr_tpu.metrics.vmaf import (calculate_vmaf, calculate_vmaf_reference,
                                    ffmpeg_available)

CANNED_LOG = {
    "version": "2.3.1",
    "frames": [{"frameNum": 0, "metrics": {"vmaf": 91.2}},
               {"frameNum": 1, "metrics": {"vmaf": 95.4}}],
    "pooled_metrics": {"vmaf": {"min": 91.2, "max": 95.4, "mean": 93.3,
                                "harmonic_mean": 93.27}},
}


def test_calculate_vmaf_argv_and_json_parse():
    calls = []

    def fake_run(cmd, check=False, capture_output=False):
        calls.append(cmd)
        # the log path lives inside the filter_complex string
        filt = cmd[cmd.index("-filter_complex") + 1]
        log_path = filt.split("log_path=")[1]
        with open(log_path, "w") as f:
            json.dump(CANNED_LOG, f)
        return subprocess.CompletedProcess(cmd, 0, b"", b"")

    score = calculate_vmaf("/d/dist", "/d/ref", width=480, height=272,
                           fps=25, _run=fake_run)
    assert score == pytest.approx(93.3)
    assert len(calls) == 1
    cmd = calls[0]
    assert cmd[:6] == ["ffmpeg", "-nostdin", "-r", "25", "-i",
                       "/d/dist/%08d.png"]
    assert cmd[6:10] == ["-r", "25", "-i", "/d/ref/%08d.png"]
    assert cmd[10] == "-filter_complex"
    assert cmd[11].startswith("libvmaf=log_fmt=json:log_path=")
    assert cmd[12:] == ["-f", "null", "-"]


def test_calculate_vmaf_reference_three_commands():
    runs, popens = [], []

    def fake_run(cmd, cwd=None, **kw):
        runs.append((cmd, cwd))
        return subprocess.CompletedProcess(cmd, 0)

    class FakePopen:
        def __init__(self, cmd, stdout=None, stderr=None):
            popens.append((cmd, stdout, stderr))

        def communicate(self):
            # reference scrapes exactly 8 chars after the marker from the
            # merged stdout+stderr stream
            return (b"[libvmaf @ 0x55] VMAF score: 93.32175\n", None)

    score = calculate_vmaf_reference(
        "/res/seq", "/gt/seq", "/res/vid/seq.mkv", "/gt/vid/seq.mkv",
        _run=fake_run, _popen=FakePopen)
    assert score == pytest.approx(93.32175)
    # two packing passes, each run WITH cwd set to the frame directory
    # (the reference passes a bare %05d.png pattern relative to cwd)
    pack = ["ffmpeg", "-loglevel", "quiet", "-y", "-framerate", "10",
            "-i", "%05d.png", "-c:v", "copy"]
    assert runs == [(pack + ["/res/vid/seq.mkv"], "/res/seq"),
                    (pack + ["/gt/vid/seq.mkv"], "/gt/seq")]
    # one scoring pass: dist first, ref second, stderr merged into stdout
    cmd, out, err = popens[0]
    assert cmd == ["ffmpeg", "-loglevel", "info", "-i", "/res/vid/seq.mkv",
                   "-i", "/gt/vid/seq.mkv", "-filter_complex", "libvmaf",
                   "-f", "null", "-"]
    assert out is subprocess.PIPE and err is subprocess.STDOUT


def test_calculate_vmaf_reference_no_score_raises():
    def fake_run(cmd, cwd=None, **kw):
        return subprocess.CompletedProcess(cmd, 0)

    class FakePopen:
        def __init__(self, *a, **kw):
            pass

        def communicate(self):
            return (b"ffmpeg exploded before libvmaf ran\n", None)

    with pytest.raises(RuntimeError, match="VMAF score"):
        calculate_vmaf_reference("/a", "/b", "/a.mkv", "/b.mkv",
                                 _run=fake_run, _popen=FakePopen)


def test_missing_ffmpeg_raises_cleanly():
    if ffmpeg_available():  # pragma: no cover — not in this image
        pytest.skip("ffmpeg present; gate not exercisable")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        calculate_vmaf("/d/dist", "/d/ref", width=8, height=8)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        calculate_vmaf_reference("/a", "/b", "/a.mkv", "/b.mkv")
