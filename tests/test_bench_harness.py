"""bench.py capture-contract tests (VERDICT r3 #1: results must be
un-losable).  The TPU workers are stubbed out — this validates the harness
plumbing only: incremental banking, budget stop, failed-rung skip, and the
SIGTERM final-emit path.  No jax involved."""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FAKE_PROBE = "print('DOT_OK', 0.1, 1.0, flush=True)\n"


def _run_main(bench, monkeypatch, capsys, attempts, worker, argv=(),
              outdir=None):
    monkeypatch.setattr(bench, "ATTEMPTS", attempts)
    monkeypatch.setattr(bench, "_PROBE", FAKE_PROBE)
    monkeypatch.setattr(bench, "_WORKER", worker)
    if outdir is not None:  # never clobber the repo's real banked capture
        monkeypatch.setenv("BENCH_OUT_DIR", str(outdir))
    monkeypatch.setattr(sys, "argv", ["bench.py", *argv])
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    return [json.loads(l) for l in lines]


def test_incremental_banking_and_failed_rung_skip(monkeypatch, capsys,
                                                  tmp_path):
    bench = _load_bench()
    # rung 1 succeeds, rung 2 crashes, rung 3 succeeds: the failure must
    # not kill the ladder (dot re-probe passes) and every completion must
    # appear in a cumulative printed JSON line.
    worker = textwrap.dedent("""
        import sys
        name = sys.argv[2]
        if name == "boom":
            sys.exit("kernel exploded")
        print("FPS_RESULT", 5.0 if name == "a" else 7.5, flush=True)
    """)
    attempts = [
        ("rung_a", "fps", "a", 8, 8, 1, 60),
        ("rung_b", "fps", "boom", 8, 8, 1, 60),
        ("rung_c", "fps", "c", 8, 8, 1, 60),
    ]
    outs = _run_main(bench, monkeypatch, capsys, attempts, worker,
                     outdir=tmp_path)
    final = outs[-1]
    assert final["all"] == {"rung_a": 5.0, "rung_c": 7.5}
    assert "kernel exploded" in final["rung_errors"]["rung_b"]
    # cumulative emission: some earlier line already contains rung_a alone
    assert any(o["all"] == {"rung_a": 5.0} for o in outs[:-1])
    # the banked file (in BENCH_OUT_DIR, not the repo) matches the last line
    with open(tmp_path / "BENCH_partial.json") as f:
        assert json.load(f)["all"] == final["all"]
    # every printed line is a full parseable result dict
    assert all({"metric", "value", "unit", "vs_baseline"} <= set(o)
               for o in outs)
    # no headline rung landed: comparison must be null, not a parity-
    # implying 1.0, and the committed prior ladder must be cited
    assert final["vs_baseline"] is None
    assert final["baseline_incomparable"] is True
    if os.path.exists(os.path.join(REPO, "BENCH_BANKED.json")):
        assert final["banked_prior"]["metric"].startswith("fcvsr_full")


def test_headline_rung_updates_banked_file(monkeypatch, capsys, tmp_path):
    bench = _load_bench()
    headline = bench.HEADLINE_PREF[0]
    worker = "import sys\nprint('FPS_RESULT', 12.5, flush=True)\n"
    attempts = [(headline, "fps", "fcvsr_pallas", 8, 8, 1, 60)]
    outs = _run_main(bench, monkeypatch, capsys, attempts, worker,
                     outdir=tmp_path)
    final = outs[-1]
    assert final["metric"] == headline and final["value"] == 12.5
    # comparable with the committed full-model baseline pin (2.73 fps)
    assert final["vs_baseline"] == round(12.5 / 2.73, 3)
    assert "banked_prior" not in final
    with open(tmp_path / "BENCH_BANKED.json") as f:
        banked = json.load(f)
    assert banked["all"][headline] == 12.5


def test_signal_handlers_restored(monkeypatch, capsys, tmp_path):
    """main() must not leak its SIGTERM/SIGINT handlers into the host
    process: the harness tests run it in-process, and a leaked handler
    swallows the host's own SIGTERM later (observed as a pytest-wide
    timeout TERM surfacing as SystemExit(0) inside an unrelated test)."""
    bench = _load_bench()
    before_term = signal.getsignal(signal.SIGTERM)
    before_int = signal.getsignal(signal.SIGINT)
    worker = "import sys\nprint('FPS_RESULT', 1.0, flush=True)\n"
    _run_main(bench, monkeypatch, capsys,
              [("rung_a", "fps", "a", 8, 8, 1, 60)], worker,
              outdir=tmp_path)
    assert signal.getsignal(signal.SIGTERM) is before_term
    assert signal.getsignal(signal.SIGINT) is before_int


def test_budget_stops_launching(monkeypatch, capsys, tmp_path):
    bench = _load_bench()
    worker = "import sys\nprint('FPS_RESULT', 1.0, flush=True)\n"
    attempts = [("rung_a", "fps", "a", 8, 8, 1, 60),
                ("rung_b", "fps", "b", 8, 8, 1, 60)]
    # budget so small that after the probe no rung fits (tmo_eff < 300)
    outs = _run_main(bench, monkeypatch, capsys, attempts, worker,
                     argv=["--budget", "10"], outdir=tmp_path)
    final = outs[-1]
    assert final["all"] == {}
    assert final["budget_stop"] == "rung_a"


def test_sigterm_emits_final_json(tmp_path):
    # real-process test: a hanging rung + SIGTERM (what `timeout N
    # python bench.py` sends) must still print the banked results.
    driver = tmp_path / "driver.py"
    driver.write_text(textwrap.dedent(f"""
        import sys, textwrap
        sys.path.insert(0, {REPO!r})
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "bench_ut", {os.path.join(REPO, 'bench.py')!r})
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        bench._PROBE = {FAKE_PROBE!r}
        bench._WORKER = textwrap.dedent('''
            import sys, time
            if sys.argv[2] == "hang":
                print("READY_TO_HANG", flush=True)
                time.sleep(600)
            print("FPS_RESULT", 3.25, flush=True)
        ''')
        bench.ATTEMPTS = [("rung_a", "fps", "ok", 8, 8, 1, 60),
                          ("rung_h", "fps", "hang", 8, 8, 1, 500)]
        sys.argv = ["bench.py", "--out", {str(tmp_path)!r}]
        bench.main()
    """))
    proc = subprocess.Popen([sys.executable, str(driver)],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, cwd=REPO)
    # wait until rung_a has banked (BENCH_partial.json contains it)
    deadline = time.time() + 120
    path = os.path.join(str(tmp_path), "BENCH_partial.json")
    while time.time() < deadline:
        try:
            with open(path) as f:
                if json.load(f).get("all", {}).get("rung_a") == 3.25:
                    break
        except Exception:
            pass
        time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("rung_a never banked")
    time.sleep(1.0)  # let the hanging rung start
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    lines = [l for l in out.splitlines() if l.strip()]
    final = json.loads(lines[-1])
    assert final["all"]["rung_a"] == 3.25
    assert final.get("interrupted") is True
