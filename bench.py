"""Throughput benchmark: FCVSR 4x SR frames/sec on one chip.

Mirrors the reference FPS harness (CVSR_train/test_LD_freqCVSR_FPS.py:62-77):
sliding 7-frame windows, one SR frame per forward, steady-state wall clock at
the reference benchmark shapes (Kimono1 480x272 headline).  Prints ONE JSON
line.

Environment notes (see CLAUDE.md): the axon TPU tunnel is a single-client
service where a failing program can wedge the backend for a long time, and
``block_until_ready`` is not a sync point.  So each config runs in its own
*subprocess* with a hard timeout, safest config first — a hang or failure on
a bigger config cannot take down the numbers already banked — and timing
loops on-device (lax.fori_loop) with a host fetch as the sync point.
``vs_baseline`` compares against bench_baseline.json when present (the
reference repo publishes no FPS number, BASELINE.md).
"""

import json
import os
import subprocess
import sys

# (metric name, model, h, w, subprocess timeout s) — safest first; the LAST
# success is reported.  Shapes follow the reference FPS sequences (Johnny
# 320x184, Kimono1 480x272).  Round-1 measured: fcvsr_s 14.0 fps @320x184,
# fcvsr full 2.73 fps @480x272 (compile ~4-6 min each through the tunnel,
# hence the generous timeouts).
ATTEMPTS = [
    ("fcvsr_s_fps_320x184", "fcvsr_s", 184, 320, 1800),
    ("fcvsr_full_fps_480x272", "fcvsr", 272, 480, 2700),
]

_WORKER = r"""
import functools, json, sys, time
import numpy as np

model_name, h, w = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from fcvsr_tpu.models import EDVRNet, FCVSRNet

rng = np.random.default_rng(0)
if model_name == "fcvsr":
    model = FCVSRNet(in_channels=1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, h, w)), jnp.float32)
elif model_name == "fcvsr_stencil":
    # fast tiled-warp IAC (ops/warp.py flow_warp_stencil; exact for
    # per-tile flow deviations <= 3 px — model-level dev 1e-7 on random)
    model = FCVSRNet(in_channels=1, warp_impl="stencil")
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, h, w)), jnp.float32)
elif model_name == "fcvsr_s":
    model = FCVSRNet.small(in_channels=1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, h, w)), jnp.float32)
else:
    model = EDVRNet(in_channels=3, out_channels=3, num_frames=5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 5, 3, h, w)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), x)

@functools.partial(jax.jit, static_argnums=(2,))
def run_n(p, v, n):
    def body(i, acc):
        return acc + jnp.mean(model.apply(p, v * (1.0 + 1e-6 * i)))
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))

def timed(n):
    t0 = time.perf_counter()
    val = np.asarray(run_n(params, x, n))
    dt = time.perf_counter() - t0
    assert np.isfinite(val), "non-finite output"
    return dt

N = 20
timed(1); timed(N)
base = min(timed(1) for _ in range(2))
total = min(timed(N) for _ in range(2))
print("FPS_RESULT", (N - 1) / (total - base))
"""


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    worker = _WORKER.format(repo=repo)
    fps, metric, err = 0.0, ATTEMPTS[0][0], None
    ladder = {}
    for name, model_name, h, w, tmo in ATTEMPTS:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", worker, model_name, str(h), str(w)],
                capture_output=True, text=True, timeout=tmo, cwd=repo)
            for line in proc.stdout.splitlines():
                if line.startswith("FPS_RESULT"):
                    fps = float(line.split()[1])
                    metric = name
                    ladder[name] = round(fps, 3)
                    break
            else:
                err = (proc.stderr.strip().splitlines() or ["unknown"])[-1][:200]
                break  # a failure here has likely wedged the tunnel; stop
        except subprocess.TimeoutExpired:
            err = f"timeout on {name}"
            break

    baseline_path = os.path.join(repo, "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            prev = json.load(open(baseline_path))
            if prev.get("metric") == metric and prev.get("value"):
                vs = fps / prev["value"]
        except Exception:
            pass

    out = {
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 3),
        "all": ladder,  # every ladder entry that completed this run
    }
    if err and fps == 0.0:
        out["error"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
