"""FPS benchmark over the reference's three sequences
(CVSR_train/test_LD_freqCVSR_FPS.py equivalent: PeopleOnStreet 640x400,
Johnny 320x184, Kimono1 480x272), appending to an FPS log like the
reference harness.

Usage: python tools/test_FCVSR_FPS.py [--model fcvsr|fcvsr_s] [--log FPS/log.txt]
Each sequence runs in its own process (tunnel hygiene — see CLAUDE.md).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQS = [("PeopleOnStreet", 400, 640), ("Johnny", 184, 320), ("Kimono1", 272, 480)]

_WORKER = """
import functools, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from fcvsr_tpu.models import FCVSRNet

which, h, w = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
model = FCVSRNet.small(in_channels=1) if which == "fcvsr_s" else FCVSRNet(in_channels=1)
x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 7, 1, h, w)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), x)

@functools.partial(jax.jit, static_argnums=(2,))
def run_n(p, v, n):
    def body(i, acc):
        return acc + jnp.mean(model.apply(p, v * (1.0 + 1e-6 * i)))
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))

def timed(n):
    t0 = time.perf_counter()
    np.asarray(run_n(params, x, n))
    return time.perf_counter() - t0

timed(1); timed(10)
b = min(timed(1) for _ in range(2))
t = min(timed(10) for _ in range(2))
print("FPS_RESULT", 9 / (t - b))
"""


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fcvsr", choices=["fcvsr", "fcvsr_s"])
    ap.add_argument("--log", default="FPS/log_freqCVSR_FPS.txt")
    args = ap.parse_args(argv)

    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    worker = _WORKER.format(repo=REPO)
    results = {}
    for name, h, w in SEQS:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", worker, args.model, str(h), str(w)],
                capture_output=True, text=True, timeout=1800, cwd=REPO)
            fps = None
            for line in proc.stdout.splitlines():
                if line.startswith("FPS_RESULT"):
                    fps = float(line.split()[1])
            results[name] = fps
            print(f"{name} ({w}x{h}): {fps:.2f} fps" if fps else
                  f"{name}: FAILED", flush=True)
        except subprocess.TimeoutExpired:
            results[name] = None
            print(f"{name}: TIMEOUT", flush=True)
    with open(args.log, "a") as f:
        f.write(json.dumps({"model": args.model, "fps": results}) + "\n")


if __name__ == "__main__":
    main()
