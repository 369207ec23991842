"""Probe the axon TPU terminal for the two known infra blockers.

Round-2 found two performance levers dead on the current axon terminal
(CLAUDE.md): (1) Pallas/Mosaic compiles fail in the terminal-side compile
helper's libtpu init (and client-side compile trips the libtpu
version-mismatch guard), and (2) bf16 matmuls run ~18x SLOWER through
old-runtime emulation.  Both are terminal-version issues that an upgrade
would silently fix — this probe detects that moment.

Each probe runs in its OWN subprocess with a hard timeout so a wedged
tunnel cannot take down the parent (a failed TPU call poisons its process,
and a failed *execute* can wedge the tunnel for minutes).  Probe order is
chosen so the most dangerous attempt (Pallas compile — a failure degraded
the tunnel ~30 min in round 2) runs LAST, after the cheap results are
already banked.

Writes ``TPU_PROBE.json`` at the repo root; ``bench.py`` folds it into its
output so the driver records the probe state every round.

Usage: python tools/tpu_probe.py [--skip-pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DOT = r"""
import numpy as np, time, jax, jax.numpy as jnp
a = jnp.ones((256, 256), jnp.float32)
t0 = time.perf_counter()
v = float(np.asarray(jnp.dot(a, a))[0, 0])
print("PROBE_OK", v, round(time.perf_counter() - t0, 2))
"""

# bf16 vs f32 conv timing at a bench-relevant shape.  Loops on-device
# (block_until_ready is not a sync point on axon); reports the ratio —
# healthy runtime: bf16 <= ~1.0x of f32; old-runtime emulation: ~18x.
_BF16 = r"""
import functools, numpy as np, time, jax, jax.numpy as jnp

def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

# NOTE: reduce over the FULL conv output — slicing one pixel would let XLA
# dead-code-eliminate almost the whole conv (round-3 bug: the first probe
# version did exactly that and mismeasured the bf16 ratio).
@functools.partial(jax.jit, static_argnums=(2,))
def run_n(x, k, n):
    def body(i, acc):
        return acc + jnp.mean(conv(x * (1 + 1e-6 * i), k))
    return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

rng = np.random.default_rng(0)
res = {}
for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    x = jnp.asarray(rng.standard_normal((1, 272, 480, 64)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.01, dt)
    np.asarray(run_n(x, k, 1))  # compile
    n = 60
    np.asarray(run_n(x, k, n))  # warm

    def timed(m):
        t0 = time.perf_counter()
        v = np.asarray(run_n(x, k, m))
        assert np.isfinite(float(v))
        return time.perf_counter() - t0

    # min-of-3 for both points: single-shot subtraction goes negative
    # under tunnel jitter (round-3 mismeasurement)
    base = min(timed(1) for _ in range(3))
    full = min(timed(n) for _ in range(3))
    res[name] = (full - base) / (n - 1) * 1e3  # ms per conv
print("PROBE_OK", round(res["f32"], 3), round(res["bf16"], 3),
      round(res["bf16"] / max(res["f32"], 1e-9), 2))
"""

_PALLAS = r"""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl

def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
y = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
v = np.asarray(y)
assert np.allclose(v, np.asarray(x) * 2.0)
print("PROBE_OK pallas-compile-and-run")
"""


def _run(name: str, code: str, timeout: int) -> dict:
    t0 = time.perf_counter()
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": f"timeout {timeout}s",
                "secs": round(time.perf_counter() - t0, 1)}
    out = {"ok": False, "secs": round(time.perf_counter() - t0, 1)}
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            out["ok"] = True
            out["detail"] = line[len("PROBE_OK"):].strip()
    if not out["ok"]:
        tail = (proc.stderr.strip().splitlines() or ["unknown"])[-1]
        out["error"] = tail[:300]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-pallas", action="store_true",
                    help="skip the Pallas compile attempt (a failure can "
                         "degrade the tunnel for ~30 min)")
    ap.add_argument("--out", default=os.path.join(REPO, "TPU_PROBE.json"))
    args = ap.parse_args()

    results = {"when": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    results["dot"] = _run("dot", _DOT, 900)
    if results["dot"]["ok"]:
        results["bf16_conv"] = _run("bf16", _BF16, 600)
        if results["bf16_conv"].get("detail"):
            f32_ms, bf16_ms, ratio = results["bf16_conv"]["detail"].split()
            results["bf16_conv"]["f32_ms"] = float(f32_ms)
            results["bf16_conv"]["bf16_ms"] = float(bf16_ms)
            results["bf16_conv"]["bf16_over_f32"] = float(ratio)
            results["bf16_usable"] = float(ratio) <= 1.5
        if args.skip_pallas:
            results["pallas"] = {"ok": False, "error": "skipped by flag"}
        else:
            results["pallas"] = _run("pallas", _PALLAS, 600)
        # Congestion hint (ADVICE r3): a pallas ok=false alongside an
        # anomalously slow dot probe (healthy ~20-50 s incl. backend init)
        # is tunnel congestion, not a Mosaic regression — say so in the
        # JSON itself so automated consumers don't key on the bare ok.
        if (not results["pallas"].get("ok")
                and results["dot"].get("secs", 0) > 120):
            results["pallas"]["suspected_cause"] = (
                "tunnel congestion (dot probe took "
                f"{results['dot']['secs']}s; healthy is ~20-50s) — "
                "not a Mosaic/terminal regression")
    else:
        results["note"] = "dot probe failed; tunnel down — skipping the rest"

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
