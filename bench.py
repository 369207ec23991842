"""Throughput benchmark: FCVSR 4x SR frames/sec on one chip.

Mirrors the reference FPS harness (CVSR_train/test_LD_freqCVSR_FPS.py:62-77):
sliding 7-frame windows, one SR frame per forward, steady-state wall clock.
Shapes follow the reference benchmark sequences (Kimono1 480x272 headline).
Prints ONE JSON line.

Methodology notes for this environment: the TPU is reached through a tunnel
with high per-dispatch latency and an async queue whose ``block_until_ready``
is not a reliable sync point, so the N forward passes run *inside one jit*
via ``lax.fori_loop`` (each iteration data-dependent on the loop index, so
nothing can be hoisted), and the single result is fetched to host as the sync
point.  Dispatch overhead is measured with an N=0 run and subtracted.

``vs_baseline``: the reference repo records no FPS number (BASELINE.md), so
the ratio is reported against the previous round's value when
``bench_baseline.json`` exists, else 1.0.
"""

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcvsr_tpu.models import FCVSRNet

    h, w = 272, 480  # Kimono1 (reference FPS sequence, rows padded 270->272)
    model = FCVSRNet(in_channels=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, h, w)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_n(p, v, n):
        def body(i, acc):
            out = model.apply(p, v * (1.0 + 1e-6 * i))
            return acc + jnp.mean(out)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def timed(n):
        t0 = time.perf_counter()
        val = np.asarray(run_n(params, x, n))  # host fetch = sync
        dt = time.perf_counter() - t0
        assert np.isfinite(val), "non-finite bench output"
        return dt

    n_iter = 20
    # compile both variants
    timed(1)
    timed(n_iter)
    base = min(timed(1) for _ in range(2))
    total = min(timed(n_iter) for _ in range(2))
    per_frame = (total - base) / (n_iter - 1)
    fps = 1.0 / per_frame

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            prev = json.load(open(baseline_path))["value"]
            vs = fps / prev if prev else 1.0
        except Exception:
            pass

    print(json.dumps({
        "metric": "fcvsr_full_fps_480x272",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
