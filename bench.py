"""Throughput benchmark: FCVSR 4x SR frames/sec on one chip.

Mirrors the reference FPS harness (CVSR_train/test_LD_freqCVSR_FPS.py:62-77):
sliding 7-frame windows, one SR frame per forward, wall-clock over the steady
state.  Shapes follow the reference benchmark sequences (Kimono1 480x272 is
the headline).  Prints ONE JSON line.

``vs_baseline``: the reference repo records no FPS number (BASELINE.md), so
the ratio is reported against the previous round's value when
``bench_baseline.json`` exists, else 1.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fcvsr_tpu.models import FCVSRNet

    h, w = 272, 480  # Kimono1 (reference FPS sequence, rows padded 270->272)
    model = FCVSRNet(in_channels=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, h, w)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    forward = jax.jit(lambda p, v: model.apply(p, v))
    forward(params, x).block_until_ready()  # compile

    # steady-state timing
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = forward(params, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iter / dt

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
