"""Per-op HLO profile of the in-chain MGAA head (VERDICT r4 #4).

Round 3/4 attributed the MGAA head by standalone microbenches and in-chain
ablation; the ~2.5 ms/call standalone-vs-in-chain delta was closed "fusion
context" by elimination.  This profiles the real thing: jax.profiler trace
of the full MGAA module (bf16 spectral head, 272x480, the deployment
configuration) -> xplane.pb -> per-HLO-op self-time table via
tensorboard_plugin_profile, aggregated by named_scope/op category so the
7.1 ms head sums from *named* ops.

The module is traced in its deployment context (fused Pallas IAC chain +
bf16 head) with the same on-device fori_loop protocol as every bench —
the trace covers N steady-state iterations and per-op times are reported
per call (divided by N).

Usage:
  python benchmarks/profile_mgaa_head.py [--cpu] [--iters 10]
      [--trace-dir /tmp/mgaa_trace] [--top 40] [--probe-only]

--probe-only traces a bare jnp.dot and reports whether the axon tunnel
delivers device-side xplanes at all (unknown until tried — remote TPU
tracing may capture host activity only).
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str, top: int = 40, per_call: int = 1,
                 plane_substr: str = ""):
    """xplane.pb -> list of (op_name, us_per_call, occurrences)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        return None, "no xplane.pb under " + trace_dir
    # the xplane proto ships under tensorflow's vendored tsl in this image
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # other images
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    def want(name):
        if plane_substr:
            return plane_substr in name
        # device planes: '/device:TPU:0' / 'TensorCore'; '/host:CPU'
        # carries the XLA:CPU op events when running on the cpu backend
        return ("TPU" in name or "device" in name.lower()
                or name == "/host:CPU")

    rows = {}
    used_planes = []
    for plane in space.planes:
        if not want(plane.name):
            continue
        used_planes.append(plane.name)
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur_us = ev.duration_ps / 1e6
                r = rows.setdefault(name, [0.0, 0])
                r[0] += dur_us
                r[1] += 1
    if not used_planes:
        return None, (f"{len(paths)} xplane file(s) but no matching plane; "
                      f"planes: {[p.name for p in space.planes]}")
    out = sorted(((name, us, n) for name, (us, n) in rows.items()),
                 key=lambda t: -t[1])
    return {"planes": used_planes,
            "ops": [(name, round(us / max(per_call, 1), 1), n)
                    for name, us, n in out[:top]]}, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace-dir", default="/tmp/mgaa_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument("--deploy", action="store_true",
                    help="profile the full deployment MGAA config "
                         "(batch_fb + bf16 IAC chain)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    os.makedirs(args.trace_dir, exist_ok=True)

    if args.probe_only:
        @jax.jit
        def dot(a):
            return jnp.dot(a, a).mean()

        a = jnp.ones((512, 512), jnp.float32)
        np.asarray(dot(a))  # compile outside the trace
        with jax.profiler.trace(args.trace_dir):
            v = np.asarray(dot(a))
        table, err = parse_xplane(args.trace_dir, top=10)
        print(json.dumps({"probe": "dot", "value": float(v),
                          "device_ops": table, "error": err}))
        return

    import flax.linen as nn

    from fcvsr_tpu.models.fcvsr import MGAA

    h, w, d = 272, 480, 64
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3 * d)), jnp.float32)

    if args.deploy:
        # the full deployment configuration (test.py --fast MGAA flags)
        mgaa = MGAA(dim=d, ac_ks=3, ac_num=6, warp_impl="pallas",
                    batch_fb=True, iac_dtype="bf16", head_dtype="bf16")
    else:
        mgaa = MGAA(dim=d, ac_ks=3, ac_num=6, warp_impl="pallas",
                    head_dtype="bf16")
    params = mgaa.init(jax.random.PRNGKey(0), x3)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_n(p, v, n):
        def body(i, acc):
            return acc + jnp.mean(mgaa.apply(p, v * (1.0 + 1e-6 * i)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # compile the SAME static n that will be traced (a different n would
    # recompile INSIDE the trace and swamp the device events — round-5
    # first capture did exactly that)
    t0 = time.perf_counter()
    np.asarray(run_n(params, x3, args.iters))
    print(f"compiled in {time.perf_counter() - t0:.0f}s", flush=True)

    n = args.iters
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        val = np.asarray(run_n(params, x3, n))
    wall = time.perf_counter() - t0
    assert np.isfinite(val)
    print(f"traced {n} MGAA calls in {wall:.2f}s "
          f"({wall / n * 1e3:.2f} ms/call incl dispatch)", flush=True)

    table, err = parse_xplane(args.trace_dir, top=args.top, per_call=n)
    out = {"shape": [h, w, d], "iters": n,
           "wall_ms_per_call": round(wall / n * 1e3, 2),
           "per_op_us_per_call": table, "error": err}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
