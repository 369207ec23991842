"""Throughput benchmark: FCVSR 4x SR frames/sec on one chip.

Mirrors the reference FPS harness (CVSR_train/test_LD_freqCVSR_FPS.py:62-77):
sliding 7-frame windows, one SR frame per forward, steady-state wall clock at
the reference benchmark shapes (Kimono1 480x272 headline).  Prints ONE JSON
line.

Ladder (safest first; each config runs in its own subprocess with a hard
timeout so a hang or failure on a bigger config cannot take down numbers
already banked):
- fcvsr_s_fps_320x184 / fcvsr_full_fps_480x272 — harness-parity batch-1
  per-frame mode on the bit-exact gather path (checkpoint-parity tracking,
  comparable to rounds 1-2).
- fcvsr_full_pallas_fps_480x272 — same harness mode on the deployment
  path: fused Pallas IAC (ops/pallas_iac.py), rows-layout Pallas SCNet
  (models/scnet_rows.py) and batch-axis MGAA batching, gated on an
  on-device isfinite probe with automatic fallback to the sequential
  exact path.  This is the HEADLINE when it succeeds: the reference's FPS
  harness measures *its* deployment path (the DCN CUDA kernels), so the
  parity-correct comparison is deployment path vs deployment path —
  vs_baseline still compares against the round-1 full-model pin (same
  model, shape and harness semantics at TPU serving precision).
- fcvsr_full_throughput_480x272 — deployment mode: B=4 sliding windows per
  dispatch (a TPU deployment would never serve batch-1); per-window math
  identical to the per-frame path.
- fcvsr_s_train_step_ms — one optimizer step (batch 2, 64px patches), the
  round-2 CLAUDE.md measurement promoted to a tracked metric.
- fcvsr_s_train_fast_step_ms — the same step through train.py --fast's
  routing (fused Pallas IAC forward + fused adjoint kernels).

Environment notes (see CLAUDE.md): the axon TPU tunnel is a single-client
service where a failing program can wedge the backend for a long time, and
``block_until_ready`` is not a sync point — timing loops on-device
(lax.fori_loop) with a host fetch as the sync point.  ``vs_baseline``
compares the headline metric against bench_baseline.json when present (the
reference repo publishes no FPS number, BASELINE.md).  TPU_PROBE.json
(tools/tpu_probe.py) is folded into the output when present.
"""

import json
import os
import subprocess
import sys

# (metric, kind, model, h, w, batch, subprocess timeout s).
# kind: fps = per-frame harness mode; tput = batched-window throughput;
# train = train-step ms.  The LAST fps success on the exact path is the
# headline.  Compiles through the tunnel take 4-6 min per program, hence
# the generous timeouts.
ATTEMPTS = [
    ("fcvsr_s_fps_320x184", "fps", "fcvsr_s", 184, 320, 1, 1800),
    # S-model deployment path (the reference FPS harness measures both
    # FCVSR and FCVSR-S — test_LD_freqCVSR_S_FPS.py); never the headline
    ("fcvsr_s_pallas_fps_320x184", "fps", "fcvsr_s_pallas", 184, 320, 1, 2700),
    ("fcvsr_full_fps_480x272", "fps", "fcvsr", 272, 480, 1, 2700),
    ("fcvsr_full_pallas_fps_480x272", "fps", "fcvsr_pallas", 272, 480, 1, 2700),
    # batched sliding windows: measured round 3 B=1 3.91 / B=2 3.65 / B=4
    # 3.31 fps — the model is bandwidth-bound at this spatial size, so the
    # chip is already saturated at batch 1 and window batching LOSES; the
    # entry stays to prove that (and to catch a future dispatch-bound
    # regime where batching would start to win).
    ("fcvsr_full_throughput_480x272", "tput", "fcvsr_pallas", 272, 480, 2, 2700),
    ("fcvsr_s_train_step_ms", "train", "fcvsr_s", 64, 64, 2, 1800),
    # train.py --fast routing: fused IAC forward + fused Pallas adjoint
    # kernels (set_iac_bwd('fused'); measured 24.5 vs 28.9 ms exact r3)
    ("fcvsr_s_train_fast_step_ms", "train", "fcvsr_s_train_fast", 64, 64, 2, 1800),
    # zoo perf tracking: EDVR was pathological on TPU (0.6 fps r1, DCN
    # gathers); the fused Pallas DCN (ops/pallas_dcn.py, 44x on the L1
    # call) is the fix — this entry keeps it measured.
    ("edvr_pallas_fps_320x184", "fps", "edvr_pallas", 184, 320, 1, 2700),
]
HEADLINE = "fcvsr_full_pallas_fps_480x272"

_WORKER = r"""
import functools, json, sys, time
import numpy as np

kind, model_name, h, w, batch = (sys.argv[1], sys.argv[2], int(sys.argv[3]),
                                 int(sys.argv[4]), int(sys.argv[5]))

import jax
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from fcvsr_tpu.models import EDVRNet, FCVSRNet

rng = np.random.default_rng(0)

def make(name, **kw):
    if name == "fcvsr":
        return FCVSRNet(in_channels=1, **kw)
    if name == "fcvsr_pallas":
        # fused Pallas IAC (bounded-deviation contract, ops/pallas_iac.py)
        # + batch-axis MGAA batching (CPU-exact; finite-probed below)
        # + bf16-storage rows-layout Pallas SCNet (models/scnet_rows.py;
        #   60.6 dB PSNR vs the f32 chain — measured round 3)
        # + f32 upsampling tail, polyphase-folded to (H, W) (ops/psfold.py
        #   — exact kernel rearrangement; post-fold the tail is MXU-bound
        #   and bf16 storage LOSES: 10.88 f32 vs 10.69 bf16 in-chain)
        # + bf16-storage fused IAC chain
        # + bf16 MGAA spectral head (single-pass bf16 DFT + bf16 head
        #   convs; MGAA 16.5 -> 13.9 ms)
        # + bf16 MFFR band split + DivEnh chain (19.2 -> 6.4 ms standalone)
        # Total 10.88 fps @480x272; 62.6 dB PSNR vs the f32 chain (delta_max 0.0039).
        return FCVSRNet(in_channels=1, warp_impl="pallas", batch_mgaa=True,
                        scnet_impl="rows_bf16",
                        iac_dtype="bf16", tail_impl="folded",
                        head_dtype="bf16", mffr_dtype="bf16", **kw)
    if name == "fcvsr_s":
        return FCVSRNet.small(in_channels=1, **kw)
    if name == "fcvsr_s_train_fast":
        # train.py --fast: fused IAC chain forward + fused adjoint kernels
        from fcvsr_tpu.ops.sac import set_iac_bwd
        set_iac_bwd("fused")
        return FCVSRNet.small(in_channels=1, warp_impl="pallas", **kw)
    if name == "fcvsr_s_pallas":
        # same deployment flag set as fcvsr_pallas on the S topology
        return FCVSRNet.small(in_channels=1, warp_impl="pallas",
                              batch_mgaa=True, scnet_impl="rows_bf16",
                              iac_dtype="bf16", tail_impl="folded",
                              head_dtype="bf16", mffr_dtype="bf16", **kw)
    if name == "edvr_pallas":
        from fcvsr_tpu.ops.dcn import set_dcn_impl
        set_dcn_impl("pallas")  # fused DCN (ops/pallas_dcn.py)
    return EDVRNet(in_channels=3, out_channels=3, num_frames=5)

model = make(model_name)
if model_name.startswith("edvr"):
    x = jnp.asarray(rng.uniform(0, 1, (batch, 5, 3, h, w)), jnp.float32)
else:
    x = jnp.asarray(rng.uniform(0, 1, (batch, 7, 1, h, w)), jnp.float32)

if kind == "train":
    from fcvsr_tpu.train import cosine_restart, create_train_state, \
        make_train_step
    gt = jnp.asarray(rng.uniform(0, 1, (batch, 1, 4 * h, 4 * w)), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), x, cosine_restart(2e-4, [600000], [1.0]))
    step = make_train_step(model, "charbonnier_mean", donate=False)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_n(s0, n):
        def body(i, s):
            s2, _ = step(s, x * (1.0 + 1e-6 * i), gt)
            return s2
        leaves = jax.tree.leaves(jax.lax.fori_loop(0, n, body, s0).params)
        return leaves[0].ravel()[0]

    N = 20
    v = np.asarray(run_n(state, 1)); assert np.isfinite(v)
    np.asarray(run_n(state, N))
    def timed(n):
        t0 = time.perf_counter()
        v = np.asarray(run_n(state, n))
        assert np.isfinite(v)
        return time.perf_counter() - t0
    base = min(timed(1) for _ in range(2))
    total = min(timed(N) for _ in range(2))
    print("MS_RESULT", (total - base) / (N - 1) * 1e3)
    sys.exit(0)

params = model.init(jax.random.PRNGKey(0), x)

if model_name in ("fcvsr_pallas", "fcvsr_s_pallas"):
    # on-device finite probe: the old TPU runtime returned non-finite
    # outputs from the batched MGAA variant (round 2) — fall back to the
    # sequential exact-warp model if that ever recurs.
    probe = np.asarray(jnp.mean(model.apply(params, x)))
    if not np.isfinite(probe):
        print("PROBE_FALLBACK nonfinite", file=sys.stderr)
        model = make("fcvsr_s" if model_name.startswith("fcvsr_s")
                     else "fcvsr")
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
print("FPS_RESULT", batch * (N - 1) / (total - base))
"""


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    worker = _WORKER.format(repo=repo)
    fps, metric, err = 0.0, ATTEMPTS[0][0], None
    ladder = {}
    for name, kind, model_name, h, w, batch, tmo in ATTEMPTS:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", worker, kind, model_name, str(h),
                 str(w), str(batch)],
                capture_output=True, text=True, timeout=tmo, cwd=repo)
            for line in proc.stdout.splitlines():
                if line.startswith(("FPS_RESULT", "MS_RESULT")):
                    val = float(line.split()[1])
                    ladder[name] = round(val, 3)
                    if kind == "fps" and model_name in (
                            "fcvsr", "fcvsr_s", "fcvsr_pallas"):
                        # ladder order makes the deployment path the last
                        # fps success -> headline (see module docstring)
                        fps, metric = val, name
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
            # exact and deployment entries measure the same model/shape/
            # harness; both compare against the round-1 full-model pin
            same = (prev.get("metric") == metric
                    or (str(prev.get("metric")).startswith("fcvsr_full")
                        and metric.startswith("fcvsr_full")))
            if same and prev.get("value"):
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
    probe_path = os.path.join(repo, "TPU_PROBE.json")
    if os.path.exists(probe_path):
        try:
            out["tpu_probe"] = json.load(open(probe_path))
        except Exception:
            pass
    if err and fps == 0.0:
        out["error"] = err
    elif err:
        out["ladder_error"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
