"""Two-process jax.distributed smoke test (CPU, Gloo collectives).

Validates the multi-host scaffolding end-to-end without a TPU pod: two
subprocesses form a global 2-device mesh, shard a batch with
``parallel.shard_batch`` (per-process local data), replicate params with
``parallel.replicate``, and take one gradient step whose psum'd gradients
must equal the single-process equivalent.
"""

import subprocess
import sys
import textwrap

import pytest

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(f"""
    import sys
    sys.path.insert(0, {_REPO!r})
""") + textwrap.dedent("""
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from fcvsr_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh()
    assert len(jax.devices()) == nproc  # one cpu device per process

    # per-process local batch (the distributed-sampler contract)
    local_x = np.full((2, 4), float(pid + 1), np.float32)
    local_y = np.zeros((2, 1), np.float32)
    batch = shard_batch({"x": local_x, "y": local_y}, mesh)

    w = {"w": jnp.ones((4, 1)) * 0.5}
    w = replicate(w, mesh)

    def loss_fn(p, x, y):
        return jnp.mean((x @ p["w"] - y) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(w, batch["x"], batch["y"])
    g = np.asarray(grads["w"])  # replicated -> same on every process

    # single-process oracle over the concatenated global batch
    gx = np.concatenate([np.full((2, 4), float(i + 1), np.float32)
                         for i in range(nproc)])
    gy = np.zeros((2 * nproc, 1), np.float32)
    ref = np.asarray(jax.grad(loss_fn)({"w": jnp.ones((4, 1)) * 0.5},
                                       jnp.asarray(gx), jnp.asarray(gy))["w"])
    np.testing.assert_allclose(g, ref, atol=1e-6)
    print(f"proc{pid}: grads match single-process oracle", flush=True)
""")


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    # one CPU device per process (conftest exports an 8-device flag for the
    # in-process virtual mesh; subprocesses must not inherit it)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2", "12653"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "grads match single-process oracle" in out
