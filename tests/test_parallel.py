"""Mesh/parallel tests over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.parallel import data_parallel_shardings, make_mesh, replicate, shard_batch
from fcvsr_tpu.parallel.dist import gather_results, initialize_multihost, psum_metrics


def test_mesh_spans_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices()) == 8


def test_shard_and_replicate_placement():
    mesh = make_mesh()
    batch = {"x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    repl = replicate({"w": np.ones((3, 3), np.float32)}, mesh)
    assert repl["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_data_parallel_grad_psum_equivalence():
    """Sharded-batch gradient == single-device gradient (XLA inserts psum)."""
    mesh = make_mesh()
    batch_s, repl_s = data_parallel_shardings(mesh)
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 4)), jnp.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    g_sharded = jax.jit(jax.grad(loss),
                        in_shardings=(repl_s, batch_s))(
        jax.device_put(w, repl_s), jax.device_put(x, batch_s))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               atol=1e-6)


def test_psum_metrics_mean():
    mesh = make_mesh()
    out = psum_metrics({"loss": jnp.float32(2.0), "psnr": jnp.float32(30.0)},
                       mesh)
    # replicated scalar: mean over 8 identical shards == the value
    assert float(out["loss"]) == pytest.approx(2.0)
    assert float(out["psnr"]) == pytest.approx(30.0)


def test_single_process_helpers():
    assert initialize_multihost() == 0
    arr = np.arange(4.0)
    np.testing.assert_array_equal(gather_results(arr), arr)
