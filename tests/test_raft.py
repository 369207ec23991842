"""RAFT tests: shapes, param count sanity, translation recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models.raft import RAFT, raft_flow


@pytest.fixture(scope="module")
def raft_setup():
    m = RAFT(iters=3)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, x)
    return m, p


def test_raft_output_shape(raft_setup):
    m, p = raft_setup
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    flow = m.apply(p, a, b)
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_param_count(raft_setup):
    _, p = raft_setup
    n = sum(v.size for v in jax.tree.leaves(p))
    # reference full RAFT is ~5.26M parameters
    assert 5.0e6 < n < 5.5e6


def test_raft_flow_wrapper_odd(raft_setup):
    m, p = raft_setup
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (1, 50, 70, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, 50, 70, 3)), jnp.float32)
    flow = raft_flow(m, p, a, b)
    assert flow.shape == (1, 50, 70, 2)
