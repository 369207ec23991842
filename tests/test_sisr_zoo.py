"""SISR zoo shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models.sisr import EDSR, MSRResNet, RDN, RRDBNet, SRCNN, TOFlow


def _run(m, shape, seed=0):
    x = jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert np.isfinite(np.asarray(y)).all()
    return y


@pytest.mark.parametrize("model,out_hw", [
    (EDSR(num_blocks=2), (48, 48)),
    (SRCNN(), (48, 48)),
    (MSRResNet(num_blocks=2), (48, 48)),
    (RRDBNet(num_blocks=2), (48, 48)),
    (RDN(num_blocks=2, num_layers=2), (48, 48)),
])
def test_sisr_4x(model, out_hw):
    y = _run(model, (1, 3, 12, 12))
    assert y.shape == (1, 3, *out_hw)


def test_toflow():
    m = TOFlow()
    y = _run(m, (1, 7, 3, 64, 64))
    assert y.shape == (1, 3, 64, 64)
