"""Model zoo tests: shapes, finiteness, gradient flow for EDVR, BasicVSR++,
IconVSR, TDAN (reduced sizes — the zoo's role is capability parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models.basicvsr_pp import BasicVSRPlusPlus
from fcvsr_tpu.models.edvr import EDVRNet
from fcvsr_tpu.models.iconvsr import IconVSR, TDANNet


def _uniform(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32)


def test_edvr_center_frame_sr():
    m = EDVRNet(mid_channels=16, num_blocks_extraction=2,
                num_blocks_reconstruction=2, deform_groups=4)
    x = _uniform((2, 5, 3, 16, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 3, 64, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_edvr_without_tsa():
    m = EDVRNet(mid_channels=16, num_blocks_extraction=1,
                num_blocks_reconstruction=1, deform_groups=4, with_tsa=False)
    x = _uniform((1, 5, 3, 16, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (1, 3, 64, 64)


@pytest.mark.slow
def test_basicvsr_pp_sequence_sr():
    m = BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    x = _uniform((1, 5, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 5, 3, 256, 256)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_iconvsr_keyframe_refill():
    m = IconVSR(mid_channels=8, num_blocks=1, keyframe_stride=3)
    x = _uniform((1, 6, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 6, 3, 256, 256)


def test_tdan_outputs():
    m = TDANNet(mid_channels=8, num_blocks_before_align=1,
                num_blocks_after_align=1)
    x = _uniform((1, 5, 3, 16, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    sr, aligned = m.apply(p, x)
    assert sr.shape == (1, 3, 64, 64)
    assert aligned.shape == (1, 5, 3, 16, 16)
    # centre frame passes through unchanged
    np.testing.assert_allclose(np.asarray(aligned[:, 2]), np.asarray(x[:, 2]),
                               atol=1e-6)


@pytest.mark.slow
def test_edvr_gradients():
    m = EDVRNet(mid_channels=8, num_blocks_extraction=1,
                num_blocks_reconstruction=1, deform_groups=2)
    x = _uniform((1, 5, 3, 8, 8))
    p = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(m.apply(p, x) ** 2)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
