"""Batched sliding-window inference + bf16 mode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.models.inference import sliding_window_sr
from fcvsr_tpu.utils.precision import bf16_apply, cast_params


@pytest.fixture(scope="module")
def small():
    m = FCVSRNet.small(in_channels=1)
    x = jnp.zeros((1, 7, 1, 16, 16), jnp.float32)
    return m, m.init(jax.random.PRNGKey(0), x)


def test_batched_windows_match_per_frame(small):
    model, params = small
    rng = np.random.default_rng(0)
    clip = rng.uniform(0, 1, (5, 16, 16, 1)).astype(np.float32)
    batched = sliding_window_sr(model, params, clip, batch_windows=4)
    assert batched.shape == (5, 64, 64, 1)

    from fcvsr_tpu.data.pipelines import padded_window_indices

    for i in [0, 2, 4]:
        idx = padded_window_indices(i, 5, 7)
        win = np.transpose(clip[idx], (0, 3, 1, 2))[None]
        single = np.asarray(model.apply(params, jnp.asarray(win)))[0]
        np.testing.assert_allclose(batched[i], np.transpose(single, (1, 2, 0)),
                                   atol=1e-5)


def test_bf16_apply_close_to_f32(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 7, 1, 16, 16)),
                    jnp.float32)
    f32 = np.asarray(model.apply(params, x))
    b16 = np.asarray(bf16_apply(model, params, x))
    assert b16.dtype == np.float32
    # bf16 conv noise stays small relative to [0,1] pixel range
    assert np.abs(b16 - f32).mean() < 0.02


def test_cast_params_dtypes(small):
    _, params = small
    p16 = cast_params(params)
    leaves = jax.tree.leaves(p16)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
