"""High-level API tests (mmedit demo-API parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.apis import pad_sequence, restoration_video_inference
from fcvsr_tpu.models import FCVSRNet


def test_pad_sequence_mirrors():
    # Exact mmedit indices (restoration_video_inference.py:16-25):
    # p=2 -> head = frames[3:5] flipped, tail = frames[0:2] flipped.
    # Verified against torch: cat([d[:,3:5].flip(1), d, d[:,-5:-3].flip(1)]).
    frames = np.arange(5)[:, None].astype(np.float32)
    out = pad_sequence(frames, 5)
    np.testing.assert_array_equal(out[:, 0], [4, 3, 0, 1, 2, 3, 4, 1, 0])


@pytest.mark.slow
def test_sliding_inference_equals_per_frame():
    model = FCVSRNet.small(in_channels=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 1, 16, 16)))
    frames = np.random.default_rng(0).uniform(0, 1, (4, 16, 16, 1)).astype(np.float32)
    out = restoration_video_inference(model, params, frames, window_size=7,
                                      batch_windows=2)
    assert out.shape == (4, 64, 64, 1)

    from fcvsr_tpu.data.pipelines import padded_window_indices

    idx = padded_window_indices(1, 4, 7)
    win = np.transpose(frames[idx], (0, 3, 1, 2))[None]
    single = np.asarray(model.apply(params, jnp.asarray(win)))[0]
    np.testing.assert_allclose(out[1], np.transpose(single, (1, 2, 0)), atol=1e-5)
