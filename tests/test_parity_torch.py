"""End-to-end numerical parity: fcvsr_tpu FCVSRNet vs the torch mirror.

The torch mirror (tests/torch_mirror.py) expresses the reference forward
semantics with reference-compatible state_dict keys.  We initialise it with
torch's default init, convert the weights through the checkpoint converter,
and require the JAX forward to match the torch forward — this is the
machinery that will also validate released reference checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.utils.torch_import import convert_torch_state_dict
from tests.torch_mirror import FCVSRTorchMirror


def _run_parity(jax_model, torch_model, shape, seed=0, atol=1e-4):
    torch.manual_seed(seed)
    x = np.random.default_rng(seed).uniform(0, 1, shape).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()

    state = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params0 = jax_model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_torch_state_dict(state, params0)
    got = np.asarray(jax_model.apply(params, jnp.asarray(x)))

    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < atol, f"max abs deviation {err}"
    return err


def test_parity_small_y():
    jm = FCVSRNet.small(in_channels=1)
    tm = FCVSRTorchMirror(ac_num=3, freq_inv=4, sc_groups=4, up_ksize=1,
                          in_channels=1)
    _run_parity(jm, tm, (1, 7, 1, 16, 16))


def test_parity_small_rgb():
    jm = FCVSRNet.small(in_channels=3)
    tm = FCVSRTorchMirror(ac_num=3, freq_inv=4, sc_groups=4, up_ksize=1,
                          in_channels=3)
    _run_parity(jm, tm, (1, 7, 3, 16, 16))


@pytest.mark.slow
def test_parity_full_model():
    jm = FCVSRNet(in_channels=1)
    tm = FCVSRTorchMirror(in_channels=1)
    _run_parity(jm, tm, (1, 7, 1, 24, 32))
