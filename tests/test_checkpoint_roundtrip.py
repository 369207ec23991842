"""Checkpoint interop roundtrip: flax params -> torch-style npz -> flax."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.utils.checkpoint import export_torch_style
from fcvsr_tpu.utils.torch_import import convert_torch_state_dict


def test_export_import_roundtrip(tmp_path):
    model = FCVSRNet.small(in_channels=1)
    x = jnp.zeros((1, 7, 1, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(42), x)

    path = str(tmp_path / "weights.npz")
    export_torch_style(params, path)
    state = dict(np.load(path))
    # exported keys follow the reference namespace
    assert "feat_extract.0.weight" in state
    assert "MGAA.convfuse.0.weight" in state
    assert "MFFRblock.DivEnh_block.0.a" in state

    back = convert_torch_state_dict(state, params)
    import flax

    fa = flax.traverse_util.flatten_dict(params["params"])
    fb = flax.traverse_util.flatten_dict(back["params"])
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=0, err_msg="/".join(k))
