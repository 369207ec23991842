"""Checkpoint interop roundtrip: flax params -> torch-style npz -> flax."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_restore_ema_mismatch(tmp_path):
    """ADVICE r1: restoring across an EMA-presence mismatch must not fail on
    the orbax template — EMA re-seeds from params when the ckpt lacks it."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fcvsr_tpu.train import create_train_state
    from fcvsr_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    x = jnp.ones((1, 4))
    sched = lambda step: 1e-3  # noqa: E731

    # saved WITHOUT ema -> restored into a state WITH ema
    s_plain = create_train_state(Tiny(), jax.random.PRNGKey(0), x, sched)
    save_checkpoint(str(tmp_path / "a"), 5, s_plain)
    s_ema = create_train_state(Tiny(), jax.random.PRNGKey(1), x, sched,
                               use_ema=True)
    restored, step = restore_checkpoint(str(tmp_path / "a"), s_ema)
    assert step == 5
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(s_plain.params)[0]))
    # ema seeded from the restored params
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.ema_params)[0]),
        np.asarray(jax.tree.leaves(s_plain.params)[0]))

    # saved WITH ema -> restored into a state WITHOUT ema
    save_checkpoint(str(tmp_path / "b"), 7, s_ema)
    s_plain2 = create_train_state(Tiny(), jax.random.PRNGKey(2), x, sched)
    restored2, step2 = restore_checkpoint(str(tmp_path / "b"), s_plain2)
    assert step2 == 7 and restored2.ema_params is None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored2.params)[0]),
        np.asarray(jax.tree.leaves(s_ema.params)[0]))


@pytest.mark.parametrize("small,in_channels", [(False, 1), (False, 3),
                                               (True, 1), (True, 3)])
def test_export_tool_all_widths(tmp_path, small, in_channels):
    """tools/export_torch_ckpt.py: .pth (torch-mirror state_dict) -> .npz ->
    convert_torch_state_dict for all four model widths (full/S x Y/RGB)."""
    import torch

    import tools.export_torch_ckpt as tool
    from tests.torch_mirror import FCVSRTorchMirror

    torch.manual_seed(0)
    if small:
        tm = FCVSRTorchMirror(ac_num=3, freq_inv=4, sc_groups=4, up_ksize=1,
                              in_channels=in_channels)
        jm = FCVSRNet.small(in_channels=in_channels)
    else:
        tm = FCVSRTorchMirror(in_channels=in_channels)
        jm = FCVSRNet(in_channels=in_channels)

    pth = str(tmp_path / "ckpt.pth")
    # mmcv-style wrapper + generator prefix, the hardest flavour
    torch.save({"state_dict": {f"generator.{k}": v
                               for k, v in tm.state_dict().items()}}, pth)
    npz = str(tmp_path / "weights.npz")
    tool.main(["--pth", pth, "--out", npz])

    state = dict(np.load(npz))
    x = jnp.zeros((1, 7, in_channels, 16, 16), jnp.float32)
    params0 = jm.init(jax.random.PRNGKey(0), x)
    params = convert_torch_state_dict(state, params0)

    # every leaf was overwritten by converted torch weights
    import flax

    fa = flax.traverse_util.flatten_dict(params0["params"])
    fb = flax.traverse_util.flatten_dict(params["params"])
    assert set(fa) == set(fb)

    # forward parity on one width keeps the mapping honest end-to-end
    if small and in_channels == 1:
        xr = np.random.default_rng(1).uniform(
            0, 1, (1, 7, 1, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(xr)).numpy()
        got = np.asarray(jm.apply(params, jnp.asarray(xr)))
        assert np.abs(got - ref).max() < 1e-4


def test_publish_model_from_npz(tmp_path):
    import tools.publish_model as pub

    src = tmp_path / "w.npz"
    np.savez(src, **{"a.weight": np.ones((2, 2), np.float32),
                     "b.bias": np.zeros(3, np.float32)})
    final = pub.publish(str(src), str(tmp_path / "mymodel"))
    assert final.endswith(".npz")
    import re

    assert re.search(r"mymodel-[0-9a-f]{8}\.npz$", final)
    data = np.load(final)
    assert set(data.files) == {"a.weight", "b.bias"}


def test_export_aot_roundtrip(tmp_path):
    from jax import export as jexport

    import tools.export_aot as ea
    from fcvsr_tpu.utils.config import preset

    cfg = preset("fcvsr_s_redsLD_QP37")
    exported, params = ea.export_model(cfg, 16, 16)
    blob = exported.serialize()
    back = jexport.deserialize(blob)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 7, 3, 16, 16)), jnp.float32)
    got = np.asarray(back.call(params, x))

    import train as train_cli

    model = train_cli.build_model(cfg)
    ref = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, ref, atol=1e-5)
