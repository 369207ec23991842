"""SIDECVSR model + side-info dataset tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models.sidecvsr import SIDECVSR, MVLocalAttn, _stn_warp


@pytest.mark.slow
def test_sidecvsr_forward_and_grad():
    m = SIDECVSR(nf=16, sc_groups=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, 16, 16)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((1, 7, 2, 16, 16)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, 16, 16)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, mv, s, s, s)
    sr, l1 = m.apply(p, x, mv, s, s, s)
    assert sr.shape == (1, 1, 64, 64)
    assert l1.shape == (7, 16, 16, 16)

    def loss(p):
        out, _ = m.apply(p, x, mv, s, s, s)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


def test_stn_warp_zero_mv_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 4)), jnp.float32)
    z = jnp.zeros((1, 8, 10), jnp.float32)
    out = _stn_warp(x, z, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_side_info_dataset(tmp_path):
    from PIL import Image

    from fcvsr_tpu.data.datasets import SideInfoClipCache

    rng = np.random.default_rng(0)
    seq = "seq0"
    for d in ["lr/seq0", "hr/seq0", "side/seq0/MV_l0", "side/seq0/Residue",
              "side/seq0/Partition_Map", "side/seq0/pred_unfiltered"]:
        (tmp_path / d).mkdir(parents=True)
    n, h, w = 9, 12, 16
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (h, w), dtype=np.uint8)).save(
            tmp_path / "lr/seq0" / f"{i:05d}.png")
        Image.fromarray(rng.integers(0, 255, (h * 4, w * 4), dtype=np.uint8)).save(
            tmp_path / "hr/seq0" / f"{i:05d}.png")
        np.save(tmp_path / "side/seq0/MV_l0" / f"{i:05d}_mvl0.npy",
                rng.integers(-4, 4, (h, w, 2)).astype(np.int16))
        np.save(tmp_path / "side/seq0/Residue" / f"{i:05d}_res.npy",
                rng.integers(-30, 30, (h, w)).astype(np.int16))
        Image.fromarray(rng.integers(0, 255, (h, w), dtype=np.uint8)).save(
            tmp_path / "side/seq0/Partition_Map" / f"{i:05d}_M_mask.png")
        Image.fromarray(rng.integers(0, 255, (h, w), dtype=np.uint8)).save(
            tmp_path / "side/seq0/pred_unfiltered" / f"{i:05d}_unflt.png")

    ds = SideInfoClipCache(str(tmp_path / "lr"), str(tmp_path / "hr"),
                           str(tmp_path / "side"), [seq])
    out = ds.sample(np.random.default_rng(1), lr_patch=8)
    assert out["lrs"].shape == (7, 8, 8, 1)
    assert out["mvs"].shape == (7, 8, 8, 2)
    assert out["gt"].shape == (32, 32, 1)
    for k in ("residue", "partition", "unfiltered"):
        assert out[k].shape == (7, 8, 8, 1)
