"""Spatial tiling + spatial partitioning: multi-chip serving of ONE frame.

Two complementary modes (models/inference.py::tiled_sr docstring):
- tiled_sr: overlapping tiles data-parallel over the mesh — bounded
  deviation (FCVSR's MFFR band split is a global DFT, so tiles are not
  bit-exact) but composes with the fused Pallas deployment kernels.
- GSPMD spatial partition: shard H of the input across the mesh and let
  XLA insert the collectives for the global DFT contractions — exact,
  gather path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.models.inference import tiled_sr
from fcvsr_tpu.parallel import make_mesh


def _smooth_clip(rng, t, c, h, w):
    """Band-limited content (real video is smooth; white noise would put
    energy at the mask transition frequencies and inflate the seam bound)."""
    small = rng.uniform(0, 1, (t, c, h // 4, w // 4)).astype(np.float32)
    x = jax.image.resize(jnp.asarray(small), (t, c, h, w), "linear")
    return np.asarray(x)


@pytest.fixture(scope="module")
def small_48():
    m = FCVSRNet.small(in_channels=1)
    x0 = jnp.zeros((1, 7, 1, 48, 48), jnp.float32)
    return m, m.init(jax.random.PRNGKey(0), x0)


def test_tiled_sr_bounded_vs_full_frame(small_48):
    model, params = small_48
    rng = np.random.default_rng(0)
    win = _smooth_clip(rng, 7, 1, 48, 48)[None]
    full = np.asarray(model.apply(params, jnp.asarray(win)))
    tiled = tiled_sr(model, params, win, tile=32, overlap=8)
    assert tiled.shape == full.shape == (1, 1, 192, 192)
    d = np.abs(tiled - full)
    # global-DFT seam error with an 8px overlap on band-limited content —
    # measured mean 7.4e-5 / max 8.1e-4: an order tighter than the --fast
    # precision contract
    assert d.mean() < 5e-4, d.mean()
    assert d.max() < 5e-3, d.max()


def test_tiled_sr_mesh_matches_single_device(small_48):
    """The mesh path is pure data parallelism over tiles: identical output
    to the unsharded path (padding tiles dropped)."""
    model, params = small_48
    rng = np.random.default_rng(1)
    win = _smooth_clip(rng, 7, 1, 48, 48)[None]
    ref = tiled_sr(model, params, win, tile=32, overlap=8)
    mesh = make_mesh()
    got = tiled_sr(model, params, win, tile=32, overlap=8, mesh=mesh)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_spatial_partition_eval_exact(small_48):
    """GSPMD spatial partition: H sharded over the 8-device mesh, XLA
    inserts the collectives for the cross-shard DFT/resize contractions —
    output equals the single-device forward (exact gather path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, params = small_48
    rng = np.random.default_rng(2)
    win = jnp.asarray(_smooth_clip(rng, 7, 1, 48, 48)[None])
    ref = np.asarray(model.apply(params, win))

    mesh = make_mesh()
    xs = jax.device_put(win, NamedSharding(mesh, P(None, None, None, "data")))
    got = np.asarray(jax.jit(model.apply)(params, xs))
    np.testing.assert_allclose(got, ref, atol=2e-5)
