"""DCT op goldens vs the torch grouped-conv formulation; FTVSR shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fcvsr_tpu.ops.dct import (
    adaptive_avg_pool,
    block_dct,
    block_idct,
    dct_basis,
    pad_images_for_dct,
    patch_grid,
    space_to_depth,
)


def test_block_dct_matches_torch_conv():
    """The reference dct_layer is a stride-8 grouped conv with cosine filters
    (dct.py:34-48); our einsum must agree."""
    rng = np.random.default_rng(0)
    c = 3
    x = rng.standard_normal((2, c, 16, 24)).astype(np.float32)
    basis = torch.from_numpy(dct_basis(8)).unsqueeze(1)  # (64,1,8,8)
    weight = torch.cat([basis] * c, dim=0)  # (192,1,8,8)
    ref = F.conv2d(torch.from_numpy(x), weight, stride=8, groups=c).numpy()
    got = np.asarray(block_dct(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref,
                               atol=1e-4, rtol=1e-4)


def test_block_dct_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    rec = block_idct(block_dct(x))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)


def test_space_to_depth_matches_unfold():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 8, 12)).astype(np.float32)  # NCHW
    ref = F.unfold(torch.from_numpy(x), kernel_size=4, stride=4)  # (1, c*16, L)
    ref = F.fold(ref, output_size=(2, 3), kernel_size=1).numpy()  # (1, c*16, 2, 3)
    got = np.asarray(space_to_depth(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 4))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=1e-6)


def test_patch_grid_matches_unfold_fold():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 16, 16)).astype(np.float32)
    k, s, p = 6, 4, 1
    u = F.unfold(torch.from_numpy(x), kernel_size=k, padding=p, stride=s)
    nb = 4  # (16 + 2 - 6)//4 + 1
    ref = F.fold(u, output_size=(nb * k, nb * k), kernel_size=k, stride=k).numpy()
    got = np.asarray(patch_grid(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), k, s, p))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=1e-6)


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 24, 24)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), (16, 10)).numpy()
    got = np.asarray(adaptive_avg_pool(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 16, 10))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref,
                               atol=1e-5, rtol=1e-5)


def test_pad_images_for_dct_quirks():
    imgs = jnp.asarray(np.random.default_rng(5).standard_normal((1, 2, 13, 16, 3)),
                       jnp.float32)
    out, ph, pw = pad_images_for_dct(imgs)
    assert out.shape == (1, 2, 16, 16, 3)
    assert (ph, pw) == (3, 0)
    # pw == 0 -> reference copies nothing (empty slice quirk): bottom rows zero
    assert np.all(np.asarray(out[:, :, 13:, :, :]) == 0)


@pytest.mark.slow
def test_ftvsr_forward():
    from fcvsr_tpu.models.ftvsr import FTVSRNet

    m = FTVSRNet(mid_channels=8, num_blocks=1, keyframe_stride=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 3, 3, 64, 64)),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 3, 3, 256, 256)
    assert np.isfinite(np.asarray(y)).all()


def test_ftta_layer_shapes():
    from fcvsr_tpu.models.ftvsr import FTTALayer

    m = FTTALayer(channel=144, d_model=48, n_heads=4)
    q = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 16, 144)),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), q, q, q)
    out = m.apply(p, q, q, q)
    assert out.shape == q.shape


def test_ltam_shapes():
    from fcvsr_tpu.models.ftvsr import LTAM

    b, h, w, c, t, s = 1, 16, 16, 8, 2, 4
    rng = np.random.default_rng(2)
    m = LTAM(stride=s)
    cur = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    anchor = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    sd = jnp.asarray(rng.standard_normal((b, t, h // s, w // s, c * s * s)),
                     jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 3, (b, t, h // s, w // s, 2)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), cur, sd, anchor, sd, sd, sd, loc)
    out = m.apply(p, cur, sd, anchor, sd, sd, sd, loc)
    assert out.shape == anchor.shape
