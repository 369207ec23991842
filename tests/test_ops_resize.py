"""Golden tests: resize ops vs torch F.interpolate semantics."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fcvsr_tpu.ops import (
    downsample2x_bilinear,
    resize_bicubic,
    resize_bilinear,
    upsample2x_bilinear,
)


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 20), (64, 80)), ((45, 80), (22, 40)),
                                          ((17, 23), (34, 46)), ((64, 80), (32, 40))])
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    got = _np(resize_bilinear(jnp.asarray(x), *out_hw))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                      mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((1024, 1024), (45, 60)), ((32, 32), (180, 320)),
                                          ((64, 48), (64, 48))])
def test_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, *in_hw, 3), dtype=np.float32)
    got = _np(resize_bicubic(jnp.asarray(x), *out_hw))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                      mode="bicubic", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("hw", [(45, 81), (44, 80)])
def test_scale_factor_half_semantics(hw):
    # torch scale_factor=0.5 floors output size and uses the literal scale
    # (not the in/out ratio) — visible on odd sizes.
    x = np.random.default_rng(2).standard_normal((1, *hw, 2), dtype=np.float32)
    got = _np(downsample2x_bilinear(jnp.asarray(x)))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.5,
                      mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("hw", [(13, 17), (16, 20)])
def test_scale_factor_double_semantics(hw):
    x = np.random.default_rng(3).standard_normal((1, *hw, 2), dtype=np.float32)
    got = _np(upsample2x_bilinear(jnp.asarray(x)))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2.0,
                      mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
