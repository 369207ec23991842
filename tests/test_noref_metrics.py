"""No-reference metric tests: matlab imresize golden, NIQE/BRISQUE sanity
with the released parameter files (read from the reference snapshot as
external data inputs)."""

import os

import numpy as np
import pytest

from fcvsr_tpu.metrics.noref import (
    brisque_features,
    calculate_brisque,
    calculate_niqe,
    matlab_imresize,
    niqe_features,
)

NIQE_MAT = "/root/reference/CVSR_train/metric/weight/niqe_modelparameters.mat"
BRISQUE_PTH = "/root/reference/CVSR_train/metric/weight/brisque_svm_weights.pth"


def test_matlab_imresize_antialias_downsample():
    """Antialiased 0.5x of a constant image stays constant; of a checkerboard
    it averages toward the mean (the antialias kernel spans >2 px)."""
    const = np.full((16, 16), 3.7)
    out = matlab_imresize(const, 0.5)
    assert out.shape == (8, 8)
    np.testing.assert_allclose(out, 3.7, atol=1e-10)

    cb = np.indices((16, 16)).sum(0) % 2 * 1.0
    out = matlab_imresize(cb, 0.5)
    assert np.abs(out - 0.5).max() < 0.2


def test_matlab_imresize_known_ramp():
    """A linear ramp must stay (nearly) linear under cubic resampling."""
    ramp = np.tile(np.arange(16, dtype=np.float64), (16, 1))
    out = matlab_imresize(ramp, 0.5)
    diffs = np.diff(out[0][2:-2])  # interior (8-tap antialias kernel bends 2 edge px)
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-6)


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 8, w // 8))
    from fcvsr_tpu.metrics.farneback import _resize_bilinear_np

    return _resize_bilinear_np(base, h, w)


def test_niqe_features_shape():
    img = _textured(192, 192)
    f = niqe_features(img)
    assert f.shape == (4, 36)
    assert np.isfinite(f).all()


@pytest.mark.skipif(not os.path.exists(NIQE_MAT), reason="params not present")
def test_niqe_score_orders_degradation():
    clean = _textured(192, 288, 1)
    noisy = np.clip(clean + np.random.default_rng(2).normal(0, 40, clean.shape),
                    0, 255)
    s_clean = calculate_niqe(clean, NIQE_MAT)
    s_noisy = calculate_niqe(noisy, NIQE_MAT)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_clean != s_noisy


def test_brisque_features_shape():
    f = brisque_features(_textured(128, 128, 3))
    assert f.shape == (36,)
    assert np.isfinite(f).all()


@pytest.mark.skipif(not os.path.exists(BRISQUE_PTH), reason="weights not present")
def test_brisque_score_runs():
    img = _textured(128, 160, 4)
    s = calculate_brisque(img, BRISQUE_PTH)
    assert np.isfinite(s)
