"""Metric tests: PSNR/SSIM against independent torch/numpy goldens, and
Farneback flow sanity on synthetic motion."""

import numpy as np
import pytest

from fcvsr_tpu.metrics import (
    calculate_psnr,
    calculate_ssim,
    calculate_tof,
    farneback_flow,
)


def test_psnr_basics():
    img = np.random.default_rng(0).uniform(0, 255, (32, 32, 3)).astype(np.float32)
    assert calculate_psnr(img, img) == float("inf")
    noisy = np.clip(img + 10, 0, 255)
    v = calculate_psnr(img, noisy)
    assert 27 < v < 30  # mse <= 100 -> psnr >= 28.1

def test_psnr_known_value():
    a = np.zeros((8, 8), np.float32)
    b = np.full((8, 8), 10.0, np.float32)
    np.testing.assert_allclose(calculate_psnr(a, b), 20 * np.log10(255 / 10), rtol=1e-6)


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    assert calculate_ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    assert calculate_ssim(img, np.clip(img + rng.normal(0, 25, img.shape), 0, 255)) < 0.99


def test_ssim_matches_reference_formula():
    """Cross-check against a direct dense implementation with an explicitly
    materialised 11x11 window (independent of the separable fast path)."""
    rng = np.random.default_rng(2)
    img1 = rng.uniform(0, 255, (40, 40)).astype(np.float64)
    img2 = np.clip(img1 + rng.normal(0, 12, img1.shape), 0, 255)

    i = np.arange(11) - 5.0
    k = np.exp(-(i ** 2) / 4.5)
    k /= k.sum()
    win = np.outer(k, k)

    def filt(x):
        out = np.zeros((30, 30))
        for a in range(30):
            for b in range(30):
                out[a, b] = (x[a : a + 11, b : b + 11] * win).sum()
        return out

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = filt(img1), filt(img2)
    s1 = filt(img1 ** 2) - mu1 ** 2
    s2 = filt(img2 ** 2) - mu2 ** 2
    s12 = filt(img1 * img2) - mu1 * mu2
    ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
           ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean()
    got = calculate_ssim(img1, img2)
    np.testing.assert_allclose(got, ref, rtol=1e-7)


def test_y_conversion_matches_torch_coeffs():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    from fcvsr_tpu.metrics import bgr2y

    y = bgr2y(img)
    ref = (img / 255.0) @ np.array([24.966, 128.553, 65.481]) + 16.0
    np.testing.assert_allclose(y, ref, rtol=1e-5)
    assert y.min() >= 15.9 and y.max() <= 235.1


def _textured_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 4, w // 4))
    from fcvsr_tpu.metrics.farneback import _resize_bilinear_np

    return _resize_bilinear_np(base, h, w)


def test_farneback_recovers_translation():
    img = _textured_image(96, 96)
    dx, dy = 3, 2
    shifted = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    flow = farneback_flow(img, shifted)
    # interior estimate should be close to (dx, dy); flow maps prev->curr
    inner = flow[24:-24, 24:-24]
    assert abs(np.median(inner[..., 0]) - (-dx)) < 0.75 or \
        abs(np.median(inner[..., 0]) - dx) < 0.75
    assert abs(abs(np.median(inner[..., 1])) - dy) < 0.75


def test_tof_zero_for_identical_sequences():
    a = _textured_image(64, 64, 1)
    b = np.roll(a, 1, axis=0)
    v = calculate_tof(a, b, a, b)
    assert v == pytest.approx(0.0, abs=1e-9)


def test_tof_positive_for_differing_motion():
    a = _textured_image(64, 64, 2)
    b = np.roll(a, 2, axis=1)
    c = np.roll(a, -2, axis=1)
    v = calculate_tof(pred_cur=c, gt_cur=b, pred_pre=a, gt_pre=a)
    assert v > 0.5
