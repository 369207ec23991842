"""Golden tests: FFT packing + frequency band split vs torch.fft."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.fft as tfft

from fcvsr_tpu.ops import (
    gaussian_band_masks,
    irfft_features,
    rfft_features,
    split_freq,
)


def test_rfft_features_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 14, 6), dtype=np.float32)
    got = np.asarray(rfft_features(jnp.asarray(x)))
    f = tfft.rfft2(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), norm="backward")
    ref = torch.cat([f.imag, f.real], dim=1).numpy()
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=1e-4, rtol=1e-4)


def test_irfft_features_matches_torch_asymmetric_unpack():
    """Packing is [imag, real] but unpacking treats the first half as real
    (the reference asymmetry, CVSR_freq.py:1497-1499)."""
    rng = np.random.default_rng(1)
    h, w = 10, 12
    xf = rng.standard_normal((1, h, w // 2 + 1, 8), dtype=np.float32)
    got = np.asarray(irfft_features(jnp.asarray(xf), h, w))
    t = torch.from_numpy(np.transpose(xf, (0, 3, 1, 2)))
    y_real, y_imag = torch.chunk(t, 2, dim=1)
    ref = tfft.irfft2(torch.complex(y_real, y_imag), s=(h, w), norm="backward").numpy()
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=1e-4, rtol=1e-4)


def test_split_freq_matches_torch_loop():
    """Vectorised band split == per-channel fftshift/mask/ifftshift loop."""
    rng = np.random.default_rng(2)
    b, h, w, c = 1, 24, 20, 3
    k = 4
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    got = np.asarray(split_freq(jnp.asarray(x), k))  # (K, B, H, W, C)

    _, centered = gaussian_band_masks(k, h, w)
    mask = torch.from_numpy(np.asarray(centered))  # (K, H, W)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    refs = []
    for ch in range(c):
        f = tfft.fftn(xt[:, ch : ch + 1], dim=(2, 3))
        f = tfft.fftshift(f, dim=(2, 3))
        f_split = f * mask  # broadcast -> (B, K, H, W)
        f_split = tfft.ifftshift(f_split, dim=(2, 3))
        refs.append(tfft.ifftn(f_split, dim=(2, 3)).real)
    ref = torch.stack(refs, dim=-1)  # (B, K, H, W, C)
    ref = ref.permute(1, 0, 2, 3, 4).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_band_masks_partition_of_unity_center():
    """Band masks sum to the largest gaussian low-pass by construction."""
    shifted, centered = gaussian_band_masks(8, 64, 64)
    total = np.asarray(centered).sum(0)
    assert total[32, 32] > 0.99  # DC bin fully covered


def test_rfft_features_grouped_layout():
    """groups=3 is a pure channel reorder: each group slice equals the
    classic [imag_i, real_i] re-concat of the g=1 layout (MGAA's zero-copy
    group() contract)."""
    rng = np.random.default_rng(5)
    d = 3
    x = rng.standard_normal((2, 8, 10, 3 * d)).astype(np.float32)
    flat = np.asarray(rfft_features(jnp.asarray(x)))
    grouped = np.asarray(rfft_features(jnp.asarray(x), groups=3))
    for i in range(3):
        classic = np.concatenate(
            [flat[..., i * d : (i + 1) * d],
             flat[..., (3 + i) * d : (4 + i) * d]], -1)
        np.testing.assert_array_equal(
            grouped[..., 2 * d * i : 2 * d * (i + 1)], classic)


def test_ct_factored_h_dft_matches_direct():
    """The two-stage Cooley-Tukey H-DFT (fast path) matches the direct DFT
    and numpy fft at f32 tolerance, at composite sizes incl. 272=16*17."""
    from fcvsr_tpu.ops.freq import _ct_split, _dft_h_ct

    rng = np.random.default_rng(7)
    for h in (12, 34, 272):
        assert _ct_split(h) is not None
        xr = rng.standard_normal((2, h, 3, 2)).astype(np.float32)
        xi = rng.standard_normal((2, h, 3, 2)).astype(np.float32)
        yr, yi = _dft_h_ct(jnp.asarray(xr), jnp.asarray(xi), jnp.float32)
        ref = np.fft.fft(xr + 1j * xi, axis=1)
        scale = np.abs(ref).max()
        assert np.abs(np.asarray(yr) - ref.real).max() < 2e-4 * scale
        assert np.abs(np.asarray(yi) - ref.imag).max() < 2e-4 * scale


def test_rfft_features_bf16_ct_bounded():
    """Full fast-path rfft_features (bf16 + CT H-stage) stays within bf16
    bounded deviation of the exact transform."""
    from fcvsr_tpu.ops import freq

    old = freq._FFT_IMPL
    freq.set_fft_impl("dft")
    try:
        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 32, 20, 6)).astype(np.float32)
        exact = np.asarray(rfft_features(jnp.asarray(x)))
        scale = np.abs(exact).max()
        for ct in (False, True):
            freq.set_dft_ct(ct)
            jax.clear_caches()
            fast = np.asarray(rfft_features(jnp.asarray(x),
                                            compute_dtype=jnp.bfloat16))
            assert np.abs(fast.astype(np.float32) - exact).max() \
                < 3e-2 * scale, ct
    finally:
        freq.set_fft_impl(old)
        freq.set_dft_ct(False)


def test_ct_factored_w_rdft_matches_numpy():
    from fcvsr_tpu.ops.freq import _ct_split, _dft_w_ct

    rng = np.random.default_rng(9)
    for w in (12, 30, 480):
        assert _ct_split(w) is not None
        x = rng.standard_normal((2, 5, w, 3)).astype(np.float32)
        wf = w // 2 + 1
        yr, yi = _dft_w_ct(jnp.asarray(x), wf, jnp.float32)
        ref = np.fft.rfft(x, axis=2)
        scale = np.abs(ref).max()
        assert np.abs(np.asarray(yr) - ref.real).max() < 2e-4 * scale
        assert np.abs(np.asarray(yi) - ref.imag).max() < 2e-4 * scale
