"""Extended block library tests: torch goldens for the shift ops and FFT
attention; shape/finiteness checks for the rest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fcvsr_tpu.models.blocks_ext import (
    CAB,
    CAB1,
    CAB2,
    EncoderShiftBlock,
    FFTSpatialModule,
    FourierUnit,
    FSAS,
    FSAS_freq,
    MultiFreqAgg,
    PixelShufflePack,
    ResidualBlocksWithInputConv,
    SAM,
    SKFF,
    SpaFreqBlock,
    SpatialAttention,
    TFDC,
    TFRUNet,
    channel_shift,
    spatial_shift24,
)


def _init_apply(module, *shapes, method=None):
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal(s), jnp.float32)
          for i, s in enumerate(shapes)]
    params = module.init(jax.random.PRNGKey(0), *xs)
    out = module.apply(params, *xs)
    return out


@pytest.mark.parametrize("mod,shapes,out_shape", [
    (CAB(16), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (CAB1(16, 5, 4), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (CAB2(16, add_channel=8), [(2, 8, 8, 24)], (2, 8, 8, 16)),
    (FSAS(16), [(2, 16, 16, 16)], (2, 16, 16, 16)),
    (FSAS_freq(16, add_channel=8), [(2, 16, 16, 24)], (2, 16, 16, 16)),
    (FFTSpatialModule(16), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (TFDC(16), [(2, 8, 8, 48)], (2, 8, 8, 16)),
    (FourierUnit(16), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (SpatialAttention(), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (SpaFreqBlock(16), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (PixelShufflePack(8, 2), [(2, 8, 8, 16)], (2, 16, 16, 8)),
    (ResidualBlocksWithInputConv(16, 2), [(2, 8, 8, 8)], (2, 8, 8, 16)),
    (TFRUNet(16), [(2, 8, 8, 16)], (2, 8, 8, 16)),
    (EncoderShiftBlock(16), [(4, 16, 16, 16)], (4, 16, 16, 16)),
    (EncoderShiftBlock(16, use_fsas=True), [(4, 16, 16, 16)], (4, 16, 16, 16)),
])
def test_block_shapes_finite(mod, shapes, out_shape):
    out = _init_apply(mod, *shapes)
    assert out.shape == out_shape
    assert np.isfinite(np.asarray(out)).all()


def test_sam_two_outputs():
    m = SAM(16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 16)), jnp.float32)
    img = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 3)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, img)
    y, out_img = m.apply(p, x, img)
    assert y.shape == x.shape and out_img.shape == img.shape


def test_skff_height1_is_difference():
    """Reference SKFF(height=1): softmax over a singleton==1 -> a - b."""
    m = SKFF(16)
    a = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 16)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 16)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), [a, b])
    out = m.apply(p, [a, b])
    np.testing.assert_allclose(np.asarray(out), np.asarray(a - b), atol=1e-6)


def test_multifreq_agg_softmax_weights():
    m = MultiFreqAgg(16, height=3)
    feats = [jnp.asarray(np.random.default_rng(i).standard_normal((1, 8, 8, 16)),
                         jnp.float32) for i in range(3)]
    p = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(p, feats)
    assert out.shape == (1, 8, 8, 16)


def _torch_spatial_shift(hw_nchw: np.ndarray, number: int) -> np.ndarray:
    """Independent torch expression of spatial_shift2 (CVSR_freq.py:2284-2317)."""
    hw = torch.from_numpy(hw_nchw)
    n2 = (number - 1) // 2
    n1 = number - 2 * n2
    s = 4
    out = torch.zeros_like(hw)
    dirs16 = [(2, 2), (2, 1), (2, 0), (2, -1), (2, -2),
              (-2, 2), (-2, 1), (-2, 0), (-2, -1), (-2, -2),
              (1, 2), (1, -2), (0, 2), (0, -2), (-1, 2), (-1, -2)]
    dirs8 = [(1, 1), (1, 0), (1, -1), (0, 1), (0, -1), (-1, 1), (-1, 0), (-1, -1)]
    c = 0
    for (my, mx) in dirs16:
        sy, sx = my * s, mx * s
        seg = hw[:, c : c + n2]
        sl_oy = slice(max(sy, 0), seg.shape[2] + min(sy, 0))
        sl_ox = slice(max(sx, 0), seg.shape[3] + min(sx, 0))
        sl_iy = slice(max(-sy, 0), seg.shape[2] + min(-sy, 0))
        sl_ix = slice(max(-sx, 0), seg.shape[3] + min(-sx, 0))
        out[:, c : c + n2, sl_oy, sl_ox] = seg[:, :, sl_iy, sl_ix]
        c += n2
    for (my, mx) in dirs8:
        sy, sx = my * s, mx * s
        seg = hw[:, c : c + n1]
        sl_oy = slice(max(sy, 0), seg.shape[2] + min(sy, 0))
        sl_ox = slice(max(sx, 0), seg.shape[3] + min(sx, 0))
        sl_iy = slice(max(-sy, 0), seg.shape[2] + min(-sy, 0))
        sl_ix = slice(max(-sx, 0), seg.shape[3] + min(-sx, 0))
        out[:, c : c + n1, sl_oy, sl_ox] = seg[:, :, sl_iy, sl_ix]
        c += n1
    return out.numpy()


def test_spatial_shift24_matches_torch():
    number = 4  # 8*number = 32 channels
    hw = np.random.default_rng(0).standard_normal((2, 32, 24, 20)).astype(np.float32)
    got = np.asarray(spatial_shift24(jnp.asarray(np.transpose(hw, (0, 2, 3, 1))), number))
    ref = _torch_spatial_shift(hw, number)
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=1e-6)


def test_channel_shift_matches_torch():
    """channel_shift rolls (frame, channel)-flattened channels and keeps the
    boundary frame unrolled (CVSR_freq.py:2318-2336)."""
    number = 2
    b, c, h, w = 4, 32, 16, 16
    x = np.random.default_rng(1).standard_normal((b, c, h, w)).astype(np.float32)

    def ref(x, reverse):
        t = torch.from_numpy(x)
        slice_c = c // 2 if not reverse else -(c // 2)
        y1 = torch.roll(t.reshape(1, b * c, h, w), slice_c, 1).reshape(b, c, h, w)
        if not reverse:
            y = torch.cat((t[0:1], y1[1:]), dim=0)
            hw = y[:, : 8 * number]
        else:
            y = torch.cat((y1[:-1], t[-1:]), dim=0)
            hw = y[:, -8 * number :]
        hw = torch.from_numpy(_torch_spatial_shift(hw.numpy(), number))
        return torch.cat((y, hw), dim=1).numpy()

    for reverse in (False, True):
        got = np.asarray(channel_shift(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                                       number, reverse=reverse))
        expect = ref(x, reverse)
        np.testing.assert_allclose(got, np.transpose(expect, (0, 2, 3, 1)), atol=1e-6)


def test_fsas_matches_torch_composition():
    """FSAS frequency-product attention core vs direct torch math."""
    p = 8
    q = np.random.default_rng(0).standard_normal((1, 4, 16, 16)).astype(np.float32)
    k = np.random.default_rng(1).standard_normal((1, 4, 16, 16)).astype(np.float32)

    qt = torch.from_numpy(q).reshape(1, 4, 2, p, 2, p).permute(0, 1, 2, 4, 3, 5)
    kt = torch.from_numpy(k).reshape(1, 4, 2, p, 2, p).permute(0, 1, 2, 4, 3, 5)
    out = torch.fft.irfft2(torch.fft.rfft2(qt) * torch.fft.rfft2(kt), s=(p, p))
    ref = out.permute(0, 1, 2, 4, 3, 5).reshape(1, 4, 16, 16).numpy()

    from fcvsr_tpu.models.blocks_ext import _from_patches, _to_patches

    qj = jnp.asarray(np.transpose(q, (0, 2, 3, 1)))
    kj = jnp.asarray(np.transpose(k, (0, 2, 3, 1)))
    got = _from_patches(
        jnp.fft.irfft2(
            jnp.fft.rfft2(_to_patches(qj, p), axes=(3, 4))
            * jnp.fft.rfft2(_to_patches(kj, p), axes=(3, 4)),
            s=(p, p), axes=(3, 4),
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 1)),
                               atol=1e-4, rtol=1e-4)


def test_tfdc_branch_weight_sharing():
    """Branches 1 and 3 share their frequency conv pair (reference aliasing)."""
    m = TFDC(16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 48)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    top = params["params"]
    assert "conv26" in top and "conv4" in top
    assert "conv2" not in top and "conv6" not in top  # single shared module
