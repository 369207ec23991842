"""Golden tests: corr_lookup vs the reference CorrBlock pipeline in torch."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fcvsr_tpu.ops import corr_lookup


def torch_corr_block(f1_nchw, f2_nchw, radius=4):
    """Independent torch expression of CorrBlock semantics
    (CVSR_freq.py:1279-1360): elementwise product, raw memory reshape to
    (B*H*W, 1, C//2, 2), identity-grid +/-r neighbourhood sampled with
    grid_sample(align_corners=True, zeros)."""
    f1 = torch.from_numpy(f1_nchw)
    f2 = torch.from_numpy(f2_nchw)
    b, c, h, w = f1.shape
    corr = (f1.reshape(b, c, h * w) * f2.reshape(b, c, h * w)) / np.sqrt(float(c))
    corr = corr.reshape(b, h, w, 1, c // 2, -1)
    corr = corr.reshape(b * h * w, 1, c // 2, 2)

    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    coords = torch.stack([gx, gy], dim=-1).float().reshape(b and 1, h, w, 2)
    coords = coords.expand(b, h, w, 2).reshape(b * h * w, 1, 1, 2)
    r = radius
    dx = torch.linspace(-r, r, 2 * r + 1)
    dy = torch.linspace(-r, r, 2 * r + 1)
    delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
    coords_lvl = coords + delta.reshape(1, 2 * r + 1, 2 * r + 1, 2)

    hh, ww = corr.shape[-2:]
    xg = 2 * coords_lvl[..., 0] / (ww - 1) - 1
    yg = 2 * coords_lvl[..., 1] / (hh - 1) - 1
    sampled = F.grid_sample(corr, torch.stack([xg, yg], dim=-1),
                            align_corners=True)
    out = sampled.reshape(b, h, w, -1).permute(0, 3, 1, 2)
    return out.numpy()


def test_corr_lookup_matches_torch():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 12, 7, 16  # c = packed freq channels (2*dim)
    f1 = rng.standard_normal((b, h, w, c), dtype=np.float32)
    f2 = rng.standard_normal((b, h, w, c), dtype=np.float32)
    got = np.asarray(corr_lookup(jnp.asarray(f1), jnp.asarray(f2), radius=4))
    ref = torch_corr_block(np.transpose(f1, (0, 3, 1, 2)),
                           np.transpose(f2, (0, 3, 1, 2)), radius=4)
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)),
                               atol=1e-5, rtol=1e-5)


def test_corr_lookup_mostly_zero_far_from_origin():
    # Semantics check: columns beyond radius+1 yield all-zero features.
    rng = np.random.default_rng(1)
    f1 = rng.standard_normal((1, 10, 9, 16), dtype=np.float32)
    f2 = rng.standard_normal((1, 10, 9, 16), dtype=np.float32)
    out = np.asarray(corr_lookup(jnp.asarray(f1), jnp.asarray(f2), radius=4))
    assert np.all(out[:, :, 6:, :] == 0.0)
