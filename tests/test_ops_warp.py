"""Golden tests: flow_warp vs torch grid_sample (align_corners=True, zeros)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fcvsr_tpu.ops import flow_warp


def torch_flow_warp(x_nchw: np.ndarray, flow_nhwc2: np.ndarray) -> np.ndarray:
    """Independent torch expression of the reference flow_warp semantics."""
    x = torch.from_numpy(x_nchw)
    flow = torch.from_numpy(flow_nhwc2)
    n, c, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()
    gf = grid[None] + flow
    gfx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
    gfy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
    out = F.grid_sample(x, torch.stack((gfx, gfy), dim=3), mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    return out.numpy()


def test_flow_warp_matches_torch():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 13, 17, 6
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 3.0).astype(np.float32)
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    ref = torch_flow_warp(np.transpose(x, (0, 3, 1, 2)), flow)
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=1e-5, rtol=1e-5)


def test_flow_warp_zero_flow_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 9, 3), dtype=np.float32)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.zeros((1, 8, 9, 2), np.float32)))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_flow_warp_large_flow_zero_padding():
    x = np.ones((1, 6, 6, 1), np.float32)
    flow = np.full((1, 6, 6, 2), 100.0, np.float32)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
