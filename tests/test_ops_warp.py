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


class TestStencilWarp:
    """flow_warp_stencil vs the exact gather path (in-contract flows)."""

    def _cmp(self, flow, h=32, w=48, c=8, atol=1e-5):
        from fcvsr_tpu.ops.warp import flow_warp, flow_warp_stencil

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        ref = flow_warp(x, flow)
        got = flow_warp_stencil(x, flow, radius=3, tile_rows=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=atol)

    def test_small_random_flow(self):
        rng = np.random.default_rng(1)
        self._cmp(jnp.asarray(rng.uniform(-2.5, 2.5, (2, 32, 48, 2)),
                              jnp.float32))

    def test_large_smooth_flow(self):
        rng = np.random.default_rng(2)
        base = jnp.asarray([17.3, -12.6], jnp.float32)
        flow = jnp.broadcast_to(base, (2, 32, 48, 2)) + jnp.asarray(
            rng.uniform(-1.5, 1.5, (2, 32, 48, 2)), jnp.float32)
        self._cmp(flow)

    def test_out_of_image_zero_padding(self):
        # constant flow pushing the right half out of frame: zeros there
        flow = jnp.full((2, 32, 48, 2), 25.0, jnp.float32)
        self._cmp(flow)

    def test_zero_flow_identity(self):
        from fcvsr_tpu.ops.warp import flow_warp_stencil

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 32, 48, 4)), jnp.float32)
        out = flow_warp_stencil(x, jnp.zeros((1, 32, 48, 2)), radius=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
