"""SPyNet parity vs torch mirror; BasicVSR shape/grad tests."""

import jax
import jax.numpy as jnp
import math
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from fcvsr_tpu.models.spynet import SpyNet, convert_spynet_state_dict, spynet_flow


class TorchSpyNet(nn.Module):
    """Independent torch mirror of the reference SPyNet semantics
    (CVSR_train/arch/spynet/SPynet.py:24-165), reference-compatible keys."""

    def __init__(self, levels=6):
        super().__init__()
        def mk():
            return nn.Sequential(
                nn.Conv2d(8, 32, 7, padding=3), nn.ReLU(),
                nn.Conv2d(32, 64, 7, padding=3), nn.ReLU(),
                nn.Conv2d(64, 32, 7, padding=3), nn.ReLU(),
                nn.Conv2d(32, 16, 7, padding=3), nn.ReLU(),
                nn.Conv2d(16, 2, 7, padding=3))
        self.basic_module = nn.ModuleList(
            [nn.Module() for _ in range(levels)])
        for i in range(levels):
            self.basic_module[i].basic_module = mk()
        self.register_buffer("mean", torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer("std", torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    @staticmethod
    def _warp_border(x, flow):
        n, c, h, w = x.shape
        gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack((gx, gy), 2).float()
        v = grid[None] + flow
        vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
        vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
        return F.grid_sample(x, torch.stack((vx, vy), 3), mode="bilinear",
                             padding_mode="border", align_corners=True)

    def forward(self, ref, supp):
        refs = [(ref - self.mean) / self.std]
        supps = [(supp - self.mean) / self.std]
        for _ in range(5):
            refs.insert(0, F.avg_pool2d(refs[0], 2, 2, count_include_pad=False))
            supps.insert(0, F.avg_pool2d(supps[0], 2, 2, count_include_pad=False))
        flow = refs[0].new_zeros(ref.shape[0], 2, refs[0].shape[2] // 2,
                                 refs[0].shape[3] // 2)
        for level in range(len(refs)):
            up = F.interpolate(flow, scale_factor=2, mode="bilinear",
                               align_corners=True) * 2.0
            if up.size(2) != refs[level].size(2):
                up = F.pad(up, [0, 0, 0, 1], mode="replicate")
            if up.size(3) != refs[level].size(3):
                up = F.pad(up, [0, 1, 0, 0], mode="replicate")
            warped = self._warp_border(supps[level], up.permute(0, 2, 3, 1))
            flow = self.basic_module[level].basic_module(
                torch.cat([refs[level], warped, up], 1)) + up
        return flow


@pytest.fixture(scope="module")
def spynet_pair():
    torch.manual_seed(0)
    tm = TorchSpyNet()
    jm = SpyNet()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    p0 = jm.init(jax.random.PRNGKey(0), x, x)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_spynet_state_dict(state, p0)
    return tm, jm, params


def test_spynet_parity(spynet_pair):
    tm, jm, params = spynet_pair
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    supp = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        tref = torch.from_numpy(np.transpose(ref, (0, 3, 1, 2)))
        tsupp = torch.from_numpy(np.transpose(supp, (0, 3, 1, 2)))
        expect = tm(tref, tsupp).numpy()
    got = np.asarray(jm.apply(params, jnp.asarray(ref), jnp.asarray(supp)))
    np.testing.assert_allclose(got, np.transpose(expect, (0, 2, 3, 1)),
                               atol=2e-4, rtol=2e-4)


def test_spynet_flow_wrapper_odd_size(spynet_pair):
    _, jm, params = spynet_pair
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.uniform(0, 1, (1, 50, 70, 3)), jnp.float32)
    supp = jnp.asarray(rng.uniform(0, 1, (1, 50, 70, 3)), jnp.float32)
    flow = spynet_flow(jm, params, ref, supp)
    assert flow.shape == (1, 50, 70, 2)
    assert np.isfinite(np.asarray(flow)).all()


@pytest.mark.slow
def test_basicvsr_shapes_and_grad():
    from fcvsr_tpu.models.basicvsr import BasicVSRNet

    m = BasicVSRNet(mid_channels=8, num_blocks=1)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 3, 64, 64)),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 4, 3, 256, 256)

    def loss(p):
        return jnp.mean(jnp.abs(m.apply(p, x)))

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
