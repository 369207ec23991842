"""End-to-end BasicVSR parity vs an independent torch mirror (zoo evidence,
same method as tests/test_parity_torch.py for FCVSR)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from fcvsr_tpu.models.basicvsr import BasicVSRNet
from tests.test_spynet_basicvsr import TorchSpyNet


class TorchBasicVSR(nn.Module):
    """Independent torch mirror of mmedit BasicVSRNet semantics
    (basicvsr_net.py:15-167), reduced sizes for test speed."""

    def __init__(self, mid=8, blocks=1):
        super().__init__()
        self.mid = mid
        self.spynet = TorchSpyNet()

        def trunk(cin):
            layers = [nn.Conv2d(cin, mid, 3, padding=1), nn.LeakyReLU(0.1)]
            for _ in range(blocks):
                layers.append(_Res(mid))
            return nn.Sequential(*layers)

        self.backward_resblocks = trunk(mid + 3)
        self.forward_resblocks = trunk(mid + 3)
        self.fusion = nn.Conv2d(mid * 2, mid, 1)
        self.up1 = nn.Conv2d(mid, mid * 4, 3, padding=1)
        self.up2 = nn.Conv2d(mid, 64 * 4, 3, padding=1)
        self.conv_hr = nn.Conv2d(64, 64, 3, padding=1)
        self.conv_last = nn.Conv2d(64, 3, 3, padding=1)

    @staticmethod
    def _warp(x, flow):
        n, c, h, w = x.shape
        gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack((gx, gy), 2).float()
        v = grid[None] + flow.permute(0, 2, 3, 1)
        vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
        vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
        return F.grid_sample(x, torch.stack((vx, vy), 3), mode="bilinear",
                             padding_mode="zeros", align_corners=True)

    def forward(self, lrs):
        n, t, c, h, w = lrs.shape
        l1 = lrs[:, :-1].reshape(-1, c, h, w)
        l2 = lrs[:, 1:].reshape(-1, c, h, w)
        flows_b = self.spynet(l1, l2).view(n, t - 1, 2, h, w)
        flows_f = self.spynet(l2, l1).view(n, t - 1, 2, h, w)

        outs = []
        feat = lrs.new_zeros(n, self.mid, h, w)
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                feat = self._warp(feat, flows_b[:, i])
            feat = self.backward_resblocks(torch.cat([lrs[:, i], feat], 1))
            outs.append(feat)
        outs = outs[::-1]

        feat = torch.zeros_like(feat)
        results = []
        for i in range(t):
            if i > 0:
                feat = self._warp(feat, flows_f[:, i - 1])
            feat = self.forward_resblocks(torch.cat([lrs[:, i], feat], 1))
            out = F.leaky_relu(self.fusion(torch.cat([outs[i], feat], 1)), 0.1)
            out = F.leaky_relu(F.pixel_shuffle(self.up1(out), 2), 0.1)
            out = F.leaky_relu(F.pixel_shuffle(self.up2(out), 2), 0.1)
            out = F.leaky_relu(self.conv_hr(out), 0.1)
            out = self.conv_last(out)
            base = F.interpolate(lrs[:, i], scale_factor=4, mode="bilinear",
                                 align_corners=False)
            results.append(out + base)
        return torch.stack(results, 1)


class _Res(nn.Module):
    def __init__(self, mid):
        super().__init__()
        self.conv1 = nn.Conv2d(mid, mid, 3, padding=1)
        self.conv2 = nn.Conv2d(mid, mid, 3, padding=1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(x)))


def _convert(tm: TorchBasicVSR, jm: BasicVSRNet, params0):
    """Map the mirror's weights onto the flax BasicVSRNet tree."""
    import flax

    from fcvsr_tpu.models.spynet import convert_spynet_state_dict

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    flat = flax.traverse_util.flatten_dict(params0["params"])
    out = {}

    def conv(src):
        return np.transpose(sd[src + ".weight"], (2, 3, 1, 0)), sd[src + ".bias"]

    spy_params = convert_spynet_state_dict(
        {k[len("spynet."):]: v for k, v in sd.items() if k.startswith("spynet.")},
        {"params": flax.traverse_util.unflatten_dict(
            {k[1:]: v for k, v in flat.items() if k[0] == "spynet"})})

    for key, template in flat.items():
        if key[0] == "spynet":
            v = flax.traverse_util.flatten_dict(spy_params["params"])[key[1:]]
        else:
            if key[0] in ("backward", "forward"):
                trunk = ("backward_resblocks" if key[0] == "backward"
                         else "forward_resblocks")
                sub = key[2]  # inside resblocks module
                if sub == "input_conv":
                    k_, b_ = conv(f"{trunk}.0")
                else:  # blockN
                    n = int(sub[len("block"):])
                    cn = key[3]  # conv1/conv2
                    k_, b_ = conv(f"{trunk}.{2 + n}.{cn}")
                v = k_ if key[-1] == "kernel" else b_
            elif key[0] == "fusion":
                k_, b_ = conv("fusion")
                v = k_ if key[-1] == "kernel" else b_
            elif key[0] in ("upsample1", "upsample2"):
                src = "up1" if key[0] == "upsample1" else "up2"
                k_, b_ = conv(src)
                v = k_ if key[-1] == "kernel" else b_
            elif key[0] in ("conv_hr", "conv_last"):
                k_, b_ = conv(key[0])
                v = k_ if key[-1] == "kernel" else b_
            else:
                raise KeyError(key)
        assert v.shape == template.shape, (key, v.shape, template.shape)
        out[key] = np.asarray(v, np.float32)
    return {"params": flax.traverse_util.unflatten_dict(out)}


@pytest.mark.slow
def test_basicvsr_parity():
    torch.manual_seed(0)
    tm = TorchBasicVSR(mid=8, blocks=1)
    jm = BasicVSRNet(mid_channels=8, num_blocks=1)
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    params0 = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _convert(tm, jm, params0)
    got = np.asarray(jm.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 2e-4, f"max deviation {err}"
