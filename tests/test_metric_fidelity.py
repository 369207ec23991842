"""Metric fidelity hardening (VERDICT r1 #8).

* Farnebäck — the polynomial expansion is checked against a brute-force
  per-pixel weighted-least-squares oracle, and the full flow is validated by
  recovering a known smooth non-translational warp on a textured image.
* BRISQUE — the RBF-SVR scoring is golden-tested against an independently
  written oracle on a synthetic SVM model (gamma=0.05 / rho=-153.591 are
  code constants in the reference too, brisque.py:868-871 — the released
  weight file carries only sv_coef and the support vectors).
* LPIPS — the torch-weight loading path is golden-tested against a fresh
  torch oracle of the published LPIPS v0.1 design with transplanted weights.
* RAFT — weight-transplant goldens for the numerics-heavy submodules
  (BasicEncoder with instance norms, SepConvGRU).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

RNG = np.random.default_rng(23)


def _smooth_image(h, w, seed=0):
    """Band-limited random texture (natural-ish statistics)."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((h, w))
    k = np.exp(-np.arange(-6, 7) ** 2 / (2 * 2.5 ** 2))
    k /= k.sum()
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.float64)


# ------------------------------ Farnebäck ------------------------------------


def test_poly_exp_matches_wls_oracle():
    from fcvsr_tpu.metrics.farneback import _poly_exp

    n, sigma = 3, 1.2
    img = _smooth_image(14, 17, seed=1)
    R = _poly_exp(img, n, sigma)

    i = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(i ** 2) / (2 * sigma * sigma))
    g /= g.sum()
    xx, yy = np.meshgrid(i, i)
    wgt = np.outer(g, g).ravel()
    basis = np.stack([np.ones_like(xx).ravel(), xx.ravel(), yy.ravel(),
                      (xx ** 2).ravel(), (yy ** 2).ravel(),
                      (xx * yy).ravel()], axis=1)
    pad = np.pad(img, n, mode="edge")
    sw = np.sqrt(wgt)
    aw = basis * sw[:, None]

    for (y, x) in [(0, 0), (5, 7), (13, 16), (2, 11)]:
        win = pad[y : y + 2 * n + 1, x : x + 2 * n + 1].ravel()
        coef, *_ = np.linalg.lstsq(aw, win * sw, rcond=None)
        # coef = (c, bx, by, axx, ayy, axy); R = (by, bx, ayy, axx, axy)
        np.testing.assert_allclose(
            R[y, x], [coef[2], coef[1], coef[4], coef[3], coef[5]],
            atol=1e-8)


@pytest.mark.slow
def test_farneback_recovers_smooth_nonuniform_flow():
    from fcvsr_tpu.metrics.farneback import farneback_flow

    h, w = 96, 128
    img = _smooth_image(h + 16, w + 16, seed=2)
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # smooth non-translational field: shear + sinusoid, |flow| <= ~2.2 px
    fx = 1.2 + 0.6 * np.sin(2 * np.pi * gy / h)
    fy = -0.8 + 0.5 * np.cos(2 * np.pi * gx / w) + 0.004 * gx

    def bilerp(src, yy, xx):
        y0 = np.floor(yy).astype(int)
        x0 = np.floor(xx).astype(int)
        ty, tx = yy - y0, xx - x0
        return ((1 - ty) * (1 - tx) * src[y0, x0]
                + (1 - ty) * tx * src[y0, x0 + 1]
                + ty * (1 - tx) * src[y0 + 1, x0]
                + ty * tx * src[y0 + 1, x0 + 1])

    prev = img[8 : 8 + h, 8 : 8 + w]
    curr = bilerp(img, gy + 8 - fy, gx + 8 - fx)  # curr(x) = prev(x - f)

    flow = farneback_flow(prev.astype(np.float32), curr.astype(np.float32))
    interior = (slice(12, -12), slice(12, -12))
    epe = np.hypot(flow[..., 0][interior] - fx[interior],
                   flow[..., 1][interior] - fy[interior])
    assert np.median(epe) < 0.25, np.median(epe)
    assert epe.mean() < 0.45, epe.mean()


# ------------------------------- BRISQUE -------------------------------------


def test_brisque_svr_scoring_matches_oracle(tmp_path):
    from fcvsr_tpu.metrics.noref import _BRISQUE_RANGES, calculate_brisque

    rng = np.random.default_rng(4)
    sv = rng.uniform(-1, 1, (25, 36)).astype(np.float32)
    coef = rng.uniform(-2, 2, 25).astype(np.float32)
    path = tmp_path / "svm.pth"
    torch.save((torch.from_numpy(coef), torch.from_numpy(sv)), path)

    img = (_smooth_image(128, 128, seed=5)).astype(np.float32)
    got = calculate_brisque(img, str(path), convert_to=None)

    # independent oracle of the reference scoring chain
    from fcvsr_tpu.metrics.noref import brisque_features

    feats = brisque_features(img.astype(np.float64))
    lo, hi = _BRISQUE_RANGES[:, 0], _BRISQUE_RANGES[:, 1]
    scaled = -1 + 2 * (feats - lo) / (hi - lo)
    kern = np.exp(-0.05 * ((scaled[None] - sv) ** 2).sum(1))
    expect = float(kern @ coef + 153.591)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


# -------------------------------- LPIPS --------------------------------------


def test_lpips_matches_torch_oracle():
    from fcvsr_tpu.metrics.lpips import (LPIPSAlex, load_torch_lpips_weights,
                                         lpips_distance)

    torch.manual_seed(2)
    cfg = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
           (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    convs = [tnn.Conv2d(i, o, k, s, p) for i, o, k, s, p in cfg]
    lins = [tnn.Conv2d(o, 1, 1, bias=False) for _, o, _, _, _ in cfg]
    for m in lins:
        tnn.init.uniform_(m.weight, 0.0, 0.2)  # official heads are >= 0

    backbone_state = {}
    for idx, tk in zip(range(5), ["0", "3", "6", "8", "10"]):
        backbone_state[f"{tk}.weight"] = convs[idx].weight.detach()
        backbone_state[f"{tk}.bias"] = convs[idx].bias.detach()
    lin_state = {f"lin{i}.model.1.weight": lins[i].weight.detach()
                 for i in range(5)}

    model = LPIPSAlex()
    x01 = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    y01 = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    p0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x01), jnp.asarray(y01))
    params = load_torch_lpips_weights(backbone_state, lin_state, p0)
    got = float(lpips_distance(model, params, jnp.asarray(x01),
                               jnp.asarray(y01))[0])

    # fresh torch oracle of the published LPIPS v0.1 forward
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(v):
        out = []
        x = (v - shift) / scale
        for i, conv in enumerate(convs):
            x = F.relu(conv(x))
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return out

    with torch.no_grad():
        fx = feats(torch.from_numpy(x01) * 2 - 1)
        fy = feats(torch.from_numpy(y01) * 2 - 1)
        total = 0.0
        for a, b, lin in zip(fx, fy, lins):
            an = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
            bn = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
            total = total + lin((an - bn) ** 2).mean(dim=(1, 2, 3))
    np.testing.assert_allclose(got, float(total[0]), atol=2e-5)


# --------------------------------- RAFT --------------------------------------


def _conv_params(conv):
    p = {"kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if conv.bias is not None:
        p["bias"] = conv.bias.detach().numpy()
    return p


def _in_params(norm):
    return {"scale": norm.weight.detach().numpy(),
            "bias": norm.bias.detach().numpy()}


def test_raft_encoder_matches_torch_transplant():
    from fcvsr_tpu.models.raft import _BasicEncoder

    torch.manual_seed(3)

    class ResUnitT(tnn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1)
            self.n1 = tnn.InstanceNorm2d(planes, affine=True, eps=1e-6)
            self.n2 = tnn.InstanceNorm2d(planes, affine=True, eps=1e-6)
            self.down = None
            if stride != 1 or cin != planes:
                self.down = tnn.Conv2d(cin, planes, 1, stride)
                self.n3 = tnn.InstanceNorm2d(planes, affine=True, eps=1e-6)

        def forward(self, x):
            y = F.relu(self.n1(self.conv1(x)))
            y = F.relu(self.n2(self.conv2(y)))
            if self.down is not None:
                x = self.n3(self.down(x))
            return F.relu(x + y)

    class EncT(tnn.Module):
        def __init__(self, out_dim=64):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3)
            self.norm1 = tnn.InstanceNorm2d(64, affine=True, eps=1e-6)
            dims = [(64, 64, 1), (64, 64, 1), (64, 96, 2), (96, 96, 1),
                    (96, 128, 2), (128, 128, 1)]
            self.res = tnn.ModuleList([ResUnitT(*d) for d in dims])
            self.conv2 = tnn.Conv2d(128, out_dim, 1)

        def forward(self, x):
            y = F.relu(self.norm1(self.conv1(x)))
            for r in self.res:
                y = r(y)
            return self.conv2(y)

    enc_t = EncT().eval()
    params = {"conv1": {"Conv_0": _conv_params(enc_t.conv1)},
              "norm1": _in_params(enc_t.norm1),
              "conv2": {"Conv_0": _conv_params(enc_t.conv2)}}
    for i, r in enumerate(enc_t.res):
        entry = {"conv1": {"Conv_0": _conv_params(r.conv1)},
                 "conv2": {"Conv_0": _conv_params(r.conv2)},
                 "norm1": _in_params(r.n1), "norm2": _in_params(r.n2)}
        if r.down is not None:
            entry["downsample"] = {"Conv_0": _conv_params(r.down)}
            entry["norm3"] = _in_params(r.n3)
        params[f"res{i}"] = entry

    x = RNG.standard_normal((1, 32, 40, 3)).astype(np.float32)
    enc_j = _BasicEncoder(output_dim=64, norm="instance")
    got = enc_j.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = enc_t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)


def test_raft_gru_matches_torch_transplant():
    from fcvsr_tpu.models.raft import _SepConvGRU

    torch.manual_seed(4)
    hidden, xin = 16, 24

    class GRUT(tnn.Module):
        def __init__(self):
            super().__init__()
            cin = hidden + xin
            self.convz1 = tnn.Conv2d(cin, hidden, (1, 5), padding=(0, 2))
            self.convr1 = tnn.Conv2d(cin, hidden, (1, 5), padding=(0, 2))
            self.convq1 = tnn.Conv2d(cin, hidden, (1, 5), padding=(0, 2))
            self.convz2 = tnn.Conv2d(cin, hidden, (5, 1), padding=(2, 0))
            self.convr2 = tnn.Conv2d(cin, hidden, (5, 1), padding=(2, 0))
            self.convq2 = tnn.Conv2d(cin, hidden, (5, 1), padding=(2, 0))

        def forward(self, h, x):
            for z_, r_, q_ in [(self.convz1, self.convr1, self.convq1),
                               (self.convz2, self.convr2, self.convq2)]:
                hx = torch.cat([h, x], 1)
                z = torch.sigmoid(z_(hx))
                r = torch.sigmoid(r_(hx))
                q = torch.tanh(q_(torch.cat([r * h, x], 1)))
                h = (1 - z) * h + z * q
            return h

    gru_t = GRUT().eval()
    params = {name: _conv_params(getattr(gru_t, name))
              for name in ("convz1", "convr1", "convq1",
                           "convz2", "convr2", "convq2")}

    h0 = RNG.standard_normal((1, 8, 10, hidden)).astype(np.float32)
    x0 = RNG.standard_normal((1, 8, 10, xin)).astype(np.float32)
    gru_j = _SepConvGRU(hidden)
    got = gru_j.apply({"params": params}, jnp.asarray(h0), jnp.asarray(x0))
    with torch.no_grad():
        ref = gru_t(torch.from_numpy(np.transpose(h0, (0, 3, 1, 2))),
                    torch.from_numpy(np.transpose(x0, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               atol=1e-5)


OFFICIAL_LPIPS_LIN = ("/root/reference/CVSR_train/opt/weights/v0.1/alex.pth")


@pytest.mark.skipif(not os.path.exists(OFFICIAL_LPIPS_LIN),
                    reason="official LPIPS linear weights not present")
def test_lpips_loader_ingests_official_linear_heads():
    """The official lpips v0.1 alex linear heads (shipped by the reference
    under opt/weights/) parse through load_torch_lpips_weights — pins the
    real key/shape format, not just our synthetic fixtures.  (The AlexNet
    backbone needs torchvision's pretrained weights, absent offline — a
    random backbone still validates the full mapping path.)"""
    from fcvsr_tpu.metrics.lpips import LPIPSAlex, load_torch_lpips_weights

    lin_state = {k: v for k, v in torch.load(
        OFFICIAL_LPIPS_LIN, map_location="cpu").items()}
    model = LPIPSAlex()
    a = jnp.zeros((1, 3, 64, 64), jnp.float32)  # NCHW in [-1, 1]
    p0 = model.init(jax.random.PRNGKey(0), a, a)
    backbone = {}
    rng = np.random.default_rng(0)
    for tk, (co, ci, k) in {"0": (64, 3, 11), "3": (192, 64, 5),
                            "6": (384, 192, 3), "8": (256, 384, 3),
                            "10": (256, 256, 3)}.items():
        backbone[f"{tk}.weight"] = rng.standard_normal(
            (co, ci, k, k)).astype(np.float32) * 0.05
        backbone[f"{tk}.bias"] = np.zeros(co, np.float32)
    params = load_torch_lpips_weights(backbone, lin_state, p0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)), jnp.float32)
    d_same = float(model.apply(params, x, x)[0])
    d_diff = float(model.apply(params, x, y)[0])
    assert d_same < 1e-6 and d_diff > 0
