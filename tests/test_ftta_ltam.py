"""FTVSR attention goldens: FTTA layer and LTAM vs fresh torch oracles with
transplanted weights (VERDICT r1 #6).

The torch oracles express the reference semantics (restorers/ftvsr.py /
sr_backbones/ftvsr.py FTTA_layer:627-702, LTAM:371-468) written from
scratch; the FTTA oracle generalises the hard-coded 64 channel groups so the
valid-grouping path is testable at small widths (the shipped channel=144
with 64 groups crashes upstream — that defect and our gcd workaround are
documented on FTTALayer.freq_groups).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

from fcvsr_tpu.models.ftvsr import FTTALayer, LTAM

RNG = np.random.default_rng(17)


# ------------------------------ FTTA oracle ----------------------------------


class FTTAOracle(tnn.Module):
    def __init__(self, channel, d_model, n_heads, patch=8, groups=64):
        super().__init__()
        self.p = patch
        self.groups = groups
        inpl = (channel // groups) * patch * patch
        self.layer_q = tnn.Linear(inpl, d_model)
        self.layer_k = tnn.Linear(inpl, d_model)
        self.layer_v = tnn.Linear(inpl, d_model)
        self.mha = tnn.MultiheadAttention(d_model, n_heads)
        self.norm1 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_model)
        self.norm2 = tnn.LayerNorm(d_model)
        self.linear2 = tnn.Linear(d_model, inpl)

    def forward(self, q, k, v):
        n, c, h, w = q.shape
        g, p = self.groups, self.p

        def unfold_tokens(x):
            xs = x.reshape(n * g, -1, h, w)
            u = F.unfold(xs, (p, p), stride=p)          # (n*g, cg*p*p, num)
            bf, d, num = u.shape
            return u.view(n, g, d, num).permute(0, 1, 3, 2).reshape(n, -1, d)

        qs = self.layer_q(unfold_tokens(q))
        ks = self.layer_k(unfold_tokens(k))
        vs = self.layer_v(unfold_tokens(v))
        qs, ks, vs = (t.permute(1, 0, 2) for t in (qs, ks, vs))
        attn, _ = self.mha(qs, ks, vs)
        out = self.norm1(attn + vs).permute(1, 0, 2)

        x2 = F.leaky_relu(self.linear1(out), 0.1)
        out = self.norm2(x2 + out)
        out = self.linear2(out)

        num = (h // p) * (w // p)
        d = out.shape[-1]
        out = out.view(n, g, num, d).permute(0, 1, 3, 2).reshape(n * g, d, num)
        out = F.fold(out, (h, w), (p, p), stride=p)
        return out.view(n, c, h, w)


def _dense(linear):
    return {"kernel": linear.weight.detach().numpy().T,
            "bias": linear.bias.detach().numpy()}


def _ln(norm):
    return {"scale": norm.weight.detach().numpy(),
            "bias": norm.bias.detach().numpy()}


def test_ftta_layer_matches_torch_oracle():
    c, d_model, nh, p, g = 32, 16, 4, 4, 8
    torch.manual_seed(0)
    oracle = FTTAOracle(c, d_model, nh, patch=p, groups=g).eval()

    dm = d_model
    ipw = oracle.mha.in_proj_weight.detach().numpy()
    ipb = oracle.mha.in_proj_bias.detach().numpy()
    params = {"params": {
        "layer_q": _dense(oracle.layer_q),
        "layer_k": _dense(oracle.layer_k),
        "layer_v": _dense(oracle.layer_v),
        "in_proj_q": {"kernel": ipw[:dm].T, "bias": ipb[:dm]},
        "in_proj_k": {"kernel": ipw[dm:2 * dm].T, "bias": ipb[dm:2 * dm]},
        "in_proj_v": {"kernel": ipw[2 * dm:].T, "bias": ipb[2 * dm:]},
        "attn_out": _dense(oracle.mha.out_proj),
        "norm1": _ln(oracle.norm1),
        "linear1": _dense(oracle.linear1),
        "norm2": _ln(oracle.norm2),
        "linear2": _dense(oracle.linear2),
    }}

    h = w = 8
    q = RNG.standard_normal((1, h, w, c)).astype(np.float32)
    k = RNG.standard_normal((1, h, w, c)).astype(np.float32)
    v = RNG.standard_normal((1, h, w, c)).astype(np.float32)

    layer = FTTALayer(c, d_model, nh, patch=p, freq_groups=g)
    got = layer.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    with torch.no_grad():
        ref = oracle(*(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
                       for x in (q, k, v)))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_ftta_invalid_groups_raises():
    layer = FTTALayer(144, 16, 4, freq_groups=64)
    x = jnp.zeros((1, 8, 8, 144))
    with pytest.raises(ValueError, match="defect"):
        layer.init(jax.random.PRNGKey(0), x, x, x)


def test_ftta_gcd_workaround_runs():
    layer = FTTALayer(144, 16, 4, freq_groups=None)
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 144)), jnp.float32)
    p = layer.init(jax.random.PRNGKey(0), x, x, x)
    out = layer.apply(p, x, x, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


# ------------------------------ LTAM oracle ----------------------------------


def ltam_oracle(curr_feat, index_set, anchor_feat, s1, s2, s3, location,
                fusion_w, fusion_b, stride=4):
    """Reference LTAM semantics in torch, NCHW (fresh implementation)."""
    n, c, h, w = anchor_feat.shape
    t = s1.shape[1]
    s = stride
    hb, wb = h // s, w // s
    feat_len = c * s * s
    feat_num = hb * wb

    grid = location.view(n, t, 2, hb, wb).permute(0, 1, 3, 4, 2)
    gx = 2.0 * grid[..., 0] / max(wb - 1, 1) - 1.0
    gy = 2.0 * grid[..., 1] / max(hb - 1, 1) - 1.0
    grid = torch.stack((gx, gy), dim=4).view(-1, hb, wb, 2)

    def samp(buf):
        return F.grid_sample(buf.reshape(-1, feat_len, hb, wb), grid,
                             mode="nearest", padding_mode="zeros",
                             align_corners=True)

    o1, o2, o3, idx = samp(s1), samp(s2), samp(s3), samp(index_set)

    cf = F.unfold(curr_feat, (s, s), stride=s).permute(0, 2, 1)
    cf = F.normalize(cf, dim=2).unsqueeze(3)
    ix = idx.view(n, t, feat_len, feat_num).permute(0, 3, 1, 2)
    ix = F.normalize(ix, dim=3)
    m = torch.matmul(ix, cf).squeeze(3)
    corr_soft, corr_index = torch.max(m, dim=2)
    soft = corr_soft.unsqueeze(1).expand(-1, feat_len, -1)
    soft = F.fold(soft, (h, w), (s, s), stride=s)

    outs = []
    for o in (o1, o2, o3):
        ov = o.view(n, t, feat_len, feat_num)
        got = torch.gather(ov, 1, corr_index.view(n, 1, 1, feat_num)
                           .expand(-1, -1, feat_len, -1)).squeeze(1)
        outs.append(F.fold(got, (h, w), (s, s), stride=s))
    out = torch.cat(outs, dim=1)
    out = F.conv2d(out, fusion_w, fusion_b, padding=1)
    return out * soft + anchor_feat


def test_ltam_matches_torch_oracle():
    n, c, h, w, t, s = 1, 8, 16, 16, 3, 4
    hb, wb = h // s, w // s
    d = c * s * s
    torch.manual_seed(1)
    fusion_w = torch.randn(c, 3 * c, 3, 3) * 0.1
    fusion_b = torch.randn(c) * 0.1

    curr = RNG.standard_normal((n, h, w, c)).astype(np.float32)
    anchor = RNG.standard_normal((n, h, w, c)).astype(np.float32)
    bufs = [RNG.standard_normal((n, t, hb, wb, d)).astype(np.float32)
            for _ in range(4)]
    # tracked locations: in-range block coordinates (x, y)
    loc = np.stack(
        [RNG.uniform(0, wb - 1, (n, t, hb, wb)).astype(np.float32),
         RNG.uniform(0, hb - 1, (n, t, hb, wb)).astype(np.float32)], axis=-1)

    ltam = LTAM(stride=s)
    params = {"params": {"fusion": {"Conv_0": {
        "kernel": np.transpose(fusion_w.numpy(), (2, 3, 1, 0)),
        "bias": fusion_b.numpy(),
    }}}}
    got = ltam.apply(params, jnp.asarray(curr), jnp.asarray(bufs[3]),
                     jnp.asarray(anchor), jnp.asarray(bufs[0]),
                     jnp.asarray(bufs[1]), jnp.asarray(bufs[2]),
                     jnp.asarray(loc))

    def nchw(x):
        return torch.from_numpy(np.moveaxis(x, -1, -3).copy())

    with torch.no_grad():
        ref = ltam_oracle(
            nchw(curr), nchw(bufs[3]), nchw(anchor), nchw(bufs[0]),
            nchw(bufs[1]), nchw(bufs[2]),
            torch.from_numpy(np.moveaxis(loc, -1, 2).reshape(n, 2 * t, hb, wb)
                             .copy()),
            fusion_w, fusion_b, stride=s)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
