"""Composed FTVSR end-to-end golden (VERDICT r2 item 6).

The FTTA/LTAM layer transplants (tests/test_ftta_ltam.py) pin the attention
blocks in isolation; this test composes a full torch mirror of FTVSRNet —
SpyNet flows, trajectory-tracked recurrent propagation with LTAM, the
upsampling head, and the FTT frequency transformer over DCT coefficients —
from the already-golden torch oracles plus fresh torch code, transplants the
jax model's weights into it, and checks the whole forward graph at a small
valid width.  TTVSR (the no-FTT head) is pinned the same way.

Reference semantics: mmedit_train sr_backbones/ftvsr.py:24-369 (propagation
+ cross-scale buffers), restorers/ftvsr.py:135-380 (FTT/DCT pipeline).  All
torch code here is written from scratch against those semantics — nothing
is imported from /root/reference.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fcvsr_tpu.models.ftvsr import FTVSRNet
from fcvsr_tpu.ops.dct import dct_basis

from test_ftta_ltam import FTTAOracle, ltam_oracle
from test_spynet_basicvsr import TorchSpyNet

RNG = np.random.default_rng(23)

MID, NBLK, DM, NH, KS, S = 8, 2, 16, 4, 2, 4


def _t(a):
    return torch.from_numpy(np.array(a))


def _conv(x, sub, stride=1):
    w = _t(sub["Conv_0"]["kernel"]).permute(3, 2, 0, 1).contiguous()
    b = _t(sub["Conv_0"]["bias"])
    return F.conv2d(x, w, b, stride=stride, padding=w.shape[-1] // 2)


def _resblocks(x, sub, n):
    y = F.leaky_relu(_conv(x, sub["input_conv"]), 0.1)
    for i in range(n):
        r = _conv(F.relu(_conv(y, sub[f"block{i}"]["conv1"])),
                  sub[f"block{i}"]["conv2"])
        y = y + r
    return y


def _load_spynet(P):
    tm = TorchSpyNet().eval()
    for lvl in range(6):
        seq = tm.basic_module[lvl].basic_module
        for j in range(5):
            sub = P["spynet"][f"level{lvl}"][f"conv{j}"]["Conv_0"]
            seq[2 * j].weight.data = _t(sub["kernel"]).permute(3, 2, 0, 1) \
                .contiguous()
            seq[2 * j].bias.data = _t(sub["bias"])
    return tm


def _load_ftta(P):
    g = math.gcd(144, 64)
    orc = FTTAOracle(144, DM, NH, patch=8, groups=g).eval()
    fp = P["ftta"]
    for name in ("layer_q", "layer_k", "layer_v", "linear1", "linear2"):
        getattr(orc, name).weight.data = _t(fp[name]["kernel"]).T.contiguous()
        getattr(orc, name).bias.data = _t(fp[name]["bias"])
    ipw = torch.cat([_t(fp[f"in_proj_{n}"]["kernel"]).T for n in "qkv"])
    ipb = torch.cat([_t(fp[f"in_proj_{n}"]["bias"]) for n in "qkv"])
    orc.mha.in_proj_weight.data = ipw.contiguous()
    orc.mha.in_proj_bias.data = ipb
    orc.mha.out_proj.weight.data = _t(fp["attn_out"]["kernel"]).T.contiguous()
    orc.mha.out_proj.bias.data = _t(fp["attn_out"]["bias"])
    for name in ("norm1", "norm2"):
        getattr(orc, name).weight.data = _t(fp[name]["scale"])
        getattr(orc, name).bias.data = _t(fp[name]["bias"])
    return orc


def _warp(x, flow, mode):
    n, c, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    v = torch.stack((gx, gy), 2).float()[None] + flow.permute(0, 2, 3, 1)
    vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack((vx, vy), 3), mode=mode,
                         padding_mode="border", align_corners=True)


def _s2d(x, s):
    n, c, h, w = x.shape
    return F.unfold(x, s, stride=s).view(n, c * s * s, h // s, w // s)


def _patch_grid(x, k, stride, pad):
    n, c, h, w = x.shape
    nb_h = (h + 2 * pad - k) // stride + 1
    nb_w = (w + 2 * pad - k) // stride + 1
    u = F.unfold(x, k, padding=pad, stride=stride)
    return F.fold(u, (nb_h * k, nb_w * k), k, stride=k)


def _cross_scale(feat, h, w):
    f1 = _s2d(feat, S)
    f2 = _s2d(F.adaptive_avg_pool2d(
        _patch_grid(feat, int(1.5 * S), S, int(0.25 * S)), (h, w)), S)
    f3 = _s2d(F.adaptive_avg_pool2d(
        _patch_grid(feat, 2 * S, S, S // 2), (h, w)), S)
    return f1, f2, f3


def _dct_weight(c=3):
    basis = torch.from_numpy(dct_basis(8)).unsqueeze(1)  # (64,1,8,8)
    return torch.cat([basis] * c, 0)                     # (64c,1,8,8)


def torch_ftvsr_forward(P, lrs, with_ftt=True):
    """Full FTVSR forward in torch; P is the jax model's params['params']."""
    n, t, c, h, w = lrs.shape
    x = [torch.from_numpy(lrs[:, i]) for i in range(t)]
    spynet = _load_spynet(P)
    hb, wb = h // S, w // S

    def flows_of(frames):
        ff = [spynet(frames[i + 1], frames[i]) for i in range(len(frames) - 1)]
        fb = [spynet(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
        return ff, fb

    flows_forward, flows_backward = flows_of(x)
    feats = [_resblocks(xi, P["feat_extractor"], 5) for xi in x]

    gy, gx = torch.meshgrid(torch.arange(hb), torch.arange(wb), indexing="ij")
    grid0 = torch.stack([gx, gy]).float()[None].expand(n, -1, -1, -1)

    fusion_w = _t(P["LTAM"]["fusion"]["Conv_0"]["kernel"]).permute(
        3, 2, 0, 1).contiguous()
    fusion_b = _t(P["LTAM"]["fusion"]["Conv_0"]["bias"])

    def propagate(order, flows, keyset):
        feat_prop = torch.zeros(n, MID, h, w)
        locations = [grid0]
        s1b, s2b, s3b, idxb = [], [], [], []
        outs = {}
        for step, i in enumerate(order):
            cur = feats[i]
            if step > 0:
                flow = flows[step - 1]
                feat_prop = _warp(feat_prop, flow, "bilinear")
                flow_s = F.adaptive_avg_pool2d(flow, (hb, wb)) / S
                locations = [_warp(l, flow_s, "nearest") for l in locations]
                tt = len(s1b)
                feat_prop = ltam_oracle(
                    cur, torch.stack(idxb, 1), feat_prop,
                    torch.stack(s1b, 1), torch.stack(s2b, 1),
                    torch.stack(s3b, 1),
                    torch.cat(locations[:tt], 1), fusion_w, fusion_b, S)
                if i in keyset:
                    locations.append(grid0)
            feat_prop = _resblocks(torch.cat([cur, feat_prop], 1),
                                   P["resblocks"], NBLK)
            outs[i] = feat_prop
            if i in keyset:
                f1, f2, f3 = _cross_scale(feat_prop, h, w)
                s1b.append(f1)
                s2b.append(f2)
                s3b.append(f3)
                idxb.append(_s2d(cur, S))
        return outs

    kf_fwd = set(range(0, t, KS))
    kf_bwd = set(range(t - 1, 0, -KS))
    outs_back = propagate(list(range(t - 1, -1, -1)),
                          flows_backward[::-1], kf_bwd)
    outs_fwd = propagate(list(range(t)), flows_forward, kf_fwd)

    hf, bic = [], []
    for i in range(t):
        o = torch.cat([outs_back[i], feats[i], outs_fwd[i]], 1)
        o = F.leaky_relu(_conv(o, P["fusion"]), 0.1)
        o = F.leaky_relu(F.pixel_shuffle(
            _conv(o, P["upsample1"]["upsample_conv"]), 2), 0.1)
        o = F.leaky_relu(F.pixel_shuffle(
            _conv(o, P["upsample2"]["upsample_conv"]), 2), 0.1)
        o = F.leaky_relu(_conv(o, P["conv_hr"]), 0.1)
        o = _conv(o, P["conv_last"])
        base = F.interpolate(x[i], scale_factor=4, mode="bilinear",
                             align_corners=False)
        bic.append(base)
        hf.append(o + base)

    if not with_ftt:
        return torch.stack(hf, 1)

    # ---- FTT over DCT coefficients (restorers/ftvsr.py:135-380) ----------
    hh, ww = hf[0].shape[2:]
    assert hh % 8 == 0 and ww % 8 == 0  # padding quirk golden-tested separately
    ff2, fb2 = flows_of(hf)

    def small(fl):
        out = F.interpolate(fl, (hh // 8, ww // 8), mode="bilinear",
                            align_corners=False)
        sw, sh = (ww // 8) / ww, (hh // 8) / hh
        return out * torch.tensor([sw, sh]).view(1, 2, 1, 1)

    ff2s = [small(f) for f in ff2]
    fb2s = [small(f) for f in fb2]

    wdct = _dct_weight(3)
    dct_bic0 = [F.conv2d(b_, wdct, stride=8, groups=3) for b_ in bic]
    dct_hf0 = [F.conv2d(h_, wdct, stride=8, groups=3) for h_ in hf]

    def norm_coeff(d0):
        flat = d0.flatten(2)  # (n, 192, tokens)
        nrm = flat.norm(dim=2, keepdim=True).clamp_min(1e-12)
        return (flat / nrm).view_as(d0)

    ftta = _load_ftta(P)
    bic_fea = [_resblocks(_conv(norm_coeff(d), P["conv_layer1"]),
                          P["ftt_feat"], 3) for d in dct_bic0]
    hf_fea = [_resblocks(_conv(norm_coeff(d), P["conv_layer1"]),
                         P["ftt_feat"], 3) for d in dct_hf0]

    def ftt_propagate(order, flows):
        prop = torch.zeros(n, 144, hh // 8, ww // 8)
        outs = {}
        for step, i in enumerate(order):
            if step > 0:
                prop = _warp(prop, flows[step - 1], "bilinear")
                hf_ = ftta(bic_fea[i], hf_fea[i], hf_fea[i])
                prop = ftta(hf_, prop, prop)
            prop = _resblocks(torch.cat([hf_fea[i], prop], 1),
                              P["ftt_res"], 3)
            outs[i] = prop
        return outs

    back = ftt_propagate(list(range(t - 1, -1, -1)), fb2s[::-1])
    fwd = ftt_propagate(list(range(t)), ff2s)

    finals = []
    for i in range(t):
        o = torch.cat([back[i], hf_fea[i], fwd[i]], 1)
        o = _conv(F.leaky_relu(_conv(o, P["ftt_fusion0"]), 0.1),
                  P["ftt_fusion1"])
        o = _conv(o, P["conv_layer2"]) + dct_hf0[i]
        img = F.conv_transpose2d(o, wdct, stride=8, groups=3) + hf[i]
        finals.append(img)
    return torch.stack(finals, 1)


def _run_pair(with_ftt):
    lrs = RNG.uniform(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    model = FTVSRNet(mid_channels=MID, num_blocks=NBLK, d_model=DM,
                     n_heads=NH, keyframe_stride=KS, with_ftt=with_ftt)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(lrs))
    got = np.asarray(model.apply(params, jnp.asarray(lrs)))
    with torch.no_grad():
        ref = torch_ftvsr_forward(params["params"], lrs,
                                  with_ftt=with_ftt).numpy()
    return got, ref


@pytest.mark.slow
def test_ftvsr_forward_matches_composed_torch_mirror():
    got, ref = _run_pair(with_ftt=True)
    dev = np.abs(got - ref).max()
    assert dev < 1e-3, f"max dev {dev}"


@pytest.mark.slow
def test_ttvsr_forward_matches_composed_torch_mirror():
    got, ref = _run_pair(with_ftt=False)
    dev = np.abs(got - ref).max()
    assert dev < 1e-3, f"max dev {dev}"
