"""Deformable conv golden tests vs an independent torch composition.

The torch oracle builds DCNv2 from per-tap grid_sample calls — the published
definition (Dai et al. / Zhu et al.), the same semantics as the reference
CUDA kernels (zero outside, bilinear, (dg, k, [dy, dx]) offset layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fcvsr_tpu.ops.dcn import deform_conv2d, modulated_deform_conv2d


def torch_mdcn(x, offset, mask, weight, bias, stride=1, padding=1, dilation=1,
               groups=1, deform_groups=1):
    """x (B,Cin,H,W); offset (B,dg*K*2,Ho,Wo); mask (B,dg*K,Ho,Wo) or None."""
    x = torch.from_numpy(x)
    offset = torch.from_numpy(offset)
    mask = torch.from_numpy(mask) if mask is not None else None
    weight = torch.from_numpy(weight)
    b, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    k = kh * kw
    dg = deform_groups
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    cg = cin // dg

    off = offset.reshape(b, dg, k, 2, ho, wo)
    base_y = torch.arange(ho) * stride - padding
    base_x = torch.arange(wo) * stride - padding
    cols = torch.zeros(b, ho, wo, k, cin)
    for g in range(dg):
        xg = x[:, g * cg : (g + 1) * cg]
        for t in range(k):
            ty = (t // kw) * dilation
            tx = (t % kw) * dilation
            py = base_y.view(1, ho, 1) + ty + off[:, g, t, 0]
            px = base_x.view(1, 1, wo) + tx + off[:, g, t, 1]
            gx = 2 * px / max(w - 1, 1) - 1
            gy = 2 * py / max(h - 1, 1) - 1
            grid = torch.stack([gx.expand(b, ho, wo), gy.expand(b, ho, wo)], -1)
            s = F.grid_sample(xg, grid, mode="bilinear", padding_mode="zeros",
                              align_corners=True)
            cols[:, :, :, t, g * cg : (g + 1) * cg] = s.permute(0, 2, 3, 1)
    if mask is not None:
        m = mask.reshape(b, dg, k, ho, wo).permute(0, 3, 4, 1, 2)
        m = m.repeat_interleave(cg, dim=3)  # (b,ho,wo,cin,k)
        cols = cols * m.permute(0, 1, 2, 4, 3)
    wk = weight.permute(2, 3, 1, 0).reshape(k, cin_g, cout)
    if groups == 1:
        out = torch.einsum("bhwkc,kco->bhwo", cols, wk)
    else:
        cpg = cin // groups
        opg = cout // groups
        colsg = cols.reshape(b, ho, wo, k, groups, cpg)
        wk2 = wk.reshape(k, cpg, groups, opg)
        out = torch.einsum("bhwkgc,kcgo->bhwgo", colsg, wk2).reshape(
            b, ho, wo, cout)
    if bias is not None:
        out = out + torch.from_numpy(bias)
    return out.permute(0, 3, 1, 2).numpy()


def _mk(b=2, cin=8, h=10, w=12, cout=6, k=3, dg=2, stride=1, padding=1,
        dilation=1, groups=1, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    x = rng.standard_normal((b, cin, h, w)).astype(np.float32)
    offset = (rng.standard_normal((b, dg * k * k * 2, ho, wo)) * 2).astype(np.float32)
    mask = rng.uniform(0, 1, (b, dg * k * k, ho, wo)).astype(np.float32) if with_mask else None
    weight = rng.standard_normal((cout, cin // groups, k, k)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)
    return x, offset, mask, weight, bias


def _run_jax(x, offset, mask, weight, bias, **kw):
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    oj = jnp.asarray(np.transpose(offset, (0, 2, 3, 1)))
    mj = jnp.asarray(np.transpose(mask, (0, 2, 3, 1))) if mask is not None else None
    wj = jnp.asarray(np.transpose(weight, (2, 3, 1, 0)))
    bj = jnp.asarray(bias) if bias is not None else None
    out = modulated_deform_conv2d(xj, oj, mj, wj, bj, **kw)
    return np.transpose(np.asarray(out), (0, 3, 1, 2))


def test_mdcn_basic():
    x, offset, mask, weight, bias = _mk()
    got = _run_jax(x, offset, mask, weight, bias, deform_groups=2)
    ref = torch_mdcn(x, offset, mask, weight, bias, deform_groups=2)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_dcn_v1_no_mask():
    x, offset, _, weight, bias = _mk(with_mask=False, dg=1)
    # rebuild offset for dg=1
    x, offset, _, weight, bias = _mk(with_mask=False, dg=1, seed=3)
    got = _run_jax(x, offset, None, weight, bias, deform_groups=1)
    ref = torch_mdcn(x, offset, None, weight, bias, deform_groups=1)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_mdcn_stride2_dilation2():
    x, offset, mask, weight, bias = _mk(stride=2, padding=2, dilation=2, seed=1)
    kw = dict(stride=2, padding=2, dilation=2, deform_groups=2)
    got = _run_jax(x, offset, mask, weight, bias, **kw)
    ref = torch_mdcn(x, offset, mask, weight, bias, **kw)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_mdcn_groups():
    x, offset, mask, weight, bias = _mk(cin=8, cout=8, groups=2, seed=2)
    got = _run_jax(x, offset, mask, weight, bias, groups=2, deform_groups=2)
    ref = torch_mdcn(x, offset, mask, weight, bias, groups=2, deform_groups=2)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_mdcn_zero_offset_equals_conv():
    """With zero offsets and unit mask, DCN == plain convolution."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    weight = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    offset = np.zeros((1, 18, 8, 8), np.float32)
    mask = np.ones((1, 9, 8, 8), np.float32)
    got = _run_jax(x, offset, mask, weight, None, deform_groups=1)
    ref = torch.conv2d(torch.from_numpy(x), torch.from_numpy(weight),
                       padding=1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_mdcn_differentiable():
    x, offset, mask, weight, bias = _mk(seed=7)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    oj = jnp.asarray(np.transpose(offset, (0, 2, 3, 1)))
    mj = jnp.asarray(np.transpose(mask, (0, 2, 3, 1)))
    wj = jnp.asarray(np.transpose(weight, (2, 3, 1, 0)))

    def loss(o, w):
        return jnp.mean(modulated_deform_conv2d(xj, o, mj, w, None,
                                                deform_groups=2) ** 2)

    go, gw = jax.grad(loss, argnums=(0, 1))(oj, wj)
    assert np.isfinite(np.asarray(go)).all() and np.abs(np.asarray(go)).sum() > 0
    assert np.isfinite(np.asarray(gw)).all()
