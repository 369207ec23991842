"""NRQM/PI tests: every feature family is checked against an
independently-written torch oracle (fresh code expressing the reference
semantics of CVSR_train/metric/nrqm.py — never imported, never copied), and
the random-forest scorer against a plain recursive tree walk.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fcvsr_tpu.metrics.noref import matlab_imresize
from fcvsr_tpu.metrics.nrqm import (
    _block_dct_features,
    _gauss_pyramid,
    _gsm_features,
    _im2col_distinct,
    calculate_nrqm,
    gamma_gen_gauss,
    nrqm_features,
    random_forest_predict,
    scf_pyramid,
)

RNG = np.random.default_rng(7)


# ------------------------------ torch oracles -------------------------------


def oracle_gamma(x: torch.Tensor) -> torch.Tensor:
    """GGD shape estimate by table inversion (rows of x)."""
    gamma = torch.arange(0.03, 10 + 0.001, 0.001, dtype=torch.float64)
    r_tab = (torch.lgamma(1 / gamma) + torch.lgamma(3 / gamma)
             - 2 * torch.lgamma(2 / gamma)).exp()
    mean = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=True)
    mean_abs = (x - mean).abs().mean(-1) ** 2
    rho = var / (mean_abs + 1e-7)
    idx = (rho[..., None] - r_tab).abs().argmin(-1)
    return gamma[idx]


def oracle_cv(x: torch.Tensor, eps: float) -> torch.Tensor:
    ax = x.abs()
    return ax.std(-1, unbiased=True) / (ax.mean(-1) + eps)


def oracle_gauss_kernel3() -> torch.Tensor:
    y, x = np.mgrid[-1.0:2.0, -1.0:2.0]
    h = np.exp(-(x * x + y * y) / (2 * 0.5 * 0.5))
    # reference fspecial computes f64 then quantizes via .float()
    return torch.from_numpy((h / h.sum()).astype(np.float32)).double()


def oracle_pyramid(img: torch.Tensor, levels: int = 2):
    """Gaussian pyramid: 3x3 sigma-.5 blur, zero pad, [1::2, 1::2]."""
    k = oracle_gauss_kernel3()[None, None]
    pyr = [img]
    cur = img
    for _ in range(levels):
        blurred = F.conv2d(F.pad(cur[None, None], (1, 1, 1, 1)), k)[0, 0]
        cur = blurred[1::2, 1::2]
        pyr.append(cur)
    return pyr


def oracle_dct2_ortho(blocks: torch.Tensor) -> torch.Tensor:
    n = blocks.shape[-1]
    i = torch.arange(n, dtype=torch.float64)
    m = torch.cos(math.pi * i[:, None] * (2 * i[None] + 1) / (2 * n))
    m = m * math.sqrt(2.0 / n)
    m[0] /= math.sqrt(2.0)
    return torch.einsum("ij,pjk,lk->pil", m, blocks, m)


def oracle_block_dct_feats(im: torch.Tensor) -> np.ndarray:
    """The 6 per-level DCT features via torch unfold."""
    h, w = im.shape
    oh, ow = math.ceil(h / 3), math.ceil(w / 3)
    pr, pc = (oh - 1) * 3 + 7 - h, (ow - 1) * 3 + 7 - w
    x = F.pad(im[None, None], (pc // 2, pc - pc // 2, pr // 2, pr - pr // 2))
    patches = F.unfold(x, 7, stride=3).transpose(1, 2).reshape(-1, 7, 7)
    d = oracle_dct2_ortho(patches)
    flat = d.reshape(-1, 49)[:, 1:]

    g = oracle_gamma(flat).sort()[0]
    cv = oracle_cv(flat, 1e-7).sort()[0]
    n = g.shape[0]
    o1 = torch.cat([d[:, 0, 1:], d[:, 1, 2:], d[:, 2, 4:], d[:, 3, 5:]], -1)
    o2 = torch.cat([d[:, 1, 1:2], d[:, 2, 2:4], d[:, 3, 2:5], d[:, 4, 3:],
                    d[:, 5, 4:], d[:, 6, 4:]], -1)
    o3 = torch.cat([d[:, 1:, 0], d[:, 2:, 1], d[:, 4:, 2], d[:, 5:, 3]], -1)
    rho = torch.stack([oracle_cv(o, 1e-8) for o in (o1, o2, o3)],
                      -1).var(-1, unbiased=True).sort()[0]
    return np.array([
        g[: math.ceil(0.1 * n) + 1].mean(), g.mean(),
        cv[math.floor(0.9 * n):].mean(), cv.mean(),
        rho[math.floor(0.9 * n):].mean(), rho.mean(),
    ])


def oracle_scf_pyramid(img: torch.Tensor, height: int = 2, nbands: int = 6):
    """Complex steerable pyramid in torch (fft-domain raised-cosine masks)."""
    from scipy.special import factorial

    def grid(m, n):
        x = np.linspace(-(m // 2) / (m / 2),
                        (m // 2) / (m / 2) - (1 - m % 2) * 2 / m, num=m)
        y = np.linspace(-(n // 2) / (n / 2),
                        (n // 2) / (n / 2) - (1 - n % 2) * 2 / n, num=n)
        xv, yv = np.meshgrid(y, x)
        ang = np.arctan2(yv, xv)
        rad = np.sqrt(xv ** 2 + yv ** 2)
        rad[m // 2][n // 2] = rad[m // 2][n // 2 - 1]
        return np.log2(rad), ang

    def interp_mask(im, yv, xv):
        return torch.from_numpy(
            np.interp(im.ravel(), xv, yv).reshape(im.shape).astype(np.float32))

    npts = 256
    xr = np.pi * np.arange(-npts - 1, 2) / 2 / npts
    yr = np.cos(xr) ** 2
    yr[0], yr[npts + 2] = yr[1], yr[npts + 1]
    xrcos = -0.5 + 2 / np.pi * (xr + np.pi / 4)
    yrcos = np.sqrt(yr)
    yircos = np.sqrt(1 - yr)

    h, w = img.shape
    log_rad, angle = grid(h, w)
    dft = torch.fft.fftshift(torch.fft.fft2(img))
    lodft = dft * interp_mask(log_rad, yircos, xrcos)
    hi0 = torch.fft.ifft2(torch.fft.ifftshift(
        dft * interp_mask(log_rad, yrcos, xrcos))).real

    lutsize = 1024
    xcosn = np.pi * np.arange(-(2 * lutsize + 1), lutsize + 2) / lutsize
    alpha = (xcosn + np.pi) % (2 * np.pi) - np.pi
    order = nbands - 1
    const = (2 ** (2 * order)) * factorial(order) ** 2 / (
        nbands * factorial(2 * order))
    ycosn = 2 * np.sqrt(const) * np.cos(xcosn) ** order * (
        np.abs(alpha) < np.pi / 2)
    cfact = complex(0, -1) ** (nbands - 1)

    levels = []
    for _ in range(height):
        xrcos = xrcos - 1.0
        him = interp_mask(log_rad, yrcos, xrcos)
        bands = []
        for b in range(nbands):
            am = interp_mask(angle, ycosn, xcosn + np.pi * b / nbands)
            banddft = lodft * am * him * cfact
            bands.append(torch.fft.ifft2(torch.fft.ifftshift(banddft)))
        levels.append(bands)
        dims = np.array(lodft.shape)
        st = (np.ceil((dims + 0.5) / 2)
              - np.ceil((np.ceil((dims - 0.5) / 2) + 0.5) / 2)).astype(int)
        en = (st + np.ceil((dims - 0.5) / 2)).astype(int)
        log_rad = log_rad[st[0]:en[0], st[1]:en[1]]
        angle = angle[st[0]:en[0], st[1]:en[1]]
        lodft = lodft[st[0]:en[0], st[1]:en[1]]
        lodft = lodft * interp_mask(log_rad, np.abs(yircos), xrcos)
    lowpass = torch.fft.ifft2(torch.fft.ifftshift(lodft)).real
    return [hi0] + levels + [lowpass]


def oracle_tree_walk(feat, ldau, rdau, thr, pred, attr, tree):
    k = prev = 0
    for _ in range(ldau.shape[0]):
        prev = k
        if feat[attr[k, tree] - 1] <= thr[k, tree]:
            k = ldau[k, tree] - 1
        else:
            k = rdau[k, tree] - 1
        if k == -1:
            break
    return pred[prev, tree]


# --------------------------------- tests ------------------------------------


def test_gamma_gen_gauss_matches_oracle():
    x = RNG.normal(size=(40, 48))
    ours = gamma_gen_gauss(x)
    ref = oracle_gamma(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_gauss_pyramid_matches_oracle():
    img = RNG.uniform(0, 1, (37, 53))
    ours = _gauss_pyramid(img)
    ref = oracle_pyramid(torch.from_numpy(img))
    assert len(ours) == 3
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b.numpy(), atol=1e-12)


def test_block_dct_features_match_oracle():
    img = RNG.uniform(0, 1, (45, 61))
    ours = _block_dct_features(img)
    ref = oracle_block_dct_feats(torch.from_numpy(img))
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


def test_im2col_distinct_layout():
    img = np.arange(30, dtype=np.float64).reshape(5, 6)
    cols = _im2col_distinct(img, 5)
    # two blocks: left 5x5, right 5x1 zero-padded to 5x5
    x = F.pad(torch.from_numpy(img)[None, None], (0, 4, 0, 0))
    ref = F.unfold(x, 5, stride=5).transpose(1, 2)[0].numpy()
    np.testing.assert_array_equal(cols, ref)


def test_scf_pyramid_matches_oracle():
    img = RNG.uniform(0, 255, (64, 80))
    ours = scf_pyramid(img, height=2, nbands=6)
    ref = oracle_scf_pyramid(torch.from_numpy(img), height=2, nbands=6)
    np.testing.assert_allclose(ours[0], ref[0].numpy(), atol=1e-8)
    np.testing.assert_allclose(ours[-1], ref[-1].numpy(), atol=1e-8)
    for lo, lr in zip(ours[1:3], ref[1:3]):
        for bo, br in zip(lo, lr):
            np.testing.assert_allclose(bo, br.numpy(), atol=1e-8)


@pytest.mark.slow
def test_gsm_features_finite_and_scale():
    """f2 on a natural-ish image: 45 finite features, gammas in table range."""
    img = np.cumsum(RNG.normal(size=(64, 80)), axis=1)
    img = 255 * (img - img.min()) / (img.max() - img.min())
    f2 = _gsm_features(img)
    assert f2.shape == (45,)
    assert np.isfinite(f2).all()
    assert (f2[:18] >= 0.03 - 1e-9).all() and (f2[:18] <= 10 + 1e-9).all()
    # ssim-cs correlations are in [0, 1]
    assert (f2[18:] >= 0).all() and (f2[18:] <= 1 + 1e-9).all()


def test_full_feature_vector_shapes():
    # large enough that the coarsest level still has >= 25 distinct 5x5
    # blocks, giving the full 75 singular values
    img = RNG.uniform(0, 255, (112, 144))
    f1, f2, f3 = nrqm_features(img)
    assert f1.shape == (18,) and f2.shape == (45,) and f3.shape == (75,)
    assert all(np.isfinite(f).all() for f in (f1, f2, f3))


def test_svd_features_match_oracle():
    img = RNG.uniform(0, 1, (33, 41))
    ours = np.linalg.svd(_im2col_distinct(img, 5), compute_uv=False)
    x = torch.from_numpy(img)[None, None]
    pr, pc = 5 * math.ceil(33 / 5) - 33, 5 * math.ceil(41 / 5) - 41
    cols = F.unfold(F.pad(x, (0, pc, 0, pr)), 5, stride=5).transpose(1, 2)[0]
    ref = torch.linalg.svdvals(cols).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def _random_forest(n_nodes=15, n_trees=8, n_feat=10, seed=3):
    """Random full binary trees in the MATLAB layout (1-based, 0 = leaf)."""
    rng = np.random.default_rng(seed)
    ldau = np.zeros((n_nodes, n_trees), np.int64)
    rdau = np.zeros((n_nodes, n_trees), np.int64)
    # perfect binary tree over 15 nodes: children of k are 2k+1, 2k+2
    for k in range(n_nodes // 2):
        ldau[k, :] = 2 * k + 2  # 1-based
        rdau[k, :] = 2 * k + 3
    thr = rng.normal(size=(n_nodes, n_trees))
    pred = rng.normal(size=(n_nodes, n_trees))
    attr = rng.integers(1, n_feat + 1, size=(n_nodes, n_trees))
    return ldau, rdau, thr, pred, attr


def test_random_forest_matches_recursive_oracle():
    ldau, rdau, thr, pred, attr = _random_forest()
    for seed in range(5):
        feat = np.random.default_rng(seed).normal(size=10)
        ours = random_forest_predict(feat, ldau, rdau, thr, pred, attr)
        ref = np.mean([oracle_tree_walk(feat, ldau, rdau, thr, pred, attr, t)
                       for t in range(ldau.shape[1])])
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_calculate_nrqm_with_synthetic_model(tmp_path):
    """End-to-end scoring against a synthetic NRQM_model.mat."""
    import scipy.io

    forests = [_random_forest(n_feat=f, seed=s)
               for f, s in ((18, 1), (45, 2), (75, 3))]
    linear = np.array([[0.5], [1.0], [-1.0], [2.0]])

    rf_cells = np.empty((1, 3), object)
    for i, (ldau, rdau, thr, pred, attr) in enumerate(forests):
        # field order [0]=ldau [1]=rdau [4]=threshold [5]=pred [6]=best_attri
        rec = np.zeros(
            (1, 1), dtype=[("ldau", object), ("rdau", object), ("x2", object),
                           ("x3", object), ("threshold", object),
                           ("pred", object), ("attr", object)])
        rec[0, 0] = (ldau, rdau, np.zeros(1), np.zeros(1), thr, pred, attr)
        rf_cells[0, i] = rec

    model = np.zeros((1, 1), dtype=[("linear", object), ("rf", object)])
    model[0, 0] = (linear, rf_cells)
    path = tmp_path / "NRQM_model.mat"
    scipy.io.savemat(path, {"model": model})

    img = RNG.uniform(0, 255, (112, 144))
    score = calculate_nrqm(img, str(path))

    f1, f2, f3 = nrqm_features(img)
    expect = 0.5
    for f, rf, wgt in zip((f1, f2, f3), forests, (1.0, -1.0, 2.0)):
        expect += wgt * random_forest_predict(f, *rf)
    np.testing.assert_allclose(score, expect, rtol=1e-9)


def test_calculate_nrqm_missing_model():
    with pytest.raises(FileNotFoundError):
        calculate_nrqm(np.zeros((64, 64)), "/nonexistent/NRQM_model.mat")


def test_imresize_sizes_matches_scale():
    img = RNG.uniform(0, 1, (24, 32))
    np.testing.assert_allclose(
        matlab_imresize(img, sizes=(12, 16)), matlab_imresize(img, 0.5),
        atol=1e-12)
