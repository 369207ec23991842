"""Degradation pipeline, new transforms, and LMDB write->read tests."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fcvsr_tpu.data.degradations import (
    DegradationsWithShuffle,
    RandomBlur,
    RandomJPEGCompression,
    RandomNoise,
    RandomResize,
    RandomVideoCompression,
    bivariate_gaussian,
    bivariate_generalized_gaussian,
    bivariate_plateau,
    filter2d,
    random_circular_lowpass_kernel,
    random_mixed_kernels,
    resize_image,
)
from fcvsr_tpu.data.pipelines import (
    mirror_sequence,
    normalize,
    rescale_to_zero_one,
    temporal_reverse,
)

RNG = np.random.default_rng(5)


# --------------------------- blur kernel goldens -----------------------------


def _oracle_gaussian(ks, sig_x, sig_y, theta, beta=None, kind="gauss"):
    """Direct-formula torch oracle for the bivariate kernels."""
    r = torch.arange(-ks // 2 + 1.0, ks // 2 + 1.0, dtype=torch.float64)
    x, y = torch.meshgrid(r, r, indexing="xy")
    grid = torch.stack([x, y], -1)
    d = torch.tensor([[sig_x ** 2, 0], [0, sig_y ** 2]]).float()
    rot = torch.tensor([[np.cos(theta), -np.sin(theta)],
                       [np.sin(theta), np.cos(theta)]]).float()
    sigma = (rot @ d @ rot.T).double()
    inv = torch.linalg.inv(sigma)
    q = torch.einsum("hwi,ij,hwj->hw", grid, inv, grid)
    if kind == "gauss":
        k = torch.exp(-0.5 * q)
    elif kind == "gen":
        k = torch.exp(-0.5 * q ** beta)
    else:
        k = 1.0 / (q ** beta + 1)
    return (k / k.sum()).numpy()


def test_bivariate_gaussian_matches_oracle():
    got = bivariate_gaussian(11, 1.5, 2.5, 0.7, is_isotropic=False)
    ref = _oracle_gaussian(11, 1.5, 2.5, 0.7)
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # isotropic ignores sig_y/theta
    got_iso = bivariate_gaussian(11, 1.5, 99.0, 0.3, is_isotropic=True)
    ref_iso = _oracle_gaussian(11, 1.5, 1.5, 0.0)
    np.testing.assert_allclose(got_iso, ref_iso, atol=1e-6)


def test_generalized_and_plateau_match_oracle():
    got = bivariate_generalized_gaussian(9, 1.2, 2.0, -0.5, beta=2.0,
                                         is_isotropic=False)
    ref = _oracle_gaussian(9, 1.2, 2.0, -0.5, beta=2.0, kind="gen")
    np.testing.assert_allclose(got, ref, atol=1e-6)

    got = bivariate_plateau(9, 1.2, 2.0, -0.5, beta=1.5, is_isotropic=False)
    ref = _oracle_gaussian(9, 1.2, 2.0, -0.5, beta=1.5, kind="plateau")
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_sinc_kernel_properties():
    np.random.seed(3)
    k = random_circular_lowpass_kernel([np.pi / 3, np.pi], 13)
    assert k.shape == (13, 13)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-8)
    np.testing.assert_allclose(k, k.T, atol=1e-12)  # circular symmetry
    np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-12)
    k21 = random_circular_lowpass_kernel([np.pi / 3, np.pi], 13, pad_to=21)
    assert k21.shape == (21, 21)


def test_random_mixed_kernels_all_types():
    np.random.seed(0)
    for t in ("iso", "aniso", "generalized_iso", "generalized_aniso",
              "plateau_iso", "plateau_aniso", "sinc"):
        k = random_mixed_kernels([t], [1], 11)
        assert k.shape == (11, 11)
        np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)


def test_filter2d_matches_torch_reflect101():
    img = RNG.uniform(0, 1, (12, 15, 3)).astype(np.float32)
    kernel = RNG.uniform(0, 1, (5, 5)).astype(np.float64)
    kernel /= kernel.sum()
    got = filter2d(img, kernel)
    x = torch.from_numpy(np.transpose(img, (2, 0, 1)))[None].double()
    xp = F.pad(x, (2, 2, 2, 2), mode="reflect")
    # cv2.filter2D and torch conv2d are both cross-correlations — no flip
    kt = torch.from_numpy(kernel)
    ref = F.conv2d(xp, kt[None, None].expand(3, 1, 5, 5), groups=3)
    np.testing.assert_allclose(
        got, np.transpose(ref[0].numpy(), (1, 2, 0)), atol=1e-5)


def test_resize_image_modes():
    img = RNG.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    for kind in ("bilinear", "bicubic", "area", "lanczos"):
        out = resize_image(img, (8, 12), kind)
        assert out.shape == (8, 12, 3)
        up = resize_image(img, (32, 48), kind)
        assert up.shape == (32, 48, 3)
    # bilinear matches torch interpolate (half-pixel)
    got = resize_image(img, (8, 12), "bilinear")
    ref = F.interpolate(torch.from_numpy(np.transpose(img, (2, 0, 1)))[None],
                        size=(8, 12), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, np.transpose(ref[0].numpy(), (1, 2, 0)),
                               atol=1e-5)
    # area downsample by 2 == 2x2 box mean
    got = resize_image(img, (8, 12), "area")
    ref = img.reshape(8, 2, 12, 2, 3).mean((1, 3))
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ------------------------------ transforms -----------------------------------


def test_random_blur_applies_kernels():
    np.random.seed(1)
    tr = RandomBlur(dict(kernel_size=[7], kernel_list=["iso"],
                         kernel_prob=[1], sigma_x=[1.0, 1.0]), keys=["lq"])
    imgs = [RNG.uniform(0, 1, (10, 10, 3)).astype(np.float32)
            for _ in range(2)]
    out = tr({"lq": [im.copy() for im in imgs]})["lq"]
    assert len(out) == 2 and out[0].shape == (10, 10, 3)
    assert not np.allclose(out[0], imgs[0])  # actually blurred
    assert out[0].std() < imgs[0].std()      # smoothing reduces variance


def test_random_resize_and_noise_and_jpeg():
    np.random.seed(2)
    img = RNG.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)

    tr = RandomResize(dict(resize_opt=["bilinear"], resize_prob=[1],
                           target_size=(8, 10)), keys=["lq"])
    assert tr({"lq": img.copy()})["lq"].shape == (8, 10, 3)

    tr = RandomNoise(dict(noise_type=["gaussian"], noise_prob=[1],
                          gaussian_sigma=[20, 20],
                          gaussian_gray_noise_prob=0.0), keys=["lq"])
    noisy = tr({"lq": [img.copy()]})["lq"][0]
    np.testing.assert_allclose((noisy - img).std(), 20 / 255, rtol=0.2)

    tr = RandomNoise(dict(noise_type=["poisson"], noise_prob=[1],
                          poisson_scale=[1, 1],
                          poisson_gray_noise_prob=1.0), keys=["lq"])
    noisy = tr({"lq": [img.copy()]})["lq"][0]
    assert noisy.shape == img.shape and not np.allclose(noisy, img)

    tr = RandomJPEGCompression(dict(quality=[50, 50]), keys=["lq"])
    jpg = tr({"lq": img.copy()})["lq"]
    assert jpg.shape == img.shape
    assert 0 < np.abs(jpg - img).mean() < 0.2


def test_random_video_compression_gated():
    tr = RandomVideoCompression(dict(codec=["libx264"], codec_prob=[1],
                                     bitrate=[1e4, 1e5]), keys=["lq"])
    if not tr._has_av:
        with pytest.raises(RuntimeError, match="av"):
            tr({"lq": [np.zeros((8, 8, 3), np.float32)]})


def test_degradations_with_shuffle_runs_groups():
    np.random.seed(4)
    degradations = [
        dict(type="RandomBlur",
             params=dict(kernel_size=[7], kernel_list=["iso"],
                         kernel_prob=[1], sigma_x=[1.0, 1.0])),
        [dict(type="RandomResize",
              params=dict(resize_opt=["bilinear"], resize_prob=[1],
                          target_size=(12, 12))),
         dict(type="RandomJPEGCompression", params=dict(quality=[80, 80]))],
    ]
    tr = DegradationsWithShuffle(degradations, keys=["lq"])
    out = tr({"lq": RNG.uniform(0, 1, (16, 16, 3)).astype(np.float32)})
    assert out["lq"].shape == (12, 12, 3)


def test_small_transforms():
    frames = RNG.uniform(0, 255, (3, 4, 5, 3)).astype(np.float32)
    n = normalize(frames, mean=[1, 2, 3], std=[2, 4, 8])
    np.testing.assert_allclose(n[..., 1], (frames[..., 1] - 2) / 4, atol=1e-5)
    nb = normalize(frames, mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True)
    np.testing.assert_allclose(nb[..., 0], frames[..., 2], atol=1e-6)

    np.testing.assert_allclose(rescale_to_zero_one(frames), frames / 255.0)

    rev, a, b = temporal_reverse(np.random.default_rng(0), frames, frames,
                                 reverse_ratio=1.0)
    assert rev
    np.testing.assert_array_equal(a, frames[::-1])

    m = mirror_sequence(frames)
    assert m.shape[0] == 6
    np.testing.assert_array_equal(m[3], frames[2])


# --------------------------------- LMDB --------------------------------------


def test_lmdb_write_read_roundtrip(tmp_path):
    from fcvsr_tpu.data.lmdb_reader import LmdbReader
    from fcvsr_tpu.data.lmdb_writer import write_lmdb

    rng = np.random.default_rng(0)
    items = {f"k{i:05d}".encode(): rng.integers(0, 256, int(s), np.uint8)
             .tobytes()
             for i, s in enumerate(rng.integers(1, 12000, 300))}
    path = str(tmp_path / "rt.lmdb")
    write_lmdb(path, items)

    r = LmdbReader(path)
    assert r.entries == len(items)
    assert list(r.keys()) == sorted(items)
    for k, v in items.items():
        assert r.get(k) == v
    assert r.get(b"zzz-missing") is None


def test_lmdb_single_page(tmp_path):
    from fcvsr_tpu.data.lmdb_reader import LmdbReader
    from fcvsr_tpu.data.lmdb_writer import write_lmdb

    path = str(tmp_path / "one.lmdb")
    write_lmdb(path, {b"a": b"1", b"b": b"2"})
    r = LmdbReader(path)
    assert r.get(b"a") == b"1" and r.get(b"b") == b"2"


def test_make_lmdb_tool_roundtrip(tmp_path):
    from PIL import Image

    import tools.preprocess_reds_dataset as prep
    from fcvsr_tpu.data.lmdb_reader import SRLmdbDataset

    data = tmp_path / "frames"
    rng = np.random.default_rng(1)
    for seq in ("000", "001"):
        (data / seq).mkdir(parents=True)
        for i in range(3):
            img = rng.integers(0, 255, (12, 16, 3), np.uint8)
            Image.fromarray(img).save(data / seq / f"{i:08d}.png")

    lmdb_path = str(tmp_path / "out.lmdb")
    prep.make_lmdb(str(data), lmdb_path)

    ds = SRLmdbDataset(lmdb_path)
    keys = ds.keys()
    assert "000_00000000" in keys and len(keys) == 6
    img = ds.load("001_00000002")
    ref = np.asarray(Image.open(data / "001" / "00000002.png"))
    np.testing.assert_array_equal(img, ref)
    assert os.path.exists(os.path.join(lmdb_path, "meta_info.txt"))
    assert os.path.exists(os.path.join(lmdb_path, "lock.mdb"))


def test_extract_subimages_tool(tmp_path):
    from PIL import Image

    import tools.preprocess_reds_dataset as prep

    src = tmp_path / "frames"
    src.mkdir()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (10, 14, 3), np.uint8)
    Image.fromarray(img).save(src / "0001x4.png")

    out = tmp_path / "sub"
    prep.extract_subimages(str(src), str(out), crop_size=6, step=4,
                           thresh_size=0)
    names = sorted(os.listdir(out))
    # h_space = [0, 4], w_space = [0, 4, 8]; x4 stripped from the name
    assert len(names) == 6 and names[0] == "0001_s001.png"
    first = np.asarray(Image.open(out / "0001_s001.png"))
    np.testing.assert_array_equal(first, img[:6, :6])
    last = np.asarray(Image.open(out / "0001_s006.png"))
    np.testing.assert_array_equal(last, img[4:10, 8:14])


def test_lmdb_empty_database(tmp_path):
    """Meta-layout regression: md_root must stay the empty sentinel when no
    items are written (a last_pg/txnid pack at the wrong offset used to
    clobber it)."""
    from fcvsr_tpu.data.lmdb_reader import LmdbReader
    from fcvsr_tpu.data.lmdb_writer import write_lmdb

    path = str(tmp_path / "empty.lmdb")
    write_lmdb(path, {})
    r = LmdbReader(path)
    assert r.entries == 0
    assert r.get(b"anything") is None
    assert list(r.keys()) == []


def test_area_resize_rounding_edge():
    """Regression: float rounding in the area-weights span (hi = (o+1) *
    in/out) could push ceil(hi) one past in_len (675 failing (in, out)
    pairs under 200 — e.g. 21->19) and IndexError inside the random
    second-order pipeline."""
    import numpy as np

    from fcvsr_tpu.data.degradations import resize_image

    img = np.random.default_rng(0).uniform(0, 1, (21, 25, 3)).astype(
        np.float32)
    out = resize_image(img, (19, 22), "area")
    assert out.shape == (19, 22, 3)
    assert np.isfinite(out).all()
    # exact box-mean identity on an aligned pair stays intact
    img2 = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    got = resize_image(img2, (2, 2), "area")
    exp = img2.reshape(2, 2, 2, 2, 1).mean((1, 3))
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_div2k_preprocess_driver(tmp_path):
    """tools/preprocess_div2k_dataset.py end-to-end on a toy DIV2K layout:
    HR + X2 sub-image extraction with per-scale crop/step (reference
    preprocess_div2k_dataset.py main_extract_subimages) and flat-key LMDB
    packing (prepare_keys_div2k)."""
    from PIL import Image

    import tools.preprocess_div2k_dataset as div2k
    from fcvsr_tpu.data.lmdb_reader import SRLmdbDataset

    rng = np.random.default_rng(3)
    root = tmp_path / "DIV2K"
    (root / "DIV2K_train_HR").mkdir(parents=True)
    (root / "DIV2K_train_LR_bicubic" / "X2").mkdir(parents=True)
    hr = rng.integers(0, 255, (20, 28, 3), np.uint8)
    lr = rng.integers(0, 255, (10, 14, 3), np.uint8)
    Image.fromarray(hr).save(root / "DIV2K_train_HR" / "0001.png")
    Image.fromarray(lr).save(
        root / "DIV2K_train_LR_bicubic" / "X2" / "0001x2.png")

    div2k.main(["--data-root", str(root), "--scales", "2",
                "--crop-size", "12", "--step", "8", "--make-lmdb"])

    hr_sub = sorted(os.listdir(root / "DIV2K_train_HR_sub"))
    lr_sub = sorted(os.listdir(root / "DIV2K_train_LR_bicubic" / "X2_sub"))
    # identical grid: HR 20x28 @12/8 and LR 10x14 @6/4 -> 2x3 windows each,
    # so every HR sub-image has its aligned LR partner (x2 name-stripped)
    assert len(hr_sub) == len(lr_sub) == 6
    assert hr_sub[0] == lr_sub[0] == "0001_s001.png"

    ds = SRLmdbDataset(str(root / "DIV2K_train_HR_sub.lmdb"))
    assert "0001_s001" in ds.keys() and len(ds.keys()) == 6
    got = ds.load("0001_s001")
    np.testing.assert_array_equal(got, hr[:12, :12])
