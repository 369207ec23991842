"""Data pipeline tests: index generation vs mmedit semantics, crop/aug
consistency, and end-to-end dataset loading over a synthetic fixture."""

import os

import numpy as np
import pytest

from fcvsr_tpu.data import (
    ClipFolderDataset,
    as_model_input,
    padded_window_indices,
    paired_flip_rotate,
    paired_random_crop,
    segment_indices,
)


@pytest.mark.parametrize(
    "center,padding,expected",
    [
        # mmedit GenerateFrameIndiceswithPadding doc cases: 8 frames, window 5
        (0, "replicate", [0, 0, 0, 1, 2]),
        (0, "reflection", [2, 1, 0, 1, 2]),
        (0, "reflection_circle", [4, 3, 0, 1, 2]),
        (0, "circle", [3, 4, 0, 1, 2]),
        (7, "replicate", [5, 6, 7, 7, 7]),
        (7, "reflection", [5, 6, 7, 6, 5]),
        (7, "reflection_circle", [5, 6, 7, 4, 3]),
        (7, "circle", [5, 6, 7, 3, 4]),
        (3, "replicate", [1, 2, 3, 4, 5]),
    ],
)
def test_padded_window_indices(center, padding, expected):
    assert padded_window_indices(center, 8, 5, padding) == expected


def test_segment_indices_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        idx = segment_indices(rng, 20, 7)
        assert len(idx) == 7
        assert 0 <= idx[0] and idx[-1] < 20
        assert idx == list(range(idx[0], idx[0] + 7))


def test_paired_random_crop_alignment():
    rng = np.random.default_rng(1)
    scale = 4
    lr = np.arange(2 * 16 * 20 * 1).reshape(2, 16, 20, 1).astype(np.uint8)
    gt = np.kron(lr, np.ones((1, scale, scale, 1))).astype(np.uint8)
    lrc, gtc = paired_random_crop(rng, lr, gt, 8, scale)
    assert lrc.shape == (2, 8, 8, 1)
    assert gtc.shape == (2, 32, 32, 1)
    # every GT 4x4 block equals the corresponding LR pixel (kron structure)
    np.testing.assert_array_equal(gtc[:, ::scale, ::scale], lrc)


def test_paired_flip_rotate_consistency():
    rng = np.random.default_rng(2)
    lr = np.random.default_rng(3).integers(0, 255, (3, 8, 10, 1), dtype=np.uint8)
    gt = np.kron(lr, np.ones((1, 4, 4, 1))).astype(np.uint8)
    for _ in range(10):
        lrc, gtc = paired_flip_rotate(rng, lr, gt)
        np.testing.assert_array_equal(gtc[:, ::4, ::4], lrc)


@pytest.fixture
def synthetic_clip_dirs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    lr_root = tmp_path / "lr"
    gt_root = tmp_path / "gt"
    for seq in ["seq_a", "seq_b"]:
        (lr_root / seq).mkdir(parents=True)
        (gt_root / seq).mkdir(parents=True)
        for i in range(9):
            lr = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
            gt = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(lr).save(lr_root / seq / f"{i:08d}.png")
            Image.fromarray(gt).save(gt_root / seq / f"{i:08d}.png")
    return str(lr_root), str(gt_root)


def test_clip_folder_dataset(synthetic_clip_dirs):
    lr_root, gt_root = synthetic_clip_dirs
    ds = ClipFolderDataset(lr_root=lr_root, gt_root=gt_root, window=7)
    assert ds.sequences == ["seq_a", "seq_b"]
    windows = list(ds.iter_test_windows("seq_a"))
    assert len(windows) == 9
    i, win, gt = windows[0]
    assert win.shape == (7, 12, 16, 3)
    assert gt.shape == (48, 64, 3)
    x = as_model_input(win)
    assert x.shape == (1, 7, 3, 12, 16)
    assert x.dtype == np.float32 and x.max() <= 1.0

    rng = np.random.default_rng(1)
    lr, gtc = ds.sample_train_window(rng, lr_patch=8)
    assert lr.shape == (7, 8, 8, 3)
    assert gtc.shape == (32, 32, 3)


def test_mm522_dataset(tmp_path):
    """MM522 key parsing, val-partition filtering, interval sampling
    (reference sr_mm522_dataset.py:25-128)."""
    from PIL import Image

    from fcvsr_tpu.data import MM522Dataset

    rng_img = np.random.default_rng(0)
    for clip in ["000/sub", "241/sub"]:
        for root, hw in (("lq", (16, 16)), ("gt", (64, 64))):
            d = tmp_path / root / clip
            d.mkdir(parents=True)
            for i in range(10):
                Image.fromarray(rng_img.integers(
                    0, 255, hw + (3,), np.uint8)).save(d / f"{i:08d}.png")
    meta = tmp_path / "meta.txt"
    lines = [f"data/train/x/000/sub/{i:08d}" for i in range(10)]
    lines += [f"data/train/x/241/sub/{i:08d}" for i in range(10)]
    meta.write_text("\n".join(lines) + "\n")

    ds = MM522Dataset(str(tmp_path / "lq"), str(tmp_path / "gt"), str(meta),
                      num_input_frames=5, interval_list=(1, 2),
                      random_reverse=True)
    # official partition removes clips 240-269
    assert all(k.startswith("000/") for k in ds.keys)
    assert len(ds.keys) == 10

    rng = np.random.default_rng(1)
    lr, gt = ds.sample_train_window(rng, lr_patch=8)
    assert lr.shape == (5, 8, 8, 3)
    assert gt.shape == (32, 32, 3)
    assert lr.dtype == np.float32 and 0.0 <= lr.min() and lr.max() <= 1.0

    with pytest.raises(ValueError, match="validation partition"):
        MM522Dataset(str(tmp_path / "lq"), str(tmp_path / "gt"), str(meta),
                     val_partition="bogus")
