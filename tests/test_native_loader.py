"""Native C++ PNG loader tests (skipped if the toolchain can't build it)."""

import os

import numpy as np
import pytest
from PIL import Image

from fcvsr_tpu.data.native_loader import (
    load_batch_native,
    load_image_native,
    native_available,
    u8_to_f32_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader unavailable")


@pytest.fixture
def png_dir(tmp_path):
    rng = np.random.default_rng(0)
    rgb, gray = [], []
    for i in range(6):
        arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        p = tmp_path / f"rgb{i}.png"
        Image.fromarray(arr).save(p)
        rgb.append((str(p), arr))
    for i in range(3):
        arr = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        p = tmp_path / f"g{i}.png"
        Image.fromarray(arr).save(p)
        gray.append((str(p), arr))
    return rgb, gray


def test_rgb_decode_exact(png_dir):
    rgb, _ = png_dir
    for path, arr in rgb:
        got = load_image_native(path)
        np.testing.assert_array_equal(got, arr)


def test_gray_decode_and_pil_luma_parity(png_dir):
    rgb, gray = png_dir
    for path, arr in gray:
        got = load_image_native(path, grayscale=True)
        np.testing.assert_array_equal(got[..., 0], arr)
    for path, _ in rgb:
        got = load_image_native(path, grayscale=True)[..., 0]
        ref = np.asarray(Image.open(path).convert("L"))
        np.testing.assert_array_equal(got, ref)


def test_batch_decode_threaded(png_dir):
    rgb, _ = png_dir
    paths = [p for p, _ in rgb]
    batch = load_batch_native(paths, 24, 32, num_threads=4)
    assert batch.shape == (6, 24, 32, 3)
    for i, (_, arr) in enumerate(rgb):
        np.testing.assert_array_equal(batch[i], arr)


def test_u8_to_f32():
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = u8_to_f32_native(arr)
    np.testing.assert_allclose(out, arr / 255.0, atol=1e-7)


def test_rgba_and_16bit_fallback(tmp_path):
    # RGBA decodes natively (alpha dropped); 16-bit falls back to PIL
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 255, (8, 8, 4), dtype=np.uint8)
    p1 = tmp_path / "rgba.png"
    Image.fromarray(rgba, "RGBA").save(p1)
    got = load_image_native(str(p1))
    np.testing.assert_array_equal(got, rgba[..., :3])
