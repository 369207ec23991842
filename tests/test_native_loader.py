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


def test_batch_oversized_image_rejected_before_write(tmp_path):
    """ADVICE r1 (medium): an oversized PNG in a batch must be rejected from
    its header, BEFORE any pixel lands in the fixed h*w slot — previously the
    decode wrote width*height pixels first and only then hit the size check,
    overflowing the numpy buffer (heap corruption)."""
    import ctypes

    from fcvsr_tpu.data.native_loader import _get_lib

    lib = _get_lib()
    if lib is None:
        import pytest

        pytest.skip("native loader unavailable")

    rng = np.random.default_rng(7)
    small = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    big = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)  # 64x the slot
    p_small = tmp_path / "small.png"
    p_big = tmp_path / "big.png"
    Image.fromarray(small).save(p_small)
    Image.fromarray(big).save(p_big)

    n = 2
    out = np.full((n, 8, 8, 3), 0xAB, np.uint8)  # sentinel fill
    arr = (ctypes.c_char_p * n)(str(p_small).encode(), str(p_big).encode())
    rc = lib.fcvsr_png_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 3,
        8, 8, 2)
    assert rc == -30
    np.testing.assert_array_equal(out[0], small)  # good slot decoded
    assert np.all(out[1] == 0xAB)  # bad slot: not a single byte written
