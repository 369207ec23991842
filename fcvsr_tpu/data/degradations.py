"""Random degradation pipeline (RealBasicVSR training data synthesis).

Rebuilds mmedit/datasets/pipelines/{blur_kernels.py:1-536,
random_degradations.py:1-556} in pure numpy/PIL (host-side; cv2 and av are
absent from the image):

* blur kernels — bivariate (generalized) Gaussian, plateau, circular sinc,
  with random parameter sampling and optional multiplicative noise;
* RandomBlur / RandomResize / RandomNoise / RandomJPEGCompression /
  DegradationsWithShuffle — the second-order degradation chain;
* RandomVideoCompression — gated: requires the ``av`` codec library exactly
  like the reference; raises a clear error when absent.

cv2 replacements: filter2D -> reflect-101 padded correlation;
cv2.resize -> separable half-pixel resizes (bilinear / bicubic a=-0.75 /
area box / lanczos4); JPEG -> PIL (libjpeg) round-trip.
"""

from __future__ import annotations

import functools
import io
import math
import random
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "bivariate_gaussian", "bivariate_generalized_gaussian",
    "bivariate_plateau", "random_circular_lowpass_kernel",
    "random_mixed_kernels", "filter2d", "resize_image",
    "RandomBlur", "RandomResize", "RandomNoise", "RandomJPEGCompression",
    "RandomVideoCompression", "DegradationsWithShuffle",
]


# --------------------------- kernel generation -------------------------------


def _mesh_grid(kernel_size: int):
    r = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    x, y = np.meshgrid(r, r)
    return np.stack([x, y], axis=-1), x, y


def _sigma_matrix(sig_x, sig_y, theta, is_isotropic):
    if is_isotropic:
        return np.array([[sig_x ** 2, 0], [0, sig_x ** 2]], np.float32)
    diag = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]], np.float32)
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]], np.float32)
    return rot @ diag @ rot.T


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=None,
                       grid=None, is_isotropic=True):
    """Normalized bivariate Gaussian kernel (blur_kernels.py:69-113)."""
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta, is_isotropic))
    k = np.exp(-0.5 * np.sum((grid @ inv) * grid, 2))
    return k / k.sum()


def bivariate_generalized_gaussian(kernel_size, sig_x, sig_y=None, theta=None,
                                   beta=1.0, grid=None, is_isotropic=True):
    """exp(-0.5 * (x^T S^-1 x)^beta) (blur_kernels.py:116-165)."""
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta, is_isotropic))
    k = np.exp(-0.5 * np.power(np.sum((grid @ inv) * grid, 2), beta))
    return k / k.sum()


def bivariate_plateau(kernel_size, sig_x, sig_y=None, theta=None, beta=1.0,
                      grid=None, is_isotropic=True):
    """1 / ((x^T S^-1 x)^beta + 1) (blur_kernels.py:167-207)."""
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta, is_isotropic))
    k = np.reciprocal(np.power(np.sum((grid @ inv) * grid, 2), beta) + 1)
    return k / k.sum()


def random_circular_lowpass_kernel(omega_range, kernel_size, pad_to=0):
    """2-D circular sinc filter (blur_kernels.py:401-437)."""
    from scipy import special

    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    omega = np.random.uniform(omega_range[0], omega_range[-1])
    with np.errstate(divide="ignore", invalid="ignore"):
        kernel = np.fromfunction(
            lambda x, y: omega * special.j1(omega * np.sqrt(
                (x - (kernel_size - 1) / 2) ** 2
                + (y - (kernel_size - 1) / 2) ** 2))
            / (2 * np.pi * np.sqrt((x - (kernel_size - 1) / 2) ** 2
                                   + (y - (kernel_size - 1) / 2) ** 2)),
            [kernel_size, kernel_size])
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = \
        omega ** 2 / (4 * np.pi)
    kernel = kernel / kernel.sum()
    if pad_to > kernel_size:
        p = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((p, p), (p, p)))
    return kernel


def _maybe_kernel_noise(kernel, noise_range):
    if noise_range is not None:
        noise = np.random.uniform(noise_range[0], noise_range[1],
                                  size=kernel.shape)
        kernel = kernel * noise
        kernel = kernel / kernel.sum()
    return kernel


def random_mixed_kernels(kernel_list, kernel_prob, kernel_size,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-np.pi, np.pi),
                         beta_gaussian_range=(0.5, 8),
                         beta_plateau_range=(1, 2),
                         omega_range=(0, np.pi), noise_range=None):
    """Sample one kernel of a random type (blur_kernels.py:440-536)."""
    kernel_type = np.random.choice(kernel_list, p=kernel_prob)
    sig_x = np.random.uniform(*sigma_x_range)
    sig_y = np.random.uniform(*sigma_y_range)
    theta = np.random.uniform(*rotation_range)

    if kernel_type in ("iso", "aniso"):
        k = bivariate_gaussian(kernel_size, sig_x, sig_y, theta,
                               is_isotropic=kernel_type == "iso")
    elif kernel_type in ("generalized_iso", "generalized_aniso"):
        beta = np.random.uniform(*beta_gaussian_range)
        k = bivariate_generalized_gaussian(
            kernel_size, sig_x, sig_y, theta, beta,
            is_isotropic=kernel_type == "generalized_iso")
    elif kernel_type in ("plateau_iso", "plateau_aniso"):
        beta = np.random.uniform(*beta_plateau_range)
        k = bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta,
                              is_isotropic=kernel_type == "plateau_iso")
    elif kernel_type == "sinc":
        return random_circular_lowpass_kernel(omega_range, kernel_size)
    else:
        raise NotImplementedError(f"kernel type {kernel_type}")
    return _maybe_kernel_noise(k, noise_range)


# ------------------------------ image ops ------------------------------------


def filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """cv2.filter2D equivalent: correlation with reflect-101 border."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    else:
        squeeze = False
    pad = np.pad(img, ((ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)),
                 mode="reflect")
    h, w, c = img.shape
    s0, s1, s2 = pad.strides
    from numpy.lib.stride_tricks import as_strided
    win = as_strided(pad, (h, w, kh, kw, c), (s0, s1, s0, s1, s2))
    out = np.einsum("hwijc,ij->hwc", win, kernel).astype(img.dtype, copy=False)
    return out[..., 0] if squeeze else out


def _cubic_w(t):
    a = -0.75
    at = np.abs(t)
    return np.where(at <= 1, (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1,
                    np.where(at < 2, a * (at ** 3 - 5 * at ** 2 + 8 * at - 4),
                             0.0))


def _lanczos_w(t, a=4):
    at = np.abs(t)
    with np.errstate(invalid="ignore"):
        w = np.sinc(t) * np.sinc(t / a)
    return np.where(at < a, w, 0.0)


@functools.lru_cache(maxsize=None)
def _resize_weights(in_len: int, out_len: int, kind: str):
    scale = out_len / in_len
    if kind == "area" and scale < 1:
        # box average over the source span of each output pixel
        inv = in_len / out_len
        w = np.zeros((out_len, in_len))
        for o in range(out_len):
            lo, hi = o * inv, (o + 1) * inv
            # float rounding can push ceil(hi) one past in_len (e.g.
            # 19/21*21 = 19.000000000000004) — clamp to the valid range
            for i in range(max(int(np.floor(lo)), 0),
                           min(int(np.ceil(hi)), in_len)):
                w[o, i] = min(hi, i + 1) - max(lo, i)
        return (w / w.sum(1, keepdims=True)).astype(np.float32)
    # half-pixel sample positions
    src = (np.arange(out_len) + 0.5) / scale - 0.5
    if kind == "bilinear" or (kind == "area" and scale >= 1):
        support, fn = 1, lambda t: np.maximum(0, 1 - np.abs(t))
    elif kind == "bicubic":
        support, fn = 2, _cubic_w
    elif kind == "lanczos":
        support, fn = 4, _lanczos_w
    else:
        raise NotImplementedError(kind)
    idx = np.floor(src)[:, None] + np.arange(-support + 1, support + 1)[None]
    wgt = fn(src[:, None] - idx)
    wgt = wgt / wgt.sum(1, keepdims=True)
    idx = np.clip(idx, 0, in_len - 1).astype(np.int64)
    return wgt.astype(np.float32), idx


def resize_image(img: np.ndarray, target_hw: tuple, kind: str) -> np.ndarray:
    """Separable resize of an HWC float image (cv2.resize conventions:
    half-pixel centres, edge clamp, no antialiasing except 'area')."""
    oh, ow = target_hw
    h, w = img.shape[:2]
    if (h, w) == (oh, ow):
        return img

    def apply_axis(x, in_len, out_len, axis):
        ws = _resize_weights(in_len, out_len, kind)
        if isinstance(ws, tuple):
            wgt, idx = ws
            taken = np.take(x, idx, axis=axis)  # (..., out, taps, ...)
            return np.einsum(
                wgt_spec(axis, x.ndim), taken, wgt).astype(np.float32)
        return np.tensordot(ws, x, axes=([1], [axis])) if axis == 0 else \
            np.moveaxis(np.tensordot(ws, x, axes=([1], [axis])), 0, axis)

    def wgt_spec(axis, ndim):
        # einsum over the taps axis inserted right after `axis`
        letters = "abcdefg"
        src = letters[:axis] + "ot" + letters[axis: ndim - 1]
        return f"{src},ot->{letters[:axis]}o{letters[axis: ndim - 1]}"

    out = apply_axis(img, h, oh, 0)
    out = apply_axis(out, w, ow, 1)
    return out


def _jpeg_roundtrip(img: np.ndarray, quality: int) -> np.ndarray:
    """float [0,1] HxWx3 -> JPEG encode/decode (PIL libjpeg)."""
    from PIL import Image

    u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="JPEG", quality=int(quality))
    buf.seek(0)
    out = np.asarray(Image.open(buf).convert("RGB"), np.float32) / 255.0
    return out


# ------------------------------ transforms -----------------------------------


class RandomBlur:
    """random_degradations.py:20-137."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def get_kernel(self, num_kernels):
        p = self.params
        kernel_type = np.random.choice(p["kernel_list"], p=p["kernel_prob"])
        kernel_size = random.choice(p["kernel_size"])
        sigma_x = np.random.uniform(*p.get("sigma_x", [0, 0]))
        sigma_y = np.random.uniform(*p.get("sigma_y", [0, 0]))
        rotate = np.random.uniform(*p.get("rotate_angle", [-np.pi, np.pi]))
        beta_gau = np.random.uniform(*p.get("beta_gaussian", [0.5, 4]))
        beta_pla = np.random.uniform(*p.get("beta_plateau", [1, 2]))
        omega_range = p.get("omega")
        if omega_range is None:
            omega_range = [np.pi / 3, np.pi] if kernel_size < 13 \
                else [np.pi / 5, np.pi]
        omega = np.random.uniform(*omega_range)

        steps = {k: p.get(f"{k}_step", 0) for k in
                 ("sigma_x", "sigma_y", "rotate_angle", "beta_gaussian",
                  "beta_plateau", "omega")}
        kernels = []
        for _ in range(num_kernels):
            kernels.append(random_mixed_kernels(
                [kernel_type], [1], kernel_size,
                [sigma_x, sigma_x], [sigma_y, sigma_y], [rotate, rotate],
                [beta_gau, beta_gau], [beta_pla, beta_pla], [omega, omega],
                None))
            sigma_x = np.clip(
                sigma_x + np.random.uniform(-steps["sigma_x"],
                                            steps["sigma_x"]),
                *p.get("sigma_x", [0, 0]))
            sigma_y = np.clip(
                sigma_y + np.random.uniform(-steps["sigma_y"],
                                            steps["sigma_y"]),
                *p.get("sigma_y", [0, 0]))
            rotate = np.clip(
                rotate + np.random.uniform(-steps["rotate_angle"],
                                           steps["rotate_angle"]),
                *p.get("rotate_angle", [-np.pi, np.pi]))
            beta_gau = np.clip(
                beta_gau + np.random.uniform(-steps["beta_gaussian"],
                                             steps["beta_gaussian"]),
                *p.get("beta_gaussian", [0.5, 4]))
            beta_pla = np.clip(
                beta_pla + np.random.uniform(-steps["beta_plateau"],
                                             steps["beta_plateau"]),
                *p.get("beta_plateau", [1, 2]))
            omega = np.clip(
                omega + np.random.uniform(-steps["omega"], steps["omega"]),
                *omega_range)
        return kernels

    def __call__(self, results):
        if np.random.uniform() > self.params.get("prob", 1):
            return results
        for key in self.keys:
            imgs = results[key]
            single = isinstance(imgs, np.ndarray)
            if single:
                imgs = [imgs]
            kernels = self.get_kernel(len(imgs))
            imgs = [filter2d(img, k) for img, k in zip(imgs, kernels)]
            results[key] = imgs[0] if single else imgs
        return results


class RandomResize:
    """random_degradations.py:140-244."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        p = self.params
        if np.random.uniform() > p.get("prob", 1):
            return results
        for key in self.keys:
            imgs = results[key]
            single = isinstance(imgs, np.ndarray)
            if single:
                imgs = [imgs]
            h, w = imgs[0].shape[:2]
            kind = np.random.choice(p["resize_opt"],
                                    p=p["resize_prob"]).lower()
            resize_step = p.get("resize_step", 0)
            target_size = p.get("target_size")
            scale_factor = 1.0
            if target_size is None:
                mode = np.random.choice(["up", "down", "keep"],
                                        p=p["resize_mode_prob"])
                scale = p["resize_scale"]
                if mode == "up":
                    scale_factor = np.random.uniform(1, scale[1])
                elif mode == "down":
                    scale_factor = np.random.uniform(scale[0], 1)
                h_out, w_out = h * scale_factor, w * scale_factor
                if p.get("is_size_even", False):
                    h_out, w_out = 2 * (h_out // 2), 2 * (w_out // 2)
                target_size = (int(h_out), int(w_out))
            else:
                resize_step = 0

            outputs = []
            for img in imgs:
                outputs.append(resize_image(img, target_size, kind))
                if resize_step:
                    scale_factor = np.clip(
                        scale_factor + np.random.uniform(-resize_step,
                                                         resize_step),
                        *p["resize_scale"])
                    h_out, w_out = h * scale_factor, w * scale_factor
                    if p.get("is_size_even", False):
                        h_out, w_out = 2 * (h_out // 2), 2 * (w_out // 2)
                    target_size = (int(h_out), int(w_out))
            results[key] = outputs[0] if single else outputs
        return results


class RandomNoise:
    """random_degradations.py:245-349 (gaussian + poisson)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def _gaussian(self, imgs):
        p = self.params
        sigma_range = p["gaussian_sigma"]
        sigma = np.random.uniform(*sigma_range) / 255.0
        step = p.get("gaussian_sigma_step", 0)
        gray = np.random.uniform() < p["gaussian_gray_noise_prob"]
        out = []
        for img in imgs:
            noise = np.random.randn(*img.shape).astype(np.float32) * sigma
            if gray:
                noise = noise[:, :, :1]
            out.append(img + noise)
            sigma = np.clip(sigma + np.random.uniform(-step, step) / 255.0,
                            sigma_range[0] / 255.0, sigma_range[1] / 255.0)
        return out

    def _poisson(self, imgs):
        p = self.params
        scale_range = p["poisson_scale"]
        scale = np.random.uniform(*scale_range)
        step = p.get("poisson_scale_step", 0)
        gray = np.random.uniform() < p["poisson_gray_noise_prob"]
        out = []
        for img in imgs:
            noise = img.copy()
            if gray:
                # reference: cv2.cvtColor(noise[..., [2,1,0]], BGR2GRAY) on
                # RGB pipeline images == ITU-R 601 luma on RGB order
                luma = (0.299 * noise[..., 0] + 0.587 * noise[..., 1]
                        + 0.114 * noise[..., 2])
                noise = luma[..., None]
            noise = np.clip((noise * 255.0).round(), 0, 255) / 255.0
            unique = 2 ** np.ceil(np.log2(len(np.unique(noise))))
            noise = np.random.poisson(noise * unique) / unique - noise
            out.append(img + noise * scale)
            scale = np.clip(scale + np.random.uniform(-step, step),
                            *scale_range)
        return out

    def __call__(self, results):
        p = self.params
        if np.random.uniform() > p.get("prob", 1):
            return results
        noise_type = np.random.choice(p["noise_type"], p=p["noise_prob"])
        for key in self.keys:
            imgs = results[key]
            single = isinstance(imgs, np.ndarray)
            if single:
                imgs = [imgs]
            imgs = self._gaussian(imgs) if noise_type.lower() == "gaussian" \
                else self._poisson(imgs)
            results[key] = imgs[0] if single else imgs
        return results


class RandomJPEGCompression:
    """random_degradations.py:350-407 (PIL encode/decode)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        p = self.params
        if np.random.uniform() > p.get("prob", 1):
            return results
        quality = p["quality"]
        step = p.get("quality_step", 0)
        q = round(np.random.uniform(*quality))
        for key in self.keys:
            imgs = results[key]
            single = isinstance(imgs, np.ndarray)
            if single:
                imgs = [imgs]
            out = []
            for img in imgs:
                out.append(_jpeg_roundtrip(img, q))
                q = round(np.clip(q + np.random.uniform(-step, step),
                                  *quality))
            results[key] = out[0] if single else out
        return results


class RandomVideoCompression:
    """random_degradations.py:408-484 — needs the ``av`` codec library
    (same dependency as the reference); gated with a clear error."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys
        try:
            import av  # noqa: F401
            self._has_av = True
        except ImportError:
            self._has_av = False

    def __call__(self, results):
        if np.random.uniform() > self.params.get("prob", 1):
            return results
        if not self._has_av:
            raise RuntimeError(
                "RandomVideoCompression requires the 'av' library (PyAV), "
                "which is not installed in this image — identical to the "
                "reference's dependency (random_degradations.py:14-17).")
        import av
        p = self.params
        codec = np.random.choice(p["codec"], p=p["codec_prob"])
        bitrate = int(np.random.randint(*p["bitrate"]))
        for key in self.keys:
            imgs = results[key]
            buf = io.BytesIO()
            with av.open(buf, "w", "mp4") as container:
                stream = container.add_stream(codec, rate=1)
                stream.height = imgs[0].shape[0]
                stream.width = imgs[0].shape[1]
                stream.pix_fmt = "yuv420p"
                stream.bit_rate = bitrate
                for img in imgs:
                    u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
                    frame = av.VideoFrame.from_ndarray(u8, format="rgb24")
                    for packet in stream.encode(frame):
                        container.mux(packet)
                for packet in stream.encode():
                    container.mux(packet)
            out = []
            with av.open(buf, "r", "mp4") as container:
                for frame in container.decode(video=0):
                    out.append(frame.to_rgb().to_ndarray().astype(np.float32)
                               / 255.0)
            results[key] = out
        return results


_ALLOWED = {
    "RandomBlur": RandomBlur,
    "RandomResize": RandomResize,
    "RandomNoise": RandomNoise,
    "RandomJPEGCompression": RandomJPEGCompression,
    "RandomVideoCompression": RandomVideoCompression,
}


class DegradationsWithShuffle:
    """random_degradations.py:485-556 — shuffled degradation chain with
    order-preserving groups."""

    def __init__(self, degradations, keys, shuffle_idx=None):
        self.keys = keys
        self.degradations = self._build(list(degradations))
        self.shuffle_idx = list(range(len(self.degradations))) \
            if shuffle_idx is None else list(shuffle_idx)

    def _build(self, degradations):
        built = []
        for d in degradations:
            if isinstance(d, (list, tuple)):
                built.append(self._build(list(d)))
            else:
                built.append(_ALLOWED[d["type"]](d["params"], self.keys))
        return built

    def __call__(self, results):
        if self.shuffle_idx:
            group = [self.degradations[i] for i in self.shuffle_idx]
            np.random.shuffle(group)
            for i, idx in enumerate(self.shuffle_idx):
                self.degradations[idx] = group[i]
        for d in self.degradations:
            if isinstance(d, list):
                for sub in d:
                    results = sub(results)
            else:
                results = d(results)
        return results


def realbasicvsr_degradation_chain(keys=("lq",), include_video_compression=False):
    """The RealBasicVSR second-order training degradation (its published
    recipe over random_degradations.py:20-556): blur -> resize -> noise ->
    jpeg, then a lighter second pass, then a shuffled [jpeg, video
    compression] group.  ``include_video_compression`` is off by default —
    it needs PyAV, absent from this image (RandomVideoCompression raises).
    """
    first = [
        {"type": "RandomBlur", "params": {
            "kernel_size": [7, 9, 11, 13, 15, 17, 19, 21],
            "kernel_list": ["iso", "aniso", "generalized_iso",
                            "generalized_aniso", "plateau_iso",
                            "plateau_aniso", "sinc"],
            "kernel_prob": [0.405, 0.225, 0.108, 0.027, 0.108, 0.027, 0.1],
            "sigma_x": [0.2, 3], "sigma_y": [0.2, 3],
            "rotate_angle": [-3.1416, 3.1416],
            "beta_gaussian": [0.5, 4], "beta_plateau": [1, 2],
            "sigma_x_step": 0.02, "sigma_y_step": 0.02,
            "rotate_angle_step": 0.31416, "beta_gaussian_step": 0.05,
            "beta_plateau_step": 0.1, "omega_step": 0.0628}},
        {"type": "RandomResize", "params": {
            "resize_mode_prob": [0.2, 0.7, 0.1],  # up, down, keep
            "resize_scale": [0.15, 1.5],
            "resize_opt": ["bilinear", "area", "bicubic"],
            "resize_prob": [1 / 3.0, 1 / 3.0, 1 / 3.0],
            "resize_step": 0.015, "is_size_even": True}},
        {"type": "RandomNoise", "params": {
            "noise_type": ["gaussian", "poisson"],
            "noise_prob": [0.5, 0.5],
            "gaussian_sigma": [1, 30], "gaussian_gray_noise_prob": 0.4,
            "poisson_scale": [0.05, 3], "poisson_gray_noise_prob": 0.4,
            "gaussian_sigma_step": 0.1, "poisson_scale_step": 0.005}},
        {"type": "RandomJPEGCompression", "params": {
            "quality": [30, 95], "quality_step": 3}},
    ]
    second = [
        {"type": "RandomBlur", "params": {
            "prob": 0.8,
            "kernel_size": [7, 9, 11, 13, 15, 17, 19, 21],
            "kernel_list": ["iso", "aniso", "generalized_iso",
                            "generalized_aniso", "plateau_iso",
                            "plateau_aniso", "sinc"],
            "kernel_prob": [0.405, 0.225, 0.108, 0.027, 0.108, 0.027, 0.1],
            "sigma_x": [0.2, 1.5], "sigma_y": [0.2, 1.5],
            "rotate_angle": [-3.1416, 3.1416],
            "beta_gaussian": [0.5, 4], "beta_plateau": [1, 2],
            "sigma_x_step": 0.005, "sigma_y_step": 0.005,
            "rotate_angle_step": 0.31416, "beta_gaussian_step": 0.02,
            "beta_plateau_step": 0.05, "omega_step": 0.0628}},
        {"type": "RandomResize", "params": {
            "resize_mode_prob": [0.3, 0.4, 0.3],
            "resize_scale": [0.3, 1.2],
            "resize_opt": ["bilinear", "area", "bicubic"],
            "resize_prob": [1 / 3.0, 1 / 3.0, 1 / 3.0],
            "resize_step": 0.03, "is_size_even": True}},
        {"type": "RandomNoise", "params": {
            "noise_type": ["gaussian", "poisson"],
            "noise_prob": [0.5, 0.5],
            "gaussian_sigma": [1, 25], "gaussian_gray_noise_prob": 0.4,
            "poisson_scale": [0.05, 2.5], "poisson_gray_noise_prob": 0.4,
            "gaussian_sigma_step": 0.1, "poisson_scale_step": 0.005}},
    ]
    tail = [{"type": "RandomJPEGCompression",
             "params": {"quality": [30, 95], "quality_step": 3}}]
    if include_video_compression:
        tail.append({"type": "RandomVideoCompression", "params": {
            "codec": ["libx264", "h264", "mpeg4"],
            "codec_prob": [1 / 3.0, 1 / 3.0, 1 / 3.0],
            "bitrate": [1e4, 1e5]}})
    chain = first + second + [tail]
    shuffle_idx = [len(chain) - 1] if include_video_compression else []
    return DegradationsWithShuffle(chain, list(keys), shuffle_idx)


def degrade_sequence(chain, gt_frames: np.ndarray,
                     scale: int = 4) -> np.ndarray:
    """Apply a degradation chain to a GT sequence and return LQ frames at
    1/scale resolution (the RealBasicVSR data path: degraded, then resized
    to the LQ grid).  gt_frames: (T, H, W, C) float32 in [0, 1]."""
    t, h, w, c = gt_frames.shape
    results = {"lq": [gt_frames[i] for i in range(t)]}
    results = chain(results)
    out = []
    for img in results["lq"]:
        img = resize_image(np.clip(img, 0, 1), (h // scale, w // scale),
                           "bicubic")
        out.append(np.clip(img, 0, 1).astype(np.float32))
    return np.stack(out)
