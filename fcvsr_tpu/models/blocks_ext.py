"""Extended block library: gated conv blocks, FFT attention, shift encoders,
temporal-frequency difference compensation, and misc U-Net parts.

Completes the reference op inventory (SURVEY.md §2.1) beyond what the final
FCVSR graph uses — these blocks back the FCVSR-S TFDC variant
(CVSR_train/arch/CVSR_freq_S.py), the shift-encoder experiments, and several
ablations.  Channels-last throughout.

Reference quirks preserved intentionally:
* ``TFDC`` — the reference rebinds ``self.conv2`` while defining conv3..6
  (CVSR_freq.py:1045-1065), so branch 1's frequency convs and branch 3's are
  the *same module* (final binding: conv2 is conv6, a 5x5 pair).  We share
  one module (`conv26`) accordingly; conv3/conv4/conv5 are independent.
* ``FourierUnit`` — the SE attention is applied to the *pooled* spectrum and
  the (B, C, 1, 1) result is inverse-FFT'd with s=(h, w)
  (CVSR_freq.py:1851-1866): only the DC bin survives, so the output is a
  per-channel constant image.  Reproduced faithfully (closed form).
* ``SKFF`` with height=1 on ``[a, b]`` computes ``a - b`` times a softmax
  over a single element == 1 (CVSR_freq.py:1905-1925); parameters exist but
  cannot change the output.  Kept for checkpoint-shape parity.
* ``FSAS_freq`` ignores its ``conv1`` and the appended shift channels in the
  output path (CVSR_freq.py:966-989).
* ``FourierUnit1``/``generate_kernels`` in the reference are broken dead code
  (undefined names / hard-coded cuda); not rebuilt.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import CALayer, Conv2d, LayerNorm2d, PReLU, pixel_shuffle
from ..ops.resize import upsample2x_bilinear

__all__ = [
    "SimpleGate", "simple_gate", "simple_gate2", "RepConv", "RepConv2",
    "CAB", "CAB1", "CAB2", "WithBiasLayerNorm", "FSAS", "FSAS_freq",
    "FFTSpatialModule", "TFDC", "FourierUnit", "SpatialAttention", "SKFF",
    "MultiFreqAgg", "SpaFreqBlock", "channel_shift", "spatial_shift24",
    "EncoderShiftBlock", "PixelShufflePack", "ResidualBlockNoBN",
    "ResidualBlocksWithInputConv", "SAM", "DownSample", "UpSample",
    "SkipUpSample", "CABEncoder", "CABDecoder", "TFRUNet", "ShallowCell",
]


def simple_gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


def simple_gate2(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class SimpleGate(nn.Module):
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        return simple_gate2(x) if self.sigmoid else simple_gate(x)


class RepConv(nn.Module):
    """k-branch + 3x3-branch grouped convs + identity (CVSR_freq.py:400-408)."""

    n_feat: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        g = self.n_feat // 8
        r1 = Conv2d(self.n_feat, self.kernel_size, use_bias=False, groups=g,
                    name="conv_1")(x)
        r2 = Conv2d(self.n_feat, 3, use_bias=False, groups=g, name="conv_2")(x)
        return r1 + r2 + x


class RepConv2(nn.Module):
    """Depthwise 3x3 + identity (CVSR_freq.py:409-417)."""

    n_feat: int

    @nn.compact
    def __call__(self, x):
        r2 = Conv2d(self.n_feat, 3, use_bias=False, groups=self.n_feat,
                    name="conv_2")(x)
        return r2 + x


class CAB(nn.Module):
    """conv-act-conv + channel attention, residual (CVSR_freq.py:384-399)."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.n_feat, self.kernel_size, use_bias=False, name="body0")(x)
        res = PReLU(name="act")(res)
        res = Conv2d(self.n_feat, self.kernel_size, use_bias=False, name="body1")(res)
        res = CALayer(self.n_feat, self.reduction, name="CA")(res)
        return res + x


class CAB1(nn.Module):
    """NAFNet-style gated block (CVSR_freq.py:426-453): LN -> expand ->
    RepConv2 -> gate -> RepConv -> expand -> sigmoid gate -> CA -> project,
    learned-beta residual."""

    n_feat: int
    kernel_size: int = 5
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        n = self.n_feat
        beta = self.param("beta", nn.initializers.zeros, (n,))
        res = LayerNorm2d(n, name="norm")(x)
        res = Conv2d(2 * n, 1, use_bias=False, name="expand")(res)
        res = RepConv2(2 * n, name="rep2")(res)
        res = simple_gate(res)
        res = RepConv(n, self.kernel_size, name="rep")(res)
        res = Conv2d(2 * n, 1, use_bias=False, name="expand2")(res)
        res = simple_gate2(res)
        res = CALayer(n, self.reduction, name="CA2")(res)
        res = Conv2d(n, 1, use_bias=False, name="project")(res)
        return x + res * beta.astype(x.dtype)


class CAB2(nn.Module):
    """CAB1 with auxiliary shift channels (CVSR_freq.py:454-480): input is
    (n_feat + add_channel); aux channels pass a depthwise conv, the joint
    tensor is normed and processed, the residual applies to the first n_feat."""

    n_feat: int
    add_channel: int
    kernel_size: int = 5
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        n = self.n_feat
        beta = self.param("beta", nn.initializers.zeros, (n,))
        shortcut, hw = x[..., :n], x[..., n:]
        hw = Conv2d(self.add_channel, 3, use_bias=False,
                    groups=self.add_channel, name="conv1")(hw)
        res = jnp.concatenate([shortcut, hw], -1)
        res = LayerNorm2d(n + self.add_channel, name="norm")(res)
        res = Conv2d(2 * n, 1, use_bias=False, name="expand")(res)
        res = RepConv2(2 * n, name="rep2")(res)
        res = simple_gate(res)
        res = RepConv(n, self.kernel_size, name="rep")(res)
        res = Conv2d(2 * n, 1, use_bias=False, name="expand2")(res)
        res = simple_gate2(res)
        res = CALayer(n, self.reduction, name="CA2")(res)
        res = Conv2d(n, 1, use_bias=False, name="project")(res)
        return shortcut + res * beta.astype(x.dtype)


class WithBiasLayerNorm(nn.Module):
    """Restormer-style token LN over channels, biased var, eps 1e-5
    (CVSR_freq.py:602-618)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * w.astype(x.dtype) + b.astype(x.dtype)


def _to_patches(x, p):
    """(B, H, W, C) -> (B, h, w, p, p, C)."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // p, p, ww // p, p, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5))


def _from_patches(x):
    b, h, w, p1, p2, c = x.shape
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * p1, w * p2, c)


class FSAS(nn.Module):
    """8x8-patch FFT attention (CVSR_freq.py:925-951): q.k product in the
    patch frequency domain gates v.  H, W must be divisible by 8."""

    dim: int
    patch_size: int = 8

    @nn.compact
    def __call__(self, x):
        d = self.dim
        p = self.patch_size
        hidden = Conv2d(d * 6, 1, use_bias=False, name="to_hidden")(x)
        hidden = Conv2d(d * 6, 3, use_bias=False, groups=d * 6,
                        name="to_hidden_dw")(hidden)
        q, k, v = jnp.split(hidden, 3, axis=-1)
        qf = jnp.fft.rfft2(_to_patches(q.astype(jnp.float32), p), axes=(3, 4))
        kf = jnp.fft.rfft2(_to_patches(k.astype(jnp.float32), p), axes=(3, 4))
        out = jnp.fft.irfft2(qf * kf, s=(p, p), axes=(3, 4))
        out = _from_patches(out).astype(x.dtype)
        out = WithBiasLayerNorm(d * 2, name="norm")(out)
        out = v * out
        return Conv2d(d, 1, use_bias=False, name="project_out")(out)


class FSAS_freq(nn.Module):
    """FSAS variant that also multiplies v's spectrum (CVSR_freq.py:955-989).
    Input (n_feat + add_channel); output n_feat with residual on the n_feat
    part; appended channels are consumed (dropped)."""

    dim: int
    add_channel: int
    patch_size: int = 8

    @nn.compact
    def __call__(self, x):
        d = self.dim
        p = self.patch_size
        hw = x[..., :d]
        hidden = Conv2d(d * 6, 1, use_bias=False, name="to_hidden")(hw)
        hidden = Conv2d(d * 6, 3, use_bias=False, groups=d * 6,
                        name="to_hidden_dw")(hidden)
        q, k, v = jnp.split(hidden, 3, axis=-1)
        qf = jnp.fft.rfft2(_to_patches(q.astype(jnp.float32), p), axes=(3, 4))
        kf = jnp.fft.rfft2(_to_patches(k.astype(jnp.float32), p), axes=(3, 4))
        vf = jnp.fft.rfft2(_to_patches(v.astype(jnp.float32), p), axes=(3, 4))
        out = jnp.fft.irfft2((qf * kf) * (vf * kf), s=(p, p), axes=(3, 4))
        out = _from_patches(out).astype(x.dtype)
        out = WithBiasLayerNorm(d * 2, name="norm")(out)
        return Conv2d(d, 1, use_bias=False, name="project_out")(out) + hw


class FFTSpatialModule(nn.Module):
    """Parallel spatial + full-frame FFT branches (CVSR_freq.py:993-1026).
    Packing here is real-first (unlike MGAA's imag-first)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        d = self.dim
        s = Conv2d(d // 2, 3, name="spatial0")(x)
        s = jax.nn.leaky_relu(s, 0.2)
        s = Conv2d(d // 2, 1, name="spatial1")(s)
        s = jax.nn.leaky_relu(s, 0.2)
        s = Conv2d(d, 3, name="spatial2")(s)

        y = jax.nn.leaky_relu(Conv2d(d, 3, name="conv")(x), 0.2)
        h, w = y.shape[1:3]
        f = jnp.fft.rfft2(y.astype(jnp.float32), axes=(1, 2), norm="backward")
        yf = jnp.concatenate([f.real, f.imag], -1).astype(x.dtype)
        yf = jax.nn.leaky_relu(Conv2d(2 * d, 1, name="fft0")(yf), 0.2)
        yf = jax.nn.leaky_relu(Conv2d(2 * d, 1, name="fft1")(yf), 0.2)
        re, im = jnp.split(yf, 2, axis=-1)
        fout = jnp.fft.irfft2(jax.lax.complex(re.astype(jnp.float32),
                                              im.astype(jnp.float32)),
                              s=(h, w), axes=(1, 2), norm="backward")
        fout = fout.astype(x.dtype)
        return Conv2d(d, 1, name="fuse")(jnp.concatenate([fout, s], -1))


class _ConvPair(nn.Module):
    feats: int
    k: int

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.feats, self.k, use_bias=False, name="c0")(x)
        y = nn.relu(y)
        return Conv2d(self.feats, self.k, use_bias=False, name="c1")(y)


class TFDC(nn.Module):
    """Temporal-frequency difference compensation (CVSR_freq.py:1029-1185).

    Three parallel branches with feature convs of k in {1, 3, 5} and
    frequency-difference gating; branches 1 and 3 share their frequency conv
    pair (the reference's attribute-aliasing bug).  Output: conv8 over the
    concatenated CAB2 outputs + centre residual.
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        d = self.dim
        h, w = x.shape[1:3]
        x2 = x[..., d : 2 * d]

        conv1 = _ConvPair(d, 1, name="conv1")
        conv3 = _ConvPair(d, 3, name="conv3")
        conv5 = _ConvPair(d, 5, name="conv5")
        conv4 = _ConvPair(2 * d, 3, name="conv4")
        conv26 = _ConvPair(2 * d, 5, name="conv26")  # shared branch-1/3 freq conv
        cab2 = CAB2(d // 2, add_channel=d // 2, kernel_size=5, reduction=4,
                    name="CAB2")

        def pack(v):
            f = jnp.fft.rfft2(v.astype(jnp.float32), axes=(1, 2), norm="backward")
            return jnp.concatenate([f.imag, f.real], -1).astype(v.dtype)

        def unpack(v):
            re, im = jnp.split(v, 2, axis=-1)
            out = jnp.fft.irfft2(
                jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32)),
                s=(h, w), axes=(1, 2), norm="backward")
            return out.astype(v.dtype)

        def branch(feat_conv, freq_conv):
            f1 = pack(feat_conv(x[..., :d]))
            f2 = pack(feat_conv(x[..., d : 2 * d]))
            f3 = pack(feat_conv(x[..., 2 * d :]))
            d21 = f1 - f2
            d23 = f3 - f2
            gate_f = jax.nn.sigmoid(freq_conv(d21 + freq_conv(d21)))
            gate_b = jax.nn.sigmoid(freq_conv(d23 + freq_conv(d23)))
            out = f2 * gate_f + f2 * gate_b + f2
            return cab2(unpack(out))

        o1 = branch(conv1, conv26)
        o3 = branch(conv3, conv4)
        o5 = branch(conv5, conv26)
        out = Conv2d(d, 3, use_bias=False, name="conv8")(
            jnp.concatenate([o1, o3, o5], -1))
        return out + x2


class FourierUnit(nn.Module):
    """Fourier SE gate (CVSR_freq.py:1830-1866).  The pooled-spectrum SE
    output is the only surviving coefficient (DC), so the result is a
    per-channel constant image; computed in closed form."""

    channels: int
    train: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = jnp.fft.rfftn(x.astype(jnp.float32), s=(h, w), axes=(1, 2),
                          norm="ortho")
        ff = jnp.concatenate([f.real, f.imag], -1).astype(x.dtype)
        ff = Conv2d(2 * self.channels, 1, use_bias=False, name="conv_layer")(ff)
        ff = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                          epsilon=1e-5, name="bn")(ff)
        ff = nn.relu(ff)
        pooled = jnp.mean(ff, axis=(1, 2), keepdims=True)  # (B,1,1,2C)
        se = Conv2d(self.channels, 1, use_bias=False, name="se_down")(pooled)
        se = nn.relu(se)
        se = Conv2d(2 * self.channels, 1, use_bias=False, name="se_up")(se)
        se = jax.nn.sigmoid(se)
        re, im = jnp.split(se, 2, axis=-1)
        # irfftn(s=(h,w)) of a (1,1) spectrum: only DC -> constant real image.
        const = re[:, 0, 0, :] / jnp.sqrt(jnp.asarray(h * w, x.dtype))
        return jnp.broadcast_to(const[:, None, None, :], (b, h, w, self.channels))


class SpatialAttention(nn.Module):
    """Max/mean channel pool -> 7x7 conv -> sigmoid gate (CVSR_freq.py:1869-1884)."""

    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate(
            [jnp.max(x, -1, keepdims=True), jnp.mean(x, -1, keepdims=True)], -1)
        scale = jax.nn.sigmoid(Conv2d(1, 7, name="spatial")(pooled))
        return x * scale


class SKFF(nn.Module):
    """Selective kernel fusion, height=1 difference flavour
    (CVSR_freq.py:1889-1925): output == feats[0]-feats[1]; SE params exist
    but multiply by softmax(singleton)==1."""

    in_channels: int
    height: int = 1
    reduction: int = 8

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        d = max(self.in_channels // self.reduction, 4)
        diff = feats[0] - feats[1]
        z = jnp.mean(diff, axis=(1, 2), keepdims=True)
        z = jax.nn.leaky_relu(Conv2d(d, 1, use_bias=False, name="conv_du")(z), 0.2)
        att = Conv2d(self.in_channels, 1, use_bias=False, name="fc0")(z)
        att = jax.nn.softmax(att[..., None, :], axis=-2)[..., 0, :]  # singleton
        return diff * att


class MultiFreqAgg(nn.Module):
    """SK aggregation over K band features (CVSR_freq.py:1929-1966)."""

    in_channels: int
    height: int = 3
    reduction: int = 8

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        d = max(self.in_channels // self.reduction, 4)
        stack = jnp.stack(feats, axis=1)  # (B, K, H, W, C)
        u = jnp.sum(stack, axis=1)
        z = jnp.mean(u, axis=(1, 2), keepdims=True)
        z = jax.nn.leaky_relu(Conv2d(d, 1, use_bias=False, name="conv_du")(z), 0.2)
        atts = [Conv2d(self.in_channels, 1, use_bias=False, name=f"fc{i}")(z)
                for i in range(self.height)]
        att = jax.nn.softmax(jnp.stack(atts, axis=1), axis=1)
        return jnp.sum(stack * att, axis=1)


class SpaFreqBlock(nn.Module):
    """4 rounds of Fourier-gate + spatial attention fused by difference-SKFF
    (CVSR_freq.py:1969-2006)."""

    dim: int
    train: bool = False

    @nn.compact
    def __call__(self, x):
        freq = x
        spa = x
        out = None
        for i in range(4):
            fin = freq if out is None else freq + out
            sin = spa if out is None else spa + out
            freq = FourierUnit(self.dim, train=self.train, name=f"fu{i}")(fin)
            spa = SpatialAttention(name=f"sa{i}")(sin)
            out = SKFF(self.dim, name=f"skff{i}")([freq, spa])
        return out + x


# -- shift encoders ---------------------------------------------------------

_SHIFT_DIRS_16 = [
    (8, 8), (8, 4), (8, 0), (8, -4), (8, -8),
    (-8, 8), (-8, 4), (-8, 0), (-8, -4), (-8, -8),
    (4, 8), (4, -8), (0, 8), (0, -8), (-4, 8), (-4, -8),
]
_SHIFT_DIRS_8 = [
    (4, 4), (4, 0), (4, -4), (0, 4), (0, -4), (-4, 4), (-4, 0), (-4, -4),
]


def _shift2d(x, sy, sx):
    """Zero-fill shift: out[y, x] = in[y-sy, x-sx]."""
    h, w = x.shape[1:3]
    pad = [(0, 0), (max(sy, 0), max(-sy, 0)), (max(sx, 0), max(-sx, 0)), (0, 0)]
    xp = jnp.pad(x, pad)
    return xp[:, max(-sy, 0) : max(-sy, 0) + h, max(-sx, 0) : max(-sx, 0) + w]


def spatial_shift24(hw: jnp.ndarray, number: int) -> jnp.ndarray:
    """24-direction grouped spatial shift (CVSR_freq.py:2284-2317).

    hw: (B, H, W, 8*number); 16 groups of size n2=(number-1)//2 shifted by
    the +-8/+-4 combos, 8 groups of size n1=number-2*n2 by +-4 combos.
    Channels beyond the covered prefix are zeroed (matching zeros_like init).
    """
    n2 = (number - 1) // 2
    n1 = number - 2 * n2
    parts = []
    c = 0
    for (sy, sx) in _SHIFT_DIRS_16:
        if n2:
            parts.append(_shift2d(hw[..., c : c + n2], sy, sx))
        c += n2
    for (sy, sx) in _SHIFT_DIRS_8:
        if n1:
            parts.append(_shift2d(hw[..., c : c + n1], sy, sx))
        c += n1
    tail = hw.shape[-1] - c
    if tail > 0:
        parts.append(jnp.zeros_like(hw[..., :tail]))
    return jnp.concatenate(parts, -1) if parts else hw


def channel_shift(x: jnp.ndarray, number: int, div: int = 2,
                  reverse: bool = False) -> jnp.ndarray:
    """Cross-frame channel roll + spatial shift (CVSR_freq.py:2318-2336).

    Rolls the flattened (frame, channel) axis by +-C/div — a temporal shift
    mixing channels across adjacent frames in the batch dimension — keeps the
    first (or last) frame unrolled, then appends a 24-direction spatially
    shifted copy of the leading (trailing) 8*number channels.
    """
    b, h, w, c = x.shape
    slice_c = c // div if not reverse else -(c // div)
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, h, w)
    rolled = jnp.roll(flat, slice_c, axis=0).reshape(b, c, h, w)
    rolled = jnp.transpose(rolled, (0, 2, 3, 1))
    if not reverse:
        y = jnp.concatenate([x[:1], rolled[1:]], 0)
        hw = y[..., : 8 * number]
    else:
        y = jnp.concatenate([rolled[:-1], x[-1:]], 0)
        hw = y[..., -8 * number :]
    return jnp.concatenate([y, spatial_shift24(hw, number)], -1)


class EncoderShiftBlock(nn.Module):
    """8 alternating-direction shift + (CAB2|FSAS_freq)+CAB1 stages
    (CVSR_freq.py:2258-2455).  ``use_fsas`` selects the _1 variant."""

    n_feat: int
    reduction: int = 4
    use_fsas: bool = False

    @nn.compact
    def __call__(self, x):
        number = self.n_feat // 2 // 8
        for i in range(8):
            x = channel_shift(x, number, reverse=bool(i % 2))
            if self.use_fsas:
                x = FSAS_freq(self.n_feat, add_channel=8 * number,
                              name=f"fsas{i}")(x)
            else:
                x = CAB2(self.n_feat, add_channel=8 * number, kernel_size=5,
                         reduction=self.reduction, name=f"cab2_{i}")(x)
            x = CAB1(self.n_feat, 5, self.reduction, name=f"cab1_{i}")(x)
        return x


# -- misc library blocks ----------------------------------------------------


class PixelShufflePack(nn.Module):
    """Conv + depth-to-space (CVSR_freq.py:481-503)."""

    out_channels: int
    scale_factor: int = 2
    upsample_kernel: int = 3

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.out_channels * self.scale_factor ** 2,
                   self.upsample_kernel, name="upsample_conv")(x)
        return pixel_shuffle(y, self.scale_factor)


class ResidualBlockNoBN(nn.Module):
    """conv-PReLU-conv + CA(reduction 4), residual (CVSR_freq.py:322-340)."""

    mid_channels: int = 64
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.mid_channels, 3, use_bias=False, name="conv1")(x)
        out = PReLU(name="relu")(out)
        out = Conv2d(self.mid_channels, 3, use_bias=False, name="conv2")(out)
        out = CALayer(self.mid_channels, 4, name="CA")(out)
        return x + out * self.res_scale


class ResidualBlocksWithInputConv(nn.Module):
    """Input conv + PReLU + N residual blocks (CVSR_freq.py:361-374)."""

    out_channels: int = 64
    num_blocks: int = 30

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.out_channels, 3, use_bias=False, name="input_conv")(x)
        y = PReLU(name="act")(y)
        for i in range(self.num_blocks):
            y = ResidualBlockNoBN(self.out_channels, name=f"block{i}")(y)
        return y


class SAM(nn.Module):
    """Supervised attention module (CVSR_freq.py:525-538)."""

    n_feat: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, x_img):
        x1 = Conv2d(self.n_feat, self.kernel_size, use_bias=False, name="conv1")(x)
        img = Conv2d(3, 3, use_bias=False, name="conv2")(x) + x_img
        x2 = jax.nn.sigmoid(
            Conv2d(self.n_feat, self.kernel_size, use_bias=False, name="conv3")(img))
        return x1 * x2 + x, img


class DownSample(nn.Module):
    """Stride-2 conv widening by s_factor (CVSR_freq.py:555-565)."""

    in_channels: int
    s_factor: int

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.in_channels + self.s_factor, 3, stride=2,
                      name="down")(x)


class UpSample(nn.Module):
    """2x bilinear + 1x1 narrowing conv (CVSR_freq.py:578-586)."""

    in_channels: int
    s_factor: int

    @nn.compact
    def __call__(self, x):
        y = upsample2x_bilinear(x)
        return Conv2d(self.in_channels, 1, use_bias=False, name="up")(y)


class SkipUpSample(nn.Module):
    """UpSample + skip addition (CVSR_freq.py:566-575)."""

    in_channels: int
    s_factor: int

    @nn.compact
    def __call__(self, x, skip):
        y = upsample2x_bilinear(x)
        y = Conv2d(self.in_channels, 1, use_bias=False, name="up")(y)
        return y + skip


class CABEncoder(nn.Module):
    """3-level CAB encoder with widening downsamples (CVSR_freq.py:1704-1741)."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        s = self.n_feat // 2
        enc1 = x
        for i in range(2):
            enc1 = CAB(self.n_feat, self.kernel_size, self.reduction,
                       name=f"level1_{i}")(enc1)
        y = DownSample(self.n_feat, s, name="down12")(enc1)
        enc2 = y
        for i in range(2):
            enc2 = CAB(self.n_feat + s, self.kernel_size, self.reduction,
                       name=f"level2_{i}")(enc2)
        y = DownSample(self.n_feat + s, s, name="down23")(enc2)
        enc3 = y
        for i in range(2):
            enc3 = CAB(self.n_feat + 2 * s, self.kernel_size, self.reduction,
                       name=f"level3_{i}")(enc3)
        return [enc1, enc2, enc3]


class CABDecoder(nn.Module):
    """3-level CAB decoder with skip attention (CVSR_freq.py:2494-2529)."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 4

    @nn.compact
    def __call__(self, outs):
        enc1, enc2, enc3 = outs
        s = self.n_feat // 2
        dec3 = enc3
        for i in range(2):
            dec3 = CAB(self.n_feat + 2 * s, self.kernel_size, self.reduction,
                       name=f"level3_{i}")(dec3)
        y = SkipUpSample(self.n_feat + s, s, name="up32")(
            dec3, CAB(self.n_feat + s, self.kernel_size, self.reduction,
                      name="skip_attn2")(enc2))
        dec2 = y
        for i in range(2):
            dec2 = CAB(self.n_feat + s, self.kernel_size, self.reduction,
                       name=f"level2_{i}")(dec2)
        y = SkipUpSample(self.n_feat, s, name="up21")(
            dec2, CAB(self.n_feat, self.kernel_size, self.reduction,
                      name="skip_attn1")(enc1))
        dec1 = y
        for i in range(2):
            dec1 = CAB(self.n_feat, self.kernel_size, self.reduction,
                       name=f"level1_{i}")(dec1)
        return [dec1, dec2, dec3]


class TFRUNet(nn.Module):
    """Compact CAB U-Net (CVSR_freq.py:2532-2573), scale_unetfeats=12."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        s = 12
        n = self.n_feat
        enc1 = CAB(n, self.kernel_size, self.reduction, name="enc1_0")(x)
        y = DownSample(n, s, name="down12")(enc1)
        enc2 = y
        for i in range(3):
            enc2 = CAB(n + s, self.kernel_size, self.reduction,
                       name=f"enc2_{i}")(enc2)
        y = DownSample(n + s, s, name="down23")(enc2)
        enc3 = y
        for i in range(3):
            enc3 = CAB(n + 2 * s, self.kernel_size, self.reduction,
                       name=f"enc3_{i}")(enc3)
        dec3 = enc3
        for i in range(3):
            dec3 = CAB(n + 2 * s, self.kernel_size, self.reduction,
                       name=f"dec3_{i}")(dec3)
        y = SkipUpSample(n + s, s, name="up32")(
            dec3, CAB(n + s, self.kernel_size, self.reduction,
                      name="skip_attn2")(enc2))
        dec2 = y
        for i in range(3):
            dec2 = CAB(n + s, self.kernel_size, self.reduction,
                       name=f"dec2_{i}")(dec2)
        y = SkipUpSample(n, s, name="up21")(
            dec2, CAB(n, self.kernel_size, self.reduction,
                      name="skip_attn1")(enc1))
        dec1 = CAB(n, self.kernel_size, self.reduction, name="dec1_0")(y)
        return dec1


class ShallowCell(nn.Module):
    """conv + CAB feature stem (CVSR_freq.py:542-554)."""

    n_feat: int

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.n_feat, 3, use_bias=False, name="conv")(x)
        return CAB(self.n_feat, 3, 4, name="cab")(y)


class Encoder2(nn.Module):
    """Shift-encoder entry (CVSR_freq.py:2458-2491): 3x24ch concat conv ->
    CAB -> FSAS-flavoured shift encoder -> CAB skip fusion."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.n_feat, self.kernel_size, use_bias=False, name="concat")(x)
        shortcut = y
        enc1 = CAB(self.n_feat, self.kernel_size, self.reduction,
                   name="encoder_level1")(y)
        dec1 = EncoderShiftBlock(self.n_feat, self.reduction, use_fsas=True,
                                 name="decoder_level1")(enc1)
        skip = CAB(self.n_feat, self.kernel_size, self.reduction,
                   name="skip_conv")(shortcut)
        out = Conv2d(self.n_feat, self.kernel_size, name="conv_hr0")(
            jnp.concatenate([dec1, skip], -1))
        return CAB(self.n_feat, self.kernel_size, self.reduction,
                   name="out_conv")(out)
