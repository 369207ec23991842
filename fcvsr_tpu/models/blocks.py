"""Neural building blocks (flax.linen, channels-last).

Rebuilds the block library of the reference op file
(/root/reference/CVSR_train/arch/CVSR_freq.py:234-922) with TPU-idiomatic
NHWC layouts.  Parameter initialisation matches torch defaults
(kaiming-uniform a=sqrt(5) + uniform bias) so train-from-scratch recipes
behave like the reference; blocks that the reference re-initialises with
``initialize_weights(scale)`` (kaiming-normal fan-in x scale, zero bias —
CVSR_freq.py:635-653) take an ``init_scale``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import downsample2x_bilinear, upsample2x_bilinear

__all__ = [
    "Conv2d",
    "PReLU",
    "LayerNorm2d",
    "CALayer",
    "ConvBlk",
    "ContextBlock",
    "RCB",
    "BlockRCB",
    "SCGroup",
    "SCNet",
    "DivEnh",
    "pixel_shuffle",
]


def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _kaiming_normal_scaled(scale: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        std = math.sqrt(2.0 / fan_in) * scale
        return std * jax.random.normal(key, shape, dtype)

    return init


class _SelConv(nn.Module):
    """Conv whose parameters span ``features`` output channels but which only
    *computes* the ``sel`` subset.  Parameter shapes/names match ``nn.Conv``
    exactly (checkpoint-compatible); the dead output channels are never
    produced, saving their MXU passes and HBM writes.  Used for MGAA's kernel
    predictor, where the reference's kernel1-both-passes bug leaves every
    ``kernel2`` half of the prediction unused (CVSR_freq.py:1272-1273)."""

    features: int
    sel: tuple  # static output-channel indices to compute
    kernel_size: int
    stride: int
    use_bias: bool
    groups: int
    kernel_init: object
    bias_init: object
    dtype: Optional[jnp.dtype] = None  # compute dtype, like nn.Conv's
    # 'rows' emits (B, H, Cout, W) directly (1x1 convs only) — the layout
    # the fused IAC kernel consumes; at MGAA's F1 width the NHWC->rows
    # transpose it replaces is a ~600MB HBM pass per chain
    out_layout: str = "nhwc"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin // self.groups, self.features))
        sel = list(self.sel)
        w = jnp.take(kernel, jnp.asarray(sel), axis=3)
        # promote like nn.Conv does (mixed bf16 params / f32 activations),
        # honouring an explicit compute dtype when set
        dt = self.dtype or jnp.promote_types(x.dtype, w.dtype)
        if self.out_layout == "rows":
            assert k == 1 and self.stride == 1 and self.groups == 1
            y = jnp.einsum("bhwi,io->bhow", x.astype(dt), w[0, 0].astype(dt))
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,))
                y = y + jnp.take(bias, jnp.asarray(sel)).astype(
                    dt)[None, None, :, None]
            return y
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + jnp.take(bias, jnp.asarray(sel)).astype(dt)
        return y


class _SplitConv(nn.Module):
    """Conv applied to a TUPLE of inputs as if they were concatenated on the
    channel axis, without materializing the concat: conv(concat(parts)) ==
    sum_i conv_i(part_i) with the kernel's input-channel rows split
    accordingly (linearity).  ``zero_tail`` declares trailing input channels
    whose activations are identically zero (MGAA's identity-flow features,
    CVSR_freq.py:1484-1488) — their kernel rows exist for checkpoint parity
    but are never applied.  Parameter shapes/names match ``nn.Conv``.

    The summed-partials accumulation order is not bit-identical to the
    single conv, so callers keep this off the bit-exact parity path (MGAA
    uses it on the ``warp_impl='pallas'`` deployment path only)."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    kernel_init: object
    bias_init: object
    zero_tail: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts):
        k = self.kernel_size
        pad = k // 2
        cin = sum(p.shape[-1] for p in parts) + self.zero_tail
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        dt = self.dtype or jnp.promote_types(parts[0].dtype, kernel.dtype)
        out = None
        o = 0
        for p in parts:
            c = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p.astype(dt), kernel[:, :, o : o + c, :].astype(dt),
                (self.stride, self.stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
            o += c
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            out = out + bias.astype(dt)
        return out


class Conv2d(nn.Module):
    """2-D conv with torch-compatible symmetric padding and init.

    Padding is explicit ``(k//2, k//2)`` per spatial axis (torch semantics for
    odd kernels, including stride-2 downsamples where XLA 'SAME' would pad
    asymmetrically).  ``out_select``: compute only these output channels while
    keeping full-size parameters (see ``_SelConv``).  Passing a tuple/list of
    inputs applies the conv as if they were channel-concatenated without
    materializing the concat (see ``_SplitConv``); ``zero_tail`` then
    declares trailing always-zero input channels to skip.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    groups: int = 1
    init_scale: Optional[float] = None  # None => torch default init
    dtype: Optional[jnp.dtype] = None
    out_select: Optional[tuple] = None

    zero_tail: int = 0  # only meaningful for tuple inputs (_SplitConv)
    out_layout: str = "nhwc"  # 'rows' (with out_select, 1x1): see _SelConv
    # 'rows': serve through the rows-layout Pallas kernel
    # (ops/pallas_conv.py::conv3x3_rows_nhwc) — for lane-hostile output
    # widths (conv_last0's C_out=1 runs at 0.33 TFLOP/s under XLA NHWC).
    # Same param tree; exact-path gradients via the helper's custom VJP.
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2
        split = isinstance(x, (list, tuple))
        in_features = (sum(p.shape[-1] for p in x) + self.zero_tail
                       if split else x.shape[-1])
        fan_in = (in_features // self.groups) * k * k
        if self.init_scale is None:
            kernel_init = _torch_conv_kernel_init
            bound = 1.0 / math.sqrt(fan_in)
            bias_init = (
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -bound, bound
                )
            )
        else:
            kernel_init = _kaiming_normal_scaled(self.init_scale)
            bias_init = nn.initializers.zeros
        if split:
            assert self.groups == 1 and self.out_select is None
            return _SplitConv(
                features=self.features, kernel_size=k, stride=self.stride,
                use_bias=self.use_bias, kernel_init=kernel_init,
                bias_init=bias_init, zero_tail=self.zero_tail,
                dtype=self.dtype, name="Conv_0")(tuple(x))
        if self.out_select is not None:
            return _SelConv(
                features=self.features, sel=tuple(self.out_select),
                kernel_size=k, stride=self.stride, use_bias=self.use_bias,
                groups=self.groups, kernel_init=kernel_init,
                bias_init=bias_init, dtype=self.dtype,
                out_layout=self.out_layout, name="Conv_0")(x)
        assert self.out_layout == "nhwc"
        if self.impl == "rows" and not self.is_initializing():
            assert k == 3 and self.stride == 1 and self.groups == 1
            from ..ops.pallas_conv import conv3x3_rows_nhwc

            p = self.variables["params"]["Conv_0"]
            # measured @1088x1920 C_out=1: cat3 4.41 ms, mstack 4.83 (both
            # DMA-bound; mstack's fewer weight-tile reloads only pay off at
            # wider outputs — 64->64 f32: mstack 0.160 vs cat3 0.359)
            mode = "cat3" if self.features < 8 else "mstack"
            return conv3x3_rows_nhwc(
                x, p["kernel"], p["bias"] if self.use_bias else None,
                mode, jax.default_backend() == "cpu")
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="Conv_0",
        )(x)


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch ``nn.PReLU()``)."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda *_: jnp.full((1,), self.init_value, jnp.float32))
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class LayerNorm2d(nn.Module):
    """Channel layer-norm over the feature axis (reference ``LayerNorm2d``,
    CVSR_freq.py:234-270: biased variance, eps inside the sqrt)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) / jnp.sqrt(var + self.eps)
        return y * weight.astype(x.dtype) + bias.astype(x.dtype)


class CALayer(nn.Module):
    """Squeeze-and-excite channel attention (CVSR_freq.py:271-287)."""

    channel: int
    reduction: int = 16
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # f32 accumulation for the spatial mean (exact no-op on f32 inputs;
        # keeps the bf16 head option from reducing in bf16)
        y = jnp.mean(x, axis=(1, 2), keepdims=True,
                     dtype=jnp.float32).astype(x.dtype)
        y = Conv2d(self.channel // self.reduction, 1, use_bias=self.use_bias,
                   dtype=self.dtype, name="down")(y)
        y = nn.relu(y)
        y = Conv2d(self.channel, 1, use_bias=self.use_bias,
                   dtype=self.dtype, name="up")(y)
        return x * jax.nn.sigmoid(y)


class ConvBlk(nn.Module):
    """conv-PReLU-conv with additive (not residual-input) CA
    (CVSR_freq.py:344-357); kernel size 2*index+1."""

    dim: int
    index: int
    res_scale: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = 2 * self.index + 1
        out = Conv2d(self.dim, k, use_bias=False, dtype=self.dtype,
                     name="conv1")(x)
        out = PReLU(name="relu")(out)
        out = Conv2d(self.dim, k, use_bias=False, dtype=self.dtype,
                     name="conv2")(out)
        ca = CALayer(self.dim, reduction=1, dtype=self.dtype, name="CA")(out)
        return ca * self.res_scale + out


class ContextBlock(nn.Module):
    """Global-context block (CVSR_freq.py:657-701)."""

    n_feat: int
    use_bias: bool = False
    init_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        mask = Conv2d(1, 1, use_bias=self.use_bias, init_scale=self.init_scale,
                      name="conv_mask")(x)
        # softmax over all spatial positions, kept in 2-D NHWC shapes: the
        # (b, h*w) flatten forced a costly relayout on TPU (measured 1.67ms
        # per block at 272x480 — the dominant SCNet cost, benchmarks/
        # microbench3.py); spatial-axis reductions are bandwidth-bound.
        mask = mask - jnp.max(mask, axis=(1, 2), keepdims=True)
        mask = jnp.exp(mask)
        mask = mask / jnp.sum(mask, axis=(1, 2), keepdims=True)
        context = jnp.sum(x * mask, axis=(1, 2))
        context = context[:, None, None, :]
        term = Conv2d(self.n_feat, 1, use_bias=self.use_bias,
                      init_scale=self.init_scale, name="add0")(context)
        term = jax.nn.leaky_relu(term, 0.2)
        term = Conv2d(self.n_feat, 1, use_bias=self.use_bias,
                      init_scale=self.init_scale, name="add1")(term)
        return x + term


class RCB(nn.Module):
    """Residual context block (CVSR_freq.py:705-725)."""

    n_feat: int
    init_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.n_feat, 3, use_bias=False, init_scale=self.init_scale,
                     name="body0")(x)
        res = jax.nn.leaky_relu(res, 0.2)
        res = Conv2d(self.n_feat, 3, use_bias=False, init_scale=self.init_scale,
                     name="body1")(res)
        res = ContextBlock(self.n_feat, init_scale=self.init_scale, name="gcnet")(res)
        res = jax.nn.leaky_relu(res, 0.2)
        return x + res


class BlockRCB(nn.Module):
    """Cross-scale residual block over an [L1, L2, L3] pyramid
    (CVSR_freq.py:729-777).  The body/down/up convs are re-initialised with
    kaiming-normal x 0.1 in the reference; we honour that."""

    nf: int
    width_multiplier: int = 2

    @nn.compact
    def __call__(self, x_list: Sequence[jnp.ndarray]):
        body0 = Conv2d(self.nf * self.width_multiplier, 3, init_scale=0.1, name="body0")
        body1 = Conv2d(self.nf, 3, init_scale=0.1, name="body1")
        rcb = RCB(self.nf, init_scale=0.1, name="rcb")
        down_conv = Conv2d(self.nf, 1, init_scale=0.1, name="down")
        up_conv = Conv2d(self.nf, 1, init_scale=0.1, name="up")

        def body(x):
            y = body0(x)
            y = jax.nn.leaky_relu(y, 0.1)
            y = body1(y)
            return rcb(y)

        res = [body(x) for x in x_list]
        down_res = [res[0]] + [downsample2x_bilinear(down_conv(r)) for r in res[:-1]]
        up_res = [upsample2x_bilinear(up_conv(r)) for r in res[1:]] + [res[-1]]
        return [x + r + d + u for x, r, d, u in zip(x_list, res, down_res, up_res)]


class SCGroup(nn.Module):
    """Group of BlockRCBs + one conv shared across scales (CVSR_freq.py:781-803)."""

    nf: int
    back_rbs: int = 3

    @nn.compact
    def __call__(self, x_list):
        res = list(x_list)
        for i in range(self.back_rbs):
            res = BlockRCB(self.nf, name=f"block{i}")(res)
        conv = Conv2d(self.nf, 3, name="conv")
        res = [conv(r) for r in res]
        return [x + r for x, r in zip(x_list, res)]


class SCNet(nn.Module):
    """Stack of SCGroups with outer residual (CVSR_freq.py:807-822).

    ``impl='rows'`` serves the identical computation through the
    chain-resident rows-layout Pallas conv kernel (models/scnet_rows.py):
    bf16 MXU matmuls with width in lanes instead of XLA's half-occupied
    C=64 NHWC convs.  Gradients stay exact-path (custom VJP re-runs the
    NHWC backward).  Params are laid down by the normal path at init, so
    both impls share one checkpoint format.
    """

    nf: int
    num_groups: int = 10
    impl: str = "xla"  # 'rows' / 'rows_bf16' = Pallas rows-layout serving
    # kernel ('rows_bf16' additionally stores the chain activations as
    # bf16 in HBM — halves the layout's memory traffic; storage-rounding
    # numerics delta only, the MXU passes are bf16 either way)

    @nn.compact
    def __call__(self, x_list):
        if self.impl in ("rows", "rows_bf16") and not self.is_initializing():
            from .scnet_rows import scnet_rows_diff

            interpret = jax.default_backend() == "cpu"
            return list(scnet_rows_diff(
                self.variables["params"], tuple(x_list), self.nf,
                self.num_groups, interpret, self.impl == "rows_bf16"))
        res = list(x_list)
        for i in range(self.num_groups):
            res = SCGroup(self.nf, name=f"group{i}")(res)
        return [x + r for x, r in zip(x_list, res)]


class DivEnh(nn.Module):
    """Per-band detail enhancement (CVSR_freq.py:2104-2133).

    The reference defines a 3x3 conv + sigmoid that the shipped forward never
    calls (commented out); we omit them so the parameter tree holds only live
    weights.  Callers pass pre-summed lower-band context.
    """

    channel: int
    # compute/storage dtype for the band chain (params stay f32; the
    # mffr_dtype='bf16' deployment option threads bf16 through here)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_before_sum=None, ex_before_sum=None):
        a = self.param("a", nn.initializers.zeros, (self.channel,))
        b = self.param("b", nn.initializers.ones, (self.channel,))
        ca = CALayer(self.channel, dtype=self.dtype, name="ca")
        a = a.astype(x.dtype)
        b = b.astype(x.dtype)
        if x_before_sum is None:
            out = x - jnp.mean(x, axis=(1, 2), keepdims=True)
            return ca(0.2 * a * out * x + b * x)
        out = x - x_before_sum + 0.2 * ex_before_sum
        out1 = ca(0.2 * a * out * x + b * x)
        out2 = ca(0.2 * a * ex_before_sum * x + b * x)
        return out1 + out2


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Depth-to-space matching torch PixelShuffle channel order.

    x: (B, H, W, C*r*r) with channel index c*r*r + i*r + j  ->  (B, H*r, W*r, C).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c)
