"""RAFT optical flow (flax) — zoo parity for CVSR_train/arch/raft/.

Standard full-size RAFT (hidden=context=128, 4-level all-pairs correlation
pyramid, radius 4, SepConvGRU updates, convex upsampling), matching the
reference's fixed hyper-parameters (raft.py:24-56).  The iteration loop is a
``lax.scan``-friendly fixed count under jit.  ``raft_flow`` reproduces the
``RAFT_flow`` /8-padding wrapper (raft.py:150+).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from .blocks import Conv2d

__all__ = ["RAFT", "raft_flow"]


class _ResUnit(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"

    def _norm(self, name):
        if self.norm == "instance":
            return nn.GroupNorm(num_groups=None, group_size=1, name=name)
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=True, name=name)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.relu(self._norm("norm1")(
            Conv2d(self.planes, 3, stride=self.stride, name="conv1")(x)))
        y = nn.relu(self._norm("norm2")(Conv2d(self.planes, 3, name="conv2")(y)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = self._norm("norm3")(
                Conv2d(self.planes, 1, stride=self.stride, name="downsample")(x))
        return nn.relu(x + y)


class _BasicEncoder(nn.Module):
    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        if self.norm == "instance":
            norm1 = nn.GroupNorm(num_groups=None, group_size=1, name="norm1")
        elif self.norm == "batch":
            norm1 = nn.BatchNorm(use_running_average=True, name="norm1")
        else:
            norm1 = lambda v: v
        y = nn.relu(norm1(Conv2d(64, 7, stride=2, name="conv1")(x)))
        for i, (planes, stride) in enumerate([(64, 1), (64, 1), (96, 2),
                                              (96, 1), (128, 2), (128, 1)]):
            y = _ResUnit(planes, stride, self.norm, name=f"res{i}")(y)
        return Conv2d(self.output_dim, 1, name="conv2")(y)


def _corr_pyramid(f1, f2, levels=4):
    """All-pairs correlation pyramid. f: (B, H, W, C) -> list of
    (B*H*W, hl, wl) volumes."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bxyc,buvc->bxyuv", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = nn.avg_pool(corr, (2, 2), (2, 2))
        pyramid.append(corr)
    return pyramid


def _corr_lookup(pyramid, coords, radius=4):
    """coords: (B, H, W, 2) absolute positions at 1/8 res.  Returns
    (B, H, W, levels*(2r+1)^2)."""
    b, h, w, _ = coords.shape
    r = radius
    n = 2 * r + 1
    dx, dy = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1))
    delta = jnp.asarray(np.stack([dx, dy], -1).reshape(-1, 2), jnp.float32)
    outs = []
    for lvl, corr in enumerate(pyramid):
        centroid = coords.reshape(b * h * w, 1, 2) / (2 ** lvl)
        pts = centroid + delta[None]  # (BHW, n*n, 2)
        from ..ops.warp import grid_sample_bilinear

        sampled = grid_sample_bilinear(corr, pts[..., 0], pts[..., 1])
        outs.append(sampled.reshape(b, h, w, n * n))
    return jnp.concatenate(outs, -1)


class _MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(Conv2d(256, 1, name="convc1")(corr))
        c = nn.relu(Conv2d(192, 3, name="convc2")(c))
        f = nn.relu(Conv2d(128, 7, name="convf1")(flow))
        f = nn.relu(Conv2d(64, 3, name="convf2")(f))
        out = nn.relu(Conv2d(126, 3, name="conv")(jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)  # 128


class _SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        def gru(h, x, ks, tag):
            hx = jnp.concatenate([h, x], -1)
            z = jax.nn.sigmoid(_sep_conv(self.hidden, ks, f"convz{tag}")(hx))
            r = jax.nn.sigmoid(_sep_conv(self.hidden, ks, f"convr{tag}")(hx))
            q = jnp.tanh(_sep_conv(self.hidden, ks, f"convq{tag}")(
                jnp.concatenate([r * h, x], -1)))
            return (1 - z) * h + z * q

        h = gru(h, x, (1, 5), "1")
        h = gru(h, x, (5, 1), "2")
        return h


def _sep_conv(features, ks, name):
    kh, kw = ks
    return nn.Conv(features, (kh, kw),
                   padding=((kh // 2, kh // 2), (kw // 2, kw // 2)), name=name)


class _UpdateBlock(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = _MotionEncoder(name="encoder")(flow, corr)
        net = _SepConvGRU(self.hidden, name="gru")(
            net, jnp.concatenate([inp, motion], -1))
        dflow = Conv2d(2, 3, name="flow_head2")(
            nn.relu(Conv2d(256, 3, name="flow_head1")(net)))
        mask = Conv2d(64 * 9, 1, name="mask2")(
            nn.relu(Conv2d(256, 3, name="mask1")(net)))
        return net, mask * 0.25, dflow


class RAFT(nn.Module):
    """image1, image2: (B, H, W, 3) in [0, 255]; H, W divisible by 8.
    Returns the final upsampled flow (B, H, W, 2)."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4

    @nn.compact
    def __call__(self, image1, image2):
        b, h, w, _ = image1.shape
        image1 = image1 / 127.5 - 1.0
        image2 = image2 / 127.5 - 1.0

        fnet = _BasicEncoder(256, "instance", name="fnet")
        f1 = fnet(image1)
        f2 = fnet(image2)
        pyramid = _corr_pyramid(f1, f2, self.corr_levels)

        cmap = _BasicEncoder(256, "batch", name="cnet")(image1)
        net = jnp.tanh(cmap[..., :128])
        inp = nn.relu(cmap[..., 128:])

        h8, w8 = h // 8, w // 8
        gy, gx = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (b, h8, w8, 2))
        coords1 = coords0

        update = _UpdateBlock(name="update_block")
        mask = None
        for _ in range(self.iters):
            corr = _corr_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, mask, dflow = update(net, inp, corr, flow)
            coords1 = coords1 + dflow

        flow = coords1 - coords0
        # convex upsampling: (B, h8, w8, 9*64) mask over 3x3 taps per 8x8 cell
        m = mask.reshape(b, h8, w8, 9, 64)
        m = jax.nn.softmax(m, axis=3)
        fp = jnp.pad(8 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [fp[:, dy : dy + h8, dx : dx + w8] for dy in range(3)
                for dx in range(3)]
        taps = jnp.stack(taps, 3)  # (B, h8, w8, 9, 2)
        up = jnp.einsum("bhwkc,bhwkm->bhwmc", taps, m)  # (B,h8,w8,64,2)
        up = up.reshape(b, h8, w8, 8, 8, 2)
        up = jnp.transpose(up, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, 2)
        return up


def raft_flow(model: RAFT, params, ref, supp):
    """/8 pad wrapper (RAFT_flow): arbitrary (B, H, W, 3) [0,1] inputs."""
    h, w = ref.shape[1:3]
    h8 = -(-h // 8) * 8
    w8 = -(-w // 8) * 8
    ref_r = resize_bilinear(ref * 255.0, h8, w8)
    supp_r = resize_bilinear(supp * 255.0, h8, w8)
    flow = model.apply(params, ref_r, supp_r)
    flow = resize_bilinear(flow, h, w)
    return flow * jnp.asarray([w / w8, h / h8], flow.dtype)
