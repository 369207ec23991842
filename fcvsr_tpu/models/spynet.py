"""SPyNet optical flow (flax, channels-last).

Rebuilds the reference SPyNet (CVSR_train/arch/spynet/SPynet.py:24-167, and
the identical copies embedded in the mmedit zoo backbones): 6-level coarse-to-
fine pyramid, each level refining an upsampled flow with a 5-conv (7x7)
module over [ref, border-warped supp, flow].  ``SpyNetFlow`` adds the /32
pad-resize wrapper (``SpyNet_flow``, SPynet.py:167+).

Checkpoint keys: ``basic_module.{L}.basic_module.{0,2,4,6,8}.{weight,bias}``
— mapped by ``convert_spynet_state_dict``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from ..ops.warp import flow_warp
from .blocks import Conv2d

__all__ = ["SpyNet", "spynet_flow", "convert_spynet_state_dict"]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _BasicModule(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i, feats in enumerate((32, 64, 32, 16)):
            x = nn.relu(Conv2d(feats, 7, name=f"conv{i}")(x))
        return Conv2d(2, 7, name="conv4")(x)


class SpyNet(nn.Module):
    """ref, supp: (B, H, W, 3) in [0,1], H and W divisible by 32.
    Returns flow (B, H, W, 2)."""

    levels: int = 6

    @nn.compact
    def __call__(self, ref, supp):
        mean = jnp.asarray(_MEAN, ref.dtype)
        std = jnp.asarray(_STD, ref.dtype)
        refs = [(ref - mean) / std]
        supps = [(supp - mean) / std]
        for _ in range(self.levels - 1):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), (2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), (2, 2)))

        b, h0, w0, _ = refs[0].shape
        flow = jnp.zeros((b, h0 // 2, w0 // 2, 2), ref.dtype)
        for level in range(self.levels):
            rh, rw = refs[level].shape[1:3]
            up = resize_bilinear(flow, flow.shape[1] * 2, flow.shape[2] * 2,
                                 align_corners=True) * 2.0
            if up.shape[1] != rh:
                up = jnp.pad(up, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
            if up.shape[2] != rw:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
            warped = flow_warp(supps[level], up, padding_mode="border")
            inp = jnp.concatenate([refs[level], warped, up], -1)
            flow = _BasicModule(name=f"level{level}")(inp) + up
        return flow


def spynet_flow(model: SpyNet, params, ref, supp):
    """/32 pad-resize wrapper (SpyNet_flow): arbitrary (B, H, W, 3) inputs."""
    h, w = ref.shape[1:3]
    h32 = int(math.floor(math.ceil(h / 32.0) * 32.0))
    w32 = int(math.floor(math.ceil(w / 32.0) * 32.0))
    ref_r = resize_bilinear(ref, h32, w32)
    supp_r = resize_bilinear(supp, h32, w32)
    flow = model.apply(params, ref_r, supp_r)
    flow = resize_bilinear(flow, h, w)
    scale = jnp.asarray([w / w32, h / h32], flow.dtype)
    return flow * scale


def convert_spynet_state_dict(state, flax_params):
    """Torch SPyNet state_dict -> flax params (shape-checked)."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out = {}
    for key, template in flat.items():
        # key: ('levelL', 'convI', 'Conv_0', 'kernel'|'bias')
        lvl = int(key[0][len("level"):])
        conv = int(key[1][len("conv"):])
        base = f"basic_module.{lvl}.basic_module.{conv * 2}"
        if key[-1] == "kernel":
            v = np.transpose(np.asarray(state[f"{base}.weight"]), (2, 3, 1, 0))
        else:
            v = np.asarray(state[f"{base}.bias"])
        if v.shape != template.shape:
            raise ValueError(f"shape mismatch at {key}: {v.shape} vs {template.shape}")
        out[key] = v.astype(np.float32)
    return {"params": flax.traverse_util.unflatten_dict(out)}
