"""LPIPS perceptual metric (flax AlexNet/VGG backbone + linear heads).

Rebuilds the vendored LPIPS package the reference carries
(CVSR_train/opt/lpips/ — loss.py/trainer.py/pretrained_networks.py, v0.1
linear weights under opt/lpips/weights/).  The network is the published
LPIPS v0.1 design: ImageNet-normalised input, conv features from 5 stages of
AlexNet or VGG16, unit-normalised per channel, squared differences passed
through 1x1 "linear" heads and spatially averaged.

Pretrained backbone + head weights must be supplied (torchvision is not
available offline): ``load_torch_lpips_weights`` maps a torch state_dict
(the official lpips package layout) onto the flax tree.  Without weights the
module still runs (random init) for pipeline testing.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPSAlex", "lpips_distance", "load_torch_lpips_weights"]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _AlexFeatures(nn.Module):
    """AlexNet conv trunk; returns the 5 relu feature maps LPIPS taps."""

    @nn.compact
    def __call__(self, x):
        feats = []
        cfg = [
            (64, 11, 4, 2),   # conv1
            (192, 5, 1, 2),   # conv2
            (384, 3, 1, 1),   # conv3
            (256, 3, 1, 1),   # conv4
            (256, 3, 1, 1),   # conv5
        ]
        for i, (f, k, s, p) in enumerate(cfg):
            x = nn.Conv(f, (k, k), (s, s), padding=((p, p), (p, p)),
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
            if i in (0, 1):
                x = nn.max_pool(x, (3, 3), (2, 2))
        return feats


class LPIPSAlex(nn.Module):
    """LPIPS v0.1 with AlexNet backbone; inputs (B, 3, H, W) in [-1, 1]."""

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def prep(v):
            v = jnp.transpose(v, (0, 2, 3, 1))
            return (v - shift) / scale

        net = _AlexFeatures(name="net")
        fx = net(prep(x))
        fy = net(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            an = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            bn = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (an - bn) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def lpips_distance(model, params, img1_01: jnp.ndarray, img2_01: jnp.ndarray):
    """LPIPS distance for (B, 3, H, W) images in [0, 1]."""
    return model.apply(params, img1_01 * 2 - 1, img2_01 * 2 - 1)


def load_torch_lpips_weights(backbone_state, lin_state, flax_params):
    """Map official lpips-package torch weights onto the flax tree.

    ``backbone_state``: torchvision alexnet.features state_dict
    (keys '0.weight', '3.weight', '6.weight', '8.weight', '10.weight' + biases).
    ``lin_state``: lpips linear heads ('lin{i}.model.1.weight').
    """
    import flax

    conv_map = {0: "0", 1: "3", 2: "6", 3: "8", 4: "10"}
    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out = {}
    for key, template in flat.items():
        if key[0] == "net":
            idx = int(key[1][len("conv"):])
            tk = conv_map[idx]
            if key[-1] == "kernel":
                v = np.transpose(np.asarray(backbone_state[f"{tk}.weight"]),
                                 (2, 3, 1, 0))
            else:
                v = np.asarray(backbone_state[f"{tk}.bias"])
        elif key[0].startswith("lin"):
            i = int(key[0][len("lin"):])
            v = np.transpose(np.asarray(lin_state[f"lin{i}.model.1.weight"]),
                             (2, 3, 1, 0))
        else:
            raise KeyError(key)
        if v.shape != template.shape:
            raise ValueError(f"{key}: {v.shape} vs {template.shape}")
        out[key] = v.astype(np.float32)
    return {"params": flax.traverse_util.unflatten_dict(out)}
