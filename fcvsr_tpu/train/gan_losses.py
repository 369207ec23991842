"""GAN / perceptual / gradient losses (mmedit models/losses rebuild).

Reference files: mmedit/models/losses/{gan_loss.py, perceptual_loss.py,
gradient_loss.py}.  All functional (loss = f(args)); the VGG feature
extractor is a flax module whose torchvision-indexed layer names keep the
mmedit ``layer_weights={'34': 1.0}``-style configs meaningful.  torchvision
is absent from the image, so VGG weights initialize randomly unless an .npz
(``features.N.weight``/``features.N.bias``, torch OIHW layout) is supplied.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gan_loss", "disc_shift_loss", "gradient_penalty_loss", "gradient_loss",
    "VGGFeatureExtractor", "perceptual_loss", "transferal_perceptual_loss",
    "load_vgg_npz",
]


# ------------------------------- GAN losses ---------------------------------


def gan_loss(pred: jnp.ndarray, target_is_real: bool, gan_type: str,
             real_label_val: float = 1.0, fake_label_val: float = 0.0,
             loss_weight: float = 1.0, is_disc: bool = False) -> jnp.ndarray:
    """mmedit GANLoss.forward (gan_loss.py:80-133).

    ``loss_weight`` is applied only for the generator, exactly as in the
    reference ("loss_weight is always 1.0 for discriminators").
    """
    if gan_type == "wgan":
        loss = -pred.mean() if target_is_real else pred.mean()
    elif gan_type == "hinge":
        if is_disc:
            pred = -pred if target_is_real else pred
            loss = jax.nn.relu(1 + pred).mean()
        else:
            loss = -pred.mean()
    else:
        target = jnp.full_like(
            pred, real_label_val if target_is_real else fake_label_val)
        if gan_type == "vanilla":  # BCE with logits
            loss = jnp.mean(
                jnp.maximum(pred, 0) - pred * target
                + jnp.log1p(jnp.exp(-jnp.abs(pred))))
        elif gan_type == "lsgan":
            loss = jnp.mean((pred - target) ** 2)
        else:
            raise NotImplementedError(f"GAN type {gan_type}")
    return loss if is_disc else loss * loss_weight


def disc_shift_loss(pred: jnp.ndarray, loss_weight: float = 0.1) -> jnp.ndarray:
    """mean(pred^2) * weight (gan_loss.py:322-341)."""
    return jnp.mean(pred ** 2) * loss_weight


def gradient_penalty_loss(disc_fn, key, real_data: jnp.ndarray,
                          fake_data: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          loss_weight: float = 1.0) -> jnp.ndarray:
    """WGAN-GP penalty (gan_loss.py:244-319): gradient norm at random
    interpolates driven to 1.  ``disc_fn``: array -> logits."""
    alpha = jax.random.uniform(key, (real_data.shape[0],) + (1,) * (real_data.ndim - 1))
    interp = alpha * real_data + (1 - alpha) * fake_data

    def scalar_disc(x):
        return disc_fn(x).sum()

    grads = jax.grad(scalar_disc)(interp)
    if mask is not None:
        grads = grads * mask
    norm = jnp.sqrt(jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2) * loss_weight


# ------------------------------ gradient loss --------------------------------


def gradient_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  loss_weight: float = 1.0,
                  reduction: str = "mean") -> jnp.ndarray:
    """Sobel-gradient L1 (gradient_loss.py:13-53).  NHWC inputs."""
    kx = jnp.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], pred.dtype)
    ky = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], pred.dtype)

    def grad2d(x, k):
        c = x.shape[-1]
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    def l1(a, b):
        d = jnp.abs(a - b)
        if weight is not None:
            d = d * weight
        if reduction == "mean":
            return d.mean()
        if reduction == "sum":
            return d.sum()
        return d

    loss = l1(grad2d(pred, kx), grad2d(target, kx)) + \
        l1(grad2d(pred, ky), grad2d(target, ky))
    return loss * loss_weight


# ------------------------------- perceptual ----------------------------------

# torchvision vgg19.features layer table: index -> (kind, out_channels)
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _vgg19_layers():
    """[(torchvision_index, kind, channels)] for vgg19.features."""
    layers = []
    idx = 0
    for v in _VGG19_CFG:
        if v == "M":
            layers.append((idx, "pool", None))
            idx += 1
        else:
            layers.append((idx, "conv", v))
            idx += 1
            layers.append((idx, "relu", None))
            idx += 1
    return layers


class VGGFeatureExtractor(nn.Module):
    """VGG19 prefix returning the activations named in ``layer_name_list``
    (torchvision feature indices as strings, mmedit PerceptualVGG parity).

    Input: (B, H, W, 3) in [0, 1]; ImageNet-normalized internally when
    ``use_input_norm``.
    """

    layer_name_list: Sequence[str] = ("34",)
    use_input_norm: bool = True

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.use_input_norm:
            mean = jnp.asarray((0.485, 0.456, 0.406), x.dtype)
            std = jnp.asarray((0.229, 0.224, 0.225), x.dtype)
            x = (x - mean) / std
        wanted = set(self.layer_name_list)
        max_idx = max(int(k) for k in wanted)
        out = {}
        for idx, kind, ch in _vgg19_layers():
            if idx > max_idx:
                break
            if kind == "conv":
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"features_{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if str(idx) in wanted:
                out[str(idx)] = x
        return out


def load_vgg_npz(path: str) -> dict:
    """Torch ``features.N.weight``/``bias`` .npz -> flax params for
    VGGFeatureExtractor (OIHW -> HWIO)."""
    data = np.load(path)
    params = {}
    for key in data.files:
        if not key.startswith("features."):
            continue
        _, idx, kind = key.split(".")
        name = f"features_{idx}"
        entry = params.setdefault(name, {})
        if kind == "weight":
            entry["kernel"] = np.transpose(data[key], (2, 3, 1, 0))
        else:
            entry["bias"] = data[key]
    return {"params": params}


def _gram(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    return jnp.einsum("bpc,bpd->bcd", f, f) / (c * h * w)


def perceptual_loss(vgg: VGGFeatureExtractor, vgg_params, x: jnp.ndarray,
                    gt: jnp.ndarray, layer_weights: Dict[str, float],
                    perceptual_weight: float = 1.0,
                    style_weight: float = 0.0,
                    norm_img: bool = False,
                    criterion: str = "l1"):
    """mmedit PerceptualLoss.forward (perceptual_loss.py:172-220), NHWC.

    Returns (percep_loss | None, style_loss | None).
    """
    if norm_img:
        x = (x + 1) * 0.5
        gt = (gt + 1) * 0.5
    xf = vgg.apply(vgg_params, x)
    gf = vgg.apply(vgg_params, jax.lax.stop_gradient(gt))

    crit = (lambda a, b: jnp.abs(a - b).mean()) if criterion == "l1" else \
        (lambda a, b: ((a - b) ** 2).mean())

    percep = None
    if perceptual_weight > 0:
        percep = sum(crit(xf[k], gf[k]) * w for k, w in layer_weights.items())
        percep = percep * perceptual_weight
    style = None
    if style_weight > 0:
        style = sum(crit(_gram(xf[k]), _gram(gf[k])) * w
                    for k, w in layer_weights.items())
        style = style * style_weight
    return percep, style


def transferal_perceptual_loss(maps: Sequence[jnp.ndarray],
                               soft_attention: jnp.ndarray,
                               textures: Sequence[jnp.ndarray],
                               use_attention: bool = True,
                               criterion: str = "mse",
                               loss_weight: float = 1.0) -> jnp.ndarray:
    """TTSR transferal perceptual loss (perceptual_loss.py:235-293), NHWC.

    maps: features of the SR output at 3 scales; textures: transferred
    textures (stop-gradient); soft_attention: (B, H, W, 1) at scale 0.
    """
    if use_attention:
        h, w = soft_attention.shape[1:3]
        attns = [
            jax.image.resize(soft_attention, (soft_attention.shape[0],
                                              h * 2 ** i, w * 2 ** i, 1),
                             "nearest")
            for i in range(len(maps))
        ]
    else:
        attns = [1.0] * len(maps)

    loss = 0.0
    for m, t, a in zip(maps, textures, attns):
        t = jax.lax.stop_gradient(t)
        if criterion == "mse":
            loss += (((m - t) * a) ** 2).mean()
        else:
            loss += jnp.abs((m - t) * a).mean()
    return loss * loss_weight
