"""Pixel losses matching both reference trees.

* ``charbonnier_sum`` — CVSR_train flavour (opt/loss.py:20-31): eps added
  *unsquared* inside the sqrt and **sum** reduction.
* ``charbonnier`` — mmedit flavour (losses/pixelwise_loss.py:41-51):
  sqrt(diff^2 + eps^2) with eps=1e-12 and configurable reduction; the FCVSR
  configs use reduction='mean'.
* ``l1``, ``mse``, ``total_variation``, ``sobel`` — the remaining opt/loss.py
  functions used by ablations.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["charbonnier_sum", "charbonnier", "l1_loss", "mse_loss",
           "total_variation", "sobel_loss"]


def charbonnier_sum(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """CVSR_train CharbonnierLoss: sum(sqrt(diff^2 + eps)), eps unsquared."""
    diff = pred - target
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-12,
                reduction: str = "mean", loss_weight: float = 1.0) -> jnp.ndarray:
    """mmedit CharbonnierLoss (default reduction='mean' per FCVSR configs)."""
    diff = pred - target
    val = jnp.sqrt(diff * diff + eps)
    if reduction == "mean":
        out = jnp.mean(val)
    elif reduction == "sum":
        out = jnp.sum(val)
    elif reduction == "none":
        out = val
    else:
        raise ValueError(f"unknown reduction {reduction}")
    return loss_weight * out


def l1_loss(pred, target, reduction: str = "mean"):
    val = jnp.abs(pred - target)
    return jnp.mean(val) if reduction == "mean" else jnp.sum(val)


def mse_loss(pred, target, reduction: str = "mean"):
    val = jnp.square(pred - target)
    return jnp.mean(val) if reduction == "mean" else jnp.sum(val)


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic TV over the trailing two spatial axes of (..., H, W)."""
    dh = jnp.abs(x[..., 1:, :] - x[..., :-1, :])
    dw = jnp.abs(x[..., :, 1:] - x[..., :, :-1])
    return jnp.mean(dh) + jnp.mean(dw)


def sobel_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 between Sobel gradient magnitudes, (B, C, H, W) layout."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T

    def grad(img):
        b, c, h, w = img.shape
        flat = img.reshape(b * c, 1, h, w)
        import jax

        gx = jax.lax.conv_general_dilated(flat, kx[None, None], (1, 1), "SAME")
        gy = jax.lax.conv_general_dilated(flat, ky[None, None], (1, 1), "SAME")
        return jnp.sqrt(gx * gx + gy * gy + 1e-12).reshape(b, c, h, w)

    return jnp.mean(jnp.abs(grad(pred) - grad(target)))
