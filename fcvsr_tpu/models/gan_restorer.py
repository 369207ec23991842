"""GAN restorers — SRGAN / ESRGAN / GLEAN / RealBasicVSR training semantics.

Reference: mmedit restorers/srgan.py:100-180 (generator step gated by
``disc_steps``/``disc_init_steps``, then real/fake discriminator steps),
restorers/real_basicvsr.py:76-200 (adds the cleaning loss on the
area-downsampled GT and per-frame flattening), restorers/esrgan.py
(relativistic discriminator), restorers/glean.py (img_channels slicing).

Functional/JAX: parameters and optimizer states are explicit; one
``train_step(state, lq, gt, rng)`` alternates generator and discriminator
updates inside a single jitted call (the reference's two ``.backward()``s
become two ``value_and_grad``s over disjoint param trees).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..train.gan_losses import (VGGFeatureExtractor, gan_loss,
                                perceptual_loss)
from ..train.losses import l1_loss

__all__ = ["GANRestorer", "area_downsample"]


def area_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch F.interpolate(mode='area') for integer factors = avg pooling.
    x: (..., H, W, C)."""
    *lead, h, w, c = x.shape
    y = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    return y.mean(axis=(-4, -2))


@dataclass
class GANRestorer:
    """Bundles generator/discriminator apply fns + GAN training recipe.

    ``generator_apply(params, lq) -> sr`` (and optionally
    ``(sr, cleaned_lq)`` when ``cleaning_loss_weight > 0`` — RealBasicVSR).
    ``disc_apply(params, img) -> logits`` over NHWC images.
    """

    generator_apply: Callable
    # None => generator-only training (the wogan pre-training stage of
    # RealBasicVSR / DIC: pixel(+cleaning/perceptual) losses, no adversary)
    disc_apply: Optional[Callable]
    gan_type: str = "vanilla"
    gan_loss_weight: float = 5e-3
    pixel_loss_weight: float = 1e-2
    cleaning_loss_weight: float = 0.0
    perceptual: Optional[VGGFeatureExtractor] = None
    perceptual_params: Any = None
    perceptual_layer_weights: Dict[str, float] = field(
        default_factory=lambda: {"34": 1.0})
    perceptual_weight: float = 1.0
    style_weight: float = 0.0
    disc_steps: int = 1
    disc_init_steps: int = 0
    relativistic: bool = False  # ESRGAN-style relativistic discriminator

    # ---------------- losses ----------------

    def _to_frames(self, x):
        """(B, T, C, H, W) or (B, C, H, W) -> (N, H, W, C) NHWC frames."""
        if x.ndim == 5:
            b, t, c, h, w = x.shape
            x = x.reshape(b * t, c, h, w)
        return jnp.transpose(x, (0, 2, 3, 1))

    def generator_loss(self, g_params, d_params, lq, gt):
        out = self.generator_apply(g_params, lq)
        cleaned = None
        if self.cleaning_loss_weight > 0:
            out, cleaned = out
        sr = self._to_frames(out)
        gt_f = self._to_frames(gt)

        logs = {}
        loss = 0.0
        if self.pixel_loss_weight > 0:
            lp = l1_loss(sr, gt_f) * self.pixel_loss_weight
            loss += lp
            logs["loss_pix"] = lp
        if self.cleaning_loss_weight > 0:
            gt_clean = area_downsample(gt_f, 4)
            lc = l1_loss(self._to_frames(cleaned), gt_clean) * \
                self.cleaning_loss_weight
            loss += lc
            logs["loss_clean"] = lc
        if self.perceptual is not None:
            lp, ls = perceptual_loss(
                self.perceptual, self.perceptual_params, sr, gt_f,
                self.perceptual_layer_weights,
                perceptual_weight=self.perceptual_weight,
                style_weight=self.style_weight)
            if lp is not None:
                loss += lp
                logs["loss_perceptual"] = lp
            if ls is not None:
                loss += ls
                logs["loss_style"] = ls

        if self.disc_apply is None:
            return loss, (logs, jax.lax.stop_gradient(sr))
        fake_pred = self.disc_apply(d_params, sr)
        if self.relativistic:
            real_pred = jax.lax.stop_gradient(self.disc_apply(d_params, gt_f))
            lg = (gan_loss(real_pred - fake_pred.mean(), False, self.gan_type,
                           loss_weight=self.gan_loss_weight)
                  + gan_loss(fake_pred - real_pred.mean(), True, self.gan_type,
                             loss_weight=self.gan_loss_weight)) / 2
        else:
            lg = gan_loss(fake_pred, True, self.gan_type,
                          loss_weight=self.gan_loss_weight)
        loss += lg
        logs["loss_gan"] = lg
        return loss, (logs, jax.lax.stop_gradient(sr))

    def disc_loss(self, d_params, sr_detached, gt):
        gt_f = self._to_frames(gt)
        real_pred = self.disc_apply(d_params, gt_f)
        fake_pred = self.disc_apply(d_params, sr_detached)
        if self.relativistic:
            # reference esrgan.py detaches the opposing prediction's mean in
            # each term so only the named branch receives gradient
            ld_real = gan_loss(
                real_pred - jax.lax.stop_gradient(fake_pred).mean(), True,
                self.gan_type, is_disc=True) * 0.5
            ld_fake = gan_loss(
                fake_pred - jax.lax.stop_gradient(real_pred).mean(), False,
                self.gan_type, is_disc=True) * 0.5
        else:
            ld_real = gan_loss(real_pred, True, self.gan_type, is_disc=True)
            ld_fake = gan_loss(fake_pred, False, self.gan_type, is_disc=True)
        return ld_real + ld_fake, {"loss_d_real": ld_real,
                                   "loss_d_fake": ld_fake}

    # ---------------- train step ----------------

    def make_train_step(self, g_tx: optax.GradientTransformation,
                        d_tx: optax.GradientTransformation):
        """Returns jitted ``step(state, lq, gt) -> (state, logs)`` where
        state = (g_params, d_params, g_opt, d_opt, step_counter)."""

        def step_fn(state, lq, gt):
            g_params, d_params, g_opt, d_opt, counter = state

            run_g = jnp.logical_and(counter % self.disc_steps == 0,
                                    counter >= self.disc_init_steps)

            (g_loss, (logs, sr)), g_grads = jax.value_and_grad(
                self.generator_loss, has_aux=True)(g_params, d_params, lq, gt)
            # gate the whole generator update (params AND optimizer state) —
            # the reference skips optimizer.step() entirely on gated steps;
            # stepping Adam with zero grads would still decay its moments
            g_updates, g_opt_new = g_tx.update(g_grads, g_opt, g_params)
            g_params_new = optax.apply_updates(g_params, g_updates)
            pick = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(run_g, a, b), new, old)
            g_params = pick(g_params_new, g_params)
            g_opt = pick(g_opt_new, g_opt)

            if self.disc_apply is not None:
                (d_loss, d_logs), d_grads = jax.value_and_grad(
                    self.disc_loss, has_aux=True)(d_params, sr, gt)
                d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                logs = dict(logs, **d_logs, loss_d=d_loss)

            logs = dict(logs, loss_g=g_loss)
            return (g_params, d_params, g_opt, d_opt, counter + 1), logs

        return jax.jit(step_fn)


def dic_losses(sr_list, heatmap_list, gt, gt_heatmap, pixel_loss=None):
    """DIC multi-step supervision (restorers/dic.py:94-131): every iterative
    step's SR output and landmark heatmap are supervised against the targets.

    sr_list/heatmap_list: per-step NCHW tensors from DICNet; returns
    (total, logs) with per-step components.  ``pixel_loss`` defaults to L1.
    """
    crit = pixel_loss or (lambda a, b: jnp.abs(a - b).mean())
    logs = {}
    loss_pix = 0.0
    loss_align = 0.0
    for step, (sr, hm) in enumerate(zip(sr_list, heatmap_list)):
        lp = crit(sr, gt)
        la = crit(hm, gt_heatmap)
        logs[f"loss_pixel_v{step}"] = lp
        logs[f"loss_align_v{step}"] = la
        loss_pix += lp
        loss_align += la
    return loss_pix + loss_align, logs
