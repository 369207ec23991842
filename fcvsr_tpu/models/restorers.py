"""Restorer wrappers — the mmedit L3 layer rebuilt functionally.

Covers the semantics of ``BasicRestorer`` / ``BasicVSR`` restorer
(mmedit/models/restorers/basic_restorer.py, basicvsr.py:15-241) and the
centre-frame ``FCVSRRestorer`` (restorers/fcvsr_restorer.py:18-272, which
supervises only ``gt[:, t//2]``):

* ``loss_fn``          — forward_train + parse_losses
* ``make_train_step``  — jitted step with the fix_iter SPyNet/EDVR freeze
                         (frozen params get zero gradient until fix_iter)
* ``forward_test``     — inference + PSNR/SSIM/tOF evaluation with previous-
                         frame state threading (for tOF), mirroring
                         basicvsr.py:157-238

State is explicit (JAX-style): the tOF previous-frame pair is carried by the
caller, not hidden on the module.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import calculate_psnr, calculate_ssim, calculate_tof
from ..train.losses import charbonnier, charbonnier_sum

__all__ = ["VideoRestorer", "tensor2img"]


def tensor2img(t: jnp.ndarray) -> np.ndarray:
    """(1, C, H, W) [0,1] -> HWC float [0,255] (mmedit tensor2img semantics,
    minus the uint8 rounding which the metric drivers re-apply)."""
    arr = np.asarray(t)[0]
    arr = np.clip(arr, 0, 1) * 255.0
    arr = np.transpose(arr, (1, 2, 0))
    return np.round(arr)


@dataclass
class VideoRestorer:
    """Functional restorer: model + loss + test-time metric config."""

    model: Any
    pixel_loss: str = "charbonnier_mean"  # or "charbonnier_sum"
    center_frame_only: bool = False       # FCVSRRestorer semantics
    fix_iter: int = 0                     # freeze spynet/edvr params early
    metrics: Sequence[str] = ("PSNR", "SSIM")
    crop_border: int = 0
    convert_to: Optional[str] = "Y"

    _ALLOWED = {"PSNR", "SSIM", "tOF"}

    def loss_fn(self, params, lq, gt, step=0):
        loss = charbonnier if self.pixel_loss == "charbonnier_mean" else charbonnier_sum
        sr = self.model.apply(params, lq)
        if self.center_frame_only and gt.ndim == 5:
            gt = gt[:, gt.shape[1] // 2]
        return loss(sr, gt), sr

    def make_train_step(self, tx):
        """Jitted (params, opt_state, step, lq, gt) -> updated triple + loss.
        Implements fix_iter by zeroing gradients of spynet/edvr params."""

        def is_frozen_path(path):
            names = "/".join(str(k.key) if hasattr(k, "key") else str(k)
                             for k in path).lower()
            return "spynet" in names or "edvr" in names

        def step_fn(params, opt_state, step, lq, gt):
            (loss, _), grads = jax.value_and_grad(
                lambda p: self.loss_fn(p, lq, gt, step), has_aux=True)(params)
            if self.fix_iter > 0:
                frozen = step < self.fix_iter

                def mask_grad(path, g):
                    if is_frozen_path(path):
                        return jnp.where(frozen, jnp.zeros_like(g), g)
                    return g

                grads = jax.tree_util.tree_map_with_path(mask_grad, grads)
            import optax

            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, step + 1, {"loss": loss}

        return jax.jit(step_fn, donate_argnums=(0, 1))

    def forward_test(
        self,
        params,
        lq: jnp.ndarray,
        gt: Optional[jnp.ndarray] = None,
        prev_state: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ):
        """Inference + metric evaluation.

        lq: (1, T, C, H, W); gt: (1, T, C, 4H, 4W) sequence or (1, C, 4H, 4W)
        centre frame.  ``prev_state`` carries (sr_pre, gt_pre) 255-scale
        arrays for tOF.  Returns (results dict, new_state).
        """
        sr = self.model.apply(params, lq)
        results: Dict[str, Any] = {}
        new_state = prev_state
        if gt is not None:
            channel_order = "rgb"
            if sr.ndim == 5 and gt.ndim == 5:  # sequence metrics, averaged
                vals: Dict[str, list] = {m: [] for m in self.metrics}
                for i in range(sr.shape[1]):
                    o = tensor2img(sr[:, i])
                    g = tensor2img(gt[:, i])
                    for m in self.metrics:
                        vals[m].append(self._metric(m, o, g, None, None,
                                                    channel_order))
                results["eval_result"] = {m: float(np.mean(v))
                                          for m, v in vals.items()}
            else:  # centre-frame image metrics with tOF state threading
                if sr.ndim == 5:
                    sr_img = tensor2img(sr[:, sr.shape[1] // 2])
                else:
                    sr_img = tensor2img(sr)
                gt_img = tensor2img(gt if gt.ndim == 4 else gt[:, gt.shape[1] // 2])
                sr_pre, gt_pre = prev_state if prev_state else (sr_img, gt_img)
                results["eval_result"] = {
                    m: self._metric(m, sr_img, gt_img, sr_pre, gt_pre,
                                    channel_order)
                    for m in self.metrics
                }
                new_state = (sr_img, gt_img)
        else:
            results["output"] = np.asarray(sr)
        return results, new_state

    def _metric(self, name, sr, gt, sr_pre, gt_pre, channel_order):
        if name == "PSNR":
            return calculate_psnr(sr, gt, self.crop_border, self.convert_to,
                                  channel_order)
        if name == "SSIM":
            return calculate_ssim(sr, gt, self.crop_border, self.convert_to,
                                  channel_order)
        if name == "tOF":
            if sr_pre is None:
                return 0.0
            return calculate_tof(sr, gt, sr_pre, gt_pre, self.convert_to,
                                 channel_order)
        raise KeyError(f"metric {name} not in {self._ALLOWED}")
