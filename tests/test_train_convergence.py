"""Training actually converges (VERDICT r2 item 4).

One-step equivalence tests catch wiring bugs; they cannot catch a wrong
learning-rate schedule, a loss that ignores the prediction, or an optimizer
update applied with the wrong sign.  This overfits FCVSR-S on one fixed
synthetic clip for a few hundred steps and demands a substantial PSNR gain
over the untrained model — the reference expresses the same property over
600k iters (configs/restorers/fcvsr/fcvsr_redsLD_QP37.py:92-105); here the
clip is tiny so a few hundred Adam steps suffice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.train import cosine_restart, create_train_state, make_train_step


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.slow
def test_overfit_synthetic_clip_gains_3db():
    rng = np.random.default_rng(42)
    b, t, c, h, w = 2, 7, 1, 16, 16
    # smooth structured GT (random low-frequency mixture), LR = box-downsample
    yy, xx = np.mgrid[0 : 4 * h, 0 : 4 * w].astype(np.float64)
    gt = np.zeros((b, c, 4 * h, 4 * w))
    for bi in range(b):
        for _ in range(6):
            fy, fx = rng.uniform(0.02, 0.2, 2)
            ph = rng.uniform(0, 2 * np.pi)
            gt[bi, 0] += rng.uniform(0.2, 1.0) * np.sin(
                fy * yy + fx * xx + ph)
    gt = (gt - gt.min()) / (np.ptp(gt) + 1e-9)
    lr_frame = gt.reshape(b, c, h, 4, w, 4).mean(axis=(3, 5))
    lrs = np.broadcast_to(lr_frame[:, None], (b, t, c, h, w)).copy()

    lrs = jnp.asarray(lrs, jnp.float32)
    gt_j = jnp.asarray(gt, jnp.float32)

    model = FCVSRNet.small(in_channels=1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), lrs,
        cosine_restart(2e-4, [600000], [1.0]))
    psnr0 = _psnr(model.apply(state.params, lrs), gt_j)

    step = make_train_step(model, "charbonnier_mean", donate=False)
    losses = []
    for i in range(300):
        state, metrics = step(state, lrs, gt_j)
        if i % 50 == 0:
            losses.append(float(metrics["loss"]))

    psnr1 = _psnr(model.apply(state.params, lrs), gt_j)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses, psnr0, psnr1)
    assert psnr1 - psnr0 >= 3.0, f"PSNR {psnr0:.2f} -> {psnr1:.2f}"
