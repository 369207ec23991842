"""High-throughput sliding-window inference.

The reference test loop re-runs the whole network per output frame with a
rebuilt 7-frame window (test_LD_freqCVSR.py:77-83 — "per-frame window
re-inference, 7x redundant compute").  On TPU the windows are independent,
so we batch W of them through one vmapped forward: identical outputs, one
compiled program, full MXU occupancy instead of batch-1 dribbling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipelines import padded_window_indices

__all__ = ["sliding_window_sr"]


def sliding_window_sr(model, params, clip: np.ndarray, window: int = 7,
                      batch_windows: int = 8, padding: str = "replicate",
                      bf16: bool = False) -> np.ndarray:
    """SR every frame of a clip with batched sliding windows.

    clip: (T, H, W, C) float32 in [0,1].  Returns (T, 4H, 4W, C) float32.
    Equivalent to per-frame windowed inference; windows are processed
    ``batch_windows`` at a time through a single jitted forward.
    """
    t, h, w, c = clip.shape
    idx = np.stack([padded_window_indices(i, t, window, padding)
                    for i in range(t)])  # (T, window)
    # (T, window, C, H, W)
    windows = np.transpose(clip[idx], (0, 1, 4, 2, 3)).astype(np.float32)

    if bf16:
        from ..utils.precision import bf16_apply

        fwd = jax.jit(lambda p, v: bf16_apply(model, p, v))
    else:
        fwd = jax.jit(lambda p, v: model.apply(p, v))

    outs = []
    nb = batch_windows
    pad_to = -(-t // nb) * nb
    if pad_to != t:
        windows = np.concatenate(
            [windows, np.repeat(windows[-1:], pad_to - t, axis=0)], 0)
    for s in range(0, pad_to, nb):
        sr = np.asarray(fwd(params, jnp.asarray(windows[s : s + nb])))
        outs.append(sr)
    out = np.concatenate(outs, 0)[:t]  # (T, C, 4H, 4W)
    return np.transpose(out, (0, 2, 3, 1))
