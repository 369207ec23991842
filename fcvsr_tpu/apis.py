"""High-level inference APIs (mmedit apis/ equivalents).

``restoration_video_inference`` mirrors mmedit's demo entry point
(apis/restoration_video_inference.py:28): window_size > 0 runs the sliding-
window path (batched here — see models/inference.py), window_size == 0 feeds
the whole clip to a recurrent model (BasicVSR family).  ``pad_sequence``
reproduces the mirror-reflection clip padding (:16).
"""

from __future__ import annotations

import numpy as np

__all__ = ["pad_sequence", "restoration_video_inference"]


def pad_sequence(frames: np.ndarray, window_size: int) -> np.ndarray:
    """Mirror-pad a (T, ...) clip by window_size//2 on both ends.

    Exact reference semantics (restoration_video_inference.py:16-25): the
    head is ``data[1+p : 1+2p]`` flipped and the tail ``data[-1-2p : -1-p]``
    flipped — i.e. the reflection *skips* the p frames adjacent to each edge
    rather than mirroring them (arguably a reference bug, kept for parity).
    """
    half = window_size // 2
    if half == 0:
        return frames
    head = frames[1 + half : 1 + 2 * half][::-1]
    tail = frames[-1 - 2 * half : -1 - half][::-1]
    return np.concatenate([head, frames, tail], axis=0)


def restoration_video_inference(model, params, frames: np.ndarray,
                                window_size: int = 7,
                                batch_windows: int = 8) -> np.ndarray:
    """SR a clip.  frames: (T, H, W, C) float32 [0,1].

    window_size > 0: per-frame sliding windows through a windowed model
    (FCVSR/EDVR style).  window_size == 0: one recurrent forward over the
    whole clip (BasicVSR style).  Returns (T, 4H, 4W, C).
    """
    import jax
    import jax.numpy as jnp

    if window_size > 0:
        from .models.inference import sliding_window_sr

        return sliding_window_sr(model, params, frames, window=window_size,
                                 batch_windows=batch_windows)
    x = jnp.asarray(np.transpose(frames, (0, 3, 1, 2))[None])
    out = np.asarray(jax.jit(model.apply)(params, x))[0]  # (T, C, 4H, 4W)
    return np.transpose(out, (0, 2, 3, 1))
