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

__all__ = ["sliding_window_sr", "tiled_sr"]


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


def tiled_sr(model, params, window: np.ndarray, tile: int = 272,
             overlap: int = 32, mesh=None) -> np.ndarray:
    """Spatially-tiled SR of one 7-frame window — multi-chip serving mode.

    The reference serves whole frames on one GPU (test_LD_freqCVSR.py:77-90);
    frames past ~1080p then exceed a single chip's HBM (the exact gather
    path holds four full-resolution (2r+2)^2-tap temporaries).  The TPU
    deployment answer is spatial tiling: split the frame into overlapping
    ``tile``x``tile`` patches, run them as ONE batched forward data-parallel
    over the device mesh (tiles ride the already-sharded batch axis, so the
    only ICI traffic is the scatter/gather of tile pixels), crop the 4x
    overlap ring off each SR tile and stitch.

    FCVSR is not shift-invariant (the MFFR band split is a global DFT), so
    tiling is a bounded-deviation serving mode, NOT bit-exact: the gaussian
    band masks decay fast in space, and ``overlap`` >= 32 keeps the stitch
    seam error in the same class as the --fast precision contract
    (tests/test_tiled_sr.py pins the bound).  Exact multi-chip serving of
    one frame is the GSPMD spatial partition of the gather path instead
    (see tests/test_multichip.py::test_spatial_partition_eval).

    window: (T, C, H, W) or (1, T, C, H, W) float32 in [0, 1].
    Returns (1, C, 4H, 4W) float32.
    """
    x = np.asarray(window, np.float32)
    if x.ndim == 4:
        x = x[None]
    b, t, c, h, w = x.shape
    assert b == 1, "tiled_sr serves one window; batch the tiles instead"
    s = 4  # model scale
    step = tile - 2 * overlap
    assert step > 0, "tile must exceed 2*overlap"
    ny = max(1, -(-(h - 2 * overlap) // step))
    nx = max(1, -(-(w - 2 * overlap) // step))
    # pad so the tile grid covers the frame (replicate edges: zero padding
    # would bleed black into the overlap ring)
    hp = step * ny + 2 * overlap
    wp = step * nx + 2 * overlap
    xp = np.pad(x, ((0, 0), (0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                mode="edge")

    tiles = []
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * step, ix * step
            tiles.append(xp[0, :, :, y0 : y0 + tile, x0 : x0 + tile])
    tiles = np.stack(tiles)  # (N, T, C, tile, tile)

    n = len(tiles)
    fwd = jax.jit(model.apply)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = mesh.devices.size
        npad = -(-n // nd) * nd - n
        if npad:
            tiles = np.concatenate([tiles, np.repeat(tiles[-1:], npad, 0)])
        sh = NamedSharding(mesh, P("data"))
        tiles_dev = jax.device_put(jnp.asarray(tiles), sh)
        out = np.asarray(fwd(params, tiles_dev))[:n]
    else:
        out = np.asarray(fwd(params, jnp.asarray(tiles)))

    sr = np.zeros((1, c, s * hp, s * wp), np.float32)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * step, ix * step
            # interior crop: drop the overlap ring except at frame borders
            # (the first/last tile keeps its outer ring — it IS the border)
            cy0 = 0 if iy == 0 else overlap
            cy1 = tile if iy == ny - 1 else tile - overlap
            cx0 = 0 if ix == 0 else overlap
            cx1 = tile if ix == nx - 1 else tile - overlap
            sr[0, :, s * (y0 + cy0) : s * (y0 + cy1),
               s * (x0 + cx0) : s * (x0 + cx1)] = \
                out[k][:, s * cy0 : s * cy1, s * cx0 : s * cx1]
            k += 1
    return sr[:, :, : s * h, : s * w]
