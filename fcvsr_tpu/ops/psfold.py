"""Polyphase (sub-pixel) folding of conv-after-pixel-shuffle.

FCVSR's upsampling tail (reference CVSR_freq.py:2559-2568/2640-2648:
``upconv1 -> PS -> lrelu -> upconv2 -> PS -> lrelu -> conv_last0``)
interleaves 3x3 convs with depth-to-space.  On TPU the shuffles and the
lane-hostile C_out=1 conv at (4H, 4W) dominate: the composed tail runs
21.2 ms @480x272 while its conv arithmetic sums to ~3 ms — the rest is
XLA relayout passes over the (2H,2W,256)/(4H,4W,64) intermediates.

``conv(PS_r(x)) == PS_r(conv'(x))`` for a kernel rearrangement ``conv'``
(the classic sub-pixel convolution identity): each output phase (p, q)
of the upsampled grid reads input taps whose positions fold back to
low-resolution offsets ``floor((p+a)/r)`` and channel phases
``(p+a) mod r``.  Folding every conv below the *first* shuffle therefore
runs the whole tail at (H, W) with wide channels — MXU-friendly matmuls,
zero big-tensor relayouts — and one final depth-to-space of a 16-channel
(H, W) tensor.  The folded kernels are pure rearrangements of the
original parameters (checkpoint-compatible, built per forward from the
live params; differentiable, so training through the folded tail is the
exact same function).

Channel convention matches ``models.blocks.pixel_shuffle`` (torch
PixelShuffle): channel index ``c*r*r + i*r + j`` shuffles to spatial
offset ``(i, j)``.  The leaky-relu/PReLU between stages is elementwise
with a single shared slope, so it commutes with the shuffle.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fold_ps_conv", "fold_ps_bias"]


def fold_ps_conv(kernel: jnp.ndarray, r: int) -> jnp.ndarray:
    """Fold a SAME, stride-1 conv over a preceding r-x pixel shuffle.

    kernel: HWIO ``(k, k, Cin, Cout)`` for the conv applied on the
    shuffled (rH, rW, Cin) grid.  Returns ``(S, S, Cin*r*r, Cout*r*r)``
    HWIO such that

        conv(pixel_shuffle(x, r), kernel) ==
            pixel_shuffle(conv(x, folded), r)

    with both convs SAME/stride-1 and zero padding.  Input channels are
    read as ``c*r*r + i*r + j`` (the pre-shuffle layout) and output
    channels are emitted in the same convention, so folds nest: folding
    an already-folded kernel over an outer shuffle composes two shuffles.

    The folded support is ``S = ceil((k - 1 + r) / r)`` rounded to cover
    every phase (odd k: S = 2*ceil((k-1)/(2r)) + 1 at most 1 + the
    halo); entries a phase does not use stay zero — the MXU runs the
    dense matmul regardless, and at tail widths the zero FLOPs are
    cheaper than per-phase conv dispatches.
    """
    k, k2, cin, cout = kernel.shape
    assert k == k2, "square kernels only"
    m = (k - 1) // 2
    assert k == 2 * m + 1, "odd kernel sizes only"
    # support of low-res offsets over all (phase, tap) pairs
    s_min = (0 - m) // r          # python floor division (negative-safe)
    s_max = (r - 1 + m) // r
    S = s_max - s_min + 1
    o = -s_min
    folded = jnp.zeros((S, S, cin * r * r, cout * r * r), kernel.dtype)
    for a in range(k):
        for b in range(k):
            for p in range(r):
                for q in range(r):
                    pa = p + (a - m)
                    qb = q + (b - m)
                    s, i = pa // r, pa % r
                    t, j = qb // r, qb % r
                    folded = folded.at[
                        s + o, t + o,
                        i * r + j :: r * r,
                        p * r + q :: r * r,
                    ].set(kernel[a, b])
    return folded


def fold_ps_bias(bias: jnp.ndarray, r: int) -> jnp.ndarray:
    """Bias of the folded conv: per-output-channel, constant over phases
    (channel layout ``d*r*r + p*r + q``)."""
    return jnp.repeat(bias, r * r)
