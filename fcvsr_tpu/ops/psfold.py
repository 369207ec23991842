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

import jax
import jax.numpy as jnp

__all__ = ["fold_ps_conv", "fold_ps_bias", "conv_folded_phase2",
           "conv_folded_tapmajor", "conv_folded_phase2_blocked",
           "block_to_interleaved_perm"]


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


def _phase2_maps(x, folded, bias):
    """The four per-phase 2x2 convs of an r=2-folded 3x3 kernel, in phase
    order i*2+j — shared by the interleaving and block-layout combiners."""
    assert folded.shape[0] == 3 and folded.shape[1] == 3, folded.shape
    ys = []
    for i in range(2):
        for j in range(2):
            sub = folded[i : i + 2, j : j + 2, :, i * 2 + j :: 4]
            y = jax.lax.conv_general_dilated(
                x, sub.astype(x.dtype), (1, 1), ((1 - i, i), (1 - j, j)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            ys.append(y + bias[i * 2 + j :: 4].astype(x.dtype))
    return ys


def conv_folded_phase2(x, folded, bias):
    """Apply an r=2-folded 3x3 conv as four per-phase 2x2 convs (exact).

    A ``fold_ps_conv(k3, 2)`` kernel is (3, 3, Cin, 4*Cout') but each
    output phase p only reads folded support rows {p, p+1} (cols likewise)
    — the dense kernel is 25% nonzero, so the dense conv runs 9/4 the
    needed FLOPs.  This splits by phase: four 2x2 convs with asymmetric
    SAME padding, channels interleaved back to the fold layout
    (out ch = c*4 + i*2 + j).  Same taps as the dense conv — exact up to
    the backend's channel-reduction order.  Measured @272x480
    (256 -> 1024): 3.79 -> 2.39 ms standalone
    (benchmarks/microbench_tail.py ``folded_up2_phase``).

    NOT wired into FCVSRNet: in-chain the phase2+tapmajor pair LOSES
    3.9 ms/frame on the deployment path (87.11 -> 90.99 ms measured
    full-model — the standalone wins are XLA-fusion-context dependent);
    per-candidate in-chain A/B pending.

    x: (B, H, W, Cin); folded: (3, 3, Cin, Cout) with Cout % 4 == 0;
    bias: (Cout,).
    """
    b, h, w, _ = x.shape
    ys = _phase2_maps(x, folded, bias)
    return jnp.stack(ys, axis=-1).reshape(b, h, w, -1)


def block_to_interleaved_perm(cout: int, phases: int = 4):
    """Permutation p with  blocked[..., k] == interleaved[..., p[k]].

    Fold layout interleaves: channel ``d*phases + ph``.  Block layout
    groups per phase: position ``ph*cb + d`` (cb = cout // phases).  The
    returned index array converts WEIGHT-side tensors between the two —
    e.g. ``W_interleaved_cin[:, :, perm, :]`` consumes block-layout input.
    """
    cb = cout // phases
    import numpy as np

    idx = np.empty(cout, np.int32)
    for ph in range(phases):
        for d in range(cb):
            idx[ph * cb + d] = d * phases + ph
    return idx


def conv_folded_phase2_blocked(x, folded, bias):
    """``conv_folded_phase2`` emitting PHASE-BLOCKED output channels.

    The round-3 in-chain loss of the phase split (87.11 -> 93.16 ms
    full-model) was the trailing ``stack+reshape`` that re-interleaves the
    four phase maps back into fold layout — a full (H, W, Cout) relayout
    pass XLA cannot fuse away.  This variant concatenates the phase maps
    instead (channels ``[phase0 | phase1 | phase2 | phase3]``, each block
    ``Cout/4`` wide) and lets the *consumer* absorb the permutation on its
    weight side (``block_to_interleaved_perm`` — free, weights are tiny),
    so the 2.25x folded-FLOP reduction arrives without the relayout.
    Same taps as the dense folded conv — exact up to reduction order.

    x: (B, H, W, Cin); folded: (3, 3, Cin, Cout) from ``fold_ps_conv(k3,
    2)`` with Cout % 4 == 0; bias: (Cout,).  Returns (B, H, W, Cout) in
    block layout.
    """
    return jnp.concatenate(_phase2_maps(x, folded, bias), axis=-1)


def conv_folded_tapmajor(x, folded, bias):
    """Apply a folded SxS conv as one taps matmul + S*S shifted adds.

    For the doubly-folded ``conv_last0`` (Cin=16nf -> Cout=16c) the conv's
    MXU N dimension is Cout=16 — 12.5% of the 128-wide systolic array.
    Tap-major moves the taps INTO the matmul N dim: one
    (HW, Cin) x (Cin, S*S*Cout) contraction (N = 144 at S=3/c=1), then
    the conv's spatial reduction becomes S*S shifted adds of thin
    Cout-channel maps.  Exact up to fp reassociation.  Measured @272x480
    (1024 -> 16): 4.54 -> 0.70 ms standalone (6.5x,
    benchmarks/microbench_tail.py ``folded_last_tapmajor``).
    In-chain status: see ``conv_folded_phase2`` — the pair loses on the
    deployment path; per-candidate A/B pending.

    x: (B, H, W, Cin); folded: (S, S, Cin, Cout) odd S; bias: (Cout,).
    """
    S = folded.shape[0]
    m = (S - 1) // 2
    cin, cout = folded.shape[2], folded.shape[3]
    b, h, w, _ = x.shape
    wtap = jnp.transpose(folded.reshape(S * S, cin, cout), (1, 0, 2)) \
        .reshape(cin, S * S * cout)
    p = jnp.einsum("bhwc,ck->bhwk", x, wtap.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    p = p.reshape(b, h, w, S * S, cout)
    pad = jnp.pad(p, ((0, 0), (m, m), (m, m), (0, 0), (0, 0)))
    out = bias.astype(jnp.float32)[None, None, None]
    for dy in range(S):
        for dx in range(S):
            out = out + pad[:, dy : dy + h, dx : dx + w, dy * S + dx]
    return out.astype(x.dtype)
