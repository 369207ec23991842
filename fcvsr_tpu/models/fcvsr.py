"""FCVSR — frequency-aware compressed video super-resolution (TPU-native).

Re-implements the reference model family as flax.linen modules over NHWC
feature maps:

* ``MGAA``    — motion-guided adaptive alignment in the frequency domain
                (reference ``MGAAbk``, CVSR_freq.py:1365-1547).
* ``MFFR``    — multi-frequency refinement (``MultiFreq_Refinment``,
                CVSR_freq.py:2183-2254 with ``Split_freq``/``DivEnh``).
* ``FCVSRNet``— the full 7-frame -> 1-frame x4 SR network (``GShiftNet`` /
                mmedit ``FCVSRNet``, CVSR_freq.py:2653-2756, fcvsr.py:39-158).
                ``num_params``: full ~= 2.9M / S ~= smaller per reference
                hyper-params (ACNum/Freq_Inv/SCGroupN).
* ``fcvsr_etc_forward`` — sliding 13-frame -> 7-frame mode (``GShiftNet_ETC``,
                CVSR_freq.py:2760-2843) expressed with ``jax.vmap`` over the 7
                windows instead of a Python loop — one compiled program, the
                whole batch of windows rides the MXU together.

Bug-compatible behaviours preserved from the reference (shipped checkpoints
depend on them): SAC applies kernel1 in both passes; the correlation feature
``corrf`` (forward direction) conditions *both* forward and backward offsets
(CVSR_freq.py:1487-1488 — ``corrb`` is computed but unused, so we skip it);
the CorrBlock memory-reinterpret reshape; identity "flow" features are
all-zero.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.corr import corr_lookup
from ..ops.freq import irfft_features, rfft_features, split_freq
from ..ops.resize import resize_bilinear
from ..ops.sac import iac
from .blocks import CALayer, Conv2d, ConvBlk, DivEnh, PReLU, SCNet, pixel_shuffle


@functools.lru_cache(maxsize=None)
def _halves_perm(n_gated: int) -> np.ndarray:
    """(4n, 4n) one-hot matrix moving each gated block's [re2, im2] to the
    irfft halves layout [all re pairs..., all im pairs...].  Numpy, NOT
    jnp (cached jnp constants leak tracers — CLAUDE.md)."""
    p = np.zeros((4 * n_gated, 4 * n_gated), np.float32)
    for j in range(n_gated):
        for t in range(2):
            p[4 * j + t, 2 * j + t] = 1.0
            p[4 * j + 2 + t, 2 * n_gated + 2 * j + t] = 1.0
    return p


class MGAA(nn.Module):
    """Motion-guided adaptive alignment (reference ``MGAAbk``).

    Input: (B, H, W, 3*dim) — three temporally adjacent feature groups.
    Output: (B, H, W, dim) — the centre group aligned/fused with neighbours.
    """

    dim: int
    ac_ks: int = 3
    ac_num: int = 6
    corr_radius: int = 4
    kernel1_both: bool = True  # reference SAC bug (CVSR_freq.py:1272-1273)
    warp_impl: str = "gather"  # 'pallas' = fused IAC kernel (ops/pallas_iac.py)
    # 'bf16': bf16-storage IAC chain (pallas only) — F1 emits bf16 rows
    # kernels and the fused chain keeps src/kernels/residual/output at
    # half HBM traffic (ops/pallas_iac.py); arithmetic stays f32.
    iac_dtype: str = "f32"
    # 'bf16': bf16 spectral head (pallas path only) — the rfft runs as
    # single-pass bf16 DFT matmuls with f32 accumulation, and the offset/
    # correlation convs + ConvBlks compute and store bf16.  The irfft that
    # produces the warp offsets stays f32 HIGHEST.  Bounded-deviation
    # deployment option like iac_dtype/tail_dtype.
    head_dtype: str = "f32"
    # Batch the per-direction ConvBlk calls (f/b) along the batch axis.
    # CPU-exact, but that axis is the data-sharded one (concat/split forces
    # resharding collectives on a mesh) and the round-2 full-shape run
    # returned non-finite outputs on the old TPU runtime — so this is
    # opt-in for single-device inference, gated by an isfinite probe
    # (bench.py) with automatic fallback.
    batch_fb: bool = False
    # Fused kernel prediction (round 5): never materialize F1's predicted
    # kernels (the chain's dominant HBM stream, ~300 MB/chain bf16 at
    # 480x272 — written by F1 and re-read every iteration); instead F1's
    # selected weight columns ride into the fused IAC kernel and the
    # per-pixel kernels are one thin in-kernel matmul from f0
    # (ops/pallas_iac.py::iac_fused_kf).  Same function up to matmul
    # accumulation order.  Inference-only (deployment flag): under
    # autodiff keep it False — the custom-VJP training routings consume
    # the materialized tensor.
    k_fused: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dim
        b, h, w, _ = x.shape
        x1, x2, x3 = x[..., :d], x[..., d : 2 * d], x[..., 2 * d :]

        split = self.warp_impl == "pallas"
        hd = jnp.bfloat16 if (split and self.head_dtype == "bf16") else None

        # One batched FFT over all 3 groups (rfft2 is per-channel, so slicing
        # the packed output is identical to three per-group FFTs — and one
        # big FFT schedules better on TPU).  groups=3 emits the channels
        # group-interleaved ([imag_g, real_g] per temporal group) so each
        # group below is ONE contiguous zero-copy slice — the classic
        # layout's per-group imag+real re-concat was 3 materialized
        # (B, H, Wf, 2d) copies (~100 MB of relayout traffic per MGAA call).
        xf = rfft_features(x, compute_dtype=hd, groups=3)
        # (B, H, Wf, 6d): [imag_g0(d), real_g0(d), imag_g1(d), ...]

        def group(i):
            return xf[..., 2 * d * i : 2 * d * (i + 1)]

        x1_f, x2_f, x3_f = group(0), group(1), group(2)

        # deployment path (warp_impl='pallas'): concat-feeding convs run as
        # split partial convs (Conv2d tuple inputs — exact by linearity but
        # summed-partial accumulation order, so the bit-exact gather path
        # keeps real concats); the always-zero identity-flow channels are
        # dropped via zero_tail
        fuse0 = Conv2d(2 * d, 1, use_bias=False, dtype=hd, name="convfuse0")
        fuse1 = Conv2d(2 * d, 1, use_bias=False, dtype=hd, name="convfuse1")
        fuse2 = Conv2d(2 * d, 1, use_bias=False, dtype=hd, name="convfuse2")

        def convfuse(*ys):
            y = ys if split else jnp.concatenate(ys, -1)
            return fuse2(nn.relu(fuse1(nn.relu(fuse0(y)))))

        off_f = (x1_f - x2_f) + convfuse(x1_f, x2_f)
        off_b = (x3_f - x2_f) + convfuse(x3_f, x2_f)

        crt0 = Conv2d(d, 1, use_bias=False, dtype=hd, name="convcrt0")
        crt1 = Conv2d(4, 1, use_bias=False, dtype=hd, name="convcrt1")
        x2_f_sim = crt1(nn.relu(crt0(x2_f)))

        # Correlation conditioning: forward corr is used for BOTH directions
        # (reference bug); identity flow features are exactly zero.
        corrf = corr_lookup(x1_f, x2_f, self.corr_radius)
        corr0 = Conv2d(d, 1, use_bias=False, zero_tail=2, dtype=hd,
                       name="convcorr0")
        corr1 = Conv2d(d, 1, use_bias=False, dtype=hd, name="convcorr1")
        corr2 = Conv2d(4, 1, use_bias=False, dtype=hd, name="convcorr2")

        def convcorr(off, cf):
            if split:
                y = (off, cf)  # zero_tail=2 stands in for zero_flow
            else:
                zero_flow = jnp.zeros(off.shape[:3] + (2,), off.dtype)
                y = jnp.concatenate([off, cf, zero_flow], -1)
            return corr2(nn.relu(corr1(nn.relu(corr0(y)))))

        off_f = convcorr(off_f, corrf)
        off_b = convcorr(off_b, corrf)

        # Per-iteration offset fields: ConvBlk branch -> gate -> irfft2.
        # All 2*ac_num gated spectra go through ONE batched irfft: each is
        # only 4 channels, and a 4-lane DFT matmul uses ~3% of the MXU —
        # packing them restores utilisation (identical per-channel math).
        # (per-direction ConvBlk calls: ``batch_fb`` runs f/b as one batch —
        # identical per-channel math, half the small-op dispatches — see the
        # batch_fb note above for why it is opt-in)
        gated = []
        if self.batch_fb:
            off_fb = jnp.concatenate([off_f, off_b], axis=0)
            sim_fb = jnp.concatenate([x2_f_sim, x2_f_sim], axis=0)
            for i in range(self.ac_num):
                g = ConvBlk(4, index=i, dtype=hd, name=f"mconv{i}")(off_fb) \
                    * sim_fb
                gated.append(g[:b])
                gated.append(g[b:])
        else:
            for i in range(self.ac_num):
                blk = ConvBlk(4, index=i, dtype=hd, name=f"mconv{i}")
                gated.append(blk(off_f) * x2_f_sim)
                gated.append(blk(off_b) * x2_f_sim)
        # halves reorder for irfft ([re2|im2]*2ac -> [re...][im...]) rides
        # a one-hot matmul on the natural concat: bit-exact (one-hot picks
        # are exact in any dtype) and ~free on the MXU, vs 0.23 ms for the
        # 4ac-slice relayout (pack_irfft vs pack_irfft_perm,
        # benchmarks/microbench_mgaa.py, round 4)
        nat = jnp.concatenate(gated, -1)
        packed = jnp.einsum("bhkc,cd->bhkd", nat,
                            jnp.asarray(_halves_perm(len(gated))))
        # warp offsets stay f32 (HIGHEST-precision irfft; tiny — 0.23 ms)
        fields = irfft_features(packed.astype(jnp.float32), h, w)
        # (B, H, W, 2*ac_num*2)
        offsets_f = jnp.stack(
            [fields[..., 4 * i : 4 * i + 2] for i in range(self.ac_num)])
        offsets_b = jnp.stack(
            [fields[..., 4 * i + 2 : 4 * i + 4] for i in range(self.ac_num)])

        # Kernel predictor (shared for both directions).  Under the reference
        # kernel1-both bug the kernel2 halves of the prediction are dead, so
        # F1 computes only the kernel1 output channels (full-size params via
        # out_select — exact numerics, half the MXU passes and HBM writes).
        f_kp = Conv2d(d, 3, name="conv_KP")(x2)
        f0 = Conv2d(d, 3, name="F0")(f_kp)
        half = d * self.ac_ks
        k_parts = None
        if self.kernel1_both:
            # kernel1 halves only (the kernel2 outputs are dead under the
            # reference bug), emitted TAP-MAJOR per iteration chunk so SAC's
            # per-tap slices are contiguous lanes (free output permutation).
            # On the fused path F1 additionally emits (B, H, C', W) rows
            # layout directly — the kernels tensor is the biggest in the
            # model (AC*3*dim channels) and the fused kernel consumes rows,
            # so the NHWC->rows transpose it replaces is a ~600MB HBM pass.
            sel = tuple(i * 2 * half + c * self.ac_ks + t
                        for i in range(self.ac_num)
                        for t in range(self.ac_ks)
                        for c in range(d))
            k_rows = split
            # bf16 IAC storage: F1 emits bf16 rows kernels directly (the
            # ~600MB/chain tensor is written AND re-read at half width)
            bf16 = split and self.iac_dtype == "bf16"
            if self.k_fused and split and self.warp_impl == "pallas" \
                    and not self.is_initializing():
                # fused kernel prediction (round 5): never materialize
                # F1's output — its selected weight columns ride into the
                # IAC kernel and the per-pixel kernels are computed there
                # from f0 (ops/pallas_iac.py::iac_fused_kf).  F1's params
                # exist from init (the else-branch call) and stay
                # checkpoint-compatible.
                p = self.variables["params"]["F1"]["Conv_0"]
                sel_ix = jnp.asarray(sel)
                k_parts = (f0, jnp.take(p["kernel"][0, 0], sel_ix, axis=1),
                           jnp.take(p["bias"], sel_ix))
                pred_k = None
                k_rows = False
            else:
                pred_k = Conv2d(self.ac_num * half * 2, 1, name="F1",
                                out_select=sel,
                                dtype=jnp.bfloat16 if bf16 else None,
                                out_layout="rows" if k_rows else "nhwc")(f0)
        else:
            k_rows = False
            bf16 = False
            pred_k = Conv2d(self.ac_num * half * 2, 1, name="F1")(f0)

        sd = jnp.bfloat16 if bf16 else None
        x1s = x1.astype(sd) if sd else x1
        x3s = x3.astype(sd) if sd else x3
        aligned_f = iac(x1s, pred_k, offsets_f, self.ac_num, d, self.ac_ks,
                        kernel1_both=self.kernel1_both,
                        k1_only=self.kernel1_both, warp_impl=self.warp_impl,
                        k_tap_major=self.kernel1_both, k_rows=k_rows,
                        k_parts=k_parts)
        aligned_b = iac(x3s, pred_k, offsets_b, self.ac_num, d, self.ac_ks,
                        kernel1_both=self.kernel1_both,
                        k1_only=self.kernel1_both, warp_impl=self.warp_impl,
                        k_tap_major=self.kernel1_both, k_rows=k_rows,
                        k_parts=k_parts)

        # conv3 follows the head dtype: with a bf16 IAC chain the aligned
        # outputs arrive bf16, and an f32 conv3 forces two (H, W, 64)
        # bf16->f32 relayout-cast fusions first (measured 1.23 ms/call on
        # the round-5 device profile); matmuls are single-pass bf16 either
        # way, so dtype=hd only removes the casts (bounded-dev contract).
        out = Conv2d(d, 3, use_bias=False, dtype=hd, name="conv3")(
            (aligned_f, aligned_b) if split
            else jnp.concatenate([aligned_f, aligned_b], -1)
        )
        return out.astype(x2.dtype) + x2


class MFFR(nn.Module):
    """Multi-frequency feature refinement (``MultiFreq_Refinment``)."""

    dim: int
    freq_inv: int = 8
    mode: str = "gaussian"
    # 'bf16': bf16 band split (single-pass bf16 DFT matmuls, bf16 masked
    # spectra) + bf16 DivEnh chain — the whole module is elementwise/
    # bandwidth-bound between the two DFT contractions, so halved bytes
    # win; params stay f32; the f32 residual add keeps the module output
    # centered on x (bounded-deviation deployment option).
    dtype: str = "f32"

    @nn.compact
    def __call__(self, x):
        cd = jnp.bfloat16 if self.dtype == "bf16" else None
        bands = split_freq(x, self.freq_inv, self.mode, compute_dtype=cd)
        # "l2h" ordering reverses the band list (CVSR_freq.py:2204-2205).
        freq = bands[::-1]
        enhanced_sum = None
        raw_sum = None
        out_sum = None
        for i in range(self.freq_inv):
            de = DivEnh(self.dim, dtype=cd, name=f"divenh{i}")
            if i == 0:
                fo = de(freq[i])
            else:
                fo = de(freq[i], raw_sum, enhanced_sum)
            raw_sum = freq[i] if raw_sum is None else raw_sum + freq[i]
            enhanced_sum = fo if enhanced_sum is None else enhanced_sum + fo
            out_sum = fo if out_sum is None else out_sum + fo
        out = CALayer(self.dim, dtype=cd, name="ca")(out_sum)
        return out.astype(x.dtype) + x


class FCVSRNet(nn.Module):
    """FCVSR backbone: 7 LR frames -> centre frame x4 (GShiftNet/FCVSRNet).

    ``in_channels``: 1 for Y-channel (CVCP) or 3 for RGB (REDS/Vimeo).
    FCVSR-S is the same topology with ``ac_num=3, freq_inv=4, sc_groups=4``
    and 1x1 upsampling convs (CVSR_freq.py:2577-2646); use
    ``FCVSRNet.small()``.
    """

    n_feats: int = 64
    in_channels: int = 1
    ac_ks: int = 3
    ac_num: int = 6
    freq_inv: int = 8
    sc_groups: int = 10
    up_ksize: int = 3  # FCVSR-S uses 1x1 convs in the upsampling tail
    num_frames: int = 7
    use_remat: bool = False  # rematerialize MGAA/SCNet (trade FLOPs for HBM)
    warp_impl: str = "gather"  # 'pallas' = fused IAC kernel (ops/pallas_iac.py)
    scnet_impl: str = "xla"  # 'rows' = Pallas rows-layout SCNet (scnet_rows.py)
    # 'bf16': bf16-storage fused IAC chain inside MGAA (pallas path only;
    # see MGAA.iac_dtype) — halves the chain's HBM traffic.
    iac_dtype: str = "f32"
    # 'bf16': bf16 MGAA spectral head (see MGAA.head_dtype).
    head_dtype: str = "f32"
    # 'bf16': bf16 MFFR band split + DivEnh chain (see MFFR.dtype).
    mffr_dtype: str = "f32"
    # 'bf16': bf16-storage upsampling tail (SCNet outputs -> conv_last0).
    # The tail is relayout/bandwidth-bound at 4x spatial size — measured
    # 21.2 -> 17.4 ms @480x272 (benchmarks/microbench_tail.py tail_bf16).
    # Matmul precision is single-pass bf16 either way on this chip; the
    # numerics change is bf16 *storage* rounding between tail convs
    # (bounded-deviation --fast contract, like scnet_impl='rows_bf16').
    # Params stay f32 (flax dtype= casts at compute).
    tail_dtype: str = "f32"
    # 'folded': polyphase-fold the upconv1/upconv2/conv_last0 cascade so
    # the whole upsampling tail runs at (H, W) with wide channels and no
    # (2H,2W)/(4H,4W) intermediates (ops/psfold.py) — mathematically the
    # same function (kernel rearrangement of the live params; exact up to
    # fp reassociation), so it composes with either tail_dtype.
    tail_impl: str = "xla"
    # Batch the two independent shared-weight MGAA calls (and MGAA's f/b
    # ConvBlks) along the batch axis.  CPU-exact; opt-in because the batch
    # axis is the data-sharded one under DP training and the old TPU
    # runtime returned non-finite outputs at full shape (round 2) —
    # bench.py probes isfinite on-device and falls back automatically.
    batch_mgaa: bool = False
    # fused kernel prediction in the IAC chain (see MGAA.k_fused) —
    # deployment/inference flag, not for training
    k_fused: bool = False

    @classmethod
    def small(cls, in_channels: int = 1, **kw):
        return cls(in_channels=in_channels, ac_num=3, freq_inv=4, sc_groups=4,
                   up_ksize=1, **kw)

    @nn.compact
    def __call__(self, x):
        """x: (B, T=7, C, H, W) in [0, 1] -> (B, C, 4H, 4W)."""
        b, t, c, h, w = x.shape
        nf = self.n_feats
        center = jnp.transpose(x[:, t // 2], (0, 2, 3, 1))  # (B, H, W, C)
        feats = jnp.transpose(x, (0, 3, 4, 1, 2)).reshape(b, h, w, t * c)

        lrelu = PReLU(name="lrelu")  # single shared slope, as in reference
        mgaa_cls = nn.remat(MGAA) if self.use_remat else MGAA
        mgaa = mgaa_cls(dim=nf, ac_ks=self.ac_ks, ac_num=self.ac_num,
                        warp_impl=self.warp_impl, batch_fb=self.batch_mgaa,
                        iac_dtype=self.iac_dtype, k_fused=self.k_fused,
                        head_dtype=self.head_dtype, name="MGAA")

        feat = Conv2d(t * nf, 3, name="feat_extract")(feats)
        f1 = feat[..., : 3 * nf]
        f2 = feat[..., 3 * nf : 4 * nf]
        f3 = feat[..., 4 * nf :]

        # MGAA(f1)/MGAA(f3) share weights and are independent.  Batching
        # them along the batch axis is exact but that axis is the
        # data-parallel sharded one (resharding collectives on a mesh,
        # perturbed grad reduction order) — so it is opt-in via
        # ``batch_mgaa`` for single-device inference (see flag note).
        if self.batch_mgaa:
            g13 = mgaa(jnp.concatenate([f1, f3], axis=0))
            g1, g3 = g13[:b], g13[b:]
        else:
            g1 = mgaa(f1)
            g3 = mgaa(f3)
        g2 = mgaa(jnp.concatenate([g1, f2, g3], -1))

        dec = MFFR(dim=nf, freq_inv=self.freq_inv, dtype=self.mffr_dtype,
                   name="MFFRblock")(g2)
        dec1 = Conv2d(nf, 3, stride=2, name="rconcat1")(dec)
        dec2 = Conv2d(nf, 3, stride=2, name="rconcat2")(dec1)
        scnet_cls = nn.remat(SCNet) if self.use_remat else SCNet
        l1, l2, l3 = scnet_cls(nf, self.sc_groups, impl=self.scnet_impl,
                               name="recorb1")([dec, dec1, dec2])

        ks = self.up_ksize
        td = jnp.bfloat16 if self.tail_dtype == "bf16" else None
        if td is not None:
            l1, l2, l3 = l1.astype(td), l2.astype(td), l3.astype(td)
        out_l3 = lrelu(Conv2d(nf, ks, dtype=td, name="upconv1_L3")(l3))
        out_l3_1 = pixel_shuffle(out_l3)       # (nf/4, H/2)
        out_l3_2 = pixel_shuffle(out_l3_1)     # (nf/16, H)
        out_l2 = lrelu(Conv2d(nf, ks, dtype=td, name="upconv1_L2")(l2))
        out_l2 = pixel_shuffle(
            out_l2
            + Conv2d(nf, ks, dtype=td, name="upconv1_L2_2")(
                jnp.concatenate([out_l2, out_l3_1], -1)
            )
        )  # (nf/4, H)
        fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
        fuse = Conv2d(nf, 3, dtype=td, name="recorb0")(
            Conv2d(nf, 3, dtype=td, name="upconv_fuse")(fuse))

        if self.tail_impl in ("folded", "folded_pb") \
                and not self.is_initializing():
            # polyphase-folded cascade (ops/psfold.py): identical function,
            # computed at (H, W) — no (2H,2W)/(4H,4W) intermediates, no
            # big-tensor shuffle relayouts.  Kernels are rearranged from
            # the live params each call (small tensors; differentiable).
            from ..ops.psfold import fold_ps_bias, fold_ps_conv

            p = self.variables["params"]

            def conv(v, kern, bias):
                pad = (kern.shape[0] - 1) // 2
                y = jax.lax.conv_general_dilated(
                    v, kern.astype(v.dtype), (1, 1),
                    ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y + bias.astype(v.dtype)

            w1, b1 = (p["upconv1"]["Conv_0"][k] for k in ("kernel", "bias"))
            w2, b2 = (p["upconv2"]["Conv_0"][k] for k in ("kernel", "bias"))
            wl, bl = (p["conv_last0"]["Conv_0"][k]
                      for k in ("kernel", "bias"))
            a = lrelu(conv(fuse, w1, b1))                      # (H,W,4nf)
            f2k, f2b = fold_ps_conv(w2, 2), fold_ps_bias(b2, 2)
            wl2 = fold_ps_conv(fold_ps_conv(wl, 2), 2)
            bl2 = fold_ps_bias(fold_ps_bias(bl, 2), 2)
            if self.tail_impl == "folded_pb" and f2k.shape[0] == 3:
                # phase-blocked split (VERDICT r4 #2): the dense folded
                # kernels are 25% / 6.25% nonzero — per-phase 2x2 convs
                # drop the zero FLOPs (2.25x on upconv2), and the block
                # channel layout rides to conv_last0 via a weight-side
                # permutation so no (H,W,16nf) interleave relayout runs
                # (that relayout is why the r3 phase split LOST in-chain).
                from ..ops.psfold import (block_to_interleaved_perm,
                                          conv_folded_phase2_blocked,
                                          conv_folded_tapmajor)

                bmid = lrelu(conv_folded_phase2_blocked(a, f2k, f2b))
                perm = block_to_interleaved_perm(f2k.shape[3])
                y16 = conv_folded_tapmajor(bmid, wl2[:, :, perm, :], bl2)
            else:
                bmid = lrelu(conv(a, f2k, f2b))                # (H,W,16nf)
                y16 = conv(bmid, wl2, bl2)                     # (H,W,16c)
            out = pixel_shuffle(pixel_shuffle(y16))
        else:
            up = lrelu(pixel_shuffle(Conv2d(nf * 4, ks, dtype=td,
                                            name="upconv1")(fuse)))
            up = lrelu(pixel_shuffle(Conv2d(nf * 4, ks, dtype=td,
                                            name="upconv2")(up)))
            # deployment path: the C_out=1 conv at (4H, 4W) is
            # lane-hostile under XLA NHWC (0.33 TFLOP/s, 7.3 of the
            # tail's 21 ms at 480x272) — serve it through the rows-layout
            # kernel (in-chain tail 21.2 -> 19.7 ms; standalone 7.3 -> 4.4)
            last_impl = "rows" if self.warp_impl == "pallas" else "xla"
            out = Conv2d(c, 3, dtype=td, impl=last_impl,
                         name="conv_last0")(up)
        out = out.astype(jnp.float32)

        base = resize_bilinear(center, 4 * h, 4 * w)
        out = out + base
        return jnp.transpose(out, (0, 3, 1, 2))


def fcvsr_etc_forward(model: FCVSRNet, params, clip: jnp.ndarray):
    """Temporal-consistency mode: 13-frame clip -> 7 SR frames + bicubic bases.

    Reference ``GShiftNet_ETC`` loops 7 overlapping windows through the
    shared-weight network (CVSR_freq.py:2792-2843).  Here the windows are
    batched with ``vmap`` so XLA compiles a single parallel program.

    clip: (B, 13, C, H, W) -> (out (B, 7, C, 4H, 4W), base (B, 7, C, 4H, 4W)).
    """
    b, frames, c, h, w = clip.shape
    n_windows = frames - model.num_frames + 1  # == 7 for a 13-frame clip

    idx = jnp.arange(n_windows)

    def one_window(i):
        window = jax.lax.dynamic_slice_in_dim(clip, i, model.num_frames, axis=1)
        out = model.apply(params, window)
        center = window[:, model.num_frames // 2]
        base = jnp.transpose(
            resize_bilinear(jnp.transpose(center, (0, 2, 3, 1)), 4 * h, 4 * w),
            (0, 3, 1, 2),
        )
        return out, base

    outs, bases = jax.vmap(one_window, out_axes=1)(idx)
    return outs, bases
