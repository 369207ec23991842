"""FCVSR head/tail decomposition at the full bench shape (272x480, nf=64).

The deployment-path frame is 138.6 ms with MGAA (58.2), SCNet (41.3) and
MFFR (~8) accounted — this times the remaining ~31 ms so the next target
is measured, not guessed:

- feat_extract : the 7-frame 3x3 conv (7 -> 448 channels)
- downcat      : rconcat1/rconcat2 stride-2 convs feeding SCNet
- tail         : the full upsampling pyramid (upconv L3/L2 + pixel
                 shuffles + fuse + upconv1/2 + conv_last0) from [l1,l2,l3]
- base         : the bilinear x4 base resize + final add + NCHW transpose
- api_in       : (B,T,C,H,W) -> NHWC feats + centre transpose

Usage: python benchmarks/microbench_tail.py [--cpu] [--iters 20] [--only ...]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp

    from fcvsr_tpu.models.blocks import Conv2d, PReLU, pixel_shuffle
    from fcvsr_tpu.ops.resize import resize_bilinear

    h, w, nf, t, c = 272, 480, 64, 7, 1
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    bench = {}

    def setup_feat():
        feats = arr(1, h, w, t * c)
        conv = Conv2d(t * nf, 3, name="feat_extract")
        p = conv.init(jax.random.PRNGKey(0), feats)
        return (lambda v: conv.apply(p, v)), feats, ()

    bench["feat_extract"] = setup_feat

    def setup_downcat():
        dec = arr(1, h, w, nf)

        class Down(nn.Module):
            @nn.compact
            def __call__(self, d):
                d1 = Conv2d(nf, 3, stride=2, name="rconcat1")(d)
                d2 = Conv2d(nf, 3, stride=2, name="rconcat2")(d1)
                return d1, d2

        mod = Down()
        p = mod.init(jax.random.PRNGKey(0), dec)
        return (lambda v: mod.apply(p, v)), dec, ()

    bench["downcat"] = setup_downcat

    def setup_tail(dtype=jnp.float32):
        last_impl = "rows" if dtype == "rows" else "xla"
        if dtype == "rows":
            dtype = jnp.float32
        l1 = arr(1, h, w, nf).astype(dtype)
        l2 = arr(1, h // 2, w // 2, nf).astype(dtype)
        l3 = arr(1, h // 4, w // 4, nf).astype(dtype)

        class Tail(nn.Module):
            ks: int = 3
            last_impl: str = "xla"

            @nn.compact
            def __call__(self, l1, l2, l3):
                ks = self.ks
                lrelu = PReLU(name="lrelu")
                out_l3 = lrelu(Conv2d(nf, ks, name="upconv1_L3")(l3))
                out_l3_1 = pixel_shuffle(out_l3)
                out_l3_2 = pixel_shuffle(out_l3_1)
                out_l2 = lrelu(Conv2d(nf, ks, name="upconv1_L2")(l2))
                out_l2 = pixel_shuffle(
                    out_l2 + Conv2d(nf, ks, name="upconv1_L2_2")(
                        jnp.concatenate([out_l2, out_l3_1], -1)))
                fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
                fuse = Conv2d(nf, 3, name="recorb0")(
                    Conv2d(nf, 3, name="upconv_fuse")(fuse))
                up = lrelu(pixel_shuffle(Conv2d(nf * 4, ks,
                                                name="upconv1")(fuse)))
                up = lrelu(pixel_shuffle(Conv2d(nf * 4, ks,
                                                name="upconv2")(up)))
                return Conv2d(c, 3, impl=self.last_impl,
                              name="conv_last0")(up)

        mod = Tail(last_impl=last_impl)
        p = mod.init(jax.random.PRNGKey(0), l1, l2, l3)
        p = jax.tree.map(lambda a: a.astype(dtype), p)
        return (lambda v, a, b: mod.apply(p, v, a, b).astype(jnp.float32)), \
            l1, (l2, l3)

    bench["tail"] = setup_tail

    # tail internals: which op owns the 21 ms?
    def setup_upconv2():
        z = arr(1, 2 * h, 2 * w, nf)

        class U2(nn.Module):
            @nn.compact
            def __call__(self, u):
                lrelu = PReLU(name="lrelu")
                return lrelu(pixel_shuffle(Conv2d(nf * 4, 3,
                                                  name="upconv2")(u)))

        mod = U2()
        p = mod.init(jax.random.PRNGKey(0), z)
        return (lambda v: mod.apply(p, v)), z, ()

    bench["upconv2"] = setup_upconv2

    def setup_convlast():
        z = arr(1, 4 * h, 4 * w, nf)
        conv = Conv2d(c, 3, name="conv_last0")
        p = conv.init(jax.random.PRNGKey(0), z)
        return (lambda v: conv.apply(p, v)), z, ()

    bench["convlast"] = setup_convlast

    def setup_convlast_rows():
        from fcvsr_tpu.ops.pallas_conv import conv3x3_rows_nhwc

        z = arr(1, 4 * h, 4 * w, nf)
        wgt = arr(3, 3, nf, c)
        bias = arr(c)
        interp = jax.default_backend() == "cpu"
        return (lambda v: conv3x3_rows_nhwc(v, wgt, bias, "mstack",
                                            interp)), z, ()

    bench["convlast_rows"] = setup_convlast_rows

    def setup_convlast_rows_v(tile_rows, mode):
        from fcvsr_tpu.ops.pallas_conv import (conv3x3_rows, pad_to_rows,
                                               prep_weight, rows_to_nhwc)

        z = arr(1, 4 * h, 4 * w, nf)
        wgt = arr(3, 3, nf, c)
        bias = arr(c)
        interp = jax.default_backend() == "cpu"

        def fn(v):
            y = conv3x3_rows(pad_to_rows(v, tile_rows),
                             prep_weight(wgt, mode), bias, h=4 * h, w=4 * w,
                             tile_rows=tile_rows, mode=mode,
                             interpret=interp)
            return rows_to_nhwc(y, 4 * h, 4 * w)

        return fn, z, ()

    # tile_rows > 16 is ruled out by the layout (ROW_OFF = 16)
    bench["convlast_rows_c3"] = functools.partial(setup_convlast_rows_v,
                                                  16, "cat3")

    def setup_fusepart():
        # the low-res section: L2/L3 pyramid + fuse + upconv1 block
        l1 = arr(1, h, w, nf)
        l2 = arr(1, h // 2, w // 2, nf)
        l3 = arr(1, h // 4, w // 4, nf)

        class Low(nn.Module):
            @nn.compact
            def __call__(self, l1, l2, l3):
                lrelu = PReLU(name="lrelu")
                out_l3 = lrelu(Conv2d(nf, 3, name="upconv1_L3")(l3))
                out_l3_1 = pixel_shuffle(out_l3)
                out_l3_2 = pixel_shuffle(out_l3_1)
                out_l2 = lrelu(Conv2d(nf, 3, name="upconv1_L2")(l2))
                out_l2 = pixel_shuffle(
                    out_l2 + Conv2d(nf, 3, name="upconv1_L2_2")(
                        jnp.concatenate([out_l2, out_l3_1], -1)))
                fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
                fuse = Conv2d(nf, 3, name="recorb0")(
                    Conv2d(nf, 3, name="upconv_fuse")(fuse))
                return lrelu(pixel_shuffle(Conv2d(nf * 4, 3,
                                                  name="upconv1")(fuse)))

        mod = Low()
        p = mod.init(jax.random.PRNGKey(0), l1, l2, l3)
        return (lambda v, a, b: mod.apply(p, v, a, b)), l1, (l2, l3)

    bench["fusepart"] = setup_fusepart
    # bf16 params + activations (f32 result): decides whether the tail is
    # worth a bf16-storage variant — single-conv probes say XLA bf16 NHWC
    # is SLOWER at 64ch/272x480, but the tail is dominated by 4x-spatial
    # relayout traffic where halved bytes win.  Measured (TPU, 2026-08-18):
    # tail 21.23 / tail_bf16 17.38 / tail_rows 19.72 ms.
    bench["tail_bf16"] = functools.partial(setup_tail, jnp.bfloat16)
    # the composed tail with conv_last0 on the rows kernel (the
    # deployment-path routing): in-chain win is 1.5 ms (vs 2.9 standalone
    # — XLA layout pressure absorbs part of it)
    bench["tail_rows"] = functools.partial(setup_tail, "rows")

    def setup_tail_folded(dtype=jnp.float32):
        # the deployment tail: polyphase-folded upconv1/upconv2/conv_last0
        # cascade (ops/psfold.py) — the whole 4x section runs at (H, W)
        from fcvsr_tpu.ops.psfold import fold_ps_bias, fold_ps_conv

        l1 = arr(1, h, w, nf).astype(dtype)
        l2 = arr(1, h // 2, w // 2, nf).astype(dtype)
        l3 = arr(1, h // 4, w // 4, nf).astype(dtype)

        class TailFolded(nn.Module):
            @nn.compact
            def __call__(self, l1, l2, l3):
                lrelu = PReLU(name="lrelu")
                out_l3 = lrelu(Conv2d(nf, 3, name="upconv1_L3")(l3))
                out_l3_1 = pixel_shuffle(out_l3)
                out_l3_2 = pixel_shuffle(out_l3_1)
                out_l2 = lrelu(Conv2d(nf, 3, name="upconv1_L2")(l2))
                out_l2 = pixel_shuffle(
                    out_l2 + Conv2d(nf, 3, name="upconv1_L2_2")(
                        jnp.concatenate([out_l2, out_l3_1], -1)))
                fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
                fuse = Conv2d(nf, 3, name="recorb0")(
                    Conv2d(nf, 3, name="upconv_fuse")(fuse))
                w1 = self.param("w1", nn.initializers.normal(0.02),
                                (3, 3, nf, 4 * nf))
                b1 = self.param("b1", nn.initializers.zeros, (4 * nf,))
                w2 = self.param("w2", nn.initializers.normal(0.02),
                                (3, 3, nf, 4 * nf))
                b2 = self.param("b2", nn.initializers.zeros, (4 * nf,))
                wl = self.param("wl", nn.initializers.normal(0.02),
                                (3, 3, nf, c))
                bl = self.param("bl", nn.initializers.zeros, (c,))

                def conv(v, kern, bias):
                    pad = (kern.shape[0] - 1) // 2
                    y = jax.lax.conv_general_dilated(
                        v, kern.astype(v.dtype), (1, 1),
                        ((pad, pad), (pad, pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return y + bias.astype(v.dtype)

                a = lrelu(conv(fuse, w1, b1))
                bmid = lrelu(conv(a, fold_ps_conv(w2, 2),
                                  fold_ps_bias(b2, 2)))
                wl2 = fold_ps_conv(fold_ps_conv(wl, 2), 2)
                y16 = conv(bmid, wl2,
                           fold_ps_bias(fold_ps_bias(bl, 2), 2))
                return pixel_shuffle(pixel_shuffle(y16))

        mod = TailFolded()
        p = mod.init(jax.random.PRNGKey(0), l1, l2, l3)
        p = jax.tree.map(lambda a: a.astype(dtype), p)
        return (lambda v, a, b: mod.apply(p, v, a, b).astype(jnp.float32)), \
            l1, (l2, l3)

    bench["tail_folded"] = setup_tail_folded
    bench["tail_folded_bf16"] = functools.partial(setup_tail_folded,
                                                  jnp.bfloat16)

    def setup_tail_folded_rows():
        # the same folded cascade, but the three 3x3 convs run through the
        # rows-layout Pallas kernel (ops/pallas_conv.py) with bf16 chain
        # storage and the PReLU applied ring-safe between calls (alpha*0=0)
        # — XLA ran the dense folded convs at ~75 TFLOP/s (9.27 ms tail);
        # the rows kernel sustains ~103 in-chain.
        from fcvsr_tpu.ops.pallas_conv import (conv3x3_rows, pad_to_rows,
                                               prep_weight, rows_to_nhwc)
        from fcvsr_tpu.ops.psfold import fold_ps_bias, fold_ps_conv

        l1 = arr(1, h, w, nf)
        l2 = arr(1, h // 2, w // 2, nf)
        l3 = arr(1, h // 4, w // 4, nf)
        interp = jax.default_backend() == "cpu"

        class TailFoldedRows(nn.Module):
            @nn.compact
            def __call__(self, l1, l2, l3):
                lrelu = PReLU(name="lrelu")
                out_l3 = lrelu(Conv2d(nf, 3, name="upconv1_L3")(l3))
                out_l3_1 = pixel_shuffle(out_l3)
                out_l3_2 = pixel_shuffle(out_l3_1)
                out_l2 = lrelu(Conv2d(nf, 3, name="upconv1_L2")(l2))
                out_l2 = pixel_shuffle(
                    out_l2 + Conv2d(nf, 3, name="upconv1_L2_2")(
                        jnp.concatenate([out_l2, out_l3_1], -1)))
                fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
                fuse = Conv2d(nf, 3, name="recorb0")(
                    Conv2d(nf, 3, name="upconv_fuse")(fuse))
                w1 = self.param("w1", nn.initializers.normal(0.02),
                                (3, 3, nf, 4 * nf))
                b1 = self.param("b1", nn.initializers.zeros, (4 * nf,))
                w2 = self.param("w2", nn.initializers.normal(0.02),
                                (3, 3, nf, 4 * nf))
                b2 = self.param("b2", nn.initializers.zeros, (4 * nf,))
                wl = self.param("wl", nn.initializers.normal(0.02),
                                (3, 3, nf, c))
                bl = self.param("bl", nn.initializers.zeros, (c,))
                alpha = lrelu.variables["params"]["alpha"]

                def prelu_rows(y):
                    a = alpha.astype(y.dtype).reshape(())
                    return jnp.where(y >= 0, y, a * y)

                xr = pad_to_rows(fuse, 8).astype(jnp.bfloat16)
                y = conv3x3_rows(xr, prep_weight(w1), b1, h=h, w=w,
                                 tile_rows=8, interpret=interp)
                y = prelu_rows(y)
                y = conv3x3_rows(y, prep_weight(fold_ps_conv(w2, 2)),
                                 fold_ps_bias(b2, 2), h=h, w=w,
                                 tile_rows=8, interpret=interp)
                y = prelu_rows(y)
                wl2 = fold_ps_conv(fold_ps_conv(wl, 2), 2)
                y16 = conv3x3_rows(y, prep_weight(wl2),
                                   fold_ps_bias(fold_ps_bias(bl, 2), 2),
                                   h=h, w=w, tile_rows=8,
                                   out_dtype=jnp.float32,
                                   interpret=interp)
                y16 = rows_to_nhwc(y16, h, w)
                return pixel_shuffle(pixel_shuffle(y16))

        mod = TailFoldedRows()
        p = mod.init(jax.random.PRNGKey(0), l1, l2, l3)
        return (lambda v, a, b: mod.apply(p, v, a, b).astype(jnp.float32)), \
            l1, (l2, l3)

    bench["tail_folded_rows"] = setup_tail_folded_rows

    def setup_tail_folded_pb():
        # phase-blocked folded pair (VERDICT r4 #2): dense folded kernels
        # are 25% / 6.25% nonzero — per-phase 2x2 convs drop the zero
        # FLOPs (upconv2 616 -> 154 GFLOP dense-equivalent) and the block
        # channel layout rides into the tap-major conv_last0 via a
        # weight-side permutation, so no (H,W,16nf) interleave relayout
        # runs (the r3 phase split lost in-chain on exactly that relayout).
        from fcvsr_tpu.ops.psfold import (block_to_interleaved_perm,
                                          conv_folded_phase2_blocked,
                                          conv_folded_tapmajor,
                                          fold_ps_bias, fold_ps_conv)

        l1 = arr(1, h, w, nf)
        l2 = arr(1, h // 2, w // 2, nf)
        l3 = arr(1, h // 4, w // 4, nf)

        class TailFoldedPB(nn.Module):
            @nn.compact
            def __call__(self, l1, l2, l3):
                lrelu = PReLU(name="lrelu")
                out_l3 = lrelu(Conv2d(nf, 3, name="upconv1_L3")(l3))
                out_l3_1 = pixel_shuffle(out_l3)
                out_l3_2 = pixel_shuffle(out_l3_1)
                out_l2 = lrelu(Conv2d(nf, 3, name="upconv1_L2")(l2))
                out_l2 = pixel_shuffle(
                    out_l2 + Conv2d(nf, 3, name="upconv1_L2_2")(
                        jnp.concatenate([out_l2, out_l3_1], -1)))
                fuse = jnp.concatenate([l1, out_l2, out_l3_2], -1)
                fuse = Conv2d(nf, 3, name="recorb0")(
                    Conv2d(nf, 3, name="upconv_fuse")(fuse))
                w1 = self.param("w1", nn.initializers.normal(0.02),
                                (3, 3, nf, 4 * nf))
                b1 = self.param("b1", nn.initializers.zeros, (4 * nf,))
                w2 = self.param("w2", nn.initializers.normal(0.02),
                                (3, 3, nf, 4 * nf))
                b2 = self.param("b2", nn.initializers.zeros, (4 * nf,))
                wl = self.param("wl", nn.initializers.normal(0.02),
                                (3, 3, nf, c))
                bl = self.param("bl", nn.initializers.zeros, (c,))

                def conv(v, kern, bias):
                    pad = (kern.shape[0] - 1) // 2
                    y = jax.lax.conv_general_dilated(
                        v, kern.astype(v.dtype), (1, 1),
                        ((pad, pad), (pad, pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return y + bias.astype(v.dtype)

                a = lrelu(conv(fuse, w1, b1))
                f2k, f2b = fold_ps_conv(w2, 2), fold_ps_bias(b2, 2)
                bmid = lrelu(conv_folded_phase2_blocked(a, f2k, f2b))
                wl2 = fold_ps_conv(fold_ps_conv(wl, 2), 2)
                perm = block_to_interleaved_perm(f2k.shape[3])
                y16 = conv_folded_tapmajor(
                    bmid, wl2[:, :, perm, :],
                    fold_ps_bias(fold_ps_bias(bl, 2), 2))
                return pixel_shuffle(pixel_shuffle(y16))

        mod = TailFoldedPB()
        p = mod.init(jax.random.PRNGKey(0), l1, l2, l3)
        return (lambda v, a, b: mod.apply(p, v, a, b).astype(jnp.float32)), \
            l1, (l2, l3)

    bench["tail_folded_pb"] = setup_tail_folded_pb

    # ---- folded-tail components (what is the 9.5 ms made of?) ----
    def _plain_conv(v, kern, bias):
        pad = (kern.shape[0] - 1) // 2
        y = jax.lax.conv_general_dilated(
            v, kern.astype(v.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(v.dtype)

    def setup_folded_up1():
        # fuse -> upconv1 at (H, W): 64 -> 256, the only unfolded tail conv
        v = arr(1, h, w, nf)
        kern = arr(3, 3, nf, 4 * nf)
        bias = arr(4 * nf)
        return (lambda u: _plain_conv(u, kern, bias)), v, ()

    def setup_folded_up2():
        # folded upconv2 at (H, W): 256 -> 1024 with the S=3 dense folded
        # kernel (25% nonzero — 616 GFLOP dense vs 154 needed)
        from fcvsr_tpu.ops.psfold import fold_ps_bias, fold_ps_conv

        v = arr(1, h, w, 4 * nf)
        kern = fold_ps_conv(arr(3, 3, nf, 4 * nf), 2)
        bias = fold_ps_bias(arr(4 * nf), 2)
        return (lambda u: _plain_conv(u, kern, bias)), v, ()

    def setup_folded_last():
        # doubly-folded conv_last0 at (H, W): 1024 -> 16 (MXU N=16 — the
        # output-channel dim uses 16/128 of the systolic array)
        from fcvsr_tpu.ops.psfold import fold_ps_bias, fold_ps_conv

        v = arr(1, h, w, 16 * nf)
        kern = fold_ps_conv(fold_ps_conv(arr(3, 3, nf, c), 2), 2)
        bias = fold_ps_bias(fold_ps_bias(arr(c), 2), 2)
        return (lambda u: _plain_conv(u, kern, bias)), v, ()

    bench["folded_up1"] = setup_folded_up1
    bench["folded_up2"] = setup_folded_up2
    bench["folded_last"] = setup_folded_last

    def setup_folded_up2_phase():
        # CANDIDATE: phase-split folded upconv2 — each of the 4 output
        # phases is a 2x2 conv (a slice of the dense S=3 folded kernel;
        # per-phase support rows {i, i+1} with asymmetric padding), then a
        # stack+reshape interleaves channels back to c*4 + i*2 + j.
        # 4 x 68.5 = 274 GFLOP vs the dense 616.
        from fcvsr_tpu.ops.psfold import fold_ps_bias, fold_ps_conv

        v = arr(1, h, w, 4 * nf)
        kern = fold_ps_conv(arr(3, 3, nf, 4 * nf), 2)   # (3,3,256,1024)
        bias = fold_ps_bias(arr(4 * nf), 2)
        co = 4 * nf

        def fn(u):
            ys = []
            for i in range(2):
                for j in range(2):
                    sub = kern[i : i + 2, j : j + 2, :, i * 2 + j :: 4]
                    y = jax.lax.conv_general_dilated(
                        u, sub.astype(u.dtype), (1, 1),
                        ((1 - i, i), (1 - j, j)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    ys.append(y + bias[i * 2 + j :: 4].astype(u.dtype))
            return jnp.stack(ys, axis=-1).reshape(1, h, w, 4 * co)

        return fn, v, ()

    def setup_folded_last_tapmajor():
        # CANDIDATE: the doubly-folded conv_last as ONE (HW,1024)x(1024,
        # S*S*16) matmul (N=144: 56% MXU N-util vs 12.5% at N=16) followed
        # by S*S shifted adds of the 16-channel tap maps.
        from fcvsr_tpu.ops.psfold import fold_ps_bias, fold_ps_conv

        v = arr(1, h, w, 16 * nf)
        kern = fold_ps_conv(fold_ps_conv(arr(3, 3, nf, c), 2), 2)
        bias = fold_ps_bias(fold_ps_bias(arr(c), 2), 2)
        S = kern.shape[0]
        m = (S - 1) // 2
        cin, co = kern.shape[2], kern.shape[3]
        wtap = jnp.transpose(kern.reshape(S * S, cin, co), (1, 0, 2)) \
            .reshape(cin, S * S * co)

        def fn(u):
            p = jnp.einsum("bhwc,ck->bhwk", u, wtap,
                           preferred_element_type=jnp.float32)
            p = p.reshape(1, h, w, S * S, co)
            pad = jnp.pad(p, ((0, 0), (m, m), (m, m), (0, 0), (0, 0)))
            out = bias.astype(jnp.float32)[None, None, None]
            for dy in range(S):
                for dx in range(S):
                    out = out + pad[:, dy : dy + h, dx : dx + w,
                                    dy * S + dx]
            return out

        return fn, v, ()

    bench["folded_up2_phase"] = setup_folded_up2_phase
    bench["folded_last_tapmajor"] = setup_folded_last_tapmajor

    def setup_base():
        center = arr(1, h, w, c)
        out = arr(1, 4 * h, 4 * w, c)

        def fn(v, o):
            base = resize_bilinear(v, 4 * h, 4 * w)
            return jnp.transpose(o + base, (0, 3, 1, 2))

        return fn, center, (out,)

    bench["base"] = setup_base

    def setup_api_in():
        x = arr(1, t, c, h, w)

        def fn(v):
            center = jnp.transpose(v[:, t // 2], (0, 2, 3, 1))
            feats = jnp.transpose(v, (0, 3, 4, 1, 2)).reshape(1, h, w, t * c)
            return feats, center

        return fn, x, ()

    bench["api_in"] = setup_api_in

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    out = {}
    for name, setup in bench.items():
        if only and name not in only:
            continue
        fn, inp, extras = setup()

        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(v, ex, k, fn=fn):
            def body(i, acc):
                r = fn(v * (1.0 + 1e-6 * i), *ex)
                leaves = jax.tree.leaves(r)
                return acc + sum(jnp.mean(l) for l in leaves)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        try:
            t0 = time.perf_counter()
            np.asarray(run_n(inp, extras, 1))
            compile_s = time.perf_counter() - t0
            np.asarray(run_n(inp, extras, n))

            def timed(k):
                t0 = time.perf_counter()
                val = np.asarray(run_n(inp, extras, k))
                assert np.isfinite(val)
                return time.perf_counter() - t0

            base = min(timed(1) for _ in range(2))
            total = min(timed(n) for _ in range(2))
            ms = (total - base) / (n - 1) * 1e3
            out[name] = round(ms, 3)
            print(f"{name:13s} {ms:9.3f} ms   (compile {compile_s:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:13s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            out[name] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
