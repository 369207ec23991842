"""MGAA component breakdown at the full bench shape (272x480, d=64, ac=6).

After the fused IAC (ops/pallas_iac.py) the chain is ~13.7 ms of an
~34 ms MGAA call; this times each remaining head component standalone so
the next fusion target is measured, not guessed:

- mgaa_full / mgaa_b2 : the whole module (B=1 / B=2 batched directions)
- iac6                : one 6-iteration fused IAC chain (one direction)
- predictor           : conv_KP + F0 + F1[out_select] kernel predictor
- rfft192             : batched rfft_features over the 3 packed groups
- irfft48             : the batched gated-spectra irfft
- corr                : corr_lookup (radius 4) on the spectral pair
- fuse1x1             : one convfuse chain (256->128->128->128 1x1s)
- convblks            : the 12 gated ConvBlk spectra (k = 1,3,..,11 on
                        4-channel maps — MXU-hostile tiny-channel convs)
- conv3               : the 128->64 3x3 output fuse

Usage: python benchmarks/microbench_mgaa.py [--cpu] [--iters 20] [--only a,b]
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

    from fcvsr_tpu.models.blocks import Conv2d, ConvBlk
    from fcvsr_tpu.models.fcvsr import MGAA
    from fcvsr_tpu.ops.corr import corr_lookup
    from fcvsr_tpu.ops.freq import irfft_features, rfft_features
    from fcvsr_tpu.ops.sac import iac

    h, w, d, ac = 272, 480, 64, 6
    wf = w // 2 + 1
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)

    bench = {}  # name -> zero-arg setup returning (fn, input)

    # ---- full module ----
    x3 = arr(1, h, w, 3 * d)

    def setup_mgaa(batch, iac_dtype="f32", head_dtype="f32"):
        mgaa = MGAA(dim=d, ac_num=ac, warp_impl="pallas", batch_fb=True,
                    iac_dtype=iac_dtype, head_dtype=head_dtype)
        p_mgaa = mgaa.init(jax.random.PRNGKey(0), x3)
        v = x3 if batch == 1 else arr(batch, h, w, 3 * d)
        return (lambda u: mgaa.apply(p_mgaa, u)), v

    bench["mgaa_full"] = lambda: setup_mgaa(1)
    bench["mgaa_b2"] = lambda: setup_mgaa(2)
    # bf16-storage IAC chain (F1 emits bf16 rows kernels; fused chain at
    # half HBM traffic — ops/pallas_iac.py)
    bench["mgaa_bf16"] = lambda: setup_mgaa(1, "bf16")
    # + bf16 spectral head (single-pass bf16 DFT, bf16 head convs)
    bench["mgaa_bf16h"] = lambda: setup_mgaa(1, "bf16", "bf16")
    # the deployment B=2 call (batch_mgaa merges the two shared-weight
    # MGAA(f1)/MGAA(f3) calls): completes the frame-budget accounting
    bench["mgaa_bf16h_b2"] = lambda: setup_mgaa(2, "bf16", "bf16")

    def setup_noiac(head_dtype="f32"):
        """The full module with iac() replaced by a stub that CONSUMES
        pred_k and offsets (cheap reductions): measures the spectral/
        predictor head INCLUDING glue without the chain.  (An identity
        stub lets XLA dead-code the whole head — pred_k and offsets have
        no other consumers.)"""
        from fcvsr_tpu.models import fcvsr as fcvsr_mod

        orig = fcvsr_mod.iac

        def stub(feat_in, pred_k, offsets, *a, **kw):
            keep = (jnp.mean(pred_k.astype(jnp.float32))
                    + jnp.mean(offsets.astype(jnp.float32)))
            return feat_in + keep.astype(feat_in.dtype) * 1e-12

        fcvsr_mod.iac = stub
        try:
            mgaa = MGAA(dim=d, ac_num=ac, warp_impl="pallas", batch_fb=True,
                        iac_dtype="bf16" if head_dtype == "bf16" else "f32",
                        head_dtype=head_dtype)
            p = mgaa.init(jax.random.PRNGKey(0), x3)

            def fn(u):
                fcvsr_mod.iac = stub
                try:
                    return mgaa.apply(p, u)
                finally:
                    fcvsr_mod.iac = orig
        finally:
            fcvsr_mod.iac = orig
        return fn, x3

    bench["mgaa_noiac"] = setup_noiac
    bench["mgaa_noiac_bf16h"] = lambda: setup_noiac("bf16")

    # ---- fused IAC chain, one direction ----
    feat = arr(1, h, w, d)
    pred_k = arr(1, h, w, ac * 3 * d)
    offs = jnp.asarray(rng.uniform(-3, 3, (ac, 1, h, w, 2)), jnp.float32)
    # pred_k (600 MB) must ride as a jit ARG: closure-captured arrays
    # inline as HLO constants and overflow the tunnel's compile request
    # (HTTP 413).
    bench["iac6"] = lambda: (
        lambda v, pk, of: iac(v, pk, of, ac, d, 3, kernel1_both=True,
                              k1_only=True, warp_impl="pallas",
                              k_tap_major=True),
        feat, (pred_k, offs))
    # bf16 storage: src/kernels/residual/output at half HBM bytes
    bench["iac6_bf16"] = lambda: (
        lambda v, pk, of: iac(v.astype(jnp.bfloat16),
                              pk.astype(jnp.bfloat16), of, ac, d, 3,
                              kernel1_both=True, k1_only=True,
                              warp_impl="pallas",
                              k_tap_major=True).astype(jnp.float32),
        feat, (pred_k, offs))

    # VMEM-resident whole-chain kernel (VERDICT r4 #3): the map ping-pongs
    # between two VMEM buffers — HBM sees 1 read + 1 write instead of 6+6
    def setup_iac6_resident(dtype=jnp.float32):
        from fcvsr_tpu.ops.pallas_iac import iac_fused_resident

        def fn(v, pk, of):
            return iac_fused_resident(v.astype(dtype), pk.astype(dtype),
                                      of, ac, d).astype(jnp.float32)

        return fn, feat, (pred_k, offs)

    bench["iac6_res"] = setup_iac6_resident
    bench["iac6_res_bf16"] = functools.partial(setup_iac6_resident,
                                               jnp.bfloat16)

    # fused kernel prediction (round 5): k computed in-kernel from f0 and
    # F1's weight slice — replaces the 50 MB/iter predicted-kernel stream
    # with the 17 MB f0 stream (and kills F1's 300 MB/chain emission,
    # which is OUTSIDE this timed region — the full-model A/B sees it)
    def setup_iac6_kf(dtype=jnp.float32):
        from fcvsr_tpu.ops.pallas_iac import iac_fused_kf

        f0 = arr(1, h, w, d)
        wsel = jnp.asarray(rng.uniform(-0.2, 0.2, (d, ac * 3 * d)),
                           jnp.float32)
        bsel = jnp.asarray(rng.uniform(-0.1, 0.1, (ac * 3 * d,)),
                           jnp.float32)

        def fn(v, f, of):
            return iac_fused_kf(v.astype(dtype), f.astype(dtype), wsel,
                                bsel, of, ac, d).astype(jnp.float32)

        return fn, feat, (f0, offs)

    bench["iac6_kf"] = setup_iac6_kf
    bench["iac6_kf_bf16"] = functools.partial(setup_iac6_kf, jnp.bfloat16)

    # ---- kernel predictor (KP -> F0 -> F1 with out_select) ----
    class Pred(nn.Module):
        @nn.compact
        def __call__(self, x):
            f_kp = Conv2d(d, 3, name="conv_KP")(x)
            f0 = Conv2d(d, 3, name="F0")(f_kp)
            half = d * 3
            sel = tuple(i * 2 * half + c * 3 + t
                        for i in range(ac) for t in range(3)
                        for c in range(d))
            return Conv2d(ac * half * 2, 1, name="F1", out_select=sel)(f0)

    def setup_pred():
        pred = Pred()
        p_pred = pred.init(jax.random.PRNGKey(1), feat)
        return (lambda v: pred.apply(p_pred, v)), feat

    bench["predictor"] = setup_pred

    # ---- spectral pieces ----
    bench["rfft192"] = lambda: ((lambda v: rfft_features(v)), x3)
    # single-pass bf16 DFT with f32 accumulation (head_dtype='bf16')
    bench["rfft192_bf16"] = lambda: (
        (lambda v: rfft_features(v, compute_dtype=jnp.bfloat16)
         .astype(jnp.float32)), x3)

    def setup_rfft_ct():
        # factored (Cooley-Tukey) fast-path stages — opt-in A/B
        from fcvsr_tpu.ops.freq import set_dft_ct
        set_dft_ct(True)
        return (lambda v: rfft_features(v, compute_dtype=jnp.bfloat16)
                .astype(jnp.float32)), x3

    bench["rfft192_bf16_ct"] = setup_rfft_ct
    packed = arr(1, h, wf, 2 * ac * 2 * 2)
    bench["irfft48"] = lambda: ((lambda v: irfft_features(v, h, w)), packed)

    # the gated-spectra reorder: 24 two-lane slices from 12 (B,H,Wf,4)
    # tensors -> (B,H,Wf,48) [reals..., imags...] + the irfft.  Δ vs
    # irfft48 = the pack's relayout cost (VERDICT r3 #3 glue suspect).
    def setup_pack():
        gs = arr(12, 1, h, wf, 4)

        def fn(g):
            gated = [g[i] for i in range(12)]
            pk = jnp.concatenate([t[..., :2] for t in gated]
                                 + [t[..., 2:] for t in gated], -1)
            return irfft_features(pk, h, w)

        return fn, gs

    bench["pack_irfft"] = setup_pack

    def setup_pack_perm():
        # same math, but the halves reorder rides a one-hot 48x48 matmul
        # (exact: one-hot picks with f32 accumulate) on the NATURAL
        # 12-tensor concat — no 24-slice relayout
        gs = arr(12, 1, h, wf, 4)
        perm = np.zeros((48, 48), np.float32)
        for j in range(12):
            for t in range(2):
                perm[4 * j + t, 2 * j + t] = 1.0          # re -> first half
                perm[4 * j + 2 + t, 24 + 2 * j + t] = 1.0  # im -> second
        pmat = jnp.asarray(perm)

        def fn(g):
            nat = jnp.concatenate([g[i] for i in range(12)], -1)
            pk = jnp.einsum("bhkc,cd->bhkd", nat, pmat)
            return irfft_features(pk, h, w)

        return fn, gs

    bench["pack_irfft_perm"] = setup_pack_perm
    fa, fb = arr(1, h, wf, 2 * d), arr(1, h, wf, 2 * d)
    bench["corr"] = lambda: ((lambda v: corr_lookup(v, fb, 4)), fa)

    class Fuse(nn.Module):
        @nn.compact
        def __call__(self, y):
            y = nn.relu(Conv2d(2 * d, 1, use_bias=False, name="f0")(y))
            y = nn.relu(Conv2d(2 * d, 1, use_bias=False, name="f1")(y))
            return Conv2d(2 * d, 1, use_bias=False, name="f2")(y)

    def setup_fuse():
        fuse = Fuse()
        cat = arr(1, h, wf, 4 * d)
        p_fuse = fuse.init(jax.random.PRNGKey(2), cat)
        return (lambda v: fuse.apply(p_fuse, v)), cat

    bench["fuse1x1"] = setup_fuse

    class Blks(nn.Module):
        """The 12 gated ConvBlk spectra, chained so DCE can't drop any."""
        dtype: object = None

        @nn.compact
        def __call__(self, off_f, off_b, sim):
            acc = None
            for i in range(ac):
                blk = ConvBlk(4, index=i, dtype=self.dtype, name=f"mconv{i}")
                gf = blk(off_f) * sim
                gb = blk(off_b) * sim
                acc = gf + gb if acc is None else acc + gf + gb
            return acc

    def setup_blks(dtype=None):
        blks = Blks(dtype=dtype)
        off_f, off_b, sim = (arr(1, h, wf, 4), arr(1, h, wf, 4),
                             arr(1, h, wf, 4))
        if dtype is not None:
            off_f, off_b, sim = (off_f.astype(dtype), off_b.astype(dtype),
                                 sim.astype(dtype))
        p_blks = blks.init(jax.random.PRNGKey(3), off_f, off_b, sim)
        return (lambda v: blks.apply(p_blks, v, off_b, sim)
                .astype(jnp.float32)), off_f

    bench["convblks"] = setup_blks
    bench["convblks_bf16"] = lambda: setup_blks(jnp.bfloat16)

    class BlksDense(nn.Module):
        """Candidate: the 12 ConvBlks' per-block convs embedded as ONE
        dense block-diagonal pair (k=11-padded, 48 channels, both
        directions batched) — exact same math once kernels are
        block-diagonal-embedded (zero padding makes padded taps exact);
        wastes 30x the FLOPs to buy full MXU lanes.  CA stays per-block
        (tiny).  This bench uses random dense kernels — cost model only.

        Measured on TPU (round 3): LOSES — dense 1.748 / dense_bf16 1.474
        vs per-block 1.565 / bf16 1.435 ms.  The tiny-channel convs are
        already bandwidth-bound, not lane-bound; CLOSED, never wired.
        """
        dtype: object = None

        @nn.compact
        def __call__(self, off_fb, sim):
            from fcvsr_tpu.models.blocks import CALayer, PReLU
            y = Conv2d(4 * ac, 11, use_bias=False, dtype=self.dtype,
                       name="c1")(off_fb)
            y = PReLU(name="relu")(y)
            y = Conv2d(4 * ac, 11, use_bias=False, dtype=self.dtype,
                       name="c2")(y)
            acc = None
            for i in range(ac):
                blk = y[..., 4 * i : 4 * i + 4]
                ca = CALayer(4, reduction=1, dtype=self.dtype,
                             name=f"ca{i}")(blk)
                g = (ca + blk) * sim
                acc = g if acc is None else acc + g
            return acc[:1] + acc[1:]

    def setup_blks_dense(dtype=None):
        blks = BlksDense(dtype=dtype)
        off_fb, sim = arr(2, h, wf, 4 * ac), arr(2, h, wf, 4)
        if dtype is not None:
            off_fb, sim = off_fb.astype(dtype), sim.astype(dtype)
        p = blks.init(jax.random.PRNGKey(3), off_fb, sim)
        return (lambda v: blks.apply(p, v, sim).astype(jnp.float32)), off_fb

    bench["convblks_dense"] = setup_blks_dense
    bench["convblks_dense_bf16"] = lambda: setup_blks_dense(jnp.bfloat16)

    def setup_conv3():
        conv3 = Conv2d(d, 3, use_bias=False)
        cat2 = arr(1, h, w, 2 * d)
        p_c3 = conv3.init(jax.random.PRNGKey(4), cat2)
        return (lambda v: conv3.apply(p_c3, v)), cat2

    bench["conv3"] = setup_conv3

    only = [s for s in args.only.split(",") if s]
    n = args.iters
    out = {}
    for name, setup in bench.items():
        if only and name not in only:
            continue
        # process-global routing flags must not leak between entries (the
        # repo's cross-test-pollution lesson; ADVICE r4): reset the CT-DFT
        # flag before every setup so only rfft192_bf16_ct sees it enabled.
        from fcvsr_tpu.ops.freq import set_dft_ct
        set_dft_ct(False)
        fn, inp, *rest = setup()
        extras = rest[0] if rest else ()

        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(v, ex, k, fn=fn):
            def body(i, acc):
                return acc + jnp.mean(fn(v * (1.0 + 1e-6 * i), *ex))
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
            print(f"{name:12s} {ms:9.3f} ms   (compile {compile_s:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            out[name] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
