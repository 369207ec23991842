"""Goldens for the rows-layout (chain-resident Pallas) SCNet replay.

`scnet_rows_apply` must replay the exact SCNet computation
(models/blocks.py::SCNet, reference CVSR_freq.py:705-822) over the same
parameter pytree.  The kernel computes 3x3 convs in single-pass bf16 with
f32 accumulation, so the forward golden compares against the f32 NHWC
module with a tolerance sized for bf16 drift through the conv chain —
orchestration errors (block ordering, resize wiring, context-block
masking, residual hookup) produce O(1) deviations, far above it.

The gradient path (`scnet_rows_diff` / SCNet(impl='rows') under jax.grad)
must match the NHWC path's gradients to f32 round-off: its custom VJP
re-runs the exact NHWC backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models.blocks import SCNet
from fcvsr_tpu.models.scnet_rows import scnet_rows_apply

RNG = np.random.default_rng(7)


def _pyramid(b, h, w, c):
    return [jnp.asarray(RNG.standard_normal((b, hh, ww, c)), jnp.float32)
            for hh, ww in ((h, w), (h // 2, w // 2), (h // 4, w // 4))]


def _init(nf, groups, xs):
    mod = SCNet(nf, groups)
    params = mod.init(jax.random.PRNGKey(3), xs)["params"]
    # torch-default init makes deep-chain outputs ~input-scale; keep as-is
    return mod, params


@pytest.mark.parametrize("b,h,w", [(1, 16, 24), (2, 24, 40)])
def test_scnet_rows_forward_golden(b, h, w):
    nf, groups = 16, 2
    xs = _pyramid(b, h, w, nf)
    mod, params = _init(nf, groups, xs)
    ref = mod.apply({"params": params}, xs)
    got = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                           interpret=True)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        scale = np.abs(r).max()
        assert np.abs(g - r).max() < 5e-2 * scale, np.abs(g - r).max() / scale


def test_scnet_rows_mstack2_matches_cat3():
    """The banded pair-row matmul mode is the same function as cat3 (fp
    reassociation only — same taps, different accumulation grouping)."""
    nf, groups = 16, 2
    xs = _pyramid(1, 24, 40, nf)
    mod, params = _init(nf, groups, xs)
    ref = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                           interpret=True)
    got = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                           interpret=True, mode="mstack2")
    for r, g in zip(ref, got):
        # the banded matmul reduces all 12 K blocks in one pass vs cat3's
        # per-dy grouping: pure fp reassociation, which walks through the
        # deep group chain (measured max 7.7e-5 abs on ~2-scale outputs)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-4)


def test_scnet_rows_odd_sizes():
    # L3 height 3: boundary tiles mix data and masked rows; odd widths
    nf, groups = 16, 1
    xs = _pyramid(1, 12, 20, nf)
    mod, params = _init(nf, groups, xs)
    ref = mod.apply({"params": params}, xs)
    got = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                           interpret=True)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert np.abs(g - r).max() < 5e-2 * np.abs(r).max()


def test_scnet_impl_rows_module_route():
    """SCNet(impl='rows').apply routes through the kernel and matches the
    XLA path at serving precision; init lays down identical param trees."""
    nf, groups = 16, 1
    xs = _pyramid(1, 16, 24, nf)
    mod_x = SCNet(nf, groups)
    mod_r = SCNet(nf, groups, impl="rows")
    p_x = mod_x.init(jax.random.PRNGKey(5), xs)["params"]
    p_r = mod_r.init(jax.random.PRNGKey(5), xs)["params"]
    assert jax.tree_util.tree_structure(p_x) == jax.tree_util.tree_structure(p_r)
    ref = mod_x.apply({"params": p_x}, xs)
    got = mod_r.apply({"params": p_x}, xs)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert np.abs(g - r).max() < 5e-2 * np.abs(r).max()


def test_scnet_rows_jit_retrace():
    """Regression: cached layout constants must be numpy, not jnp — a
    jnp constant created inside one trace and lru_cached leaks its tracer
    into every later trace (seen on TPU as UnexpectedTracerError from the
    custom_vjp fwd; two successive jits reproduce it on CPU)."""
    nf, groups = 16, 1
    xs = _pyramid(1, 8, 12, nf)
    mod_r = SCNet(nf, groups, impl="rows")
    params = mod_r.init(jax.random.PRNGKey(11), xs)["params"]
    f1 = jax.jit(lambda p, t: mod_r.apply({"params": p}, list(t)))
    out1 = f1(params, tuple(xs))
    f2 = jax.jit(
        lambda p, t: sum(jnp.sum(o) for o in mod_r.apply({"params": p},
                                                         list(t))))
    val = np.asarray(f2(params, tuple(xs)))
    assert np.isfinite(val)
    assert all(np.isfinite(np.asarray(o)).all() for o in out1)


def test_scnet_rows_grad_exact():
    """jax.grad through impl='rows' equals the NHWC path's gradients to
    f32 round-off (the custom VJP reruns the exact NHWC backward)."""
    nf, groups = 16, 1
    xs = _pyramid(1, 8, 12, nf)
    mod_x = SCNet(nf, groups)
    mod_r = SCNet(nf, groups, impl="rows")
    params = mod_x.init(jax.random.PRNGKey(9), xs)["params"]
    # a loss LINEAR in the output keeps the incoming cotangent independent
    # of the (bf16) forward values, so the exact-path VJP must agree
    cots = [jnp.asarray(RNG.standard_normal(x.shape), jnp.float32)
            for x in xs]

    def loss(mod):
        def f(p, xs_):
            out = mod.apply({"params": p}, list(xs_))
            return sum(jnp.sum(o * c) for o, c in zip(out, cots))
        return f

    g_x = jax.grad(loss(mod_x))(params, tuple(xs))
    g_r = jax.grad(loss(mod_r))(params, tuple(xs))
    flat_x, _ = jax.tree_util.tree_flatten(g_x)
    flat_r, _ = jax.tree_util.tree_flatten(g_r)
    for a, b in zip(flat_x, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_scnet_rows_bf16_chain():
    """impl='rows_bf16' (bf16 HBM-resident chain) stays within a
    storage-rounding envelope of the f32 NHWC path — a few bf16 ulps per
    op through the chain, far below any orchestration error."""
    nf, groups = 16, 2
    xs = _pyramid(1, 16, 24, nf)
    mod_x = SCNet(nf, groups)
    mod_b = SCNet(nf, groups, impl="rows_bf16")
    params = mod_x.init(jax.random.PRNGKey(13), xs)["params"]
    ref = mod_x.apply({"params": params}, xs)
    got = mod_b.apply({"params": params}, xs)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert g.dtype == np.float32
        assert np.abs(g - r).max() < 8e-2 * np.abs(r).max()


def test_quad_kernel_matches_two_pairs():
    """conv3x3_quad_rows == pair(pair(x)) bit-for-bit in both chain dtypes
    (the intra-pair mids are bf16 in both paths; the y handoff uses the
    chain dtype; halo rows are recomputed with identical dot_generals)."""
    from fcvsr_tpu.ops.pallas_conv import (conv3x3_pair_rows,
                                           conv3x3_quad_rows, pad_to_rows,
                                           prep_weight)

    nf, h, w = 16, 20, 24
    ws = [prep_weight(jnp.asarray(
        RNG.standard_normal((3, 3, nf, nf)) * 0.2, jnp.float32))
        for _ in range(4)]
    b1 = jnp.asarray(RNG.standard_normal(nf) * 0.1, jnp.float32)
    b2 = jnp.asarray(RNG.standard_normal(nf) * 0.1, jnp.float32)
    x0 = jnp.asarray(RNG.standard_normal((2, h, w, nf)), jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        x = pad_to_rows(x0, 8).astype(dt)
        y_ref = conv3x3_pair_rows(x, ws[0], b1, ws[1], b2, h=h, w=w,
                                  ns1=0.1, tile_rows=8, interpret=True)
        out_ref = conv3x3_pair_rows(y_ref, ws[2], None, ws[3], None, h=h,
                                    w=w, ns1=0.2, tile_rows=8,
                                    interpret=True)
        y, out = conv3x3_quad_rows(x, ws[0], b1, ws[1], b2, ws[2], None,
                                   ws[3], None, h=h, w=w, ns1=0.1, ns3=0.2,
                                   tile_rows=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(y_ref, np.float32))
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(out_ref, np.float32))


def test_scnet_rows_quad_fuse_matches_pair():
    """fuse='quad' replays the pair chain bit-for-bit end-to-end and stays
    within the NHWC golden tolerance."""
    nf, groups = 16, 2
    xs = _pyramid(1, 16, 24, nf)
    mod, params = _init(nf, groups, xs)
    ref = mod.apply({"params": params}, xs)
    pair = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                            interpret=True, chain_dtype=jnp.bfloat16)
    quad = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                            interpret=True, chain_dtype=jnp.bfloat16,
                            fuse="quad")
    for p, q, r in zip(pair, quad, ref):
        np.testing.assert_array_equal(np.asarray(q), np.asarray(p))
        r = np.asarray(r)
        scale = np.abs(r).max()
        assert np.abs(np.asarray(q) - r).max() < 5e-2 * scale


def test_scnet_rows_downproj_resize_first():
    """downproj='resize_first' commutes the down 1x1 with the bilinear
    resize (linear maps on disjoint axes) — equal to conv_first up to fp
    accumulation order, and within the NHWC golden tolerance."""
    nf, groups = 16, 2
    xs = _pyramid(1, 16, 24, nf)
    mod, params = _init(nf, groups, xs)
    ref = mod.apply({"params": params}, xs)
    a = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                         interpret=True)
    b = scnet_rows_apply(params, xs, num_groups=groups, tile_rows=8,
                         interpret=True, downproj="resize_first")
    for pa, pb, r in zip(a, b, ref):
        pa, pb, r = np.asarray(pa), np.asarray(pb), np.asarray(r)
        scale = np.abs(r).max()
        assert np.abs(pb - pa).max() < 2e-4 * scale, \
            np.abs(pb - pa).max() / scale
        assert np.abs(pb - r).max() < 5e-2 * scale
