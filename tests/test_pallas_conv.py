"""Chain-resident rows-layout Pallas conv3x3 goldens (interpret mode).

The kernel computes in single-pass bf16 with f32 accumulation — the same
precision XLA's default NHWC conv uses on the TPU — so goldens compare
against a bf16-cast XLA conv, plus an f32 sanity bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.ops.pallas_conv import (ROW_OFF, conv3x3_rows, pad_to_rows,
                                       prep_weight, rows_geometry,
                                       rows_to_nhwc)

RNG = np.random.default_rng(11)


def _xla_conv(x, w, bias=None, act=False):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    if act:
        out = jnp.where(out >= 0, out, 0.2 * out)
    return out


def _run(b=1, h=16, w=40, c=16, cout=16, bias=False, act=False,
         tile_rows=8, mode="cat3"):
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    wgt = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, cout)), jnp.float32)
    bvec = jnp.asarray(0.1 * RNG.standard_normal((cout,)),
                       jnp.float32) if bias else None
    ref = _xla_conv(x, wgt, bvec, act)
    rows = pad_to_rows(x, tile_rows)
    y = conv3x3_rows(rows, prep_weight(wgt, mode), bvec, h=h, w=w, act=act,
                     tile_rows=tile_rows, mode=mode, interpret=True)
    # the zero ring must be re-established everywhere outside the data
    yz = np.asarray(y).copy()
    yz[:, ROW_OFF : ROW_OFF + h, :, 1 : 1 + w] = 0.0
    assert np.abs(yz).max() == 0.0
    got = rows_to_nhwc(y, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # f32 sanity bound (guards against tap/edge miswiring that would pass
    # a loose comparison against an equally-wrong reference)
    dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    true = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "SAME", dimension_numbers=dn)
    if bvec is not None:
        true = true + bvec
    if act:
        true = jnp.where(true >= 0, true, 0.2 * true)
    err = np.abs(np.asarray(got) - np.asarray(true)).max()
    assert err < 0.15, err


@pytest.mark.parametrize("mode", ["cat3", "cat9", "mstack", "mstack2"])
def test_basic(mode):
    _run(mode=mode)


@pytest.mark.parametrize("mode", ["cat3", "cat9", "mstack", "mstack2"])
def test_bias_and_act(mode):
    _run(bias=True, act=True, mode=mode)


def test_rect_cout():
    _run(c=16, cout=32)


def test_batch2_tiles():
    _run(b=2, h=32, w=100, tile_rows=16)


def test_odd_height():
    # H not a tile multiple: the boundary tile mixes data and masked rows
    _run(h=23, w=30, tile_rows=8)


def test_chain_two_convs():
    """Two chained rows-layout convs equal two chained XLA convs — the
    zero ring written by call 1 must be a correct halo for call 2."""
    h, w, c = 24, 44, 16
    x = jnp.asarray(RNG.standard_normal((1, h, w, c)), jnp.float32)
    w1 = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, c)), jnp.float32)
    w2 = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, c)), jnp.float32)
    ref = _xla_conv(_xla_conv(x, w1, act=True).astype(jnp.float32), w2)
    y = conv3x3_rows(pad_to_rows(x, 8), prep_weight(w1), h=h, w=w,
                     act=True, neg_slope=0.2, tile_rows=8, interpret=True)
    y = conv3x3_rows(y, prep_weight(w2), h=h, w=w, tile_rows=8,
                     interpret=True)
    got = rows_to_nhwc(y, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_edges_zero_padding():
    """Border semantics: one-hot inputs at corners must spread exactly
    like SAME zero padding."""
    h, w, c = 8, 24, 16
    x = np.zeros((1, h, w, c), np.float32)
    x[0, 0, 0, 3] = 1.0
    x[0, h - 1, w - 1, 5] = 2.0
    x = jnp.asarray(x)
    wgt = jnp.asarray(RNG.standard_normal((3, 3, c, c)), jnp.float32)
    ref = _xla_conv(x, wgt)
    y = conv3x3_rows(pad_to_rows(x, 8), prep_weight(wgt), h=h, w=w,
                     tile_rows=8, interpret=True)
    got = rows_to_nhwc(y, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_geometry_last_data_tile_unclamped():
    """rows_geometry must leave the last data tile's DMA base unclamped
    (a clamp there would silently shift the window)."""
    for h in (16, 23, 68, 136, 272, 271):
        for th in (8, 16):
            hp, _ = rows_geometry(h, 30, th)
            t0_last_data = ((ROW_OFF + h - 1) // th) * th
            assert t0_last_data - 1 <= hp - (th + 2), (h, th)
            assert hp % th == 0 and hp >= ROW_OFF + h + 1


def test_fused_residual():
    """res= adds a rows tensor before the activation (the group-residual
    fusion in scnet_rows): conv(x) + res == conv3x3_rows(..., res=res)."""
    h, w, c = 24, 44, 16
    x = jnp.asarray(RNG.standard_normal((1, h, w, c)), jnp.float32)
    r = jnp.asarray(RNG.standard_normal((1, h, w, c)), jnp.float32)
    wgt = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, c)), jnp.float32)
    for act in (False, True):
        ref = _xla_conv(x, wgt).astype(jnp.float32) + r
        if act:
            ref = jnp.where(ref >= 0, ref, 0.2 * ref)
        y = conv3x3_rows(pad_to_rows(x, 8), prep_weight(wgt),
                         res=pad_to_rows(r, 8), h=h, w=w, act=act,
                         tile_rows=8, interpret=True)
        got = rows_to_nhwc(y, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)
        # ring must stay zero even though res pollutes nothing here
        yz = np.asarray(y).copy()
        yz[:, ROW_OFF : ROW_OFF + h, :, 1 : 1 + w] = 0.0
        assert np.abs(yz).max() == 0.0


def test_nhwc_wrapper_cout1():
    """conv3x3_rows_nhwc at the conv_last0 shape class (C_out=1, bias):
    matches the XLA conv at serving precision, exact-path gradients, and
    folds a vmapped axis into the kernel batch grid."""
    from fcvsr_tpu.ops.pallas_conv import conv3x3_rows_nhwc

    h, w, c = 24, 40, 16
    x = jnp.asarray(RNG.standard_normal((2, h, w, c)), jnp.float32)
    wgt = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, 1)), jnp.float32)
    bvec = jnp.asarray([0.05], jnp.float32)

    got = conv3x3_rows_nhwc(x, wgt, bvec, "mstack", True)
    ref = _xla_conv(x, wgt, bvec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    # exact-path gradients: with a FIXED upstream cotangent the custom
    # VJP must match the XLA conv VJP bit-level (both run the exact conv
    # backward at the same primals; only the primal output is bf16-rounded)
    ct = jnp.asarray(RNG.standard_normal(got.shape), jnp.float32)

    def ref_fn(a, k, b):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    _, vjp_rows = jax.vjp(
        lambda a, k, b: conv3x3_rows_nhwc(a, k, b, "mstack", True),
        x, wgt, bvec)
    _, vjp_ref = jax.vjp(ref_fn, x, wgt, bvec)
    for gr, gf in zip(vjp_rows(ct), vjp_ref(ct)):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=1e-6, atol=1e-6)

    # vmap folds into the batch grid (ETC mode)
    xv = jnp.asarray(RNG.standard_normal((3, 2, h, w, c)), jnp.float32)
    got_v = jax.vmap(lambda a: conv3x3_rows_nhwc(a, wgt, bvec, "mstack",
                                                 True))(xv)
    got_seq = jnp.stack([conv3x3_rows_nhwc(xv[i], wgt, bvec, "mstack", True)
                         for i in range(3)])
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(got_seq),
                               rtol=1e-6, atol=1e-6)


def test_conv2d_rows_impl_matches_xla():
    """Conv2d(impl='rows') serves the same params/computation as the
    default impl (bf16 serving tolerance) — the conv_last0 routing."""
    from fcvsr_tpu.models.blocks import Conv2d

    x = jnp.asarray(RNG.standard_normal((1, 24, 40, 16)), jnp.float32)
    mod_x = Conv2d(1, 3)
    mod_r = Conv2d(1, 3, impl="rows")
    params = mod_x.init(jax.random.PRNGKey(0), x)
    y_x = mod_x.apply(params, x)
    y_r = mod_r.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_x),
                               rtol=2e-2, atol=2e-2)


def _pair_ref(x, w1, b1, w2, b2, ns1):
    y = _xla_conv(x, w1, b1)
    y = jnp.where(y >= 0, y, ns1 * y).astype(jnp.float32)
    return _xla_conv(y, w2, b2)


@pytest.mark.parametrize("bias,ns1,th", [(False, 0.2, 8), (True, 0.1, 8),
                                         (True, 0.2, 16)])
def test_pair_fused(bias, ns1, th):
    """conv3x3_pair_rows == conv2(lrelu(conv1(x))) (the SCNet body0/body1
    fusion; the intermediate's VMEM halo recompute must match the
    separate-kernel chaining exactly)."""
    from fcvsr_tpu.ops.pallas_conv import conv3x3_pair_rows

    h, w, c, c1, cout = 23, 44, 16, 32, 16
    x = jnp.asarray(RNG.standard_normal((1, h, w, c)), jnp.float32)
    w1 = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, c1)), jnp.float32)
    w2 = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c1, cout)), jnp.float32)
    b1 = jnp.asarray(0.1 * RNG.standard_normal((c1,)),
                     jnp.float32) if bias else None
    b2 = jnp.asarray(0.1 * RNG.standard_normal((cout,)),
                     jnp.float32) if bias else None
    ref = _pair_ref(x, w1, b1, w2, b2, ns1)
    y = conv3x3_pair_rows(pad_to_rows(x, th), prep_weight(w1), b1,
                          prep_weight(w2), b2, h=h, w=w, ns1=ns1,
                          tile_rows=th, interpret=True)
    yz = np.asarray(y).copy()
    yz[:, ROW_OFF : ROW_OFF + h, :, 1 : 1 + w] = 0.0
    assert np.abs(yz).max() == 0.0
    got = rows_to_nhwc(y, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_pair_matches_two_kernels_batch2():
    """Pair kernel == two conv3x3_rows calls on the same rows input (the
    in-chain replacement contract), incl. batch grid and a bf16 chain."""
    from fcvsr_tpu.ops.pallas_conv import conv3x3_pair_rows

    h, w, c = 24, 30, 16
    x = jnp.asarray(RNG.standard_normal((2, h, w, c)), jnp.float32)
    w1 = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, c)), jnp.float32)
    w2 = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, c)), jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        rows = pad_to_rows(x, 8).astype(dt)
        a = conv3x3_rows(rows, prep_weight(w1), h=h, w=w, act=True,
                         neg_slope=0.2, tile_rows=8, interpret=True)
        a = conv3x3_rows(a, prep_weight(w2), h=h, w=w, tile_rows=8,
                         interpret=True)
        p = conv3x3_pair_rows(rows, prep_weight(w1), None, prep_weight(w2),
                              None, h=h, w=w, ns1=0.2, tile_rows=8,
                              interpret=True)
        tol = 5e-2 if dt == jnp.bfloat16 else 2e-2
        np.testing.assert_allclose(
            np.asarray(rows_to_nhwc(p.astype(jnp.float32), h, w)),
            np.asarray(rows_to_nhwc(a.astype(jnp.float32), h, w)),
            rtol=tol, atol=tol)
