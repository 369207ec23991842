"""CHW-layout Pallas conv3x3 goldens (interpret mode) vs lax.conv.

The kernel computes in single-pass bf16 with f32 accumulation — the same
precision XLA's default NHWC conv uses on the TPU — so goldens compare
against a bf16-cast XLA conv and use tolerances at bf16 resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.ops.pallas_conv import (conv3x3_chw, nhwc_to_rows,
                                       prep_weight, rows_to_nhwc)

RNG = np.random.default_rng(11)


def _xla_conv(x, w, bias=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def _run(b=1, h=16, w=40, c=16, cout=16, bias=False, act=False, wp=128,
         tile_rows=8, mode="cat3"):
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    wgt = jnp.asarray(0.3 * RNG.standard_normal((3, 3, c, cout)), jnp.float32)
    bvec = jnp.asarray(0.1 * RNG.standard_normal((cout,)),
                       jnp.float32) if bias else None
    ref = _xla_conv(x, wgt, bvec)
    if act:
        ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    rows = nhwc_to_rows(x, wp)
    y = conv3x3_chw(rows, prep_weight(wgt, mode), bvec, act=act,
                    tile_rows=tile_rows, mode=mode, interpret=True)
    got = rows_to_nhwc(y, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # and in f32 terms the bf16 kernel must stay within bf16 resolution
    # of the true conv (guards against tap/edge miswiring that would pass
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


@pytest.mark.parametrize("mode", ["cat3", "cat9"])
def test_basic(mode):
    _run(mode=mode)


@pytest.mark.parametrize("mode", ["cat3", "cat9"])
def test_bias_and_act(mode):
    _run(bias=True, act=True, mode=mode)


def test_rect_cout():
    _run(c=16, cout=32)


def test_batch2_tiles():
    _run(b=2, h=32, w=100, tile_rows=16)


def test_width_at_wp_edge():
    # W + 2 close to Wp: the roll wraparound zone must stay out of the
    # valid columns
    _run(w=124, wp=128)


def test_edges_zero_padding():
    """Border semantics: a one-hot input at a corner must spread exactly
    like SAME zero padding."""
    h, w, c = 8, 24, 16
    x = np.zeros((1, h, w, c), np.float32)
    x[0, 0, 0, 3] = 1.0
    x[0, h - 1, w - 1, 5] = 2.0
    x = jnp.asarray(x)
    wgt = jnp.asarray(RNG.standard_normal((3, 3, c, c)), jnp.float32)
    ref = _xla_conv(x, wgt)
    y = conv3x3_chw(nhwc_to_rows(x, 128), prep_weight(wgt), tile_rows=8,
                    interpret=True)
    got = rows_to_nhwc(y, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
