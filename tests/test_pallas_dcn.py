"""Fused Pallas DCN goldens (interpret mode) vs the exact XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.ops.dcn import modulated_deform_conv2d
from fcvsr_tpu.ops.pallas_dcn import modulated_deform_conv2d_fused

RNG = np.random.default_rng(9)


def _inputs(b=1, h=16, w=32, c=16, dg=2, cout=16, off_scale=1.2, base=None):
    k = 9
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    off = RNG.uniform(-off_scale, off_scale, (b, h, w, dg * k * 2))
    if base is not None:
        off = off + np.tile(np.asarray(base), dg * k)[None, None, None, :]
    offset = jnp.asarray(off, jnp.float32)
    mask = jnp.asarray(RNG.uniform(0, 1, (b, h, w, dg * k)), jnp.float32)
    weight = jnp.asarray(0.2 * RNG.standard_normal((3, 3, c, cout)),
                         jnp.float32)
    bias = jnp.asarray(0.1 * RNG.standard_normal((cout,)), jnp.float32)
    return x, offset, mask, weight, bias


@pytest.mark.parametrize("with_mask", [True, False])
def test_fused_dcn_small_offsets(with_mask):
    x, offset, mask, weight, bias = _inputs()
    m = mask if with_mask else None
    ref = modulated_deform_conv2d(x, offset, m, weight, bias,
                                  deform_groups=2)
    got = modulated_deform_conv2d_fused(x, offset, m, weight, bias,
                                        deform_groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_dcn_large_uniform_offset():
    """A large shared offset is absorbed by the per-tile base."""
    x, offset, mask, weight, bias = _inputs(off_scale=0.8, base=(6.4, -4.7))
    ref = modulated_deform_conv2d(x, offset, mask, weight, bias,
                                  deform_groups=2)
    got = modulated_deform_conv2d_fused(x, offset, mask, weight, bias,
                                        deform_groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_dcn_batch2():
    x, offset, mask, weight, bias = _inputs(b=2)
    ref = modulated_deform_conv2d(x, offset, mask, weight, bias,
                                  deform_groups=2)
    got = modulated_deform_conv2d_fused(x, offset, mask, weight, bias,
                                        deform_groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_dcn_unsupported_falls_back():
    """stride 2 routes to the exact XLA path (identical results)."""
    x, offset, mask, weight, bias = _inputs(h=16, w=16)
    offset8 = offset[:, ::2, ::2]
    mask8 = mask[:, ::2, ::2]
    ref = modulated_deform_conv2d(x, offset8, mask8, weight, bias, stride=2,
                                  deform_groups=2)
    got = modulated_deform_conv2d_fused(x, offset8, mask8, weight, bias,
                                        stride=2, deform_groups=2,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_set_dcn_impl_routes_and_restores():
    """set_dcn_impl('pallas') routes the public entry through the fused
    kernel (interpret on CPU) and the unsupported-config fallback does not
    recurse."""
    from fcvsr_tpu.ops import dcn as dcn_mod

    x, offset, mask, weight, bias = _inputs()
    ref = modulated_deform_conv2d(x, offset, mask, weight, bias,
                                  deform_groups=2)
    dcn_mod.set_dcn_impl("pallas")
    try:
        got = modulated_deform_conv2d(x, offset, mask, weight, bias,
                                      deform_groups=2)
        # stride-2 exercises the in-fused fallback path
        off8, m8 = offset[:, ::2, ::2], mask[:, ::2, ::2]
        fb = modulated_deform_conv2d(x, off8, m8, weight, bias, stride=2,
                                     deform_groups=2)
        assert np.isfinite(np.asarray(fb)).all()
    finally:
        dcn_mod.set_dcn_impl("gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_dcn_odd_height():
    """Heights not divisible by 8 (EDVR pyramid levels 92/46) are padded to
    the tile grid and sliced back."""
    x, offset, mask, weight, bias = _inputs(h=12, w=24)
    ref = modulated_deform_conv2d(x, offset, mask, weight, bias,
                                  deform_groups=2)
    got = modulated_deform_conv2d_fused(x, offset, mask, weight, bias,
                                        deform_groups=2, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_dcn_under_vmap():
    """nn.vmap'd DCN calls (EDVR PCD over frames) fold into the kernel's
    batch grid via the custom_vmap rule."""
    x, offset, mask, weight, bias = _inputs()
    xs = jnp.stack([x, x * 0.5])
    offs = jnp.stack([offset, offset * 0.8])
    masks = jnp.stack([mask, mask])

    ref = jnp.stack([
        modulated_deform_conv2d(xs[i], offs[i], masks[i], weight, bias,
                                deform_groups=2) for i in range(2)])
    got = jax.vmap(
        lambda a, o, m: modulated_deform_conv2d_fused(
            a, o, m, weight, bias, deform_groups=2, interpret=True)
    )(xs, offs, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_dcn_dg16():
    """BasicVSR++ geometry: deform_groups=16 at c=64 (cg=4)."""
    x, offset, mask, weight, bias = _inputs(c=64, dg=16, cout=64)
    ref = modulated_deform_conv2d(x, offset, mask, weight, bias,
                                  deform_groups=16)
    got = modulated_deform_conv2d_fused(x, offset, mask, weight, bias,
                                        deform_groups=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=5e-4)


@pytest.mark.slow
def test_basicvsr_pp_model_level_pallas_dcn():
    """BasicVSR++ (deform_groups=16 under nn.scan) forward with
    set_dcn_impl('pallas') tracks the gather model (interpret on CPU)."""
    from fcvsr_tpu.models.basicvsr_pp import BasicVSRPlusPlus
    from fcvsr_tpu.ops import dcn as dcn_mod

    m = BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 3, 3, 64, 64)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    dcn_mod.set_dcn_impl("pallas")
    try:
        got = m.apply(params, x)
    finally:
        dcn_mod.set_dcn_impl("gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("with_mask", [True, False])
def test_fused_dcn_grad_matches_gather(with_mask):
    """set_dcn_impl('pallas') is legal under jax.grad: the custom VJP pairs
    the fused forward with the exact gather-path backward, so for the op in
    isolation (a linear loss, so the cotangent does not depend on the
    forward's bounded deviation) the gradients match the gather path."""
    from fcvsr_tpu.ops import dcn as dcn_mod

    x, offset, mask, weight, bias = _inputs()
    m = mask if with_mask else None
    v = jnp.asarray(RNG.standard_normal(x.shape[:3] + (weight.shape[-1],)),
                    jnp.float32)

    def loss(impl):
        def f(xx, oo, mm, ww, bb):
            dcn_mod.set_dcn_impl(impl)
            try:
                out = modulated_deform_conv2d(xx, oo, mm, ww, bb,
                                              deform_groups=2)
            finally:
                dcn_mod.set_dcn_impl("gather")
            return jnp.vdot(out, v)
        return f

    args = (x, offset, m, weight, bias)
    argnums = (0, 1, 3, 4) if m is None else (0, 1, 2, 3, 4)
    g_ref = jax.grad(loss("gather"), argnums)(*args)
    g_pal = jax.grad(loss("pallas"), argnums)(*args)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5)
