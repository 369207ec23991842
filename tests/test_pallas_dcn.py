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


def _grads_vs_gather(setter_args, args, argnums, rtol=2e-4, atol=2e-4):
    """jax.grad through the pallas impl with the FUSED backward vs the
    gather impl (exact autodiff).  Offsets stay within the window radius
    so the fused forward's clamps are inactive and its adjoint must match
    the gather VJP to fp tolerance.

    NOTE: the impl/bwd flags are held across the WHOLE jax.grad call — a
    finally-reset inside the traced function runs at forward-trace time,
    BEFORE the custom_vjp bwd rule is traced, silently restoring the
    gather backward (found the hard way: such goldens pass trivially).
    A spy asserts the fused VJP actually executed."""
    import fcvsr_tpu.ops.pallas_dcn as pdcn
    from fcvsr_tpu.ops import dcn as dcn_mod

    x, offset, m, weight, bias, dg = args
    v = jnp.asarray(RNG.standard_normal(x.shape[:3] + (weight.shape[-1],)),
                    jnp.float32)

    def f(xx, oo, mm, ww, bb):
        out = modulated_deform_conv2d(xx, oo, mm, ww, bb, deform_groups=dg)
        return jnp.vdot(out, v)

    fargs = (x, offset, m, weight, bias)
    g_ref = jax.grad(f, argnums)(*fargs)

    calls = {"n": 0}
    orig = pdcn.modulated_deform_conv2d_fused_vjp

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    dcn_mod.set_dcn_impl("pallas")
    dcn_mod.set_dcn_bwd("fused")
    pdcn.modulated_deform_conv2d_fused_vjp = spy
    try:
        # dcn._fused_diff_bwd imports the vjp from pallas_dcn at call time,
        # so patching the pallas_dcn attribute is sufficient
        g_fus = jax.grad(f, argnums)(*fargs)
    finally:
        pdcn.modulated_deform_conv2d_fused_vjp = orig
        dcn_mod.set_dcn_impl("gather")
        dcn_mod.set_dcn_bwd("gather")
    assert calls["n"] >= 1, "fused VJP was never executed"
    names = (["dx", "doffset", "dmask", "dweight", "dbias"] if m is not None
             else ["dx", "doffset", "dweight", "dbias"])
    for name, gr, gf in zip(names, g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=rtol, atol=atol,
            err_msg=f"{name} mismatch")


@pytest.mark.parametrize("with_mask", [True, False])
def test_fused_bwd_grads_match_gather(with_mask):
    x, offset, mask, weight, bias = _inputs()
    m = mask if with_mask else None
    argnums = (0, 1, 3, 4) if m is None else (0, 1, 2, 3, 4)
    _grads_vs_gather(None, (x, offset, m, weight, bias, 2), argnums)


def test_fused_bwd_large_uniform_offset():
    """The per-tile base absorbs a large shared offset in the backward the
    same way it does in the forward."""
    x, offset, mask, weight, bias = _inputs(off_scale=0.8, base=(6.4, -4.7))
    _grads_vs_gather(None, (x, offset, mask, weight, bias, 2),
                     (0, 1, 2, 3, 4))


def test_fused_bwd_batch2_and_odd_height():
    x, offset, mask, weight, bias = _inputs(b=2, h=12, w=24)
    _grads_vs_gather(None, (x, offset, mask, weight, bias, 2),
                     (0, 1, 2, 3, 4))


def test_fused_bwd_dg16():
    """BasicVSR++ geometry (dg=16, cg=4) exercises the expand_dg path and
    its grad un-expansion (per-group sums over the channel blocks)."""
    x, offset, mask, weight, bias = _inputs(c=64, dg=16, cout=64)
    _grads_vs_gather(None, (x, offset, mask, weight, bias, 16),
                     (0, 1, 2, 3, 4), rtol=5e-4, atol=5e-4)


def test_fused_bwd_under_vmap():
    """grad-of-vmap folds the backward into the kernel batch grid (dW
    comes back per example, so the fold is exact for shared weights)."""
    from fcvsr_tpu.ops import dcn as dcn_mod

    x, offset, mask, weight, bias = _inputs()
    xs = jnp.stack([x, x * 0.5])
    offs = jnp.stack([offset, offset * 0.8])
    masks = jnp.stack([mask, mask * 0.9])
    v = jnp.asarray(RNG.standard_normal((2,) + x.shape[:3]
                                        + (weight.shape[-1],)), jnp.float32)

    def f(xx, oo, mm, ww):
        out = jax.vmap(lambda a, o, m: modulated_deform_conv2d(
            a, o, m, ww, bias, deform_groups=2))(xx, oo, mm)
        return jnp.vdot(out, v)

    g_ref = jax.grad(f, (0, 1, 2, 3))(xs, offs, masks, weight)
    dcn_mod.set_dcn_impl("pallas")
    dcn_mod.set_dcn_bwd("fused")
    try:
        g_fus = jax.grad(f, (0, 1, 2, 3))(xs, offs, masks, weight)
    finally:
        dcn_mod.set_dcn_impl("gather")
        dcn_mod.set_dcn_bwd("gather")
    for name, gr, gf in zip(["dx", "doffset", "dmask", "dweight"],
                            g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"{name} mismatch")


def test_fused_bwd_unsupported_falls_back():
    """stride-2 configs route the backward to the exact gather VJP."""
    from fcvsr_tpu.ops import dcn as dcn_mod

    x, offset, mask, weight, bias = _inputs(h=16, w=16)
    off8, m8 = offset[:, ::2, ::2], mask[:, ::2, ::2]

    def f(xx):
        out = modulated_deform_conv2d(xx, off8, m8, weight, bias,
                                      stride=2, deform_groups=2)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(f)(x)
    dcn_mod.set_dcn_impl("pallas")
    dcn_mod.set_dcn_bwd("fused")
    try:
        g_fus = jax.grad(f)(x)
    finally:
        dcn_mod.set_dcn_impl("gather")
        dcn_mod.set_dcn_bwd("gather")
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref), atol=0)


@pytest.mark.slow
def test_tdan_train_step_fused_bwd():
    """One real optimizer step on TDAN with the fully-fused DCN (pallas
    forward + fused adjoint backward, interpret on CPU): loss is finite,
    params move, and the step's loss matches the gather path (the
    train.py --fast routing for DCN families)."""
    import optax

    from fcvsr_tpu.models.iconvsr import TDANNet
    from fcvsr_tpu.ops import dcn as dcn_mod

    m = TDANNet(mid_channels=8, num_blocks_before_align=1,
                num_blocks_after_align=1)
    lrs = jnp.asarray(RNG.uniform(0, 1, (1, 5, 3, 16, 16)), jnp.float32)
    gt = jnp.asarray(RNG.uniform(0, 1, (1, 3, 64, 64)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), lrs)

    def loss_fn(p):
        sr, _ = m.apply(p, lrs)
        return jnp.mean(jnp.sqrt((sr - gt) ** 2 + 1e-6))

    def one_step(impl, bwd):
        dcn_mod.set_dcn_impl(impl)
        dcn_mod.set_dcn_bwd(bwd)
        try:
            loss, grads = jax.value_and_grad(loss_fn)(params)
            tx = optax.adam(1e-4)
            upd, _ = tx.update(grads, tx.init(params), params)
            new_p = optax.apply_updates(params, upd)
            loss = np.asarray(loss)  # force eval while the flags hold
            new_p = jax.tree_util.tree_map(np.asarray, new_p)
        finally:
            dcn_mod.set_dcn_impl("gather")
            dcn_mod.set_dcn_bwd("gather")
        return loss, new_p

    l_ref, p_ref = one_step("gather", "gather")
    l_fus, p_fus = one_step("pallas", "fused")
    assert np.isfinite(l_fus)
    np.testing.assert_allclose(l_fus, l_ref, rtol=1e-3)
    dev = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p_ref, p_fus)
    # fused and gather steps land on (numerically) the same update
    assert max(jax.tree_util.tree_leaves(dev)) < 1e-5
