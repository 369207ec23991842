"""Polyphase fold identity tests: conv(PS(x)) == PS(conv_folded(x))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models.blocks import pixel_shuffle
from fcvsr_tpu.ops.psfold import (block_to_interleaved_perm,
                                  conv_folded_phase2,
                                  conv_folded_phase2_blocked,
                                  conv_folded_tapmajor, fold_ps_bias,
                                  fold_ps_conv)

RNG = np.random.default_rng(11)


def _conv(x, k, bias=None):
    pad = (k.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if bias is None else y + bias


@pytest.mark.parametrize("k,r,cin,cout", [(3, 2, 8, 4), (1, 2, 8, 4),
                                          (3, 2, 4, 12), (3, 4, 16, 2)])
def test_fold_identity(k, r, cin, cout):
    x = jnp.asarray(RNG.standard_normal((2, 6, 5, cin * r * r)), jnp.float32)
    kern = jnp.asarray(RNG.standard_normal((k, k, cin, cout)), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((cout,)), jnp.float32)

    ref = _conv(pixel_shuffle(x, r), kern, bias)
    got = pixel_shuffle(_conv(x, fold_ps_conv(kern, r),
                              fold_ps_bias(bias, r)), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_nests():
    """Folding twice == conv after two nested shuffles (the conv_last0
    double fold down to (H, W))."""
    r, cin, cout = 2, 2, 3
    x = jnp.asarray(RNG.standard_normal((1, 5, 4, cin * 16)), jnp.float32)
    kern = jnp.asarray(RNG.standard_normal((3, 3, cin, cout)), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((cout,)), jnp.float32)

    ref = _conv(pixel_shuffle(pixel_shuffle(x, r), r), kern, bias)
    folded2 = fold_ps_conv(fold_ps_conv(kern, r), r)
    got = pixel_shuffle(pixel_shuffle(
        _conv(x, folded2, fold_ps_bias(fold_ps_bias(bias, r), r)), r), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout", [(8, 4), (4, 12)])
def test_conv_folded_phase2_exact(cin, cout):
    """Per-phase 2x2 convs == the dense folded conv (same taps; the
    backend may reassociate the channel reduction differently)."""
    x = jnp.asarray(RNG.standard_normal((2, 7, 6, cin * 4)), jnp.float32)
    kern = fold_ps_conv(
        jnp.asarray(RNG.standard_normal((3, 3, cin, cout)), jnp.float32), 2)
    bias = fold_ps_bias(
        jnp.asarray(RNG.standard_normal((cout,)), jnp.float32), 2)

    ref = _conv(x, kern, bias)
    got = conv_folded_phase2(x, kern, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout", [(8, 4), (4, 12)])
def test_conv_folded_phase2_blocked_exact(cin, cout):
    """Block-layout phase split == dense folded conv after undoing the
    block permutation (VERDICT r4 #2: the interleave rides the consumer's
    weights, never the activation tensor)."""
    x = jnp.asarray(RNG.standard_normal((2, 7, 6, cin * 4)), jnp.float32)
    kern = fold_ps_conv(
        jnp.asarray(RNG.standard_normal((3, 3, cin, cout)), jnp.float32), 2)
    bias = fold_ps_bias(
        jnp.asarray(RNG.standard_normal((cout,)), jnp.float32), 2)

    ref = _conv(x, kern, bias)
    blk = conv_folded_phase2_blocked(x, kern, bias)
    perm = block_to_interleaved_perm(4 * cout)
    # blocked[..., k] == interleaved[..., perm[k]]
    np.testing.assert_allclose(np.asarray(blk),
                               np.asarray(ref[..., perm]),
                               rtol=1e-5, atol=1e-5)


def test_blocked_chain_tapmajor_matches_dense():
    """The full phase-blocked pair (phase2_blocked -> weight-permuted
    tap-major conv_last0) == the dense folded pair — the exact composition
    FCVSRNet(tail_impl='folded_pb') runs."""
    cin, cmid, cout = 6, 4, 1
    x = jnp.asarray(RNG.standard_normal((1, 8, 9, cin * 4)), jnp.float32)
    k2 = fold_ps_conv(
        jnp.asarray(RNG.standard_normal((3, 3, cin, cmid * 4)), jnp.float32),
        2)
    b2 = fold_ps_bias(
        jnp.asarray(RNG.standard_normal((cmid * 4,)), jnp.float32), 2)
    kl = fold_ps_conv(fold_ps_conv(
        jnp.asarray(RNG.standard_normal((3, 3, cmid, cout)), jnp.float32),
        2), 2)
    bl = fold_ps_bias(fold_ps_bias(
        jnp.asarray(RNG.standard_normal((cout,)), jnp.float32), 2), 2)

    ref = _conv(jax.nn.relu(_conv(x, k2, b2)), kl, bl)
    blk = jax.nn.relu(conv_folded_phase2_blocked(x, k2, b2))
    perm = block_to_interleaved_perm(k2.shape[3])
    got = conv_folded_tapmajor(blk, kl[:, :, perm, :], bl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cin,cout", [(8, 1), (4, 3)])
def test_conv_folded_tapmajor_exact(cin, cout):
    """Taps matmul + shifted adds == the dense doubly-folded conv (fp
    reassociation tolerance only)."""
    x = jnp.asarray(RNG.standard_normal((2, 7, 6, cin * 16)), jnp.float32)
    kern = fold_ps_conv(fold_ps_conv(
        jnp.asarray(RNG.standard_normal((3, 3, cin, cout)), jnp.float32),
        2), 2)
    bias = fold_ps_bias(fold_ps_bias(
        jnp.asarray(RNG.standard_normal((cout,)), jnp.float32), 2), 2)

    ref = _conv(x, kern, bias)
    got = conv_folded_tapmajor(x, kern, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_model_folded_tail_matches_standard():
    """FCVSRNet(tail_impl='folded') == standard tail (same params, f32,
    exact path) to fp-reassociation tolerance."""
    import dataclasses

    from fcvsr_tpu.models import FCVSRNet

    for model in [FCVSRNet.small(in_channels=1),  # up_ksize=1 fold
                  FCVSRNet(in_channels=1, ac_num=2, freq_inv=2,
                           sc_groups=1)]:          # up_ksize=3 fold
        x = jnp.asarray(RNG.uniform(0, 1, (1, 7, model.in_channels, 16, 16)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(model.apply(params, x))
        for impl in ("folded", "folded_pb"):
            got = np.asarray(dataclasses.replace(model, tail_impl=impl)
                             .apply(params, x))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                       err_msg=impl)


def test_model_folded_tail_grads():
    """Training through the folded tail: grads exist and match the
    standard tail closely (same function, fp reassociation only)."""
    import dataclasses

    from fcvsr_tpu.models import FCVSRNet

    model = FCVSRNet.small(in_channels=1)
    m_f = dataclasses.replace(model, tail_impl="folded")
    x = jnp.asarray(RNG.uniform(0, 1, (1, 7, 1, 16, 16)), jnp.float32)
    gt = jnp.asarray(RNG.uniform(0, 1, (1, 1, 64, 64)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.mean(jnp.abs(m.apply(p, x) - gt))

    g_ref = jax.grad(loss(model))(params)
    g_fold = jax.grad(loss(m_f))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)
