"""Batched sliding-window inference + bf16 mode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.models.inference import sliding_window_sr
from fcvsr_tpu.utils.precision import bf16_apply, cast_params


@pytest.fixture(scope="module")
def small():
    m = FCVSRNet.small(in_channels=1)
    x = jnp.zeros((1, 7, 1, 16, 16), jnp.float32)
    return m, m.init(jax.random.PRNGKey(0), x)


def test_batched_windows_match_per_frame(small):
    model, params = small
    rng = np.random.default_rng(0)
    clip = rng.uniform(0, 1, (5, 16, 16, 1)).astype(np.float32)
    batched = sliding_window_sr(model, params, clip, batch_windows=4)
    assert batched.shape == (5, 64, 64, 1)

    from fcvsr_tpu.data.pipelines import padded_window_indices

    for i in [0, 2, 4]:
        idx = padded_window_indices(i, 5, 7)
        win = np.transpose(clip[idx], (0, 3, 1, 2))[None]
        single = np.asarray(model.apply(params, jnp.asarray(win)))[0]
        np.testing.assert_allclose(batched[i], np.transpose(single, (1, 2, 0)),
                                   atol=1e-5)


def test_bf16_apply_close_to_f32(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 7, 1, 16, 16)),
                    jnp.float32)
    f32 = np.asarray(model.apply(params, x))
    b16 = np.asarray(bf16_apply(model, params, x))
    assert b16.dtype == np.float32
    # bf16 conv noise stays small relative to [0,1] pixel range
    assert np.abs(b16 - f32).mean() < 0.02


def test_cast_params_dtypes(small):
    _, params = small
    p16 = cast_params(params)
    leaves = jax.tree.leaves(p16)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)


def test_bf16_tail_bounded_deviation(small):
    """tail_dtype='bf16' (deployment tail) shares the f32 param tree and
    stays within the --fast bounded-deviation contract."""
    import dataclasses

    model, params = small
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 7, 1, 16, 16)),
                    jnp.float32)
    m16 = dataclasses.replace(model, tail_dtype="bf16")
    # same param tree: init must produce identical shapes/dtypes
    p16 = m16.init(jax.random.PRNGKey(0), x)
    chex = jax.tree.map(lambda a, b: a.shape == b.shape
                        and a.dtype == b.dtype, params, p16)
    assert all(jax.tree.leaves(chex))

    f32 = np.asarray(model.apply(params, x))
    b16 = np.asarray(m16.apply(params, x))
    assert b16.dtype == np.float32
    d = np.abs(b16 - f32)
    # storage rounding only: the same bound class as scnet rows_bf16
    assert d.max() < 0.02 and d.mean() < 2e-3


def test_bf16_tail_with_rows_convlast(small):
    """The full deployment tail combination (bf16 tail + rows conv_last0
    via warp_impl='pallas') runs under jit on the CPU mesh and stays
    bounded vs the exact path."""
    import dataclasses

    model, params = small
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 7, 1, 16, 16)),
                    jnp.float32)
    mdep = dataclasses.replace(model, warp_impl="pallas", batch_mgaa=True,
                               tail_dtype="bf16")
    f32 = np.asarray(model.apply(params, x))
    dep = np.asarray(jax.jit(mdep.apply)(params, x))
    d = np.abs(dep - f32)
    # pallas IAC bounded deviation + bf16 storage rounding
    assert d.max() < 0.05 and d.mean() < 5e-3


def test_bf16_mffr_bounded_deviation(small):
    """mffr_dtype='bf16' (bf16 band split + DivEnh chain) shares the f32
    param tree and stays within the --fast bounded-deviation contract."""
    import dataclasses

    model, params = small
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 7, 1, 16, 16)),
                    jnp.float32)
    m16 = dataclasses.replace(model, mffr_dtype="bf16")
    p16 = m16.init(jax.random.PRNGKey(0), x)
    chex = jax.tree.map(lambda a, b: a.shape == b.shape
                        and a.dtype == b.dtype, params, p16)
    assert all(jax.tree.leaves(chex))

    f32 = np.asarray(model.apply(params, x))
    b16 = np.asarray(m16.apply(params, x))
    assert b16.dtype == np.float32
    d = np.abs(b16 - f32)
    # bf16 DFT/storage rounding through a residual-bounded module
    assert d.max() < 0.02 and d.mean() < 2e-3


def test_split_freq_bf16_close_to_f32():
    """split_freq(compute_dtype=bf16) returns bf16 bands whose sum still
    reconstructs the input to bf16 tolerance (both fft and dft impls)."""
    from fcvsr_tpu.ops.freq import set_fft_impl, split_freq

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 12, 16, 4)), jnp.float32)
    for impl in ("fft", "dft"):
        set_fft_impl(impl)
        try:
            ref = np.asarray(split_freq(x, 4))
            got = split_freq(x, 4, compute_dtype=jnp.bfloat16)
            assert got.dtype == jnp.bfloat16
            d = np.abs(np.asarray(got, np.float32) - ref)
            assert d.max() < 0.05, (impl, d.max())
        finally:
            set_fft_impl("auto")
