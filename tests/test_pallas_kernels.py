"""Pallas kernel tests (interpret mode on CPU) against the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from fcvsr_tpu.ops.pallas_kernels import _sac_pallas
from fcvsr_tpu.ops.sac import sac as sac_xla


def test_sac_fused_matches_xla():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 12, 16, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((b, h, w, c * 3)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((b, h, w, c * 3)), jnp.float32)
    for bug in (True, False):
        got = np.asarray(_sac_pallas(x, k1, k2, kernel1_both=bug, interpret=True))
        ref = np.asarray(sac_xla(x, k1, k2, 3, kernel1_both=bug))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_sac_fused_fallback_on_cpu():
    from fcvsr_tpu.ops.pallas_kernels import sac_fused

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 8, 8, 12)), jnp.float32)
    # auto-detection must fall back to XLA off-TPU
    out = sac_fused(x, k, k)
    ref = sac_xla(x, k, k, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
