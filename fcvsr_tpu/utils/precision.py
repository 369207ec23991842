"""Mixed-precision helpers.

FCVSR parity runs in float32 (FFT accuracy dictates it — SURVEY.md §7), but
for throughput-first serving the conv-dominated compute can run bfloat16:
cast params + activations to bf16 and the linen modules follow, while the
FFT ops (`ops/freq.py`, `ops/dct.py`) internally still compute their spectra
in float32 and cast back — so band-split math keeps f32 mantissas and only
the conv/elementwise traffic drops to 2 bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_params", "bf16_apply"]


def cast_params(params, dtype=jnp.bfloat16):
    """Cast all floating-point leaves of a param tree."""
    def cast(v):
        if jnp.issubdtype(v.dtype, jnp.floating):
            return v.astype(dtype)
        return v

    return jax.tree.map(cast, params)


def bf16_apply(model, params, *args):
    """Run ``model.apply`` in bfloat16 (params + inputs cast), returning f32."""
    p16 = cast_params(params)
    args16 = tuple(
        a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a
        for a in args)
    out = model.apply(p16, *args16)
    return jax.tree.map(lambda v: v.astype(jnp.float32), out)
