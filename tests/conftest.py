"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-world answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices so
sharding/collective paths compile and run in CI.

Note: this environment pins JAX_PLATFORMS=axon at interpreter start (the TPU
tunnel registers itself in sitecustomize), so the env var alone is not enough —
we must override via jax.config before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_global_impls():
    """Process-global impl switches (set_dcn_impl via test.py/train.py
    --fast paths) must not leak between tests: a polluted 'pallas' default
    makes the exact-path DCN goldens compare fused-vs-torch and fail on
    bounded deviation."""
    yield
    from fcvsr_tpu.ops import dcn

    dcn.set_dcn_impl("gather")
    dcn.set_dcn_bwd("gather")
    import importlib

    # NOTE: `import fcvsr_tpu.ops.sac as m` binds the re-exported sac()
    # FUNCTION (the package attribute shadows the submodule) — go through
    # importlib for the module itself.
    sac_mod = importlib.import_module("fcvsr_tpu.ops.sac")
    sac_mod.set_iac_bwd("gather")
    sac_mod.set_iac_chain("periter")
