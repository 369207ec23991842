"""Pin the driver entry points (VERDICT r1 item #1).

Round 1's multi-chip dryrun failed at the driver because
``dryrun_multichip`` never forced the CPU platform under the pinned
``JAX_PLATFORMS=axon``.  These tests execute the exact driver code paths on
the 8-device virtual CPU mesh, plus a mesh-sharded FULL FCVSR-S train-step
equivalence check (sharded vs single-device grads/params).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest should give 8 virtual devices"
    ge.dryrun_multichip(8)


def test_entry_compile():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """Full FCVSR-S loss + grads on the 8-device mesh == single device.

    Gradients are compared directly (not post-Adam params): Adam's first
    step is ~lr*sign(grad), so benign float-reassociation of the cross-
    device grad psum on near-zero entries would flip update signs and make
    a param comparison fail at any honest tolerance.  The sharded train
    step itself is still executed to pin the full update path.
    """
    from fcvsr_tpu.models import FCVSRNet
    from fcvsr_tpu.models.restorers import VideoRestorer
    from fcvsr_tpu.parallel import make_mesh, replicate, shard_batch
    from fcvsr_tpu.train import cosine_restart, create_train_state, make_train_step

    model = FCVSRNet.small(in_channels=1)
    rng = np.random.default_rng(42)
    b = 8
    lrs = jnp.asarray(rng.uniform(0, 1, (b, 7, 1, 16, 16)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (b, 1, 64, 64)), jnp.float32)

    def fresh_state():
        return create_train_state(
            model, jax.random.PRNGKey(0), lrs[:1],
            cosine_restart(2e-4, [600000], [1.0]),
        )

    rest = VideoRestorer(model, pixel_loss="charbonnier_mean")
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, x, y: rest.loss_fn(p, x, y)[0], argnums=0))

    params = fresh_state().params
    loss1, g1 = grad_fn(params, lrs, gt)

    mesh = make_mesh(jax.devices()[:8])
    paramsN = replicate(params, mesh)
    batch = shard_batch({"lrs": lrs, "gt": gt}, mesh)
    lossN, gN = grad_fn(paramsN, batch["lrs"], batch["gt"])

    assert np.allclose(float(loss1), float(lossN), rtol=1e-5)
    for (ka, a), (kb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(gN)):
        a = np.asarray(a)
        b_ = np.asarray(b_)
        scale = max(np.abs(a).max(), 1e-3)  # per-tensor relative tolerance
        np.testing.assert_allclose(a, b_, atol=2e-4 * scale,
                                   err_msg=jax.tree_util.keystr(ka))

    # the sharded optimizer step runs and stays finite
    stepN = make_train_step(model, "charbonnier_mean", mesh=mesh, donate=False)
    sN, mN = stepN(replicate(fresh_state(), mesh), batch["lrs"], batch["gt"])
    assert np.isfinite(float(mN["loss"]))
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(sN.params))


@pytest.mark.slow
def test_full_model_sharded_grads_match_single_device():
    """Loss + grads of the FULL FCVSRNet (ac_num=6, freq_inv=8, sc_groups=10)
    on the 8-device mesh == single device, at tiny spatial size (VERDICT r2
    item 7: the r1/r2 pinned equivalence only covered FCVSR-S)."""
    from fcvsr_tpu.models import FCVSRNet
    from fcvsr_tpu.models.restorers import VideoRestorer
    from fcvsr_tpu.parallel import make_mesh, replicate, shard_batch

    model = FCVSRNet(in_channels=1)
    rng = np.random.default_rng(11)
    lrs = jnp.asarray(rng.uniform(0, 1, (8, 7, 1, 16, 16)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (8, 1, 64, 64)), jnp.float32)

    params = model.init(jax.random.PRNGKey(0), lrs[:1])
    rest = VideoRestorer(model, pixel_loss="charbonnier_mean")
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, x, y: rest.loss_fn(p, x, y)[0], argnums=0))

    loss1, g1 = grad_fn(params, lrs, gt)

    mesh = make_mesh(jax.devices()[:8])
    paramsN = replicate(params, mesh)
    batch = shard_batch({"lrs": lrs, "gt": gt}, mesh)
    lossN, gN = grad_fn(paramsN, batch["lrs"], batch["gt"])

    assert np.allclose(float(loss1), float(lossN), rtol=1e-5)
    # full model: 3 MGAA calls x 6 IAC rounds deep at batch 8 — psum
    # reassociation noise reaches ~3e-6 absolute on the late-layer tensors
    # whose largest grad entries are only ~1e-3 at random init, so the
    # per-tensor band is 0.5% of tensor scale (the FCVSR-S test keeps its
    # tighter 2e-4*scale)
    for (ka, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(gN)):
        a = np.asarray(a)
        b_ = np.asarray(b_)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b_, rtol=1e-2, atol=5e-3 * scale,
                                   err_msg=jax.tree_util.keystr(ka))
