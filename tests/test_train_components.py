"""Training-component tests: LR schedules vs reference semantics, losses vs
torch formulations, EMA state updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fcvsr_tpu.train import (
    TrainState,
    charbonnier,
    charbonnier_sum,
    cosine_restart,
    create_train_state,
    linear_decay,
    multistep,
)


def test_multistep_matches_torch_scheduler():
    """CVSR recipe: MultiStepLR([2000,6000,10000,120000], gamma=0.25)."""
    sched = multistep(0.5e-5, [2000, 6000, 10000, 120000], 0.25)
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(lin.parameters(), lr=0.5e-5)
    tsched = torch.optim.lr_scheduler.MultiStepLR(
        opt, [2000, 6000, 10000, 120000], gamma=0.25)
    for step in range(0, 12001, 500):
        got = float(sched(step))
        # advance torch scheduler to `step`
        ref_opt = torch.optim.Adam(lin.parameters(), lr=0.5e-5)
        ref_sched = torch.optim.lr_scheduler.MultiStepLR(
            ref_opt, [2000, 6000, 10000, 120000], gamma=0.25)
        for _ in range(step):
            ref_opt.step()
            ref_sched.step()
        ref = ref_opt.param_groups[0]["lr"]
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   err_msg=f"step {step}")


def test_cosine_restart_endpoints():
    """mmedit FCVSR config: periods=[600000], restart_weights=[1], min_lr=1e-7."""
    sched = cosine_restart(2e-4, [600000], [1.0], 1e-7)
    assert float(sched(0)) == pytest.approx(2e-4, rel=1e-6)
    mid = float(sched(300000))
    assert mid == pytest.approx((2e-4 + 1e-7) / 2, rel=1e-3)
    end = float(sched(599999))
    assert end == pytest.approx(1e-7, rel=1e-2)


def test_cosine_restart_weights():
    sched = cosine_restart(1e-3, [100, 100], [1.0, 0.5], 0.0)
    assert float(sched(0)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(100)) == pytest.approx(5e-4, rel=1e-6)  # restarted at w=0.5


def test_linear_decay():
    sched = linear_decay(1e-3, 1000)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(500)) == pytest.approx(5e-4)
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-12)


def test_charbonnier_flavours_match_torch():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    b = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)

    # CVSR_train flavour: sum(sqrt(diff^2 + eps)), eps=1e-4 unsquared
    ref_sum = torch.sum(torch.sqrt((ta - tb) ** 2 + 1e-4)).item()
    got_sum = float(charbonnier_sum(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got_sum, ref_sum, rtol=1e-5)

    # mmedit flavour: mean(sqrt(diff^2 + eps^2)), eps=1e-12
    ref_mean = torch.mean(torch.sqrt((ta - tb) ** 2 + 1e-12)).item()
    got_mean = float(charbonnier(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-5)


def test_ema_state_updates():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(x)

    model = Tiny()
    x = jnp.ones((1, 2))
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               lambda s: 1e-2, use_ema=True)
    assert state.ema_params is not None
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(state.params)
    new_state = state.apply_gradients(g)
    # ema moved slightly toward new params, but lags them
    p_new = jax.tree.leaves(new_state.params)[1]
    e_new = jax.tree.leaves(new_state.ema_params)[1]
    p_old = jax.tree.leaves(state.params)[1]
    assert not np.allclose(np.asarray(p_new), np.asarray(p_old))
    np.testing.assert_allclose(np.asarray(e_new),
                               np.asarray(0.999 * p_old + 0.001 * p_new),
                               rtol=1e-5)
