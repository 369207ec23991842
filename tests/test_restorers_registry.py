"""Registry + restorer wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fcvsr_tpu.models import FCVSRNet
from fcvsr_tpu.models.registry import BACKBONES, build
from fcvsr_tpu.models.restorers import VideoRestorer


def test_registry_builds_models():
    m = build(BACKBONES, dict(type="FCVSRNet", in_channels=1))
    assert isinstance(m, FCVSRNet)
    m2 = build(BACKBONES, dict(type="GShiftNet_S"))
    assert m2.ac_num == 3 and m2.in_channels == 1
    assert "BasicVSRNet" in BACKBONES and "FTVSRNet" in BACKBONES
    with pytest.raises(KeyError):
        build(BACKBONES, dict(type="NotAModel"))


@pytest.fixture(scope="module")
def restorer_setup():
    model = FCVSRNet.small(in_channels=1)
    x = jnp.zeros((1, 7, 1, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_restorer_center_frame_loss(restorer_setup):
    model, params = restorer_setup
    r = VideoRestorer(model, center_frame_only=True)
    lq = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 7, 1, 16, 16)),
                     jnp.float32)
    gt_seq = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 7, 1, 64, 64)),
                         jnp.float32)
    loss, sr = r.loss_fn(params, lq, gt_seq)
    assert sr.shape == (1, 1, 64, 64)
    assert np.isfinite(float(loss))


def test_restorer_train_step_and_fix_iter(restorer_setup):
    model, params = restorer_setup
    r = VideoRestorer(model, center_frame_only=True, fix_iter=2)
    tx = optax.adam(1e-4)
    # the train step donates its inputs; keep the shared fixture alive
    params = jax.tree.map(jnp.copy, params)
    opt_state = tx.init(params)
    step = jnp.zeros((), jnp.int32)
    train_step = r.make_train_step(tx)
    lq = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 7, 1, 16, 16)),
                     jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 1, 64, 64)),
                     jnp.float32)
    p2, opt_state, step, metrics = train_step(params, opt_state, step, lq, gt)
    assert int(step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_restorer_forward_test_with_tof_state(restorer_setup):
    model, params = restorer_setup
    r = VideoRestorer(model, center_frame_only=True,
                      metrics=("PSNR", "SSIM", "tOF"), convert_to=None)
    rng = np.random.default_rng(2)
    state = None
    for _ in range(2):
        lq = jnp.asarray(rng.uniform(0, 1, (1, 7, 1, 16, 16)), jnp.float32)
        gt = jnp.asarray(rng.uniform(0, 1, (1, 1, 64, 64)), jnp.float32)
        results, state = r.forward_test(params, lq, gt, state)
        er = results["eval_result"]
        assert set(er) == {"PSNR", "SSIM", "tOF"}
        assert np.isfinite(er["PSNR"])
    assert er["tOF"] > 0  # second frame has real flow comparison
