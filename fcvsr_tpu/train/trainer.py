"""Training state and sharded train/eval steps.

TPU-native rebuild of the two reference training loops (SURVEY.md §3.1/§3.3):
one functional ``train_step`` compiled once by XLA, with data parallelism
expressed through sharding annotations over a ``Mesh`` — the DDP allreduce
becomes an XLA-inserted gradient ``psum`` riding ICI.

Supports both recipes:
* CVCP  — Adam(0.5e-5), Charbonnier-sum on the centre frame, MultiStepLR.
* mmedit — Adam(2e-4, betas=(0.9, 0.99)), Charbonnier-mean, CosineRestart.

EMA (mmedit core/hooks/ema.py) is carried in the state as an optional
exponential moving average of params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from .losses import charbonnier, charbonnier_sum

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            decay = 0.999
            new_ema = jax.tree.map(
                lambda e, p: decay * e + (1 - decay) * p, new_ema, new_params
            )
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)


def create_train_state(model, rng, sample_input, schedule,
                       betas=(0.9, 0.99), use_ema: bool = False) -> TrainState:
    params = model.init(rng, sample_input)
    tx = optax.adam(schedule, b1=betas[0], b2=betas[1])
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if use_ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, ema_params=ema, tx=tx)


def make_train_step(model, loss_type: str = "charbonnier_mean",
                    mesh=None, donate: bool = True):
    """Build a jitted train step: (state, lrs, gt_center) -> (state, metrics).

    ``lrs``: (B, T, C, H, W) low-res window; ``gt_center``: (B, C, 4H, 4W).
    With a mesh, batch inputs are sharded over the 'data' axis and the state
    is replicated; XLA derives the gradient reduction.
    """

    if loss_type == "charbonnier_mean":
        loss_fn = charbonnier
    elif loss_type == "charbonnier_sum":
        loss_fn = charbonnier_sum
    else:
        raise ValueError(loss_type)

    def step(state: TrainState, lrs, gt):
        def compute_loss(params):
            sr = model.apply(params, lrs)
            return loss_fn(sr, gt)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    if mesh is not None:
        # State is replicated (place it with parallel.replicate before the
        # loop); batch inputs shard over 'data'.  XLA inserts the grad psum.
        batch_s = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(None, batch_s, batch_s),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None):
    def step(params, lrs):
        return model.apply(params, lrs)

    if mesh is not None:
        batch_s = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(None, batch_s))
    return jax.jit(step)
