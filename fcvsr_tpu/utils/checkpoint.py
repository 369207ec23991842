"""Orbax checkpointing: save/restore TrainState with step-based retention.

TPU-native replacement for the reference's checkpoint paths (SURVEY.md §5):
mmcv CheckpointHook every 5000 iters with optimizer state, and CVSR_train's
periodic ``torch.save(state_dict)``.  Also exports back to a torch-style
flat-key numpy archive so results can round-trip to the reference tooling.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "export_torch_style"]


def _manager(ckpt_dir: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_to_keep: int = 5) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "step": int(step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    if state.ema_params is not None:
        payload["ema_params"] = jax.device_get(state.ema_params)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def _ckpt_contains(mgr, step: int, key: str) -> bool:
    """Whether the saved composite at ``step`` has a top-level ``key``.

    The saved tree structure lives in the item's ``_METADATA`` JSON (ocdbt
    layout); ``item_metadata`` needs a handler registry we don't configure.
    """
    import glob
    import json

    for path in glob.glob(os.path.join(str(mgr.directory), str(step), "*",
                                       "_METADATA")):
        try:
            meta = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        tree = meta.get("tree_metadata", meta)
        if any(k == key or k.startswith(f"('{key}'")
               or k.strip("()' ").startswith(key)
               for k in tree):
            return True
    return False


def restore_checkpoint(ckpt_dir: str, state: Any, step: Optional[int] = None):
    """Restore into the structure of ``state``; returns (state, step)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return state, 0
    template = {
        "step": 0,
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    # Shape the template to what the checkpoint actually CONTAINS (EMA may
    # be present or absent independently of the live state) — inspecting the
    # saved structure keeps unrelated restore failures diagnosable instead
    # of being masked by a retry with a mutated template.
    ckpt_has_ema = _ckpt_contains(mgr, step, "ema_params")
    if ckpt_has_ema:
        template["ema_params"] = jax.device_get(
            state.ema_params if state.ema_params is not None else state.params)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    import jax.numpy as jnp

    ema = state.ema_params
    if ema is not None:
        # seed EMA from restored params if the checkpoint had none
        ema = restored.get("ema_params", restored["params"])
    new_state = state.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=ema,
    )
    return new_state, step


def export_torch_style(params, path: str) -> None:
    """Write flax params as a torch-key .npz (inverse of torch_import)."""
    import flax

    from .torch_import import flax_to_torch_key

    flat = flax.traverse_util.flatten_dict(params["params"])
    out = {}
    for key_tuple, v in flat.items():
        base = flax_to_torch_key("/".join(key_tuple[:-1]))
        leaf = key_tuple[-1]
        v = np.asarray(jax.device_get(v))
        if leaf == "kernel":
            out[f"{base}.weight"] = np.transpose(v, (3, 2, 0, 1))
        elif leaf == "bias":
            out[f"{base}.bias"] = v
        elif leaf == "alpha":
            out[f"{base}.weight"] = v
        elif leaf in ("a", "b"):
            out[f"{base}.{leaf}"] = v.reshape(-1, 1, 1)
    np.savez(path, **out)


def save_gan_checkpoint(ckpt_dir: str, step: int, state,
                        max_to_keep: int = 3) -> None:
    """Persist a GANRestorer tuple state (g_params, d_params, g_opt, d_opt,
    counter); entries that are None (generator-only stage) are skipped."""
    import orbax.checkpoint as ocp

    g_params, d_params, g_opt, d_opt, counter = state
    payload = {"step": int(step), "counter": int(counter),
               "g_params": jax.device_get(g_params),
               "g_opt": jax.device_get(g_opt)}
    if d_params is not None:
        payload["d_params"] = jax.device_get(d_params)
        payload["d_opt"] = jax.device_get(d_opt)
    _manager(ckpt_dir, max_to_keep).save(
        step, args=ocp.args.StandardSave(payload))


def restore_gan_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore a GAN tuple state saved by save_gan_checkpoint; returns
    (state, start_step).  Missing dir -> (state, 0)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    g_params, d_params, g_opt, d_opt, counter = state
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return state, 0
    template = {"step": 0, "counter": 0,
                "g_params": jax.device_get(g_params),
                "g_opt": jax.device_get(g_opt)}
    if d_params is not None:
        template["d_params"] = jax.device_get(d_params)
        template["d_opt"] = jax.device_get(d_opt)
    got = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return ((got["g_params"], got.get("d_params", d_params),
             got["g_opt"], got.get("d_opt", d_opt),
             jnp.int32(got["counter"])), int(got["step"]))
