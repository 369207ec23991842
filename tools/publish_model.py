"""Publish a checkpoint: strip training state, stamp a content hash.

Parity with the reference tools/publish_model.py (mmcv convention: drop the
optimizer, append the first 8 hex chars of the file's sha256 to the name).
Input is an orbax checkpoint directory (as written by train.py) or a .npz;
output is a params-only .npz named ``<out>-<sha256[:8]>.npz`` that
``test.py --torch-checkpoint``-style loaders and ``convert_torch_state_dict``
consumers can ingest (keys are the flattened flax path joined by '.').

Usage:
  python tools/publish_model.py --ckpt work_dirs/x/ckpt --out fcvsr_qp37
  python tools/publish_model.py --ckpt weights.npz --out fcvsr_qp37 [--ema]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_params(ckpt: str, use_ema: bool):
    if ckpt.endswith(".npz"):
        return dict(np.load(ckpt))
    # orbax checkpoint dir: restore the train state, keep params (or EMA)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import flax
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt}")
    restored = mngr.restore(step)
    state = restored["state"] if "state" in restored else restored
    key = "ema_params" if use_ema and "ema_params" in state else "params"
    tree = state[key]
    flat = flax.traverse_util.flatten_dict(
        tree["params"] if "params" in tree else tree)
    return {".".join(map(str, k)): np.asarray(v) for k, v in flat.items()}


def publish(ckpt: str, out: str, use_ema: bool = False) -> str:
    params = _load_params(ckpt, use_ema)
    tmp = out + ".tmp.npz"
    np.savez(tmp, **params)
    digest = hashlib.sha256(open(tmp, "rb").read()).hexdigest()[:8]
    final = f"{out}-{digest}.npz"
    os.replace(tmp, final)
    return final


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir or .npz")
    ap.add_argument("--out", required=True, help="output basename")
    ap.add_argument("--ema", action="store_true",
                    help="publish the EMA weights when present")
    args = ap.parse_args(argv)
    final = publish(args.ckpt, args.out, args.ema)
    print(f"published {final} ({len(np.load(final).files)} tensors)")


if __name__ == "__main__":
    main()
