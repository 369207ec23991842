"""Export a reference PyTorch checkpoint to the .npz form test.py ingests.

One-command flow from a released FCVSR checkpoint to a REDS4 PSNR table:

  python tools/export_torch_ckpt.py --pth FCVSR_QP37.pth --out qp37.npz
  python test.py --preset fcvsr_redsLD_QP37 --torch-checkpoint qp37.npz \
      --lr-root <REDS4 LD QP37 frames> --gt-root <REDS4 GT> --save-dir out/

Handles the checkpoint flavours found in the reference:
  * CVSR_train raw ``state_dict`` (train_LD_freqCVSR_22.py:266
    ``torch.save(model.state_dict())``);
  * mmcv checkpoints with a ``state_dict`` wrapper and ``generator.``
    prefixes (CheckpointHook);
  * DataParallel ``module.`` prefixes.

The npz holds raw torch tensors under reference key names;
``fcvsr_tpu.utils.torch_import.convert_torch_state_dict`` does the
layout/naming mapping at load time (validated against tests/torch_mirror.py
for all four model widths in tests/test_checkpoint_roundtrip.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export_pth(pth_path: str, out_path: str) -> dict:
    import torch

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    state = {}
    for key, value in ckpt.items():
        if not hasattr(value, "numpy"):
            continue
        if key.startswith("module."):
            key = key[len("module."):]
        if key.startswith("generator."):
            key = key[len("generator."):]
        state[key] = value.detach().cpu().numpy()
    if not state:
        raise ValueError(f"no tensors found in {pth_path}")
    np.savez(out_path, **state)
    return state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="reference .pth checkpoint")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)
    state = export_pth(args.pth, args.out)
    print(f"exported {len(state)} tensors to {args.out}")


if __name__ == "__main__":
    main()
