"""Torch checkpoint ingestion: reference FCVSR state_dicts -> flax params.

The reference distributes plain ``state_dict`` checkpoints (SURVEY.md §5 —
``torch.save(model.state_dict())``; GShiftNet for CVCP / FCVSRNet for
REDS-Vimeo, identical key namespace).  This module maps those keys onto the
``fcvsr_tpu.models.FCVSRNet`` parameter tree so released weights can be run
on TPU and used for PSNR-parity validation.

Key mapping is mechanical:
* ``Conv2d``: torch (out, in, kh, kw) -> flax (kh, kw, in, out)
* ``PReLU`` weight (1,) -> ``alpha``
* ``DivEnh`` a/b (C, 1, 1) -> (C,)
* ``DivEnh.Conv`` (defined but never called in the reference forward) is
  dropped.
* mmedit checkpoints prefix keys with ``generator.`` — stripped on entry.

Input is a plain ``{name: np.ndarray}`` dict, so callers can feed either
``torch.load(...)`` results (tensors are converted) or ``np.load`` archives.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["convert_torch_state_dict", "flax_to_torch_key"]


def _conv(v: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))


def flax_to_torch_key(path: str) -> str | None:
    """Map a '/'-joined flax param path (without trailing kernel/bias) to the
    reference torch module name, or None if the param has no torch source."""
    p = path.split("/")

    def conv_name(torch_name):
        return torch_name

    # top-level plain convs
    top_convs = {
        "feat_extract": "feat_extract.0",
        "rconcat1": "rconcat1",
        "rconcat2": "rconcat2",
        "recorb0": "recorb0",
        "upconv1_L2": "upconv1_L2",
        "upconv1_L2_2": "upconv1_L2_2",
        "upconv1_L3": "upconv1_L3",
        "upconv1": "upconv1",
        "upconv2": "upconv2",
        "conv_last0": "conv_last0",
        "upconv_fuse": "upconv_fuse",
    }
    if p[0] in top_convs and p[1] == "Conv_0":
        return top_convs[p[0]]
    if p[0] == "lrelu":
        return "lrelu"

    if p[0] == "MGAA":
        m = p[1]
        simple = {
            "convfuse0": "MGAA.convfuse.0", "convfuse1": "MGAA.convfuse.2",
            "convfuse2": "MGAA.convfuse.4",
            "convcorr0": "MGAA.convcorr.0", "convcorr1": "MGAA.convcorr.2",
            "convcorr2": "MGAA.convcorr.4",
            "convcrt0": "MGAA.convcrt.0", "convcrt1": "MGAA.convcrt.2",
            "conv_KP": "MGAA.conv_KP", "F0": "MGAA.F.0", "F1": "MGAA.F.1",
            "conv3": "MGAA.conv3",
        }
        if m in simple:
            return simple[m]
        if m.startswith("mconv"):
            i = int(m[len("mconv"):])
            base = f"MGAA.MConvB.{i}"
            sub = p[2]
            if sub == "conv1":
                return f"{base}.conv1"
            if sub == "conv2":
                return f"{base}.conv2"
            if sub == "relu":
                return f"{base}.relu"
            if sub == "CA":
                return f"{base}.CA.conv_du.{0 if p[3] == 'down' else 2}"
        return None

    if p[0] == "MFFRblock":
        if p[1] == "ca":
            return f"MFFRblock.ca.conv_du.{0 if p[2] == 'down' else 2}"
        if p[1].startswith("divenh"):
            i = int(p[1][len("divenh"):])
            base = f"MFFRblock.DivEnh_block.{i}"
            if len(p) == 2:  # leaf params a/b live directly on the module
                return base
            if p[2] == "ca":
                return f"{base}.ca.conv_du.{0 if p[3] == 'down' else 2}"
        return None

    if p[0] == "recorb1":  # SCNet
        g = int(p[1][len("group"):])
        base = f"recorb1.body.{g}"
        if p[2] == "conv":
            return f"{base}.conv"
        b = int(p[2][len("block"):])
        base = f"{base}.body.{b}"
        sub = p[3]
        if sub == "body0":
            return f"{base}.body.0"
        if sub == "body1":
            return f"{base}.body.2"
        if sub == "down":
            return f"{base}.down.0"
        if sub == "up":
            return f"{base}.up.0"
        if sub == "rcb":
            r = f"{base}.body.3"
            s = p[4]
            if s == "body0":
                return f"{r}.body.0"
            if s == "body1":
                return f"{r}.body.2"
            if s == "gcnet":
                gc = {"conv_mask": "conv_mask", "add0": "channel_add_conv.0",
                      "add1": "channel_add_conv.2"}
                return f"{r}.gcnet.{gc[p[5]]}"
    return None


def convert_torch_state_dict(
    state: Mapping[str, np.ndarray], flax_params: Dict
) -> Dict:
    """Fill a flax FCVSRNet param tree from a reference torch state_dict.

    ``flax_params`` is the ``{'params': ...}`` tree from ``model.init`` and is
    used as the shape/structure template.  Raises on missing or mismatched
    weights so conversion errors never pass silently.
    """
    import flax

    state = {
        (k[len("generator."):] if k.startswith("generator.") else k): np.asarray(v)
        for k, v in state.items()
    }

    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out = {}
    for key_tuple, template in flat.items():
        path = "/".join(key_tuple[:-1])
        leaf = key_tuple[-1]
        torch_base = flax_to_torch_key(path)
        if torch_base is None:
            raise KeyError(f"no torch mapping for flax param {path}/{leaf}")
        if leaf == "alpha":
            v = state[f"{torch_base}.weight"].reshape(-1)
        elif leaf in ("a", "b"):
            v = state[f"{torch_base}.{leaf}"].reshape(-1)
        elif leaf == "kernel":
            v = _conv(state[f"{torch_base}.weight"])
        elif leaf == "bias":
            v = state[f"{torch_base}.bias"]
        else:
            raise KeyError(f"unknown leaf {leaf} at {path}")
        if v.shape != template.shape:
            raise ValueError(
                f"shape mismatch at {path}/{leaf}: torch {v.shape} vs flax {template.shape}"
            )
        out[key_tuple] = v.astype(np.float32)
    return {"params": flax.traverse_util.unflatten_dict(out)}
