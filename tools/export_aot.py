"""Serialize a compiled inference function (the TPU-native deployment path).

The reference ships GPU deployment tools (tools/pytorch2onnx.py,
tools/onnx2tensorrt.py, tools/deployment/).  The TPU-native equivalent is
``jax.export``: trace + lower the jitted forward once, serialize the
StableHLO artifact, and reload it anywhere (same or newer jax) without the
model code — the serving story for this framework.

Usage:
  python tools/export_aot.py --preset fcvsr_s_redsLD_QP37 \
      --height 184 --width 320 --out fcvsr_s.jaxexport \
      [--checkpoint <orbax dir> | --npz weights.npz]

Reload:
  from jax import export
  fn = export.deserialize(open('fcvsr_s.jaxexport', 'rb').read())
  sr = fn.call(params, lr_window)      # same pytrees as at export time
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export_model(cfg, h: int, w: int, params=None):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    import train as train_cli

    model = train_cli.build_model(cfg)
    c = cfg.model.in_channels
    t = cfg.model.num_frames or 7
    spec_x = jax.ShapeDtypeStruct((1, t, c, h, w), jnp.float32)
    if params is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros(spec_x.shape, jnp.float32))
    spec_params = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params)
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    return jexport.export(fwd)(spec_params, spec_x), params


def _load_flax_npz(path: str):
    """Published .npz (tools/publish_model.py: flax paths joined by '.')
    back into a {'params': tree}."""
    import flax

    data = np.load(path)
    flat = {tuple(k.split(".")): data[k] for k in data.files}
    return {"params": flax.traverse_util.unflatten_dict(flat)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default="",
                    help="orbax checkpoint dir (train.py work dir)")
    ap.add_argument("--npz", default="",
                    help=".npz from tools/publish_model.py")
    ap.add_argument("--cpu", action="store_true",
                    help="lower for CPU (default: current backend)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fcvsr_tpu.utils.config import preset

    cfg = preset(args.preset)
    params = None
    if args.npz:
        params = _load_flax_npz(args.npz)
    elif args.checkpoint:
        import tools.publish_model as pub

        flat = pub._load_params(args.checkpoint, use_ema=False)
        import flax

        params = {"params": flax.traverse_util.unflatten_dict(
            {tuple(k.split(".")): v for k, v in flat.items()})}
    exported, _ = export_model(cfg, args.height, args.width, params=params)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.out} ({len(blob)} bytes, "
          f"platforms={exported.platforms})")


if __name__ == "__main__":
    main()
