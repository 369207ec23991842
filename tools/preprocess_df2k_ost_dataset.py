"""DF2K_OST dataset preparation (RealBasicVSR's SISR training pool).

Rebuilds the reference's
``tools/data/super-resolution/df2k_ost/preprocess_df2k_ost_dataset.py``:
GT-only sub-image extraction from ``df2k_ost/GT`` (degradations are applied
on the fly during training — ``fcvsr_tpu/data/degradations.py``), plus
optional LMDB packing with flat keys.

Usage:
  python tools/preprocess_df2k_ost_dataset.py --data-root /data \
      [--crop-size 400] [--step 200] [--thresh-size 0] [--make-lmdb]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # script: tools/ is sys.path[0]; module: import via the package path
    from preprocess_reds_dataset import extract_subimages, make_lmdb
except ImportError:
    from tools.preprocess_reds_dataset import extract_subimages, make_lmdb


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--crop-size", type=int, default=400)
    ap.add_argument("--step", type=int, default=200)
    ap.add_argument("--thresh-size", type=int, default=0)
    ap.add_argument("--compression-level", type=int, default=3)
    ap.add_argument("--make-lmdb", action="store_true")
    args = ap.parse_args(argv)

    src = os.path.join(args.data_root, "df2k_ost", "GT")
    dst = os.path.join(args.data_root, "df2k_ost", "GT_sub")
    extract_subimages(src, dst, crop_size=args.crop_size, step=args.step,
                      thresh_size=args.thresh_size,
                      compress_level=args.compression_level)
    if args.make_lmdb:
        make_lmdb(dst, os.path.join(args.data_root, "df2k_ost",
                                    "GT_sub.lmdb"), key_style="flat")


if __name__ == "__main__":
    main()
