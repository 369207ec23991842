"""DIV2K dataset preparation: overlapped sub-image extraction + LMDB.

Rebuilds the reference's
``tools/data/super-resolution/div2k/preprocess_div2k_dataset.py``
(main_extract_subimages / make_lmdb_for_div2k): the HR folder is cropped at
``crop_size``/``step``/``thresh_size`` and each ``LR_bicubic/X{scale}``
folder at those values divided by the scale; LMDB keys are the sub-image
name without extension (``prepare_keys_div2k``).  PIL-based (cv2 absent),
single-process (this environment has one CPU; the reference's thread pool
is pure IO parallelism with identical output).

Usage:
  python tools/preprocess_div2k_dataset.py --data-root /data/DIV2K \
      [--scales 2 3 4] [--crop-size 480] [--step 240] [--thresh-size 0] \
      [--make-lmdb]
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
    ap.add_argument("--scales", nargs="*", type=int, default=[2, 3, 4])
    ap.add_argument("--crop-size", type=int, default=480)
    ap.add_argument("--step", type=int, default=240)
    ap.add_argument("--thresh-size", type=int, default=0)
    ap.add_argument("--compression-level", type=int, default=3)
    ap.add_argument("--make-lmdb", action="store_true",
                    help="also pack each _sub folder into a .lmdb")
    args = ap.parse_args(argv)

    root = args.data_root
    jobs = [(os.path.join(root, "DIV2K_train_HR"),
             os.path.join(root, "DIV2K_train_HR_sub"),
             os.path.join(root, "DIV2K_train_HR_sub.lmdb"), 1)]
    for s in args.scales:
        jobs.append((os.path.join(root, f"DIV2K_train_LR_bicubic/X{s}"),
                     os.path.join(root, f"DIV2K_train_LR_bicubic/X{s}_sub"),
                     os.path.join(root,
                                  f"DIV2K_train_LR_bicubic_X{s}_sub.lmdb"),
                     s))

    for src, dst, lmdb_path, s in jobs:
        extract_subimages(src, dst, crop_size=args.crop_size // s,
                          step=args.step // s,
                          thresh_size=args.thresh_size // s,
                          compress_level=args.compression_level)
        if args.make_lmdb:
            make_lmdb(dst, lmdb_path, key_style="flat")


if __name__ == "__main__":
    main()
