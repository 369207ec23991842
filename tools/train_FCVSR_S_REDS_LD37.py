"""Thin entry-point wrapper (reference tools/train_FCVSR_S_REDS_LD37.py equivalent).

Pins preset 'fcvsr_s_redsLD_QP37'; all other flags pass through to train.py
(SURVEY.md §2.8/L6: the reference ships one pinned script per config).
Usage: python tools/train_FCVSR_S_REDS_LD37.py --lr-root ... --gt-root ... [more flags]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as _cli

if __name__ == "__main__":
    _cli.main(["--preset", "fcvsr_s_redsLD_QP37"] + sys.argv[1:])
