"""tools/validate_released_ckpt.py end-to-end: a synthetic "released"
checkpoint (the reference-keyed torch mirror's state_dict, saved with
torch.save exactly as CVSR_train releases weights) flows through torch.load
-> key conversion -> the full eval CLI and yields a finite PSNR table.

This is the rehearsal for the real Baidu-pan weights (still egress-blocked,
VERDICT r3 #8): when a file appears, the identical command validates the
≤0.01 dB target."""

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_tool():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "validate_released_ckpt",
        os.path.join(repo, "tools", "validate_released_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_released_pth_roundtrip(tmp_path):
    import torch

    from tests.torch_mirror import FCVSRTorchMirror

    from PIL import Image

    rng = np.random.default_rng(0)
    lr_root, gt_root = tmp_path / "lr", tmp_path / "gt"
    for seq in ["seq_0"]:
        (lr_root / seq).mkdir(parents=True)
        (gt_root / seq).mkdir(parents=True)
        for i in range(8):
            lr = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
            gt = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
            Image.fromarray(lr).save(lr_root / seq / f"{i:08d}.png")
            Image.fromarray(gt).save(gt_root / seq / f"{i:08d}.png")

    # S-width mirror == fcvsr_s preset topology (FCVSRNet.small)
    torch.manual_seed(0)
    mirror = FCVSRTorchMirror(ac_num=3, freq_inv=4, sc_groups=4, up_ksize=1,
                              in_channels=3)  # REDS presets are RGB
    pth = tmp_path / "FCVSR_S_synthetic.pth"
    torch.save(mirror.state_dict(), str(pth))

    tool = _load_tool()
    rc = tool.main([str(pth), "--preset", "fcvsr_s_redsLD_QP37",
                    "--lr-root", str(lr_root), "--gt-root", str(gt_root),
                    "--seqs", "seq_0",
                    "--expected-psnr", "0.0", "--tolerance", "1e9"])
    assert rc == 0

    # missing weights file -> actionable error, rc 2
    assert tool.main([str(tmp_path / "nope.pth"), "--preset",
                      "fcvsr_s_redsLD_QP37", "--lr-root", str(lr_root),
                      "--gt-root", str(gt_root)]) == 2
