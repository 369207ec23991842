"""tools/trained_proxy_rehearsal.py end-to-end at reduced steps (VERDICT
r4 #6): a torch-side TRAINED checkpoint (not random weights) flows through
torch.save -> torch.load -> key conversion -> the full eval CLI, and the
JAX-side PSNR must match the torch-side PSNR within the real release
tolerance (≤0.01 dB).

The banked 300-step run (COVERAGE.md): torch 42.2260 dB vs JAX 42.2225 —
delta −0.0035 dB, PASS.  This keeps the machinery exercised at 30 steps.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_trained_proxy_parity_rehearsal():
    spec = importlib.util.spec_from_file_location(
        "trained_proxy_rehearsal",
        os.path.join(REPO, "tools", "trained_proxy_rehearsal.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    # 30 torch steps is enough to move the model well away from init
    # (loss roughly halves); tolerance stays the real 0.01 dB target
    rc = tool.main(["--steps", "30", "--frames", "8", "--seqs", "1"])
    assert rc == 0
