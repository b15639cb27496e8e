"""tools/verify_real_weights.py plumbing test (round-3 verdict item 5).

The script's purpose is the first NETWORKED run with the real
ZhengPeng7/BiRefNet checkpoint (blocked in this environment); this test
keeps the turnkey path from rotting by driving it whole on a random
schema-exact checkpoint at 64^2 on CPU.
"""

import subprocess
import sys
import os

import pytest
from safetensors.numpy import save_file

import birefnet_tpu as bt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("extra", [[], ["--skip-oracle"]])
def test_verify_real_weights_runs(tmp_path, extra):
    ckpt = tmp_path / "m.safetensors"
    save_file(bt.random_checkpoint(bt.BiRefNetConfig.swin_l(), 5),
              str(ckpt))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "verify_real_weights.py"),
         "--checkpoint", str(ckpt), "--size", "64", "--dtype", "float32",
         "--cpu"] + extra,
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "checkpoint schema OK" in proc.stdout
    # The default --deform-mode auto prints the 20-site probe table and
    # the resolved per-site radii (round-4 verdict item 5).
    assert "per-site |offset| probe" in proc.stdout
    assert "dec1.deform_k7" in proc.stdout
    assert "auto resolved ->" in proc.stdout
    if extra:
        assert "oracle skipped" in proc.stdout
    else:
        assert "PASS" in proc.stdout
