"""Trained-checkpoint migration: the committed torch reference model
(logs/r4_ref_trained/last.pt, produced by tools/ab_ref_train.py) ports
through utils/torch_port and reproduces the reference's eval metrics.

The per-module goldens (test_parity_golden.py) cover random inits; this
covers the real user journey — a TRAINED reference state_dict in, the
same rec_ll/log_prob/sparsity/accuracy numbers out (tools/port_trained.py,
reference workflow: torch_scae_experiments/mnist/train.ipynb resume cell).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "logs", "r4_ref_trained", "last.pt")


@pytest.mark.slow
def test_trained_reference_checkpoint_ports():
    if not os.path.exists(CKPT):
        pytest.skip("trained reference checkpoint not present")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "port_trained.py"),
         "--ckpt", CKPT],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout, proc.stdout
