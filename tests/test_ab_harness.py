"""Smoke tests for the reference-vs-repo A/B harnesses (tools/ab_reference*).

These exercise the full machinery at micro scale: fake torchvision, the
reference's own trainers and criteria, weight conversion into our models,
shared scoring. They are the round-record generators (BASELINE.md r2), so
they must not bit-rot.
"""

import sys

import numpy as np
import pytest

pytest.importorskip("jax")
pytest.importorskip("torch")

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import os  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/src"), reason="reference not mounted"
    ),
]


def test_destr_ab_smoke():
    from tools.ab_reference import main

    result = main(
        ["--num-train", "8", "--num-val", "4", "--epochs", "1", "--batch", "2",
         "--train-size", "64", "--top_k", "4", "--blocks", "1"]
    )
    assert np.isfinite(result["ref_map"]) and np.isfinite(result["ours_map"])
    assert len(result["ref_loss_curve"]) == 1
    assert len(result["ours_loss_curve"]) == 1
    # same converted init: first-batch losses agree up to the documented
    # train-mode BN-wiring divergence (REFCOMPAT #1)
    assert abs(result["init_loss_ref"] - result["init_loss_ours"]) < 0.15


def test_ssd_ab_smoke():
    from tools.ab_reference_ssd import main

    result = main(
        ["--num-train", "4", "--num-val", "2", "--epochs", "1", "--batch", "2",
         "--num_cls", "2", "--max-boxes", "2"]
    )
    assert np.isfinite(result["ref_map"]) and np.isfinite(result["ours_map"])
    assert len(result["ours_loss_curve"]) == 1
