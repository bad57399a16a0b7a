"""Guards for the driver hooks in __graft_entry__.py: entry() must stay
jit-traceable (checked cheaply via eval_shape) and dryrun_multichip is
exercised in tests/test_parallel.py."""

import sys

import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, "/root/repo")


def test_entry_traces_with_example_args():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out_shapes = jax.eval_shape(fn, *args)
    model_out, det_out = out_shapes
    assert model_out["pred_class"].shape[0] == 2
    assert model_out["pred_boxes"].shape[-1] == 4
    assert det_out["pred_class"].shape[1] >= model_out["pred_class"].shape[1] // 3
