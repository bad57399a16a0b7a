"""WHOLE-model numerical parity against the actual reference DESTR.

The module-level parity tests (encoder, decoder, mini-detector pieces) prove
each converted component; this proves the composition: the full reference
``ObjDetSplitTransformer`` — instantiated through a fake torchvision
(tools/ref_torch_models.py) — and our full flax DESTR produce the same
outputs from the same weights via ``destr_variables_from_torch``. This is
also the proof that a reference checkpoint can be loaded wholesale.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from object_detection_destr_tpu.config import DestrConfig  # noqa: E402
from object_detection_destr_tpu.models.convert import (  # noqa: E402
    destr_variables_from_torch,
)
from object_detection_destr_tpu.models.destr.model import build_destr  # noqa: E402

import os  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src"), reason="reference not mounted"
)


class _Args:
    hidden_dim = 256
    num_encoder_blocks = 2
    num_decoder_blocks = 2
    top_k = 4
    num_cls = 2
    lr_backbone = 1e-4
    resume = False
    dilation = False
    backbone = "resnet50"


def test_whole_destr_forward_parity():
    from tools.ref_torch_models import build_reference_destr, zero_reference_dropout

    torch.manual_seed(0)
    ref = build_reference_destr(_Args())
    zero_reference_dropout(ref)
    ref.eval()

    variables = destr_variables_from_torch(
        ref.state_dict(),
        num_encoder_blocks=_Args.num_encoder_blocks,
        num_decoder_blocks=_Args.num_decoder_blocks,
    )

    cfg = DestrConfig(
        num_encoder_blocks=_Args.num_encoder_blocks,
        num_decoder_blocks=_Args.num_decoder_blocks,
        top_k=_Args.top_k,
        num_cls=_Args.num_cls,
    )
    model = build_destr(cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)  # 2x2 C5 tokens

    with torch.no_grad():
        ref_model_out, ref_det_out = ref(torch.from_numpy(x))

    ours_model_out, ours_det_out = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )

    # converted variables must cover the model's full parameter structure
    expected = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    )
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, variables)
    ) == jax.tree_util.tree_structure(jax.tree.map(lambda _: 0, expected))

    def close(ours, theirs, name, tol=5e-4):
        theirs = theirs.numpy()
        ours = np.asarray(ours)
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        scale = max(np.abs(theirs).max(), 1e-6)
        err = np.abs(ours - theirs).max() / scale
        assert err < tol, f"{name}: rel err {err:.2e}"

    # Dense (pre-decoder) path is tight.
    close(ours_det_out["pred_class"], ref_det_out["pred_class"], "det/pred_class", 2e-4)
    close(ours_det_out["pred_boxes"], ref_det_out["pred_boxes"], "det/pred_boxes", 2e-4)
    # Decoder-path tolerance is wider by design, not by bug: the decoder
    # refines boxes via inverse_sigmoid(selected_centers), whose derivative
    # 1/(p(1-p)) amplifies a ~3e-5 center difference near p->0/1 into ~1e-3
    # on the logit scale. Measured: the error does NOT grow with decoder
    # depth (2.9e-3 at 1 block, 2.0e-3 at 2), ruling out a wiring mismatch.
    close(ours_model_out["pred_class"], ref_model_out["pred_class"], "pred_class", 1e-2)
    close(ours_model_out["pred_boxes"], ref_model_out["pred_boxes"], "pred_boxes", 2e-3)


def test_whole_ssd_forward_parity():
    """Full reference SingleShotDetector vs our SSD from converted weights:
    all 6 scales of boxes exactly; confidences modulo the reference's dead
    channel (REFCOMPAT #4 — its softmax uses labels 0..C-1 and channel -1
    for background, criterion.py:324-328, so channel C is never trained)."""
    from object_detection_destr_tpu.config import SSDConfig
    from object_detection_destr_tpu.models.convert import ssd_variables_from_torch
    from object_detection_destr_tpu.models.ssd.model import build_ssd
    from tools.ref_torch_models import build_reference_ssd, zero_reference_dropout

    class _A:
        num_cls = 20

    torch.manual_seed(3)
    ref = build_reference_ssd(_A())
    zero_reference_dropout(ref)
    ref.eval()

    variables = ssd_variables_from_torch(ref.state_dict(), num_cls=20)
    model = build_ssd(SSDConfig())

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 300, 300)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ours = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))

    keep = list(range(20)) + [21]
    for s in range(6):
        rb = ref_out["boxes"][s].numpy()
        ob = np.asarray(ours["boxes"][s])
        assert ob.shape == rb.shape, (s, ob.shape, rb.shape)
        # deep scales have near-zero outputs at random init; combined abs+rel
        np.testing.assert_allclose(ob, rb, rtol=5e-4, atol=1e-4,
                                   err_msg=f"boxes scale {s}")

        rc = ref_out["conf"][s].numpy()[..., keep]
        oc = np.asarray(ours["conf"][s])
        np.testing.assert_allclose(oc, rc, rtol=5e-4, atol=1e-4,
                                   err_msg=f"conf scale {s}")
