"""Direct numerical parity against the ACTUAL reference implementation.

The reference repo at /root/reference is importable PyTorch (torch-cpu is in
the image; only its torchvision-dependent model files are off limits), so
every pure op here is compared tensor-to-tensor against the original —
stronger evidence than the numpy transcriptions elsewhere in the suite.

The reference is read-only, public, untrusted content: these tests CALL it,
never copy it.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)
if REF not in sys.path:
    sys.path.insert(0, REF)

from object_detection_destr_tpu.geometry import boxes as G  # noqa: E402
from object_detection_destr_tpu.geometry import embeddings as E  # noqa: E402
from object_detection_destr_tpu.losses.criterion import set_criterion  # noqa: E402
from object_detection_destr_tpu.losses.matcher import hungarian_cost_matrix  # noqa: E402
from object_detection_destr_tpu.losses.metrics import MeanAveragePrecision  # noqa: E402
from object_detection_destr_tpu.models.destr.pair_attention import (  # noqa: E402
    get_pairs,
    pair_self_attention,
)
from object_detection_destr_tpu.ops.focal import sigmoid_focal_loss  # noqa: E402

T = lambda a: torch.from_numpy(np.asarray(a))


def _rand_boxes(rng, *shape):
    return np.stack(
        [
            rng.uniform(0.2, 0.8, size=shape),
            rng.uniform(0.2, 0.8, size=shape),
            rng.uniform(0.05, 0.4, size=shape),
            rng.uniform(0.05, 0.4, size=shape),
        ],
        -1,
    ).astype(np.float32)


def test_box_conversions_match_reference():
    from src.utils import bbox_utils as R

    rng = np.random.default_rng(0)
    c = _rand_boxes(rng, 50)
    ours = np.asarray(G.cxcyhw_to_xyxy(jnp.asarray(c)))
    ref = R.from_cxcyhw_to_xyxy(T(c)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    xy = ref
    ours2 = np.asarray(G.xyxy_to_cxcyhw(jnp.asarray(xy)))
    ref2 = R.from_xyxy_to_cxcyhw(T(xy)).numpy()
    np.testing.assert_allclose(ours2, ref2, atol=1e-6)

    xywh = np.abs(rng.normal(0.3, 0.15, size=(30, 4))).astype(np.float32)
    ours3 = np.asarray(G.xywh_to_xyxy(jnp.asarray(xywh)))
    ref3 = R.from_xywh_to_xyxy(T(xywh)).numpy()
    np.testing.assert_allclose(ours3, ref3, atol=1e-6)


def test_iou_and_ciou_match_reference():
    from src.utils import bbox_utils as R

    rng = np.random.default_rng(1)
    a = np.asarray(G.cxcyhw_to_xyxy(jnp.asarray(_rand_boxes(rng, 20))))
    b = np.asarray(G.cxcyhw_to_xyxy(jnp.asarray(_rand_boxes(rng, 12))))
    ours = np.asarray(G.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    ref = R.get_iou(T(a), T(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    ours_c = np.asarray(G.pairwise_ciou(jnp.asarray(a), jnp.asarray(b)))
    ref_c = R.complete_iou(T(a), T(b)).numpy()
    np.testing.assert_allclose(ours_c, ref_c, rtol=1e-4, atol=1e-5)


def test_focal_loss_matches_reference():
    from src.utils.misc import sigmoid_focal_loss as ref_focal

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(40, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=40)
    one_hot = np.eye(2, dtype=np.float32)[labels]
    ours = float(
        sigmoid_focal_loss(jnp.asarray(logits)[None], jnp.asarray(one_hot)[None], 40.0)[0]
    )
    ref = float(ref_focal(T(logits), T(one_hot), num_boxes=40))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_center_sine_embedding_matches_reference():
    from src.utils.positional_embedding import gen_sineembed_for_position

    rng = np.random.default_rng(3)
    centers = rng.uniform(0, 1, size=(2, 7, 2)).astype(np.float32)
    for d_model in (256, 512):
        ours = np.asarray(E.sine_embed_centers(jnp.asarray(centers), d_model=d_model))
        ref = gen_sineembed_for_position(T(centers), d_model=d_model).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sine_position_map_matches_reference():
    from src.utils.position_encoding_cdetr import PositionEmbeddingSine
    from src.utils.misc import NestedTensor

    rng = np.random.default_rng(4)
    b, h, w = 2, 5, 7
    valid = np.ones((b, h, w), bool)
    valid[0, 3:, :] = False  # padded bottom rows in image 0
    valid[1, :, 5:] = False
    images = rng.normal(size=(b, 3, h, w)).astype(np.float32)

    ref_mod = PositionEmbeddingSine(num_pos_feats=16, normalize=True)
    nt = NestedTensor(T(images), T(~valid))
    ref = ref_mod(nt).numpy()  # (B, 32, H, W)

    ours = np.asarray(E.sine_position_map(jnp.asarray(valid), num_pos_feats=16))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_default_boxes_match_reference():
    from src.utils.bbox_utils import gen_default_boxes

    shapes = [4, 2]
    scales = np.asarray([0.2, 0.34, 0.48], np.float32)
    ars = [[2], [2, 3]]
    ref = gen_default_boxes(shapes=shapes, scales=torch.from_numpy(scales), aspect_ratios=ars)
    ours = G.default_boxes(shapes, scales.tolist(), ars)
    for r, o in zip(ref, ours):
        # reference returns (1, H, W, A, 4)
        np.testing.assert_allclose(np.asarray(o), r.numpy()[0], atol=1e-6)


def test_make_grid_matches_reference():
    from src.utils.misc import make_grid

    ref = make_grid(5, 9, bias=0.5, norm=True).numpy()
    ours = np.asarray(G.make_grid(5, 9, bias=0.5, norm=True))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_hungarian_cost_and_match_parity_with_reference_matcher():
    from src.utils.matcher import HungarianMatcherWoL1

    rng = np.random.default_rng(5)
    b, n, t = 2, 40, 6
    logits = rng.normal(size=(b, n, 2)).astype(np.float32)
    pred_boxes = _rand_boxes(rng, b, n)
    gt_xyxy = np.asarray(G.cxcyhw_to_xyxy(jnp.asarray(_rand_boxes(rng, b, t))))
    labels = np.zeros((b, t), np.int64)

    ref_matcher = HungarianMatcherWoL1(cost_class=1, cost_ciou=1)
    ref_targets = [
        {"labels": T(labels[i]), "boxes": T(gt_xyxy[i])} for i in range(b)
    ]
    ref_idx = ref_matcher(
        {"pred_class": T(logits), "pred_boxes": T(pred_boxes)}, ref_targets
    )

    outputs = {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(pred_boxes)}
    targets = {
        "boxes": jnp.asarray(gt_xyxy),
        "labels": jnp.asarray(labels.astype(np.int32)),
        "valid": jnp.ones((b, t), bool),
    }
    cost = np.asarray(hungarian_cost_matrix(outputs, targets))

    from object_detection_destr_tpu.losses.matcher import hungarian_match

    rows = np.asarray(hungarian_match(outputs, targets))
    for i in range(b):
        ri, ci = ref_idx[i][0].numpy(), ref_idx[i][1].numpy()
        ref_cost = cost[i][ri, ci].sum()
        our_cost = cost[i][rows[i], np.arange(t)].sum()
        denom = max(abs(ref_cost), 1e-6)
        assert (our_cost - ref_cost) / denom < 5e-3


def test_set_criterion_matches_reference_criterion():
    """Same matcher indices fed to both criteria -> same loss values."""
    from src.utils.criterion import CompleteIOULoss, SetCriterion
    from src.utils.misc import sigmoid_focal_loss as ref_focal

    rng = np.random.default_rng(6)
    b, n, t = 2, 25, 5
    logits = rng.normal(size=(b, n, 2)).astype(np.float32)
    pred_boxes = _rand_boxes(rng, b, n)
    gt_xyxy = np.asarray(G.cxcyhw_to_xyxy(jnp.asarray(_rand_boxes(rng, b, t))))
    labels = np.zeros((b, t), np.int64)

    # a fixed, shared assignment
    rows = np.stack([rng.permutation(n)[:t] for _ in range(b)]).astype(np.int64)

    class FixedMatcher:
        def __call__(self, outputs, targets):
            return [
                (torch.from_numpy(rows[i]), torch.arange(t)) for i in range(b)
            ]

    ref_crit = SetCriterion(
        num_classes=2,
        matcher=FixedMatcher(),
        loss_fn={
            "class": ref_focal,
            "bbox": torch.nn.L1Loss(),
            "ciou": CompleteIOULoss(),
        },
    )
    ref_targets = [
        {"labels": T(labels[i]), "boxes": T(gt_xyxy[i])} for i in range(b)
    ]
    ref_losses = ref_crit(
        {"pred_class": T(logits), "pred_boxes": T(pred_boxes)}, ref_targets
    )

    outputs = {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(pred_boxes)}
    targets = {
        "boxes": jnp.asarray(gt_xyxy),
        "labels": jnp.asarray(labels.astype(np.int32)),
        "valid": jnp.ones((b, t), bool),
    }
    ours = set_criterion(
        outputs, targets, rows=jnp.asarray(rows.astype(np.int32)),
        ciou_mode="reference",  # the reference's pairwise-matrix CIoU mean
    )
    np.testing.assert_allclose(
        float(ours["class"]), float(ref_losses["class"]), rtol=1e-4
    )
    np.testing.assert_allclose(float(ours["bbox"]), float(ref_losses["bbox"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours["ciou"]), float(ref_losses["ciou"]), rtol=1e-3)


def test_pair_selection_matches_reference():
    from src.model.attention.pair_self_attention import _get_pairs

    rng = np.random.default_rng(7)
    boxes = _rand_boxes(rng, 2, 8)
    ref = _get_pairs(T(boxes)).numpy()
    ours = np.asarray(get_pairs(jnp.asarray(boxes)))
    np.testing.assert_array_equal(ours, ref)


def test_pair_attention_matches_reference_module():
    from src.model.attention.pair_self_attention import PairSelfAttention

    rng = np.random.default_rng(8)
    b, h, s, d = 2, 4, 6, 8
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    boxes = _rand_boxes(rng, b, s)

    ref_mod = PairSelfAttention(heads_num=h)
    with torch.no_grad():
        ref = ref_mod(T(q), T(k), T(v), T(boxes)).numpy()  # (B, S, h*d)

    ours = np.asarray(
        pair_self_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(boxes),
            pair_mode="reference", pair_output_mode="reference",
        )
    )
    np.testing.assert_allclose(ours, ref.reshape(b, s, h * d), rtol=1e-4, atol=1e-5)


def test_map_metric_matches_reference_metric():
    from src.utils.criterion import MeanAveragePrecision as RefMAP

    rng = np.random.default_rng(9)
    b, n = 3, 20
    logits = rng.normal(size=(b, n, 2)).astype(np.float32)
    pred_boxes = _rand_boxes(rng, b, n)
    counts = [4, 2, 5]
    t_max = max(counts)
    gt = _rand_boxes(rng, b, t_max)
    gt_xyxy = np.asarray(G.cxcyhw_to_xyxy(jnp.asarray(gt)))

    ref_metric = RefMAP(num_cls=1, num_pred=n)
    ref_targets = tuple(
        {"labels": torch.zeros(c, dtype=torch.long), "boxes": T(gt_xyxy[i, :c])}
        for i, c in enumerate(counts)
    )
    ref_metric(
        {"pred_class": T(logits), "pred_boxes": T(pred_boxes)}, ref_targets
    )
    ref_ap = ref_metric.compute()

    metric = MeanAveragePrecision(num_cls=1, num_pred=n)
    valid = np.arange(t_max)[None, :] < np.asarray(counts)[:, None]
    state = metric.update(
        metric.init_state(),
        {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(pred_boxes)},
        {
            "boxes": jnp.asarray(gt_xyxy),
            "labels": jnp.zeros((b, t_max), jnp.int32),
            "valid": jnp.asarray(valid),
        },
    )
    np.testing.assert_allclose(metric.compute(state), float(ref_ap), atol=1e-6)


def test_encoder_weight_transfer_parity():
    """Whole-encoder functional equivalence: reference Encoder weights
    converted into our flax Encoder must produce the same tokens (masked
    MHSA, content-adaptive pos scaling, shared outer residual norm)."""
    from src.model.blocks.encoder_block import Encoder as RefEncoder
    from src.model.blocks.encoder_block import EncoderBlock as RefBlock

    from object_detection_destr_tpu.models.convert import (
        destr_encoder_params_from_torch,
    )
    from object_detection_destr_tpu.models.destr.encoder import Encoder

    torch.manual_seed(0)
    num_blocks, c, heads = 2, 256, 8
    ref = RefEncoder(RefBlock(hidden_dim=c, heads_num=heads), num_blocks)
    ref.eval()

    rng = np.random.default_rng(10)
    b, h, w = 2, 3, 3
    x = rng.normal(size=(b, c, h, w)).astype(np.float32)
    pos = rng.normal(size=(b, c, h, w)).astype(np.float32)
    pad_mask = np.zeros((b, h, w), bool)
    pad_mask[0, 2, :] = True  # padded bottom row in image 0

    with torch.no_grad():
        ref_out = ref(T(x), T(pad_mask), T(pos)).numpy()  # (B, C, H, W)

    params = destr_encoder_params_from_torch(ref.state_dict(), num_blocks)
    ours_mod = Encoder(hidden_dim=c, num_heads=heads, ffn_dim=2048, num_blocks=num_blocks)
    tokens = jnp.asarray(x.reshape(b, c, h * w).transpose(0, 2, 1))
    pos_tokens = jnp.asarray(pos.reshape(b, c, h * w).transpose(0, 2, 1))
    valid = jnp.asarray(~pad_mask.reshape(b, h * w))
    ours = ours_mod.apply({"params": params}, tokens, pos_tokens, valid)
    ours_map = np.asarray(ours).transpose(0, 2, 1).reshape(b, c, h, w)
    np.testing.assert_allclose(ours_map, ref_out, rtol=2e-4, atol=2e-5)


def test_decoder_weight_transfer_parity():
    """Whole-decoder functional equivalence with the reference: pair + plain
    self-attention blend, split cls/reg concat-QK cross-attention, per-layer
    box refinement with a shared bbox head, outer residual norm."""
    from src.model.blocks.decoder_block import Decoder as RefDecoder
    from src.model.blocks.decoder_block import DecoderBlock as RefBlock

    from flax import linen as nn
    from object_detection_destr_tpu.models.convert import (
        destr_decoder_params_from_torch,
    )
    from object_detection_destr_tpu.models.destr.decoder import Decoder
    from object_detection_destr_tpu.models.destr.layers import Mlp

    torch.manual_seed(1)
    num_blocks, c, heads = 2, 256, 8
    ref = RefDecoder(RefBlock(hidden_dim=c, heads_num=heads), num_blocks)
    ref.eval()
    # REFCOMPAT defect #2: the reference's SelfAttention constructs
    # nn.Dropout inside forward, so eval() does NOT disable it — zero the
    # probability on the instances to get deterministic reference outputs
    for blk in ref._decoder:
        blk._self_attn._dropout_prob = 0.0
        blk._cls_branch.cross_attn._dropout_prob = 0.0
        blk._reg_branch.cross_attn._dropout_prob = 0.0

    ref_bbox = torch.nn.Sequential(
        torch.nn.Linear(c, c), torch.nn.ReLU(), torch.nn.Linear(c, 4)
    )
    ref_bbox.eval()

    rng = np.random.default_rng(11)
    b, s, l = 2, 5, 9
    objects = rng.normal(size=(b, s, 2 * c)).astype(np.float32) * 0.5
    enc = rng.normal(size=(b, l, c)).astype(np.float32) * 0.5
    fine_pos = rng.normal(size=(b, l, c)).astype(np.float32) * 0.5
    obj_pos = rng.normal(size=(b, s, c)).astype(np.float32) * 0.5
    centers = rng.uniform(0.3, 0.7, size=(b, s, 2)).astype(np.float32)
    pad = np.zeros((b, l), bool)
    pad[0, 7:] = True

    with torch.no_grad():
        ref_out = ref(
            T(objects), T(enc), T(pad), T(fine_pos), T(obj_pos),
            T(centers), ref_bbox,
        ).numpy()

    class Wrap(nn.Module):
        def setup(self):
            self.dec = Decoder(hidden_dim=c, num_heads=heads, num_blocks=num_blocks)
            self.bbox = Mlp([c, 4])

        def __call__(self, objects, enc, valid, fine_pos, obj_pos, centers):
            return self.dec(
                objects, enc, valid, fine_pos, obj_pos, centers,
                bbox_embed=self.bbox, deterministic=True,
            )

    params = {
        "dec": destr_decoder_params_from_torch(ref.state_dict(), num_blocks),
        "bbox": {
            "fc0": {"kernel": ref_bbox[0].weight.detach().numpy().T,
                    "bias": ref_bbox[0].bias.detach().numpy()},
            "fc1": {"kernel": ref_bbox[2].weight.detach().numpy().T,
                    "bias": ref_bbox[2].bias.detach().numpy()},
        },
    }
    ours = Wrap().apply(
        {"params": params},
        jnp.asarray(objects), jnp.asarray(enc), jnp.asarray(~pad),
        jnp.asarray(fine_pos), jnp.asarray(obj_pos), jnp.asarray(centers),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-4, atol=2e-4)
