"""Model-layer tests: forward contracts, shapes, masking, and jit-ability of
the DESTR and SSD models (the reference has only run-to-completion smoke
blocks, SURVEY.md §4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.config import DestrConfig, SSDConfig  # noqa: E402
from object_detection_destr_tpu.models.destr.model import build_destr  # noqa: E402
from object_detection_destr_tpu.models.resnet import downsample_mask, resnet50  # noqa: E402
from object_detection_destr_tpu.models.ssd.model import build_ssd  # noqa: E402

TINY = DestrConfig(
    hidden_dim=32,
    num_heads=4,
    num_encoder_blocks=2,
    num_decoder_blocks=2,
    top_k=4,
    ffn_dim=64,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def destr_vars():
    model = build_destr(TINY)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, images, train=False)
    return model, variables


def test_destr_forward_contract(destr_vars):
    """Output dict mirrors model.py:131-133: (model_output, det_output),
    boxes cxcyhw in [0, 1], class entries raw logits."""
    model, variables = destr_vars
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    model_out, det_out = model.apply(variables, images, train=False)
    k, hw = TINY.top_k, (64 // 32) ** 2
    assert model_out["pred_class"].shape == (2, k, TINY.num_cls)
    assert model_out["pred_boxes"].shape == (2, k, 4)
    assert det_out["pred_class"].shape == (2, hw, TINY.num_cls)
    assert det_out["pred_boxes"].shape == (2, hw, 4)
    for out in (model_out, det_out):
        b = np.asarray(out["pred_boxes"])
        assert (b >= 0).all() and (b <= 1).all()
        assert np.isfinite(np.asarray(out["pred_class"])).all()


def test_destr_respects_valid_mask(destr_vars):
    """Padded image regions must not change valid-region predictions: feeding
    garbage into masked-off pixels leaves det_output rows for valid tokens
    unchanged (mask plumbing through backbone/encoder/mini-detector)."""
    model, variables = destr_vars
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    mask = np.zeros((1, 64, 64), bool)
    mask[:, :32, :] = True  # top half valid -> C5 tokens rows 0 valid

    garbage = base.copy()
    garbage[:, 32:, :, :] = 999.0

    out1, det1 = model.apply(variables, jnp.asarray(base), jnp.asarray(mask))
    out2, det2 = model.apply(variables, jnp.asarray(garbage), jnp.asarray(mask))
    # token grid is 2x2; rows 0-1 (top) valid. NB: the backbone's receptive
    # field crosses the mask boundary, so only masked *token* outputs are
    # compared (mask is applied at token level, like the reference's
    # NestedTensor mask).
    d1 = np.asarray(det1["pred_class"]).reshape(1, 2, 2, -1)
    d2 = np.asarray(det2["pred_class"]).reshape(1, 2, 2, -1)
    # bottom (invalid) tokens are zeroed in both: mask_invalid_features
    np.testing.assert_allclose(d1[:, 1], d2[:, 1], atol=1e-5)


def test_destr_dropout_deterministic_in_eval(destr_vars):
    model, variables = destr_vars
    cfg = DestrConfig(
        hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
        top_k=4, ffn_dim=64, dropout=0.3,
    )
    m = build_destr(cfg)
    images = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(np.float32)
    )
    v = m.init({"params": jax.random.key(0)}, images, train=False)
    a, _ = m.apply(v, images, train=False)
    b, _ = m.apply(v, images, train=False)
    # REFCOMPAT fix #2: eval forward is deterministic (reference kept dropout on)
    np.testing.assert_array_equal(np.asarray(a["pred_class"]), np.asarray(b["pred_class"]))


def test_resnet_stage_strides():
    model = resnet50()
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out["layer1"].shape == (1, 56, 56, 256)
    assert out["layer2"].shape == (1, 28, 28, 512)
    assert out["layer3"].shape == (1, 14, 14, 1024)
    assert out["layer4"].shape == (1, 7, 7, 2048)


def test_resnet_dilation_keeps_c5_resolution():
    model = resnet50(dilation=True)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    # dilated layer4: stride 16 instead of 32 (backbone.py:139-143)
    assert out["layer4"].shape == (1, 14, 14, 2048)


def test_s2d_stem_matches_plain_conv():
    """The space-to-depth stem is an exact rewrite of the 7x7/s2 conv:
    identical param tree (conv1/kernel (7,7,3,64)) and matching outputs,
    including odd spatial sizes (appended zero row/col lands in padding)."""
    from object_detection_destr_tpu.models.resnet import ResNet

    for size in (64, 63):
        x = jnp.asarray(
            np.random.default_rng(size).normal(size=(2, size, size, 3)).astype(np.float32)
        )
        plain = ResNet(stage_sizes=(1, 1, 1, 1), s2d_stem=False)
        s2d = ResNet(stage_sizes=(1, 1, 1, 1), s2d_stem=True)
        variables = plain.init(jax.random.key(1), x)
        assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
        # same param tree -> s2d applies the plain-init variables directly
        out_a = plain.apply(variables, x)
        out_b = s2d.apply(variables, x)
        for k in out_a:
            np.testing.assert_allclose(
                np.asarray(out_a[k]), np.asarray(out_b[k]), rtol=2e-4, atol=2e-4
            )


def test_downsample_mask_nearest():
    mask = jnp.asarray(np.tri(8, 8, dtype=bool))[None]
    small = downsample_mask(mask, (4, 4))
    assert small.shape == (1, 4, 4)
    # nearest with floor indexing: src = floor(dst * 8 / 4)
    np.testing.assert_array_equal(
        np.asarray(small[0]), np.asarray(mask[0])[::2][:, ::2]
    )


@pytest.mark.slow
def test_ssd_forward_shapes_300px():
    """Full 300px SSD pyramid closes to the training-side grids
    [37,19,10,5,3,1] (matcher.py:214; REFCOMPAT fix #5)."""
    cfg = SSDConfig(num_cls=20)
    model = build_ssd(cfg)
    images = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, images, train=False)
    out = model.apply(variables, images, train=False)
    shapes = [b.shape for b in out["boxes"]]
    expected = list(zip(cfg.feature_shapes, cfg.anchors_per_scale))
    for (h_w, num_a), shape in zip(expected, shapes):
        assert shape == (1, h_w, h_w, num_a, 4), (shape, h_w, num_a)
    for (h_w, num_a), conf in zip(expected, out["conf"]):
        assert conf.shape == (1, h_w, h_w, num_a, cfg.num_cls + 1)


def test_destr_learned_position_embedding():
    """The reference's PositionEmbeddingLearned variant
    (position_encoding_cdetr.py:93-127) behind DestrConfig.pos_embed."""
    cfg = DestrConfig(
        hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
        top_k=4, ffn_dim=64, dropout=0.0, pos_embed="learned",
    )
    model = build_destr(cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, images, train=False)
    assert "pos_embedding" in variables["params"]
    tables = variables["params"]["pos_embedding"]
    assert tables["row_embed"]["embedding"].shape == (50, 16)
    model_out, _ = model.apply(variables, images, train=False)
    assert model_out["pred_class"].shape == (1, 4, 2)
