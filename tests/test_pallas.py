"""Pallas kernel tests (interpret mode on the CPU suite; the same code
compiles natively on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.ops.attention import (  # noqa: E402
    scaled_dot_product_attention,
)
from object_detection_destr_tpu.ops.pallas.flash_attention import (  # noqa: E402
    flash_attention,
)


@pytest.mark.parametrize("sq,sk", [(16, 16), (100, 130)])
def test_flash_attention_matches_xla(sq, sk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 32
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, sk // 2 :] = False
    mask = jnp.asarray(mask)

    ours = flash_attention(q, k, v, mask, block_q=32, interpret=True)
    ref = scaled_dot_product_attention(q, k, v, key_valid_mask=mask)
    # ref merges heads; ours keeps (B, h, S, d)
    ours_merged = ours.transpose(0, 2, 1, 3).reshape(b, sq, h * d)
    np.testing.assert_allclose(np.asarray(ours_merged), np.asarray(ref), atol=2e-5)


def test_flash_attention_full_pad_row_is_finite():
    b, h, sq, sk, d = 1, 2, 8, 16, 32
    q = jnp.ones((b, h, sq, d))
    k = jnp.ones((b, h, sk, d))
    v = jnp.ones((b, h, sk, d))
    mask = jnp.zeros((b, sk), bool)  # nothing attendable
    out = flash_attention(q, k, v, mask, block_q=8, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_attention_trainable_grads_match_xla():
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_trainable,
    )

    rng = np.random.default_rng(3)
    b, h, sq, sk, d = 2, 2, 24, 40, 32
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 30:] = False
    mask = jnp.asarray(mask)
    # fixed cotangent via a weighted-sum loss
    w = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, mask, None, 0.0, None, 16, 128, True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        ref = scaled_dot_product_attention(q, k, v, key_valid_mask=mask)
        ref = ref.reshape(b, sq, h, d).transpose(0, 2, 1, 3)
        return jnp.sum(ref * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} mismatch",
        )


def test_flash_attention_trainable_forward_matches_plain():
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention,
        flash_attention_trainable,
    )

    rng = np.random.default_rng(4)
    b, h, s, d = 1, 2, 16, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    a = flash_attention(q, k, v, block_q=8, interpret=True)
    t = flash_attention_trainable(q, k, v, None, None, 0.0, None, 8, 512, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(t), atol=1e-6)


def test_encoder_flash_path_matches_xla_path():
    """Encoder with use_flash=True must reproduce the XLA attention path
    (forward AND gradients), interpret mode on CPU."""
    from object_detection_destr_tpu.models.destr.encoder import Encoder

    rng = np.random.default_rng(5)
    c, heads, s_len, b = 32, 4, 12, 2
    tokens = jnp.asarray(rng.normal(size=(b, s_len, c)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(b, s_len, c)).astype(np.float32))
    valid = np.ones((b, s_len), bool)
    valid[0, 9:] = False
    valid = jnp.asarray(valid)

    xla_enc = Encoder(hidden_dim=c, num_heads=heads, ffn_dim=64, num_blocks=2,
                      dropout=0.0, use_flash=False)
    params = xla_enc.init(jax.random.key(0), tokens, pos, valid)["params"]
    flash_enc = Encoder(hidden_dim=c, num_heads=heads, ffn_dim=64, num_blocks=2,
                        dropout=0.0, use_flash=True)

    out_x = xla_enc.apply({"params": params}, tokens, pos, valid)
    out_f = flash_enc.apply({"params": params}, tokens, pos, valid)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=2e-4, atol=2e-5)

    def loss(mod):
        def f(p):
            return jnp.sum(mod.apply({"params": p}, tokens, pos, valid) ** 2)
        return f

    gx = jax.grad(loss(xla_enc))(params)
    gf = jax.grad(loss(flash_enc))(params)
    jax.tree.map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-5
        ),
        gx, gf,
    )


def test_flash_attention_multi_k_tile_matches_xla():
    """Streaming K/V tiles (n_k > 1) must agree with the one-shot XLA path."""
    rng = np.random.default_rng(7)
    b, h, sq, sk, d = 1, 2, 40, 300, 32
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 250:] = False
    mask = jnp.asarray(mask)

    ours = flash_attention(q, k, v, mask, block_q=16, block_k=128, interpret=True)
    ref = scaled_dot_product_attention(q, k, v, key_valid_mask=mask)
    ours_merged = ours.transpose(0, 2, 1, 3).reshape(b, sq, h * d)
    np.testing.assert_allclose(np.asarray(ours_merged), np.asarray(ref), atol=2e-5)


def test_flash_attention_separate_value_dim():
    """d_v != d_qk (decoder concat-QK cross attention: d=2C, dv=C)."""
    rng = np.random.default_rng(8)
    b, h, sq, sk, d, dv = 2, 1, 24, 150, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, dv)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[1, 100:] = False
    mask = jnp.asarray(mask)

    ours = flash_attention(q, k, v, mask, block_q=16, block_k=128, interpret=True)
    ref = scaled_dot_product_attention(q, k, v, key_valid_mask=mask)
    np.testing.assert_allclose(
        np.asarray(ours.transpose(0, 2, 1, 3).reshape(b, sq, h * dv)),
        np.asarray(ref), atol=2e-5,
    )

    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_trainable,
    )
    w = jnp.asarray(rng.normal(size=(b, h, sq, dv)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, mask, None, 0.0, None, 16, 128, True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        ref = scaled_dot_product_attention(q, k, v, key_valid_mask=mask)
        return jnp.sum(ref.reshape(b, sq, h, dv).transpose(0, 2, 1, 3) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} mismatch",
        )


def _manual_dropout_attention(q, k, v, mask, keep, rate):
    """Plain-jnp attention applying an explicit keep mask to the softmax
    probabilities — the ground truth for the kernel's dropout math."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d**0.5)
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    b, h, sq, sk = probs.shape
    keep = keep[:, :sq, :sk].reshape(b, h, sq, sk)
    probs = jnp.where(keep > 0, probs / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkv->bhqv", probs, v)


def test_flash_attention_dropout_matches_manual():
    """Interpret-mode dropout must equal attention with the exposed keep
    mask applied to the probabilities (forward AND gradients)."""
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        dropout_keep_mask,
        flash_attention_trainable,
    )

    rng = np.random.default_rng(11)
    b, h, sq, sk, d, rate, seed = 1, 2, 24, 40, 32, 0.3, 42
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 33:] = False
    mask = jnp.asarray(mask)
    bq, bk = 8, 128
    sq_pad, sk_pad = 24, 128
    keep = dropout_keep_mask(jnp.int32(seed), b * h, sq_pad, sk_pad, rate)

    out = flash_attention(
        q, k, v, mask, jnp.int32(seed), rate, block_q=bq, block_k=bk, interpret=True
    )
    expected = _manual_dropout_attention(q, k, v, mask, keep, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    w = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention_trainable(
            q, k, v, mask, jnp.int32(seed), rate, None, bq, bk, True
        )
        return jnp.sum(out * w)

    def loss_manual(q, k, v):
        return jnp.sum(_manual_dropout_attention(q, k, v, mask, keep, rate) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gm = jax.grad(loss_manual, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gf, gm, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} mismatch under dropout",
        )


def test_flash_attention_dropout_statistics_and_determinism():
    rng = np.random.default_rng(12)
    b, h, s, d, rate = 2, 4, 64, 32, 0.3
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

    o1 = flash_attention(q, k, v, None, jnp.int32(7), rate, interpret=True)
    o2 = flash_attention(q, k, v, None, jnp.int32(7), rate, interpret=True)
    o3 = flash_attention(q, k, v, None, jnp.int32(8), rate, interpret=True)
    assert np.array_equal(np.asarray(o1), np.asarray(o2)), "same seed must repeat"
    assert not np.array_equal(np.asarray(o1), np.asarray(o3)), "seeds must differ"

    from object_detection_destr_tpu.ops.pallas.flash_attention import dropout_keep_mask
    keep = np.asarray(dropout_keep_mask(jnp.int32(7), 64, 256, 256, rate))
    frac = 1.0 - keep.mean()
    assert abs(frac - rate) < 0.01, f"drop fraction {frac} vs rate {rate}"

    # expectation preserved: averaged over seeds, dropout output ~ clean output
    clean = flash_attention(q, k, v, interpret=True)
    acc = np.zeros_like(np.asarray(clean))
    n_seeds = 24
    for sd in range(n_seeds):
        acc += np.asarray(
            flash_attention(q, k, v, None, jnp.int32(100 + sd), rate, interpret=True)
        )
    resid = np.abs(acc / n_seeds - np.asarray(clean)).mean()
    scale = np.abs(np.asarray(clean)).mean()
    assert resid < 0.2 * scale, f"mean residual {resid} vs scale {scale}"


def test_clsreg_branch_flash_path_matches_xla():
    """Decoder cross-attention branch: use_flash=True reproduces the XLA
    path (forward and gradients), dropout off."""
    from object_detection_destr_tpu.models.destr.decoder import ClsRegBranch

    rng = np.random.default_rng(13)
    b, s, l, c = 2, 12, 50, 32
    inputs = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(b, s, 2 * c)).astype(np.float32))
    key = jnp.asarray(rng.normal(size=(b, l, 2 * c)).astype(np.float32))
    value = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    valid = np.ones((b, l), bool)
    valid[0, 40:] = False
    valid = jnp.asarray(valid)

    xla_br = ClsRegBranch(hidden_dim=c, dropout=0.0, use_flash=False)
    params = xla_br.init(jax.random.key(0), inputs, query, key, value, valid)["params"]
    flash_br = ClsRegBranch(hidden_dim=c, dropout=0.0, use_flash=True)

    out_x = xla_br.apply({"params": params}, inputs, query, key, value, valid)
    out_f = flash_br.apply({"params": params}, inputs, query, key, value, valid)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=2e-4, atol=2e-5)

    def loss(mod):
        def f(p):
            return jnp.sum(
                mod.apply({"params": p}, inputs, query, key, value, valid) ** 2
            )
        return f

    gx = jax.grad(loss(xla_br))(params)
    gf = jax.grad(loss(flash_br))(params)
    jax.tree.map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-5
        ),
        gx, gf,
    )


def test_decoder_flash_path_matches_xla():
    """Whole decoder with use_flash=True (cross attention fused) must match
    the XLA decoder, dropout off."""
    from object_detection_destr_tpu.models.destr.decoder import Decoder
    from object_detection_destr_tpu.models.destr.layers import Mlp

    rng = np.random.default_rng(14)
    b, s, l, c = 2, 8, 30, 32
    objs = jnp.asarray(rng.normal(size=(b, s, 2 * c)).astype(np.float32))
    enc = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    fine_pos = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    obj_pos = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, s, 2)).astype(np.float32))
    valid = np.ones((b, l), bool)
    valid[1, 20:] = False
    valid = jnp.asarray(valid)

    bbox_embed = Mlp([c, 4])
    bparams = bbox_embed.init(jax.random.key(1), jnp.zeros((1, c)))["params"]

    def run(flash, params=None):
        dec = Decoder(hidden_dim=c, num_heads=4, num_blocks=2, dropout=0.0,
                      use_flash=flash)

        class Wrapper:  # bind the shared bbox head like the model does
            pass

        import flax.linen as fnn

        class Host(fnn.Module):
            use_flash: bool

            def setup(self):
                self.bbox = Mlp([c, 4], name="bbox")
                self.dec = Decoder(hidden_dim=c, num_heads=4, num_blocks=2,
                                   dropout=0.0, use_flash=self.use_flash, name="dec")

            def __call__(self):
                return self.dec(objs, enc, valid, fine_pos, obj_pos, centers,
                                self.bbox)

        host = Host(use_flash=flash)
        if params is None:
            params = host.init(jax.random.key(2))["params"]
        return host.apply({"params": params}), params

    out_x, params = run(False)
    out_f, _ = run(True, params)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=3e-4, atol=3e-5)


def test_decoder_flash_grads_match_xla():
    """Whole-decoder gradient parity between the flash and XLA paths.

    Exercises the MERGED cls/reg cross-attention backward (decoder.py: one
    flash call over the stacked query sets, joint dK/dV accumulated
    in-kernel) which the forward-only test above cannot see: the stacked
    rows share K/V, so any error in the joint accumulation shows up only
    in the parameter gradients of ca_k_enc / ca_k_pos / ca_v_enc.
    """
    import flax.linen as fnn

    from object_detection_destr_tpu.models.destr.decoder import Decoder
    from object_detection_destr_tpu.models.destr.layers import Mlp

    rng = np.random.default_rng(15)
    b, s, l, c = 2, 8, 30, 32
    objs = jnp.asarray(rng.normal(size=(b, s, 2 * c)).astype(np.float32))
    enc = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    fine_pos = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    obj_pos = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, s, 2)).astype(np.float32))
    valid = np.ones((b, l), bool)
    valid[1, 20:] = False
    valid = jnp.asarray(valid)

    class Host(fnn.Module):
        use_flash: bool

        def setup(self):
            self.bbox = Mlp([c, 4], name="bbox")
            # 1 block keeps the interpret-mode grad traces cheap; the merged
            # cross-attention backward is per-block identical.
            self.dec = Decoder(hidden_dim=c, num_heads=4, num_blocks=1,
                               dropout=0.0, use_flash=self.use_flash, name="dec")

        def __call__(self):
            return self.dec(objs, enc, valid, fine_pos, obj_pos, centers,
                            self.bbox)

    params = Host(use_flash=False).init(jax.random.key(3))["params"]

    def loss(flash):
        def f(p):
            return jnp.sum(Host(use_flash=flash).apply({"params": p}) ** 2)
        return f

    gx = jax.grad(loss(False))(params)
    gf = jax.grad(loss(True))(params)
    jax.tree.map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-4
        ),
        gx, gf,
    )


def test_decoder_self_attn_flash_path_matches_xla():
    """The plain self-attention branch of the decoder block must produce the
    same output through the flash kernel as through XLA (eval mode; the pair
    branch stays XLA in both)."""
    from flax import linen as nn

    from object_detection_destr_tpu.models.destr.decoder import Decoder
    from object_detection_destr_tpu.models.destr.layers import Mlp

    class Wrap(nn.Module):
        use_flash: bool

        def setup(self):
            self.dec = Decoder(
                hidden_dim=32, num_heads=4, num_blocks=2, use_flash=self.use_flash
            )
            self.bbox = Mlp([32, 4])

        def __call__(self, *a):
            return self.dec(*a, bbox_embed=self.bbox, deterministic=True)

    rng = np.random.default_rng(0)
    b, s, l, c = 2, 6, 9, 32
    args = (
        jnp.asarray(rng.normal(size=(b, s, 2 * c)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32)),
        jnp.asarray(np.ones((b, l), bool)),
        jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.7, (b, s, 2)).astype(np.float32)),
    )
    m0 = Wrap(False)
    params = m0.init(jax.random.key(0), *args)
    o0 = m0.apply(params, *args)
    o1 = Wrap(True).apply(params, *args)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-4)


# ---------------------------------------------------------------------------
# head-packed kernel (r3): (B, S, h*d) layout, no call-site transposes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sq,sk,h,d,dv", [
    (16, 16, 4, 32, 32),
    (100, 130, 8, 32, 32),
    (24, 40, 1, 64, 32),   # single head, dv != d (ClsRegBranch geometry)
    (12, 400, 8, 64, 32),  # decoder cross-attn geometry
])
def test_flash_packed_matches_xla(sq, sk, h, d, dv):
    from object_detection_destr_tpu.ops.attention import combine_heads, split_heads
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(10)
    b = 2
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * dv)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, sk // 2 :] = False
    mask = jnp.asarray(mask)

    ours = flash_attention_packed(q, k, v, h, mask, None, 0.0, None, 32, 128, True)
    ref = scaled_dot_product_attention(
        split_heads(q, h), split_heads(k, h), split_heads(v, h),
        key_valid_mask=mask,
    )  # (B, Sq, h*dv), heads merged
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)


def test_flash_packed_grads_match_xla():
    from object_detection_destr_tpu.ops.attention import split_heads
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(11)
    b, h, sq, sk, d = 2, 4, 24, 40, 32
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 30:] = False
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))

    def loss_packed(q, k, v):
        out = flash_attention_packed(q, k, v, h, mask, None, 0.0, None, 16, 128, True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        ref = scaled_dot_product_attention(
            split_heads(q, h), split_heads(k, h), split_heads(v, h),
            key_valid_mask=mask,
        )
        return jnp.sum(ref * w)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=3e-4, atol=3e-5,
            err_msg=f"d{name} mismatch (packed)",
        )


def test_flash_packed_dropout_matches_unpacked_masks():
    """Same seed => bit-identical keep masks to the unpacked kernel
    (per-tile seeding uses bh = batch*num_heads + head), so outputs agree."""
    from object_detection_destr_tpu.ops.attention import split_heads
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
        flash_attention_trainable,
    )

    rng = np.random.default_rng(12)
    b, h, s, d = 2, 4, 32, 32
    rate, seed = 0.3, 1234
    q = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))

    packed = flash_attention_packed(
        q, k, v, h, None, seed, rate, None, 32, 128, True
    )
    unpacked4 = flash_attention_trainable(
        split_heads(q, h), split_heads(k, h), split_heads(v, h),
        None, seed, rate, None, 32, 128, True,
    )
    b_, h_, s_, d_ = unpacked4.shape
    unpacked = unpacked4.transpose(0, 2, 1, 3).reshape(b_, s_, h_ * d_)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(unpacked), atol=2e-6)


def test_flash_packed_full_pad_row_is_finite():
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    b, h, s, d = 1, 2, 16, 32
    q = jnp.ones((b, s, h * d))
    k = jnp.ones((b, s, h * d))
    v = jnp.ones((b, s, h * d))
    mask = jnp.zeros((b, s), bool)
    out = flash_attention_packed(q, k, v, h, mask, None, 0.0, None, 8, 128, True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_packed_multi_tile():
    """Multiple q AND k tiles exercise the running-stat recurrence per head."""
    from object_detection_destr_tpu.ops.attention import split_heads
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(13)
    b, h, sq, sk, d = 1, 8, 80, 300, 32
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 257:] = False
    mask = jnp.asarray(mask)
    ours = flash_attention_packed(q, k, v, h, mask, None, 0.0, None, 32, 128, True)
    ref = scaled_dot_product_attention(
        split_heads(q, h), split_heads(k, h), split_heads(v, h),
        key_valid_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)


def test_flash_packed_bwd_fused_matches_two_pass():
    """The single-launch fused backward (dQ/dK/dV in one sweep) must produce
    the same gradients as the two-pass form, with and without dropout (both
    draw per-tile keep masks from the same (bh, iq, jk) coordinates)."""
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        _bwd_impl_packed,
        _fwd_impl_packed,
    )

    rng = np.random.default_rng(14)
    b, h, sq, sk, d = 2, 4, 72, 136, 32
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    do = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 100:] = False
    mask = jnp.asarray(mask)

    for rate, seed in ((0.0, None), (0.3, 77)):
        out, lse = _fwd_impl_packed(q, k, v, h, mask, seed, rate, None, 32, 128, True)
        args = (q, k, v, h, mask, seed, out, lse, do, rate, None, 32, 128, True)
        g_fused = _bwd_impl_packed(*args, fused=True)
        g_two = _bwd_impl_packed(*args, fused=False)
        for a, bb, name in zip(g_fused, g_two, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-5,
                err_msg=f"{name} fused-vs-two-pass mismatch (rate={rate})",
            )


def test_flash_packed_fused_fit_gate():
    """Production encoder shape runs the fused backward unchunked; the
    7056-token dilated config (sk_pad 7168) must pick a smaller k-chunk
    (its full-row dK/dV scratches exceed VMEM) but still fuse."""
    from object_detection_destr_tpu.ops.pallas.flash_attention import (
        _pick_chunk_nk,
        _plan_packed,
    )

    bq, bk, sq_pad, sk_pad = _plan_packed(1600, 1600, 512, 512)
    assert _pick_chunk_nk(sk_pad // bk, bq, bk, 256, 256, 8, "prng") == sk_pad // bk
    bq, bk, sq_pad, sk_pad = _plan_packed(7056, 7056, 512, 512)
    c = _pick_chunk_nk(sk_pad // bk, bq, bk, 256, 256, 8, "prng")
    assert c is not None and 1 <= c < sk_pad // bk


def test_flash_packed_bwd_chunked_matches_two_pass(monkeypatch):
    """Force nc > 1 k-chunks (chunk_nk = 1) — per-chunk dQ partials summed
    in XLA must reproduce the two-pass gradients, dropout included."""
    import importlib

    fa = importlib.import_module(
        "object_detection_destr_tpu.ops.pallas.flash_attention"
    )
    monkeypatch.setattr(fa, "_pick_chunk_nk", lambda *a, **k: 1)

    rng = np.random.default_rng(15)
    b, h, sq, sk, d = 2, 4, 48, 400, 32  # sk_pad 512 / bk 128 -> 4 chunks
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    do = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 311:] = False
    mask = jnp.asarray(mask)

    for rate, seed in ((0.0, None), (0.3, 99)):
        out, lse = fa._fwd_impl_packed(
            q, k, v, h, mask, seed, rate, None, 16, 128, True
        )
        args = (q, k, v, h, mask, seed, out, lse, do, rate, None, 16, 128, True)
        g_fused = fa._bwd_impl_packed(*args, fused=True)
        g_two = fa._bwd_impl_packed(*args, fused=False)
        for a, bb, name in zip(g_fused, g_two, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-5,
                err_msg=f"{name} chunked-vs-two-pass mismatch (rate={rate})",
            )
