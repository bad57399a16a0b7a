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
        out = flash_attention_trainable(q, k, v, mask, None, 16, True)
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
    t = flash_attention_trainable(q, k, v, None, None, 8, True)
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
