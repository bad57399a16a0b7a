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
