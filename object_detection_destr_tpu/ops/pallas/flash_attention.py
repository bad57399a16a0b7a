"""Masked multi-head attention as a Pallas TPU kernel.

TPU-native replacement for the reference encoder's ``nn.MultiheadAttention``
over HW image tokens (encoder_block.py:57-63). Sequence lengths here are
short (400 tokens at 640px, ~1050 at 1333px), so the kernel streams q in
MXU-aligned tiles while keeping each head's full K/V resident in VMEM — the
(S_q, S_k) logits matrix only ever exists one tile at a time in VMEM and is
fused with the softmax and the PV matmul (never written to HBM, which is
the HBM-bandwidth win over a naive composition).

Numerically: logits and softmax accumulate in f32 regardless of input dtype
(MXU ``preferred_element_type``); padded key positions get -1e9 before the
softmax like ops/attention.py:81.

The wrapper pads S_q/S_k up to tile multiples and trims afterwards, so any
shape works. On non-TPU backends the kernel runs in interpreter mode (slow,
tests only).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One (head, q-tile) program: full-K attention for a bq-row stripe.

    Shapes (VMEM):
        q_ref: (1, bq, d), k_ref/v_ref: (1, Sk, d), mask_ref: (1, Sk) int32,
        o_ref: (1, bq, d).
    """
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (Sk, d)
    v = v_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, Sk)
    valid = mask_ref[0, :] > 0  # (Sk,)
    logits = jnp.where(valid[None, :], logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret")
)
def flash_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    key_valid_mask: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused masked attention.

    Args:
        query: (B, h, Sq, d); key/value: (B, h, Sk, d).
        key_valid_mask: (B, Sk) bool, True = attendable.

    Returns:
        (B, h, Sq, d) in the query dtype.
    """
    b, h, sq, d = query.shape
    sk = key.shape[2]
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bq = min(block_q, max(8, sq))
    sq_pad = -(-sq // bq) * bq
    # lane-align Sk so the logits tile is (bq, Sk) with Sk % 128 == 0
    sk_pad = -(-sk // 128) * 128

    qp = jnp.pad(query, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    kp = jnp.pad(key, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    vp = jnp.pad(value, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    if key_valid_mask is None:
        key_valid_mask = jnp.ones((b, sk), bool)
    mask = jnp.pad(key_valid_mask.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)))
    # broadcast mask over heads -> (B*h, Sk)
    mask_bh = jnp.repeat(mask, h, axis=0)

    qf = qp.reshape(b * h, sq_pad, d)
    kf = kp.reshape(b * h, sk_pad, d)
    vf = vp.reshape(b * h, sk_pad, d)

    grid = (b * h, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), query.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qf, kf, vf, mask_bh)
    return out.reshape(b, h, sq_pad, d)[:, :, :sq]
