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

__all__ = ["flash_attention", "flash_attention_trainable"]

NEG_INF = -1e9


def _pick_block_q(block_q: int, sq: int, sk_pad: int) -> int:
    """Cap the q-tile so the kernel's (bq, Sk) f32 working tiles (logits/P in
    the forward; P/dP/dS in the backward) stay within a few MB of VMEM at
    long key lengths (7k tokens at dilated 1333px)."""
    budget = 2_000_000  # bytes per (bq, Sk) f32 tile
    cap = max(16, (budget // (sk_pad * 4)) // 8 * 8)
    return min(block_q, cap, max(8, sq))


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One (head, q-tile) program: full-K attention for a bq-row stripe.

    Shapes (VMEM):
        q_ref: (1, bq, d), k_ref/v_ref: (1, Sk, d),
        mask_ref: (1, 1, Sk) int32, o_ref: (1, bq, d).
    """
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (Sk, d)
    v = v_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, Sk)
    valid = mask_ref[0, 0, :] > 0  # (Sk,)
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

    sk_pad = -(-sk // 128) * 128  # lane-align Sk
    bq = _pick_block_q(block_q, sq, sk_pad)
    sq_pad = -(-sq // bq) * bq

    qp = jnp.pad(query, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    kp = jnp.pad(key, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    vp = jnp.pad(value, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    if key_valid_mask is None:
        key_valid_mask = jnp.ones((b, sk), bool)
    mask = jnp.pad(key_valid_mask.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)))
    # broadcast mask over heads; keep a singleton middle dim so the block
    # shape (1, 1, Sk) matches the array dims (TPU tiling rule: each block
    # dim must be 8/128-aligned or equal to the full array dim)
    mask_bh = jnp.repeat(mask, h, axis=0)[:, None, :]

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
            pl.BlockSpec(
                (1, 1, sk_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qf, kf, vf, mask_bh)
    return out.reshape(b, h, sq_pad, d)[:, :, :sq]


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref, dq_ref, dk_ref, dv_ref, *, scale: float
):
    """Backward for one (head, q-tile) program.

    Standard flash-attention backward with recomputed probabilities:
        P  = softmax(scale * QK^T + mask)
        D  = rowsum(dO * O)            (= rowsum(dP * P))
        dP = dO @ V^T
        dS = P * (dP - D)
        dQ = scale * dS @ K
        dK += scale * dS^T @ Q_tile    (accumulated across q tiles)
        dV += P^T @ dO                 (accumulated across q tiles)

    The TPU grid iterates q tiles sequentially, so dK/dV accumulate into the
    same output block (zeroed on the first tile).
    """
    j = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    valid = mask_ref[0, 0, :] > 0
    logits = jnp.where(valid[None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (bq, Sk)

    d_diag = jnp.sum(do * o, axis=-1, keepdims=True)  # (bq, 1)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, Sk)
    ds = p * (dp - d_diag)

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_tile = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Sk, d)
    dv_tile = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Sk, d)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_tile.astype(dk_ref.dtype)
    dv_ref[0] += dv_tile.astype(dv_ref.dtype)


def _flash_fwd(query, key, value, key_valid_mask, scale, block_q, interpret):
    out = flash_attention(
        query, key, value, key_valid_mask,
        scale=scale, block_q=block_q, interpret=interpret,
    )
    return out, (query, key, value, key_valid_mask, out)


def _flash_bwd(scale, block_q, interpret, residuals, d_out):
    query, key, value, key_valid_mask, out = residuals
    b, h, sq, d = query.shape
    sk = key.shape[2]
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    sk_pad = -(-sk // 128) * 128
    bq = _pick_block_q(block_q, sq, sk_pad)
    sq_pad = -(-sq // bq) * bq

    pad_q = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    pad_k = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    if key_valid_mask is None:
        key_valid_mask = jnp.ones((b, sk), bool)
    mask = jnp.pad(key_valid_mask.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)))
    mask_bh = jnp.repeat(mask, h, axis=0)[:, None, :]

    qf = pad_q(query).reshape(b * h, sq_pad, d)
    kf = pad_k(key).reshape(b * h, sk_pad, d)
    vf = pad_k(value).reshape(b * h, sk_pad, d)
    dof = pad_q(d_out).reshape(b * h, sq_pad, d)
    of = pad_q(out).reshape(b * h, sq_pad, d)

    grid = (b * h, sq_pad // bq)
    q_spec = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq_pad, d), query.dtype),
            jax.ShapeDtypeStruct((b * h, sk_pad, d), key.dtype),
            jax.ShapeDtypeStruct((b * h, sk_pad, d), value.dtype),
        ),
        grid=grid,
        in_specs=[
            q_spec,
            k_spec,
            k_spec,
            pl.BlockSpec(
                (1, 1, sk_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            q_spec,
            q_spec,
        ],
        out_specs=(q_spec, k_spec, k_spec),
        interpret=interpret,
    )(qf, kf, vf, mask_bh, dof, of)

    dq = dq.reshape(b, h, sq_pad, d)[:, :, :sq]
    dk = dk.reshape(b, h, sk_pad, d)[:, :, :sk]
    dv = dv.reshape(b, h, sk_pad, d)[:, :, :sk]
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_trainable(
    query, key, value, key_valid_mask=None, scale=None, block_q=256, interpret=None
):
    """:func:`flash_attention` with a Pallas backward pass (probabilities
    recomputed per q tile — no (Sq, Sk) residuals in HBM), usable inside
    ``jax.grad``. Gradient flows to query/key/value; the mask is constant.
    """
    return flash_attention(
        query, key, value, key_valid_mask,
        scale=scale, block_q=block_q, interpret=interpret,
    )


def _fwd_rule(query, key, value, key_valid_mask, scale, block_q, interpret):
    return _flash_fwd(query, key, value, key_valid_mask, scale, block_q, interpret)


def _bwd_rule(scale, block_q, interpret, residuals, d_out):
    return _flash_bwd(scale, block_q, interpret, residuals, d_out)


flash_attention_trainable.defvjp(_fwd_rule, _bwd_rule)
