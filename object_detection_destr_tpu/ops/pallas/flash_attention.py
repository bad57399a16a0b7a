"""Masked multi-head flash attention as a Pallas TPU kernel.

TPU-native replacement for the reference's attention ops:

* the encoder's ``nn.MultiheadAttention`` over HW image tokens
  (encoder_block.py:57-63), and
* the decoder's single-head concat-QK cross attention
  (decoder_block.py:223-260), which has d_qk = 2C (512) but d_v = C (256).

The kernel streams K/V in lane-aligned tiles with the classic running
max/denominator recurrence, so VMEM use is bounded by the tile sizes — not by
the sequence length — and the (S_q, S_k) logits matrix never exists in HBM.
That matters for the dilated-1333px config (7056 tokens) and for the
cross-attention's 512-wide keys, both of which overflow a KV-resident design
(~16 MB VMEM/core).

Numerically: logits/softmax accumulate in f32 (MXU ``preferred_element_type``);
the PV matmul runs in the value dtype, matching ops/attention.py:93-96. Padded
key positions get -1e9 before the softmax like ops/attention.py:88.

Attention-probability dropout (the reference trains with p=0.3,
encoder_block.py:57-63) is supported inside the kernel: on TPU the mask is
drawn from the on-core PRNG seeded per (batch*head, q-tile, k-tile) program,
so the backward pass regenerates bit-identical masks without storing them; in
interpret mode (CPU tests) the TPU PRNG is unavailable, so an equivalent mask
is materialized host-side from the same seed and fed as an input — same math,
different bit-source. ``dropout_keep_mask`` exposes the interpret-mode mask so
tests can reproduce expected values exactly.

The forward also emits the per-row logsumexp (head-per-lane in one LANES
register); the backward recomputes probabilities per tile from it (no
(S_q, S_k) residuals in HBM). The packed backward is a SINGLE fused kernel
producing dQ/dK/dV in one sweep; the key axis is chunked so the per-chunk
dK/dV VMEM scratches fit any sequence length (``_pick_chunk_nk``), with dQ
emitted as f32 per-chunk partials summed in XLA. A two-pass form (dQ over
k-tiles, dK/dV over q-tiles) is kept for comparison/fallback. Both read a
precomputed delta = rowsum(dO*O) instead of rebuilding it per tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_attention",
    "flash_attention_trainable",
    "flash_attention_packed",
    "dropout_keep_mask",
]

NEG_INF = -1e9
LANES = 128  # per-row stats are broadcast across one lane register


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(sq: int, sk: int, block_q: int, block_k: int, itemsize: int = 2):
    """Tile sizes + padded lengths. bq is sublane-aligned (8), bk lane-aligned
    (128); both clip to the (padded) sequence so short shapes stay one tile.
    A q axis a bit over the block cap (e.g. the decoder's merged cls+reg
    cross-attention, sq=2*top_k=600) would round up to 2 tiles (1024 rows of
    work for 600 real ones); up to 1.5x the cap we widen bq to keep it one
    tile instead — strictly fewer padded rows.

    ``itemsize`` is the activation element size: the default block caps are
    probed against the 16 MB scoped-VMEM budget in bfloat16 (BASELINE.md r4
    block-plan sweep); float32 q/k/v tiles are 2x those bytes, so caps halve
    (measured: the 640px/top_k-300 production decoder bwd at f32 overflows
    the budget by 164 KB under the bf16 plan). bf16/f16 plans are untouched."""
    if itemsize >= 4:
        block_q = max(block_q // 2, 128)
        block_k = max(block_k // 2, 128)
    one_q = _round_up(sq, 8)
    bq = min(block_q, one_q)
    if bq < one_q <= block_q + block_q // 2:
        bq = one_q
    bk = min(block_k, _round_up(sk, 128))
    return bq, bk, _round_up(sq, bq), _round_up(sk, bk)


def _plan_packed(sq: int, sk: int, block_q: int, block_k: int,
                 itemsize: int = 2):
    """Block plan for the head-packed kernels. For long sequences (the
    7056-token dilated-C5 encoder, BASELINE.json config 4) wider k blocks
    amortize the per-k-tile softmax-stat updates: bk 512 -> 1024 measured
    fwd -24% / fwd+bwd -17% device-time at sq=7056 (tools/probe_flash.py).
    bq drops to 256 to stay inside the 16 MB scoped-VMEM budget (the
    (bq, h*LANES) f32 stat scratches scale with bq)."""
    if _round_up(sk, 128) >= 4096 and block_q == 512 and block_k == 512:
        block_q, block_k = 256, 1024
    return _plan(sq, sk, block_q, block_k, itemsize)


def _drop_threshold(rate: float) -> jnp.ndarray:
    # keep iff bits >= threshold; P(drop) = threshold / 2^32
    t = min(max(int(rate * 4294967296.0), 0), 4294967295)
    return jnp.uint32(t)


def _prng_keep(seed_ref, bh, iq, jk, shape, rate: float) -> jnp.ndarray:
    """Per-tile keep mask from the on-core PRNG. Seeding is a pure function of
    (seed, program coordinates), so forward and both backward kernels draw the
    identical mask for a tile regardless of their own grid orders.

    Mosaic rejects ``prng_seed`` with more than 2 values, so the three tile
    coordinates are hash-mixed into one int32 (wrapping int32 multiplies are
    deterministic on TPU) and passed alongside the user seed."""
    coord = (
        bh * jnp.int32(-1640531527)  # 0x9E3779B9 (golden-ratio odd constant)
        + iq * jnp.int32(-2048144789)  # 0x85EBCA6B (murmur3 mix constant)
        + jk * jnp.int32(-1028477387)  # 0xC2B2AE35 (murmur3 mix constant)
    )
    pltpu.prng_seed(seed_ref[0], coord)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= _drop_threshold(rate)


def dropout_keep_mask(seed, bh: int, sq_pad: int, sk_pad: int, rate: float):
    """Interpret-mode keep mask (int32 0/1), shape (bh, sq_pad, sk_pad).

    Deterministic in ``seed``; regenerated identically by the backward pass.
    Exposed so tests can compute exact expected values.
    """
    keep = jax.random.bernoulli(
        jax.random.PRNGKey(seed), 1.0 - rate, (bh, sq_pad, sk_pad)
    )
    return keep.astype(jnp.int32)


def _tile_keep(drop_mode, seed_or_mask_ref, bh, iq, jk, shape, rate, head=None):
    if drop_mode == "prng":
        return _prng_keep(seed_or_mask_ref, bh, iq, jk, shape, rate)
    if head is not None:
        return seed_or_mask_ref[0, head] > 0  # packed (1, H, bq, bk) block
    return seed_or_mask_ref[0] > 0  # materialized (1, bq, bk) block


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    *refs, scale: float, rate: float, drop_mode: str, n_k: int
):
    if drop_mode == "none":
        q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, acc, m_scr, l_scr = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, o_ref, lse_ref,
         acc, m_scr, l_scr) = refs
    bh, iq, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jk == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk) f32
    valid = mask_ref[0, 0, :] > 0
    s = jnp.where(valid[None, :], s, NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    if rate > 0.0:
        keep = _tile_keep(drop_mode, drop_ref, bh, iq, jk, p.shape, rate)
        p_acc = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        p_acc = p
    pv = jax.lax.dot_general(
        p_acc.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc[...] = acc[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jk == n_k - 1)
    def _():
        o_ref[0] = (acc[...] / l_scr[:, 0:1]).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_scr[:, 0:1] + jnp.log(l_scr[:, 0:1]), lse_ref[0].shape
        )


def _prep_inputs(query, key, value, key_valid_mask, bq, bk, sq_pad, sk_pad):
    b, h, sq, d = query.shape
    sk, dv = key.shape[2], value.shape[-1]
    qf = jnp.pad(query, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0))).reshape(
        b * h, sq_pad, d
    )
    kf = jnp.pad(key, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0))).reshape(
        b * h, sk_pad, d
    )
    vf = jnp.pad(value, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0))).reshape(
        b * h, sk_pad, dv
    )
    if key_valid_mask is None:
        key_valid_mask = jnp.ones((b, sk), bool)
    mask = jnp.pad(key_valid_mask.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)))
    mask_bh = jnp.repeat(mask, h, axis=0)[:, None, :]  # (bh, 1, sk_pad)
    return qf, kf, vf, mask_bh


def _drop_operand(drop_mode, dropout_seed, bh, sq_pad, sk_pad, rate):
    """The extra kernel input carrying dropout state, or None."""
    if drop_mode == "prng":
        return jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    if drop_mode == "mask":
        return dropout_keep_mask(dropout_seed, bh, sq_pad, sk_pad, rate)
    return None


def _drop_spec(drop_mode, bq, bk, index_map):
    if drop_mode == "prng":
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.BlockSpec((1, bq, bk), index_map, memory_space=pltpu.VMEM)


def _resolve(dropout_rate, dropout_seed, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    if dropout_rate > 0.0:
        # the TPU PRNG is unavailable under the CPU interpreter — fall back to
        # a host-materialized mask drawn from the same seed (identical math)
        drop_mode = "mask" if interpret else "prng"
    else:
        drop_mode = "none"
    return drop_mode, interpret


def _fwd_impl(
    query, key, value, key_valid_mask, dropout_seed,
    dropout_rate, scale, block_q, block_k, interpret,
):
    b, h, sq, d = query.shape
    sk, dv = key.shape[2], value.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    drop_mode, interpret = _resolve(dropout_rate, dropout_seed, interpret)

    bq, bk, sq_pad, sk_pad = _plan(sq, sk, block_q, block_k,
                                   query.dtype.itemsize)
    n_q, n_k = sq_pad // bq, sk_pad // bk
    qf, kf, vf, mask_bh = _prep_inputs(
        query, key, value, key_valid_mask, bq, bk, sq_pad, sk_pad
    )

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, iq, jk: (i, iq, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda i, iq, jk: (i, jk, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dv), lambda i, iq, jk: (i, jk, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk), lambda i, iq, jk: (i, 0, jk), memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf, mask_bh]
    if drop_mode != "none":
        in_specs.append(_drop_spec(drop_mode, bq, bk, lambda i, iq, jk: (i, iq, jk)))
        operands.append(
            _drop_operand(drop_mode, dropout_seed, b * h, sq_pad, sk_pad, dropout_rate)
        )

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, rate=dropout_rate, drop_mode=drop_mode, n_k=n_k
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq_pad, dv), query.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, LANES), jnp.float32),
        ),
        grid=(b * h, n_q, n_k),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, dv), lambda i, iq, jk: (i, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, LANES), lambda i, iq, jk: (i, iq, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, dv), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, sq_pad, dv)[:, :, :sq], lse


@functools.partial(
    jax.jit, static_argnames=("dropout_rate", "scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    key_valid_mask: Optional[jnp.ndarray] = None,
    dropout_seed: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused masked attention (forward only).

    Args:
        query: (B, h, Sq, d); key: (B, h, Sk, d); value: (B, h, Sk, dv) —
            dv may differ from d (decoder cross attention: d=2C, dv=C).
        key_valid_mask: (B, Sk) bool, True = attendable.
        dropout_seed: int32 scalar; required when dropout_rate > 0.
        dropout_rate: attention-probability dropout (train only).

    Returns:
        (B, h, Sq, dv) in the query dtype.
    """
    out, _ = _fwd_impl(
        query, key, value, key_valid_mask, dropout_seed,
        dropout_rate, scale, block_q, block_k, interpret,
    )
    return out


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(*refs, scale: float, rate: float, drop_mode: str, n_k: int):
    if drop_mode == "none":
        q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref, lse_ref, dq_ref, dq_acc = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, do_ref, o_ref, lse_ref,
         dq_ref, dq_acc) = refs
    bh, iq, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jk == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    valid = mask_ref[0, 0, :] > 0
    s = jnp.where(valid[None, :], s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, :, 0:1])  # (bq, bk)

    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = _tile_keep(drop_mode, drop_ref, bh, iq, jk, p.shape, rate)
        dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
    d_diag = jnp.sum(do * o_ref[0].astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - d_diag)
    dq_acc[...] += jax.lax.dot_general(
        ds, k_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(jk == n_k - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(*refs, scale: float, rate: float, drop_mode: str, n_q: int):
    if drop_mode == "none":
        (q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref, lse_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, do_ref, o_ref, lse_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    # grid order is (bh, jk, iq) here; dropout seeding uses the tile's
    # (iq, jk) coordinates so the mask matches the forward draw exactly
    bh, jk, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    valid = mask_ref[0, 0, :] > 0
    s = jnp.where(valid[None, :], s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, :, 0:1])  # (bq, bk)

    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = _tile_keep(drop_mode, drop_ref, bh, iq, jk, p.shape, rate)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)
        dp = jnp.where(keep, dp * inv, 0.0)
    else:
        pd = p
    d_diag = jnp.sum(do * o_ref[0].astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - d_diag)
    dk_acc[...] += jax.lax.dot_general(
        ds, q_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_acc[...] += jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_impl(
    query, key, value, key_valid_mask, dropout_seed, out, lse, d_out,
    dropout_rate, scale, block_q, block_k, interpret,
):
    b, h, sq, d = query.shape
    sk, dv = key.shape[2], value.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    drop_mode, interpret = _resolve(dropout_rate, dropout_seed, interpret)

    bq, bk, sq_pad, sk_pad = _plan(sq, sk, block_q, block_k,
                                   query.dtype.itemsize)
    n_q, n_k = sq_pad // bq, sk_pad // bk
    qf, kf, vf, mask_bh = _prep_inputs(
        query, key, value, key_valid_mask, bq, bk, sq_pad, sk_pad
    )
    pad_q = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    dof = pad_q(d_out).reshape(b * h, sq_pad, dv)
    of = pad_q(out).reshape(b * h, sq_pad, dv)
    drop_op = _drop_operand(drop_mode, dropout_seed, b * h, sq_pad, sk_pad, dropout_rate)

    vmem = pltpu.VMEM
    q_spec = lambda im: pl.BlockSpec((1, bq, d), im, memory_space=vmem)
    k_spec = lambda im: pl.BlockSpec((1, bk, d), im, memory_space=vmem)
    v_spec = lambda im: pl.BlockSpec((1, bk, dv), im, memory_space=vmem)
    qo_spec = lambda im: pl.BlockSpec((1, bq, dv), im, memory_space=vmem)
    lse_spec = lambda im: pl.BlockSpec((1, bq, LANES), im, memory_space=vmem)
    mask_spec = lambda im: pl.BlockSpec((1, 1, bk), im, memory_space=vmem)

    # --- dQ: grid (bh, iq, jk), accumulate over k tiles --------------------
    im_q = lambda i, iq, jk: (i, iq, 0)
    im_k = lambda i, iq, jk: (i, jk, 0)
    im_m = lambda i, iq, jk: (i, 0, jk)
    in_specs = [q_spec(im_q), k_spec(im_k), v_spec(im_k), mask_spec(im_m)]
    operands = [qf, kf, vf, mask_bh]
    if drop_mode != "none":
        in_specs.append(_drop_spec(drop_mode, bq, bk, lambda i, iq, jk: (i, iq, jk)))
        operands.append(drop_op)
    in_specs += [qo_spec(im_q), qo_spec(im_q), lse_spec(im_q)]
    operands += [dof, of, lse]
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, rate=dropout_rate, drop_mode=drop_mode, n_k=n_k
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), query.dtype),
        grid=(b * h, n_q, n_k),
        in_specs=in_specs,
        out_specs=q_spec(im_q),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(*operands)

    # --- dK/dV: grid (bh, jk, iq), accumulate over q tiles ------------------
    im_q2 = lambda i, jk, iq: (i, iq, 0)
    im_k2 = lambda i, jk, iq: (i, jk, 0)
    im_m2 = lambda i, jk, iq: (i, 0, jk)
    in_specs = [q_spec(im_q2), k_spec(im_k2), v_spec(im_k2), mask_spec(im_m2)]
    operands = [qf, kf, vf, mask_bh]
    if drop_mode != "none":
        in_specs.append(_drop_spec(drop_mode, bq, bk, lambda i, jk, iq: (i, iq, jk)))
        operands.append(drop_op)
    in_specs += [qo_spec(im_q2), qo_spec(im_q2), lse_spec(im_q2)]
    operands += [dof, of, lse]
    dk, dv_grad = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, rate=dropout_rate, drop_mode=drop_mode, n_q=n_q
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sk_pad, d), key.dtype),
            jax.ShapeDtypeStruct((b * h, sk_pad, dv), value.dtype),
        ),
        grid=(b * h, n_k, n_q),
        in_specs=in_specs,
        out_specs=(k_spec(im_k2), v_spec(im_k2)),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, dv), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    dq = dq.reshape(b, h, sq_pad, d)[:, :, :sq]
    dk = dk.reshape(b, h, sk_pad, d)[:, :, :sk]
    dv_grad = dv_grad.reshape(b, h, sk_pad, dv)[:, :, :sk]
    return dq, dk, dv_grad


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention_trainable(
    query, key, value, key_valid_mask=None, dropout_seed=None,
    dropout_rate=0.0, scale=None, block_q=256, block_k=512, interpret=None,
):
    """:func:`flash_attention` with a Pallas backward pass, usable inside
    ``jax.grad``. Gradient flows to query/key/value; the mask and dropout
    seed are constants. With ``dropout_rate > 0`` the same keep-mask is
    regenerated in the backward (seeded PRNG on TPU, seeded host mask in
    interpret mode) — gradients are exact for the sampled mask.
    """
    return flash_attention(
        query, key, value, key_valid_mask, dropout_seed, dropout_rate,
        scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _fwd_rule(query, key, value, key_valid_mask, dropout_seed,
              dropout_rate, scale, block_q, block_k, interpret):
    out, lse = _fwd_impl(
        query, key, value, key_valid_mask, dropout_seed,
        dropout_rate, scale, block_q, block_k, interpret,
    )
    return out, (query, key, value, key_valid_mask, dropout_seed, out, lse)


def _bwd_rule(dropout_rate, scale, block_q, block_k, interpret, residuals, d_out):
    query, key, value, key_valid_mask, dropout_seed, out, lse = residuals
    dq, dk, dv = _bwd_impl(
        query, key, value, key_valid_mask, dropout_seed, out, lse, d_out,
        dropout_rate, scale, block_q, block_k, interpret,
    )
    return dq, dk, dv, None, None


flash_attention_trainable.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# head-packed variant: (B, S, h*d) layout, zero call-site glue
# ---------------------------------------------------------------------------
#
# The (B, h, S, d) kernels above force every call site through
# ``split_heads`` — a (B, S, h, d) -> (B, h, S, d) transpose per operand plus
# the inverse on the output. The r2 profile attributed ~6.8 ms/step of the
# b8/640 DESTR step to this pad/transpose glue (BASELINE.md). Reading head
# blocks directly from (B, S, h, d) is blocked by Mosaic's last-two-dims rule
# (a per-head block has sublane dim 1), so this variant keeps the activation
# layout the MODULES already have — (B, S, h*d), heads packed on lanes — and
# slices each head's d lanes inside the kernel (static 32-lane slices,
# probe-verified to lower on this Mosaic version). Grid is (B, n_q, n_k);
# per-head running max/denominator stats live in lane-block hh of a
# (bq, h*LANES) scratch, so every slice is 128-aligned.
#
# Dropout seeds use bh = i*num_heads + hh, so the packed kernels draw
# bit-identical keep masks to the unpacked kernels for the same seed.


def _head(x, hh: int, d: int):
    return x[:, hh * d : (hh + 1) * d]


def _fwd_kernel_packed(
    *refs, scale: float, rate: float, drop_mode: str, n_k: int,
    num_heads: int, d: int, dv: int,
):
    if drop_mode == "none":
        q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, acc, m_scr, l_scr = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, o_ref, lse_ref,
         acc, m_scr, l_scr) = refs
    bi, iq, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jk == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0]  # (bq, h*d)
    k = k_ref[0]  # (bk, h*d)
    v = v_ref[0]  # (bk, h*dv)
    valid = mask_ref[0, 0, :] > 0  # (bk,)

    for hh in range(num_heads):
        s = jax.lax.dot_general(
            _head(q, hh, d), _head(k, hh, d), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk) f32
        s = jnp.where(valid[None, :], s, NEG_INF)

        m_prev = m_scr[:, hh * LANES : hh * LANES + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_scr[:, hh * LANES : hh * LANES + 1] * alpha + jnp.sum(
            p, axis=-1, keepdims=True
        )

        if rate > 0.0:
            keep = _tile_keep(
                drop_mode, drop_ref, bi * num_heads + hh, iq, jk, p.shape, rate,
                head=hh,
            )
            p_acc = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        else:
            p_acc = p
        pv = jax.lax.dot_general(
            p_acc.astype(v.dtype), _head(v, hh, dv), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, dv)
        acc[:, hh * dv : (hh + 1) * dv] = (
            acc[:, hh * dv : (hh + 1) * dv] * alpha + pv
        )
        m_scr[:, hh * LANES : (hh + 1) * LANES] = jnp.broadcast_to(
            m_new, (m_new.shape[0], LANES)
        )
        l_scr[:, hh * LANES : (hh + 1) * LANES] = jnp.broadcast_to(
            l_new, (l_new.shape[0], LANES)
        )

    @pl.when(jk == n_k - 1)
    def _():
        out = acc[...]
        bq = out.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, LANES), 1)
        lse = jnp.zeros((bq, LANES), jnp.float32)
        for hh in range(num_heads):
            l_h = l_scr[:, hh * LANES : hh * LANES + 1]
            o_ref[0, :, hh * dv : (hh + 1) * dv] = (
                out[:, hh * dv : (hh + 1) * dv] / l_h
            ).astype(o_ref.dtype)
            # compact stats: head hh lives at lane hh (8x less stat traffic
            # than the old h*LANES broadcast layout)
            lse = jnp.where(
                lane == hh, m_scr[:, hh * LANES : hh * LANES + 1] + jnp.log(l_h),
                lse,
            )
        lse_ref[0] = lse


def _prep_inputs_packed(query, key, value, key_valid_mask, sq_pad, sk_pad):
    b, sq, _ = query.shape
    sk = key.shape[1]
    qf = jnp.pad(query, ((0, 0), (0, sq_pad - sq), (0, 0)))
    kf = jnp.pad(key, ((0, 0), (0, sk_pad - sk), (0, 0)))
    vf = jnp.pad(value, ((0, 0), (0, sk_pad - sk), (0, 0)))
    if key_valid_mask is None:
        key_valid_mask = jnp.ones((b, sk), bool)
    mask = jnp.pad(key_valid_mask.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)))
    return qf, kf, vf, mask[:, None, :]


def _drop_operand_packed(drop_mode, dropout_seed, b, h, sq_pad, sk_pad, rate):
    if drop_mode == "prng":
        return jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    if drop_mode == "mask":
        m = dropout_keep_mask(dropout_seed, b * h, sq_pad, sk_pad, rate)
        return m.reshape(b, h, sq_pad, sk_pad)
    return None


def _drop_spec_packed(drop_mode, h, bq, bk, index_map):
    if drop_mode == "prng":
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.BlockSpec((1, h, bq, bk), index_map, memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "dropout_rate", "scale", "block_q",
                     "block_k", "interpret"),
)
def _fwd_impl_packed(
    query, key, value, num_heads, key_valid_mask, dropout_seed,
    dropout_rate, scale, block_q, block_k, interpret,
):
    # jitted so the N identical call sites per model share ONE trace/lowering
    # (an unjitted pallas_call body re-traces per call site — measured ~5 min
    # of host lowering for the 24-site DESTR step)
    b, sq, hd = query.shape
    sk, hdv = key.shape[1], value.shape[-1]
    d, dv = hd // num_heads, hdv // num_heads
    if num_heads > LANES:
        raise ValueError(
            f"packed kernels store per-head stats head-per-lane in one "
            f"{LANES}-lane register; num_heads={num_heads} exceeds that"
        )
    if scale is None:
        scale = 1.0 / (d**0.5)
    drop_mode, interpret = _resolve(dropout_rate, dropout_seed, interpret)

    bq, bk, sq_pad, sk_pad = _plan_packed(sq, sk, block_q, block_k,
                                          query.dtype.itemsize)
    n_q, n_k = sq_pad // bq, sk_pad // bk
    qf, kf, vf, mask3 = _prep_inputs_packed(
        query, key, value, key_valid_mask, sq_pad, sk_pad
    )

    vmem = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, bq, hd), lambda i, iq, jk: (i, iq, 0), memory_space=vmem),
        pl.BlockSpec((1, bk, hd), lambda i, iq, jk: (i, jk, 0), memory_space=vmem),
        pl.BlockSpec((1, bk, hdv), lambda i, iq, jk: (i, jk, 0), memory_space=vmem),
        pl.BlockSpec((1, 1, bk), lambda i, iq, jk: (i, 0, jk), memory_space=vmem),
    ]
    operands = [qf, kf, vf, mask3]
    if drop_mode != "none":
        in_specs.append(
            _drop_spec_packed(
                drop_mode, num_heads, bq, bk, lambda i, iq, jk: (i, 0, iq, jk)
            )
        )
        operands.append(
            _drop_operand_packed(
                drop_mode, dropout_seed, b, num_heads, sq_pad, sk_pad, dropout_rate
            )
        )

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed, scale=scale, rate=dropout_rate,
            drop_mode=drop_mode, n_k=n_k, num_heads=num_heads, d=d, dv=dv,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, sq_pad, hdv), query.dtype),
            jax.ShapeDtypeStruct((b, sq_pad, LANES), jnp.float32),
        ),
        grid=(b, n_q, n_k),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, hdv), lambda i, iq, jk: (i, iq, 0), memory_space=vmem),
            pl.BlockSpec(
                (1, bq, LANES), lambda i, iq, jk: (i, iq, 0),
                memory_space=vmem,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, hdv), jnp.float32),
            pltpu.VMEM((bq, num_heads * LANES), jnp.float32),
            pltpu.VMEM((bq, num_heads * LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out[:, :sq], lse


def _dq_kernel_packed(
    *refs, scale: float, rate: float, drop_mode: str, n_k: int,
    num_heads: int, d: int, dv: int,
):
    if drop_mode == "none":
        q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, dl_ref, dq_ref, dq_acc = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, do_ref, lse_ref, dl_ref,
         dq_ref, dq_acc) = refs
    bi, iq, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jk == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    valid = mask_ref[0, 0, :] > 0
    for hh in range(num_heads):
        do = _head(do_ref[0], hh, dv).astype(jnp.float32)
        s = jax.lax.dot_general(
            _head(q, hh, d), _head(k, hh, d), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(valid[None, :], s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, hh : hh + 1])

        dp = jax.lax.dot_general(
            do, _head(v, hh, dv).astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _tile_keep(
                drop_mode, drop_ref, bi * num_heads + hh, iq, jk, p.shape, rate,
                head=hh,
            )
            dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
        ds = p * (dp - dl_ref[0][:, hh : hh + 1])
        dq_acc[:, hh * d : (hh + 1) * d] += jax.lax.dot_general(
            ds, _head(k, hh, d).astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(jk == n_k - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel_packed(
    *refs, scale: float, rate: float, drop_mode: str, n_q: int,
    num_heads: int, d: int, dv: int,
):
    if drop_mode == "none":
        (q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, dl_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, do_ref, lse_ref, dl_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    bi, jk, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    valid = mask_ref[0, 0, :] > 0
    for hh in range(num_heads):
        do = _head(do_ref[0], hh, dv).astype(jnp.float32)
        s = jax.lax.dot_general(
            _head(q, hh, d), _head(k, hh, d), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(valid[None, :], s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, hh : hh + 1])

        dp = jax.lax.dot_general(
            do, _head(v, hh, dv).astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _tile_keep(
                drop_mode, drop_ref, bi * num_heads + hh, iq, jk, p.shape, rate,
                head=hh,
            )
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dp * inv, 0.0)
        else:
            pd = p
        ds = p * (dp - dl_ref[0][:, hh : hh + 1])
        dk_acc[:, hh * d : (hh + 1) * d] += jax.lax.dot_general(
            ds, _head(q, hh, d).astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv_acc[:, hh * dv : (hh + 1) * dv] += jax.lax.dot_general(
            pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _dkvq_kernel_packed(
    *refs, scale: float, rate: float, drop_mode: str, n_q: int, chunk_nk: int,
    bk: int, num_heads: int, d: int, dv: int,
):
    """Single-launch fused backward: dQ, dK, dV in one pass over the tiles.

    Grid (b, nc, n_q, jk) — the key axis is split into ``nc`` chunks of
    ``chunk_nk`` k-tiles so the per-chunk dK/dV VMEM scratches fit any
    sequence length (the 7056-token dilated config included). Within a
    chunk, jk is innermost: dQ accumulates per q-block and emits an f32
    PARTIAL (complete over this chunk's keys) at jk == chunk_nk-1, summed
    over chunks in XLA afterwards; dK/dV accumulate into chunk-row scratches
    (row block jk finishes at iq == n_q-1, the last sweep past it) whose
    output blocks span the whole chunk and only change with (batch, chunk),
    keeping revisits consecutive. Fusing removes the second s/p recompute
    sweep of the two-pass form (~30% of the backward MXU work, ~50% of its
    VPU work)."""
    if drop_mode == "none":
        (q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, dl_ref,
         dq_ref, dk_ref, dv_ref, dq_acc, dk_scr, dv_scr) = refs
        drop_ref = None
    else:
        (q_ref, k_ref, v_ref, mask_ref, drop_ref, do_ref, lse_ref, dl_ref,
         dq_ref, dk_ref, dv_ref, dq_acc, dk_scr, dv_scr) = refs
    bi, kc, iq, jk = (pl.program_id(0), pl.program_id(1), pl.program_id(2),
                      pl.program_id(3))
    jk_g = kc * chunk_nk + jk  # global k-tile index — dropout tiles must
    # draw the same PRNG stream as the forward regardless of chunking

    @pl.when(jk == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when((iq == 0) & (jk == 0))
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    valid = mask_ref[0, 0, :] > 0
    rows = pl.ds(jk * bk, bk)
    for hh in range(num_heads):
        do = _head(do_ref[0], hh, dv).astype(jnp.float32)
        s = jax.lax.dot_general(
            _head(q, hh, d), _head(k, hh, d), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(valid[None, :], s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, hh : hh + 1])

        dp = jax.lax.dot_general(
            do, _head(v, hh, dv).astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _tile_keep(
                drop_mode, drop_ref, bi * num_heads + hh, iq, jk_g, p.shape,
                rate, head=hh,
            )
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dp * inv, 0.0)
        else:
            pd = p
        ds = p * (dp - dl_ref[0][:, hh : hh + 1])
        dq_acc[:, hh * d : (hh + 1) * d] += jax.lax.dot_general(
            ds, _head(k, hh, d).astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        cols = slice(hh * d, (hh + 1) * d)
        dk_scr[rows, cols] += jax.lax.dot_general(
            ds, _head(q, hh, d).astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        colsv = slice(hh * dv, (hh + 1) * dv)
        dv_scr[rows, colsv] += jax.lax.dot_general(
            pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(jk == chunk_nk - 1)
    def _():
        dq_ref[0, 0] = dq_acc[...]

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0, rows, :] = dk_scr[rows, :].astype(dk_ref.dtype)
        dv_ref[0, rows, :] = dv_scr[rows, :].astype(dv_ref.dtype)


def _delta_packed(d_out, out, num_heads, dv, sq_pad):
    """delta[i, r, hh] = sum_c dO[i, r, hh*dv+c] * O[i, r, hh*dv+c], laid out
    head-per-lane in a single LANES register — the same compact layout the
    forward emits for lse. Computed once in XLA instead of per (q, k) tile
    inside the backward kernels (the flash-attention 'preprocess' step)."""
    b, sq, _ = d_out.shape
    prod = d_out.astype(jnp.float32) * out.astype(jnp.float32)
    delta = prod.reshape(b, sq, num_heads, dv).sum(-1)  # (b, sq, h)
    delta = jnp.pad(delta, ((0, 0), (0, sq_pad - sq), (0, LANES - num_heads)))
    return delta  # (b, sq_pad, LANES) f32


def _pick_chunk_nk(n_k, bq, bk, hd, hdv, num_heads, drop_mode,
                   budget=14 * 1024 * 1024):
    """Largest k-tile count per chunk (a divisor of ``n_k``) whose fused
    backward fits the VMEM budget: per-chunk dK/dV f32 scratches + their
    chunk-spanning output blocks scale with the chunk size; everything else
    is per-tile. chunk_nk == n_k is the unchunked case (one dQ partial)."""
    f32, bf16 = 4, 2
    fixed = bq * hd * f32  # dq accumulator
    fixed += bq * hd * f32 * 2  # dq f32 partial out block (double-buffered)
    fixed += 2 * (  # double-buffered per-tile input blocks
        bq * hd * bf16 + bk * (hd + hdv) * bf16 + bq * hdv * bf16
        + 2 * bq * LANES * f32 + bk * 4
    )
    if drop_mode == "mask":
        fixed += 2 * num_heads * bq * bk * 4  # (1, h, bq, bk) int32 block
    for c in range(n_k, 0, -1):
        if n_k % c:
            continue
        rows = c * bk
        per_chunk = rows * (hd + hdv) * (f32 + bf16)  # scratches + out blocks
        if fixed + per_chunk <= budget:
            return c
    return None


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "dropout_rate", "scale", "block_q",
                     "block_k", "interpret", "fused"),
)
def _bwd_impl_packed(
    query, key, value, num_heads, key_valid_mask, dropout_seed, out, lse,
    d_out, dropout_rate, scale, block_q, block_k, interpret, fused=None,
):
    b, sq, hd = query.shape
    sk, hdv = key.shape[1], value.shape[-1]
    d, dv = hd // num_heads, hdv // num_heads
    if scale is None:
        scale = 1.0 / (d**0.5)
    drop_mode, interpret = _resolve(dropout_rate, dropout_seed, interpret)

    bq, bk, sq_pad, sk_pad = _plan_packed(sq, sk, block_q, block_k,
                                          query.dtype.itemsize)
    n_q, n_k = sq_pad // bq, sk_pad // bk
    qf, kf, vf, mask3 = _prep_inputs_packed(
        query, key, value, key_valid_mask, sq_pad, sk_pad
    )
    dof = jnp.pad(d_out, ((0, 0), (0, sq_pad - sq), (0, 0)))
    delta = _delta_packed(d_out, out, num_heads, dv, sq_pad)
    drop_op = _drop_operand_packed(
        drop_mode, dropout_seed, b, num_heads, sq_pad, sk_pad, dropout_rate
    )
    chunk_nk = _pick_chunk_nk(n_k, bq, bk, hd, hdv, num_heads, drop_mode)
    if fused is None:
        fused = chunk_nk is not None
    elif fused and chunk_nk is None:
        raise ValueError("fused backward requested but no chunk size fits VMEM")

    vmem = pltpu.VMEM
    q_spec = lambda im: pl.BlockSpec((1, bq, hd), im, memory_space=vmem)
    k_spec = lambda im: pl.BlockSpec((1, bk, hd), im, memory_space=vmem)
    v_spec = lambda im: pl.BlockSpec((1, bk, hdv), im, memory_space=vmem)
    qo_spec = lambda im: pl.BlockSpec((1, bq, hdv), im, memory_space=vmem)
    lse_spec = lambda im: pl.BlockSpec((1, bq, LANES), im, memory_space=vmem)
    mask_spec = lambda im: pl.BlockSpec((1, 1, bk), im, memory_space=vmem)

    if fused:
        # --- fused dQ/dK/dV: grid (b, kc, iq, jk) --------------------------
        nc = n_k // chunk_nk
        rows = chunk_nk * bk  # key rows per chunk
        im_q = lambda i, kc, iq, jk: (i, iq, 0)
        im_k = lambda i, kc, iq, jk: (i, kc * chunk_nk + jk, 0)
        im_m = lambda i, kc, iq, jk: (i, 0, kc * chunk_nk + jk)
        in_specs = [q_spec(im_q), k_spec(im_k), v_spec(im_k), mask_spec(im_m)]
        operands = [qf, kf, vf, mask3]
        if drop_mode != "none":
            in_specs.append(
                _drop_spec_packed(
                    drop_mode, num_heads, bq, bk,
                    lambda i, kc, iq, jk: (i, 0, iq, kc * chunk_nk + jk),
                )
            )
            operands.append(drop_op)
        in_specs += [qo_spec(im_q), lse_spec(im_q), lse_spec(im_q)]
        operands += [dof, lse, delta]
        dqp, dk, dv_grad = pl.pallas_call(
            functools.partial(
                _dkvq_kernel_packed, scale=scale, rate=dropout_rate,
                drop_mode=drop_mode, n_q=n_q, chunk_nk=chunk_nk, bk=bk,
                num_heads=num_heads, d=d, dv=dv,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, nc, sq_pad, hd), jnp.float32),
                jax.ShapeDtypeStruct((b, sk_pad, hd), key.dtype),
                jax.ShapeDtypeStruct((b, sk_pad, hdv), value.dtype),
            ),
            grid=(b, nc, n_q, chunk_nk),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (1, 1, bq, hd), lambda i, kc, iq, jk: (i, kc, iq, 0),
                    memory_space=vmem,
                ),
                pl.BlockSpec(
                    (1, rows, hd), lambda i, kc, iq, jk: (i, kc, 0),
                    memory_space=vmem,
                ),
                pl.BlockSpec(
                    (1, rows, hdv), lambda i, kc, iq, jk: (i, kc, 0),
                    memory_space=vmem,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, hd), jnp.float32),
                pltpu.VMEM((rows, hd), jnp.float32),
                pltpu.VMEM((rows, hdv), jnp.float32),
            ],
            interpret=interpret,
        )(*operands)
        # dQ partials are f32 (per-chunk accumulation stays f32 end-to-end);
        # one XLA sum over the (small) chunk axis finishes the reduction
        dq = dqp.sum(axis=1).astype(query.dtype)
        return dq[:, :sq], dk[:, :sk], dv_grad[:, :sk]

    # --- dQ: grid (b, iq, jk) ---------------------------------------------
    im_q = lambda i, iq, jk: (i, iq, 0)
    im_k = lambda i, iq, jk: (i, jk, 0)
    im_m = lambda i, iq, jk: (i, 0, jk)
    in_specs = [q_spec(im_q), k_spec(im_k), v_spec(im_k), mask_spec(im_m)]
    operands = [qf, kf, vf, mask3]
    if drop_mode != "none":
        in_specs.append(
            _drop_spec_packed(
                drop_mode, num_heads, bq, bk, lambda i, iq, jk: (i, 0, iq, jk)
            )
        )
        operands.append(drop_op)
    in_specs += [qo_spec(im_q), lse_spec(im_q), lse_spec(im_q)]
    operands += [dof, lse, delta]
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel_packed, scale=scale, rate=dropout_rate,
            drop_mode=drop_mode, n_k=n_k, num_heads=num_heads, d=d, dv=dv,
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, hd), query.dtype),
        grid=(b, n_q, n_k),
        in_specs=in_specs,
        out_specs=q_spec(im_q),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        interpret=interpret,
    )(*operands)

    # --- dK/dV: grid (b, jk, iq) -------------------------------------------
    im_q2 = lambda i, jk, iq: (i, iq, 0)
    im_k2 = lambda i, jk, iq: (i, jk, 0)
    im_m2 = lambda i, jk, iq: (i, 0, jk)
    in_specs = [q_spec(im_q2), k_spec(im_k2), v_spec(im_k2), mask_spec(im_m2)]
    operands = [qf, kf, vf, mask3]
    if drop_mode != "none":
        in_specs.append(
            _drop_spec_packed(
                drop_mode, num_heads, bq, bk, lambda i, jk, iq: (i, 0, iq, jk)
            )
        )
        operands.append(drop_op)
    in_specs += [qo_spec(im_q2), lse_spec(im_q2), lse_spec(im_q2)]
    operands += [dof, lse, delta]
    dk, dv_grad = pl.pallas_call(
        functools.partial(
            _dkv_kernel_packed, scale=scale, rate=dropout_rate,
            drop_mode=drop_mode, n_q=n_q, num_heads=num_heads, d=d, dv=dv,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, sk_pad, hd), key.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, hdv), value.dtype),
        ),
        grid=(b, n_k, n_q),
        in_specs=in_specs,
        out_specs=(k_spec(im_k2), v_spec(im_k2)),
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hdv), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dq[:, :sq], dk[:, :sk], dv_grad[:, :sk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6, 7, 8, 9, 10))
def flash_attention_packed(
    query, key, value, num_heads, key_valid_mask=None, dropout_seed=None,
    dropout_rate=0.0, scale=None, block_q=512, block_k=512, interpret=None,
):
    """Head-packed fused masked attention with a Pallas backward pass.

    Args:
        query: (B, Sq, h*d); key: (B, Sk, h*d); value: (B, Sk, h*dv) — heads
            packed on the lane (feature) dimension, exactly the layout the
            transformer modules hold, so call sites need NO split_heads
            transposes or output re-merges.
        num_heads: static head count (``scale`` defaults to 1/sqrt(d)).
        key_valid_mask: (B, Sk) bool, True = attendable.

    Returns:
        (B, Sq, h*dv) in the query dtype.

    Draws bit-identical dropout masks to :func:`flash_attention_trainable`
    for the same seed (per-tile seeding uses bh = batch*num_heads + head).
    """
    out, _ = _fwd_impl_packed(
        query, key, value, num_heads, key_valid_mask, dropout_seed,
        dropout_rate, scale, block_q, block_k, interpret,
    )
    return out


def _fwd_rule_packed(query, key, value, num_heads, key_valid_mask, dropout_seed,
                     dropout_rate, scale, block_q, block_k, interpret):
    out, lse = _fwd_impl_packed(
        query, key, value, num_heads, key_valid_mask, dropout_seed,
        dropout_rate, scale, block_q, block_k, interpret,
    )
    return out, (query, key, value, key_valid_mask, dropout_seed, out, lse)


def _bwd_rule_packed(num_heads, dropout_rate, scale, block_q, block_k,
                     interpret, residuals, d_out):
    query, key, value, key_valid_mask, dropout_seed, out, lse = residuals
    dq, dk, dv = _bwd_impl_packed(
        query, key, value, num_heads, key_valid_mask, dropout_seed, out, lse,
        d_out, dropout_rate, scale, block_q, block_k, interpret,
    )
    return dq, dk, dv, None, None


flash_attention_packed.defvjp(_fwd_rule_packed, _bwd_rule_packed)
