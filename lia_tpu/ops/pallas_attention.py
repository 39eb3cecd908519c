"""Pallas TPU attention kernels.

Reference equivalents:
- :func:`flash_attention_prefill` ↔ csrc/cpu/aten/kernels/FlashAttentionKrnl.cpp
  (tiled causal softmax-attention for the first token), op def FlashAttention.cpp:37.
- :func:`decode_attention` ↔ csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp
  (decode-phase attention over the preallocated indirect-access KV cache;
  ``reduce_head`` dot products :14-27, fused softmax, flash-style tiling).

TPU-native design notes:
- online-softmax (flash) tiling keeps the working set in VMEM; the MXU sees
  [bq, D] x [D, bk] tiles;
- GQA is handled by grouping the G query heads of one KV head into a single grid
  cell (no KV replication, larger matmuls for the MXU);
- padding/validity is a per-key boolean mask (the iakv slot mask) combined with the
  causal condition inside the kernel;
- fp32 accumulation throughout; inputs may be bf16.

Both kernels run in interpreter mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Prefill flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    mask_ref,  # [1, S] int8 — key validity (padding)
    q_ref,  # [1, bq, 1, G, D]
    k_ref,  # [1, S, 1, D]
    v_ref,  # [1, S, 1, D]
    o_ref,  # [1, bq, 1, G, D]
    *,
    scale: float,
    bq: int,
    bk: int,
    seq_len: int,
):
    i = pl.program_id(2)
    G = q_ref.shape[3]
    D = q_ref.shape[4]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(bq * G, D) * scale  # [bq*G, D]

    m0 = jnp.full((bq * G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq * G, 1), jnp.float32)
    acc0 = jnp.zeros((bq * G, D), jnp.float32)

    q_pos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, G, bk), 0).reshape(bq * G, bk)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * bk, bk), 0, :].astype(jnp.float32)  # [bk, D]
        v = v_ref[0, pl.ds(j * bk, bk), 0, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq*G, bk]
        k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq * G, bk), 1)
        valid = mask_ref[0, pl.ds(j * bk, bk)].astype(jnp.bool_)[None, :]
        allow = (q_pos >= k_pos) & valid
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    # causal: kv tiles beyond this q tile's last row are fully masked — skip them
    num_kv = pl.cdiv(jnp.minimum((i + 1) * bq, seq_len), bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, :, 0] = out.reshape(bq, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention_prefill(
    q: jnp.ndarray,  # [B, S, N, D]
    k: jnp.ndarray,  # [B, S, N_kv, D]
    v: jnp.ndarray,  # [B, S, N_kv, D]
    input_mask: jnp.ndarray,  # [B, S] bool — True at real tokens
    scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Causal flash attention over a (left-padded) prompt. Returns [B, S, N, D]."""
    B, S, N, D = q.shape
    Nkv = k.shape[2]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bq = min(block_q, S)
    bk = min(block_k, S)
    assert S % bq == 0 and S % bk == 0, f"S={S} must divide block sizes ({bq},{bk})"

    qg = q.reshape(B, S, Nkv, G, D)
    grid = (B, Nkv, S // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, bq=bq, bk=bk, seq_len=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S), lambda b, h, i: (b, 0)),
            pl.BlockSpec((1, bq, 1, G, D), lambda b, h, i: (b, i, h, 0, 0)),
            pl.BlockSpec((1, S, 1, D), lambda b, h, i: (b, 0, h, 0)),
            pl.BlockSpec((1, S, 1, D), lambda b, h, i: (b, 0, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, G, D), lambda b, h, i: (b, i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, Nkv, G, D), q.dtype),
        interpret=interpret,
    )(input_mask.astype(jnp.int8), qg, k, v)
    return out.reshape(B, S, N, D)


# ---------------------------------------------------------------------------
# Decode attention over the KV cache
# ---------------------------------------------------------------------------


def _decode_kernel(
    len_ref,  # [1, 1] int32 in SMEM — valid cache length
    mask_ref,  # [1, S_max] int8 — slot occupancy
    q_ref,  # [1, 1, G, D]
    k_ref,  # [1, S_max, 1, D]
    v_ref,  # [1, S_max, 1, D]
    o_ref,  # [1, 1, G, D]
    *,
    scale: float,
    bk: int,
):
    G, D = q_ref.shape[2], q_ref.shape[3]
    S_max = k_ref.shape[1]
    length = len_ref[0, 0]
    q = q_ref[0, 0].astype(jnp.float32) * scale  # [G, D]

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * bk, bk), 0, :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * bk, bk), 0, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, bk]
        pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (G, bk), 1)
        valid = mask_ref[0, pl.ds(j * bk, bk)].astype(jnp.bool_)[None, :]
        allow = (pos < length) & valid
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    num_kv = pl.cdiv(length, bk)  # only tiles that contain valid slots
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention(
    q: jnp.ndarray,  # [B, 1, N, D] — single decode token
    k_cache: jnp.ndarray,  # [B, S_max, N_kv, D]
    v_cache: jnp.ndarray,  # [B, S_max, N_kv, D]
    slot_mask: jnp.ndarray,  # [B, S_max] bool — occupied slots (incl. current)
    length: jnp.ndarray,  # scalar int32 — valid length (incl. current token)
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Decode attention over the ring cache. Returns [B, 1, N, D]."""
    B, _, N, D = q.shape
    S_max, Nkv = k_cache.shape[1], k_cache.shape[2]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0, f"S_max={S_max} must divide block_k={bk}"

    qg = q.reshape(B, Nkv, G, D)
    lengths = jnp.broadcast_to(length.astype(jnp.int32), (1, 1))
    grid = (B, Nkv)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S_max), lambda b, h: (b, 0)),
            pl.BlockSpec((1, 1, G, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, S_max, 1, D), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, S_max, 1, D), lambda b, h: (b, 0, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, G, D), q.dtype),
        interpret=interpret,
    )(lengths, slot_mask.astype(jnp.int8), qg, k_cache, v_cache)
    return out.reshape(B, 1, N, D)
