"""Paged KV cache + paged attention (vLLM-compatible semantics).

Reference equivalent: csrc/cpu/aten/PagedAttention.cpp:57-65 (`reshape_and_cache` +
`single_query_cached_kv_attention`) with kernel PagedAttentionKrnl.cpp, surfaced as
``ipex.llm.modules.PagedAttention``. TPU-native form:

- the KV pool is a global block array ``[num_blocks, N_kv, block_size, D]``
  (head-major inside a block, matching the framework layout);
- each sequence owns a ``block_table`` row of block indices; slot ``t`` of
  sequence ``b`` lives at ``(table[b, t // bs], :, t % bs, :)``;
- :func:`reshape_and_cache` scatters fresh tokens through a flat slot mapping;
- :func:`paged_attention` gathers a sequence's blocks and runs the framework's
  masked attention (XLA gather + the jnp golden path; a Pallas gather-fused
  kernel is the planned follow-up — the contiguous decode kernel covers today's
  serving engine, which uses slot-per-sequence allocation instead of paging).

This provides drop-in API parity for engines that allocate KV in pages (prefix
sharing, fragmentation control) — complementary to the slab cache in
:mod:`lia_tpu.ops.kv_cache`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lia_tpu.config import ModelConfig
from lia_tpu.ops import attention as att


class PagedKVCache(NamedTuple):
    """One layer's paged pool. ``k``/``v``: [num_blocks, N_kv, block_size, D]."""

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def block_size(self) -> int:
        return self.k.shape[2]


def init_paged_cache(
    cfg: ModelConfig, num_blocks: int, block_size: int = 16, dtype=jnp.bfloat16
) -> PagedKVCache:
    shape = (num_blocks, cfg.num_kv_heads, block_size, cfg.head_dim)
    return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def slot_mapping(
    block_table: jnp.ndarray,  # [B, max_blocks] int32 block ids
    positions: jnp.ndarray,  # [B] target slot index per sequence
    block_size: int,
) -> jnp.ndarray:
    """Flat pool slot (block_id * bs + offset) for each sequence's write position."""
    blk = jnp.take_along_axis(block_table, (positions // block_size)[:, None], axis=1)[:, 0]
    return blk * block_size + positions % block_size


def reshape_and_cache(
    k_new: jnp.ndarray,  # [B, N_kv, 1, D] fresh keys (head-major)
    v_new: jnp.ndarray,
    cache: PagedKVCache,
    slots: jnp.ndarray,  # [B] flat pool slots (from slot_mapping)
) -> PagedKVCache:
    """Scatter one token per sequence into the pool (reshape_and_cache parity)."""
    bs = cache.block_size
    blk = slots // bs
    off = slots % bs

    def scatter(pool, new):
        # pool: [nb, H, bs, D]; write new[i, :, 0, :] at (blk[i], :, off[i], :)
        def body(i, pool):
            return jax.lax.dynamic_update_slice(
                pool,
                new[i, :, 0:1, :][None].astype(pool.dtype),
                (blk[i], jnp.zeros((), jnp.int32), off[i], jnp.zeros((), jnp.int32)),
            )

        return jax.lax.fori_loop(0, new.shape[0], body, pool)

    return PagedKVCache(scatter(cache.k, k_new), scatter(cache.v, v_new))


def gather_sequence(
    cache: PagedKVCache,
    block_table_row: jnp.ndarray,  # [max_blocks] int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize one sequence's K/V as head-major [N_kv, max_blocks*bs, D]."""
    k = jnp.take(cache.k, block_table_row, axis=0)  # [mb, H, bs, D]
    v = jnp.take(cache.v, block_table_row, axis=0)
    mb, H, bs, D = k.shape
    return (
        k.transpose(1, 0, 2, 3).reshape(H, mb * bs, D),
        v.transpose(1, 0, 2, 3).reshape(H, mb * bs, D),
    )


def paged_attention(
    q: jnp.ndarray,  # [B, 1, N, D] single decode token per sequence
    cache: PagedKVCache,
    block_table: jnp.ndarray,  # [B, max_blocks]
    lengths: jnp.ndarray,  # [B] valid tokens per sequence
    scale: float | None = None,
) -> jnp.ndarray:
    """single_query_cached_kv_attention parity: decode attention over paged KV."""
    B = q.shape[0]
    ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(block_table)
    # ks: [B, N_kv, S_virtual, D]
    S_virtual = ks.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_virtual), 1)
    mask = pos < lengths[:, None]
    return att.attend(q, ks, vs, mask[:, None, :], scale=scale)
