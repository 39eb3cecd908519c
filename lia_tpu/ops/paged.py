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
  masked attention (XLA gather + the jnp golden path — the reference semantics
  oracle);
- :func:`paged_attention_pallas` (below) is the production path: a Pallas
  kernel that walks the block table with scalar-prefetched index maps, reading
  KV blocks straight from the pool with no gather/copy.

This provides drop-in API parity for engines that allocate KV in pages (prefix
sharing, fragmentation control) — complementary to the slab cache in
:mod:`lia_tpu.ops.kv_cache`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lia_tpu.config import ModelConfig
from lia_tpu.ops import attention as att

NEG_INF = -1e30


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
    """Scatter one token per sequence into the pool (reshape_and_cache parity).

    ONE vectorized XLA scatter per plane (round 1 ran an O(B)-sequential
    ``fori_loop`` of dynamic updates — PagedAttentionKrnl.cpp's
    reshape_and_cache is a parallel scatter too)."""
    bs = cache.block_size
    blk = slots // bs
    off = slots % bs

    def scatter(pool, new):
        # pool: [nb, H, bs, D] ← new[i, :, 0, :] at (blk[i], :, off[i], :)
        return pool.at[blk, :, off, :].set(new[:, :, 0, :].astype(pool.dtype))

    return PagedKVCache(scatter(cache.k, k_new), scatter(cache.v, v_new))


def write_prompt_paged(
    cache: PagedKVCache,
    k_seq: jnp.ndarray,  # [N_kv, S, D] one sequence's fresh keys (head-major)
    v_seq: jnp.ndarray,
    block_table_row: jnp.ndarray,  # [max_blocks] int32
    length: jnp.ndarray | int,  # number of valid tokens (from slot 0)
) -> PagedKVCache:
    """Write a freshly-prefilled sequence's first ``length`` tokens into its
    pages (admission path). Block 0 is the pool's reserved NULL page (the
    allocator never hands it out): positions beyond ``length`` scatter there
    harmlessly, keeping the write a single vectorized op."""
    H, S, D = k_seq.shape
    bs = cache.block_size
    pos = jnp.arange(S, dtype=jnp.int32)
    valid = pos < length
    blk = jnp.where(valid, jnp.take(block_table_row, pos // bs), 0)
    off = pos % bs

    def scatter(pool, new):
        return pool.at[blk, :, off, :].set(
            new.transpose(1, 0, 2).astype(pool.dtype)
        )

    return PagedKVCache(scatter(cache.k, k_seq), scatter(cache.v, v_seq))


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


def _paged_kernel_call(
    q, k_pool, v_pool, layer_idx, block_table, lengths,
    k_fresh=None, v_fresh=None, scale=None,
):
    """Shard-aware dispatch to :func:`paged_decode_attention`, or None → the
    caller's jnp gather fallback. Under a TP mesh the pool's head axis shards
    on "model" and each chip walks its own head shard's pages (page tables
    replicate — they index blocks, not heads)."""
    from functools import partial

    from lia_tpu.ops import dispatch

    if not (dispatch.use_pallas() and dispatch.stacked_kernel_enabled()):
        return None
    N, D = q.shape[2], q.shape[3]
    Nkv = k_pool.shape[2]
    mesh = dispatch.tp_mesh()
    call = partial(
        paged_decode_attention, scale=scale, interpret=dispatch.interpret_mode(),
        merge_fresh=k_fresh is not None,
    )
    if mesh is None:
        if not dispatch.gqa_kernel_ok(N, Nkv, D):
            return None
        if k_fresh is None:
            return call(q, k_pool, v_pool, layer_idx, block_table, lengths)
        return call(q, k_pool, v_pool, layer_idx, block_table, lengths,
                    k_fresh, v_fresh)
    from lia_tpu.ops import tp_shard as tps

    tp, _ = tps.axis_sizes(mesh)
    if N % tp or Nkv % tp or not dispatch.gqa_kernel_ok(N // tp, Nkv // tp, D):
        return None
    P_ = jax.sharding.PartitionSpec
    d = tps.batch_axis(mesh, q.shape[0])
    m = tps.MODEL
    pool_spec = P_(None, None, m, None, None)
    in_specs = [P_(d, None, m, None), pool_spec, pool_spec, P_(),
                P_(d, None), P_(d)]
    args = [q, k_pool, v_pool, layer_idx, block_table, lengths]
    if k_fresh is not None:
        in_specs += [P_(d, m, None, None), P_(d, m, None, None)]
        args += [k_fresh, v_fresh]
    return tps.shard_call(call, mesh, in_specs, P_(d, None, m, None), *args)


def paged_attention(
    q: jnp.ndarray,  # [B, 1, N, D] single decode token per sequence
    cache: PagedKVCache,
    block_table: jnp.ndarray,  # [B, max_blocks]
    lengths: jnp.ndarray,  # [B] valid tokens per sequence
    scale: float | None = None,
) -> jnp.ndarray:
    """single_query_cached_kv_attention parity: decode attention over paged KV.

    Pallas fast path (TPU): the block-table page walk happens inside the kernel
    via scalar-prefetch index maps; fallback is the XLA gather + jnp path."""
    D = q.shape[-1]
    bs = cache.block_size
    if D % 8 == 0 and (bs % 8 == 0 or bs >= 8):
        out = _paged_kernel_call(
            q, cache.k[None], cache.v[None], jnp.asarray(0, jnp.int32),
            block_table, lengths, scale=scale,
        )
        if out is not None:
            return out
    ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(block_table)
    # ks: [B, N_kv, S_virtual, D]
    B = q.shape[0]
    S_virtual = ks.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_virtual), 1)
    mask = pos < lengths[:, None]
    return att.attend(q, ks, vs, mask[:, None, :], scale=scale)


def write_prompt_all_layers(
    k_pool: jnp.ndarray,  # [L, nb, H, bs, D]
    v_pool: jnp.ndarray,
    seg_k: jnp.ndarray,  # [L, H, S, D] one sequence's prefilled K (head-major)
    seg_v: jnp.ndarray,
    block_table_row: jnp.ndarray,  # [P] int32
    length,  # valid tokens
    start=0,  # first position to commit (prefix-cache admission skips the
    # shared pages: positions < start already live in cached pages)
):
    """Admission write: ONE scatter per plane commits all layers' prompt KV
    into the sequence's pages (invalid positions land in the null page 0)."""
    L, H, S, D = seg_k.shape
    bs = k_pool.shape[3]
    pos = jnp.arange(S, dtype=jnp.int32)
    valid = (pos >= start) & (pos < length)
    blk = jnp.where(valid, jnp.take(block_table_row, pos // bs), 0)
    off = pos % bs
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None]

    def scatter(pool, seg):
        vals = seg.transpose(0, 2, 1, 3)  # [L, S, H, D]
        return pool.at[l_idx, blk[None, :], :, off[None, :], :].set(
            vals.astype(pool.dtype)
        )

    return scatter(k_pool, seg_k), scatter(v_pool, seg_v)


def seed_prefix_cache(
    k_pool: jnp.ndarray,  # [L, nb, H, bs, D]
    v_pool: jnp.ndarray,
    block_table_row: jnp.ndarray,  # [P] int32 — pages covering [0, base)
    base,  # traced scalar: reused prefix tokens
    bucket: int,  # static seg size (>= the full prompt length)
):
    """Gather a cached prefix chain into a contiguous [1, bucket] seg cache.

    Automatic-prefix-caching admission (vLLM APC analog; the reference has no
    equivalent — its PagedAttention op stops at reshape_and_cache): the first
    ``base`` slots hold KV gathered from the shared pages, ``length``/``mask``
    mark them valid, and :func:`lia_tpu.models.transformer.prefill_chunk` then
    computes only the prompt's suffix against this context. Validity stays
    contiguous [0, base) so the Pallas chunk kernel remains legal.
    """
    from lia_tpu.ops.kv_cache import KVCache

    L, nb, H, bs, D = k_pool.shape
    Pb = -(-bucket // bs)  # static page count covering the seg
    row = block_table_row[:Pb]

    def gather(pool):
        pages = jnp.take(pool, row, axis=1)  # [L, Pb, H, bs, D]
        seq = pages.transpose(0, 2, 1, 3, 4).reshape(L, H, Pb * bs, D)
        return seq[:, None, :, :bucket, :]  # [L, 1, H, bucket, D]

    base = jnp.asarray(base, jnp.int32)
    mask = (jnp.arange(bucket, dtype=jnp.int32) < base)[None]
    return KVCache(k=gather(k_pool), v=gather(v_pool), length=base, mask=mask)


def write_token_all_layers(
    k_pool: jnp.ndarray,  # [L, nb, H, bs, D]
    v_pool: jnp.ndarray,
    k_stack: jnp.ndarray,  # [L, B, H, 1, D] — the layer scan's stacked fresh keys
    v_stack: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, P]
    lengths: jnp.ndarray,  # [B] write position per sequence
    active: jnp.ndarray,  # [B] bool — inactive slots write to the null page
):
    """Decode-step write: ONE scatter per plane commits every layer's fresh
    token (the paged analog of kv_cache.write_token_all)."""
    L, B = k_stack.shape[:2]
    bs = k_pool.shape[3]
    blk = jnp.take_along_axis(block_table, (lengths // bs)[:, None], axis=1)[:, 0]
    blk = jnp.where(active, blk, 0)
    off = lengths % bs
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None]

    def scatter(pool, stack):
        vals = stack[:, :, :, 0, :]  # [L, B, H, D]
        return pool.at[l_idx, blk[None, :], :, off[None, :], :].set(
            vals.astype(pool.dtype)
        )

    return scatter(k_pool, k_stack), scatter(v_pool, v_stack)


def write_chunk_all_layers(
    k_pool: jnp.ndarray,  # [L, nb, H, bs, D]
    v_pool: jnp.ndarray,
    k_stack: jnp.ndarray,  # [L, B, H, C, D] — the layer scan's stacked chunk keys
    v_stack: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, P]
    lengths: jnp.ndarray,  # [B] first write position per sequence
    active: jnp.ndarray,  # [B] bool — inactive slots write to the null page
):
    """Speculative-verify write: commit C chunk tokens per sequence for every
    layer in one scatter per plane (positions [lengths, lengths+C); rejected
    suffixes become dead slots past the advanced length and are overwritten
    by later writes)."""
    L, B, H, C, D = k_stack.shape
    bs = k_pool.shape[3]
    pos = lengths[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]  # [B, C]
    page_idx = jnp.clip(pos // bs, 0, block_table.shape[1] - 1)
    blk = jnp.take_along_axis(block_table, page_idx, axis=1)  # [B, C]
    blk = jnp.where(active[:, None], blk, 0)
    off = pos % bs
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None, None]

    def scatter(pool, stack):
        vals = stack.transpose(0, 1, 3, 2, 4)  # [L, B, C, H, D]
        return pool.at[l_idx, blk[None], :, off[None], :].set(vals.astype(pool.dtype))

    return scatter(k_pool, k_stack), scatter(v_pool, v_stack)


def attend_chunk_paged(
    q: jnp.ndarray,  # [B, C, N, D]
    k_fresh: jnp.ndarray,  # [B, N_kv, C, D] — the chunk's keys (not yet paged)
    v_fresh: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    layer_idx,
    block_table: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] past tokens
    alibi_slopes: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """C-query chunk attention over pages + intra-chunk causal (speculative
    verify). Pallas block-table kernel on TPU; jnp gather fallback."""
    if alibi_slopes is None:
        out = _paged_kernel_call(
            q, k_pool, v_pool, layer_idx, block_table, lengths,
            k_fresh=k_fresh, v_fresh=v_fresh,
        )
        if out is not None:
            return out
    kl = jax.lax.dynamic_index_in_dim(k_pool, layer_idx, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_pool, layer_idx, 0, keepdims=False)
    cache = PagedKVCache(kl, vl)
    ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(block_table)
    B, C = q.shape[:2]
    S = ks.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    ks2 = jnp.concatenate([ks, k_fresh.astype(ks.dtype)], axis=2)
    vs2 = jnp.concatenate([vs, v_fresh.astype(vs.dtype)], axis=2)
    # page slots visible iff < length; chunk col c' visible to chunk row c iff c' <= c
    page_ok = (pos < lengths[:, None])[:, None, :]  # [B, 1, S]
    page_ok = jnp.broadcast_to(page_ok, (B, C, S))
    tri = jnp.tril(jnp.ones((C, C), bool))[None]
    mask = jnp.concatenate([page_ok, jnp.broadcast_to(tri, (B, C, C))], axis=2)
    bias = None
    if alibi_slopes is not None:
        key_pos = jnp.concatenate(
            [pos, lengths[:, None] + jnp.arange(C, dtype=jnp.int32)[None]], axis=1
        )
        bias = att.alibi_bias(alibi_slopes, key_pos)
    return att.attend(q, ks2, vs2, mask, bias=bias)


def verify_step_paged(
    cfg: ModelConfig,
    params,
    tokens: jnp.ndarray,  # [B, C] — pending token + k proposals
    positions: jnp.ndarray,  # [B, C] logical positions
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, P]
    lengths: jnp.ndarray,  # [B] past tokens per sequence
    active: jnp.ndarray,  # [B] bool
):
    """Speculative verify over the paged pool: run all C chunk tokens through
    every layer (pages + intra-chunk causal attention), commit the chunk's KV,
    and return per-position logits [B, C, V]. The caller advances
    ``kv_lengths`` by the ACCEPTED count only — rejected slots are dead until
    overwritten (the paged analog of lookahead._verify_fn)."""
    from lia_tpu.models import transformer as T

    x = T.embed(cfg, params, tokens, positions)
    slopes = att.alibi_slopes(cfg.num_heads) if cfg.alibi else None

    def body(h, inputs):
        lp, idx = inputs
        residual = h
        q, k, v = T.attn_in(cfg, lp, h, positions)
        attn_out = attend_chunk_paged(
            q, k, v, k_pool, v_pool, idx, block_table, lengths,
            alibi_slopes=slopes,
        )
        h = T.attn_post_mlp(cfg, lp, residual, attn_out)
        return h, (k, v)

    x, (k_stack, v_stack) = jax.lax.scan(
        body, x, (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32))
    )
    k_pool, v_pool = write_chunk_all_layers(
        k_pool, v_pool, k_stack, v_stack, block_table, lengths, active
    )
    logits = T.lm_head(cfg, params, x)  # [B, C, V]
    return logits, k_pool, v_pool


def attend_decode_paged(
    q: jnp.ndarray,  # [B, 1, N, D]
    k_fresh: jnp.ndarray,  # [B, N_kv, 1, D]
    v_fresh: jnp.ndarray,
    k_pool: jnp.ndarray,  # [L, nb, N_kv, bs, D]
    v_pool: jnp.ndarray,
    layer_idx,
    block_table: jnp.ndarray,  # [B, P]
    lengths: jnp.ndarray,  # [B] past tokens (fresh merged separately)
    alibi_slopes: jnp.ndarray | None = None,  # [N] — ALiBi families (bloom/mpt)
) -> jnp.ndarray:
    """Dispatched paged decode attention with fresh-token merge.

    Paged storage holds only real tokens contiguously per sequence, so the
    ALiBi key position IS the gathered index — ``slopes · arange`` (fresh token
    at ``lengths``). ALiBi routes through the jnp gather path (the block-table
    kernel carries no bias)."""
    if alibi_slopes is None:
        out = _paged_kernel_call(
            q, k_pool, v_pool, layer_idx, block_table, lengths,
            k_fresh=k_fresh, v_fresh=v_fresh,
        )
        if out is not None:
            return out
    # fallback: gather the layer's pages, append fresh, run the jnp golden path
    kl = jax.lax.dynamic_index_in_dim(k_pool, layer_idx, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_pool, layer_idx, 0, keepdims=False)
    cache = PagedKVCache(kl, vl)
    ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(block_table)
    B, S = block_table.shape[0], ks.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    ks2 = jnp.concatenate([ks, k_fresh.astype(ks.dtype)], axis=2)
    vs2 = jnp.concatenate([vs, v_fresh.astype(vs.dtype)], axis=2)
    mask = jnp.concatenate(
        [pos < lengths[:, None], jnp.ones((B, 1), bool)], axis=1
    )
    bias = None
    if alibi_slopes is not None:
        key_pos = jnp.concatenate([pos, lengths[:, None]], axis=1)  # [B, S+1]
        bias = att.alibi_bias(alibi_slopes, key_pos)
    return att.attend(q, ks2, vs2, mask[:, None, :], bias=bias)


def decode_step_paged(
    cfg: ModelConfig,
    params,
    tokens: jnp.ndarray,  # [B, 1]
    logical_pos: jnp.ndarray,  # [B]
    k_pool: jnp.ndarray,  # [L, nb, H, bs, D]
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, P]
    lengths: jnp.ndarray,  # [B] past tokens per sequence
    active: jnp.ndarray,  # [B] bool
):
    """One ragged decode step over the paged pool (continuous batching).

    Mirrors transformer.decode_step_ragged: the layer scan reads pages via the
    Pallas block-table kernel (fresh token merged in-kernel), stacks fresh K/V
    as scan ys, and two scatters commit all layers afterwards.
    """
    from lia_tpu.models import transformer as T

    x = T.embed(cfg, params, tokens, logical_pos[:, None])
    positions = logical_pos[:, None]
    slopes = att.alibi_slopes(cfg.num_heads) if cfg.alibi else None

    def body(h, inputs):
        lp, idx = inputs
        residual = h
        q, k, v = T.attn_in(cfg, lp, h, positions)
        attn_out = attend_decode_paged(
            q, k, v, k_pool, v_pool, idx, block_table, lengths,
            alibi_slopes=slopes,
        )
        h = T.attn_post_mlp(cfg, lp, residual, attn_out)
        return h, (k, v)

    x, (k_stack, v_stack) = jax.lax.scan(
        body, x, (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32))
    )
    k_pool, v_pool = write_token_all_layers(
        k_pool, v_pool, k_stack, v_stack, block_table, lengths, active
    )
    logits = T.lm_head(cfg, params, x)[:, 0, :]
    return logits, k_pool, v_pool


# ---------------------------------------------------------------------------
# Pallas paged decode kernel (block-table page walk in the index map)
# ---------------------------------------------------------------------------


def _paged_kernel(
    tbl_ref,  # [B, P] int32 scalar-prefetch — block table
    idx_ref,  # [1] int32 scalar-prefetch — layer index
    len_ref,  # [B, 1] int32 SMEM — valid tokens per sequence (excl. fresh)
    q_ref,  # [1, Hs, 1, G*D]
    kf_ref,  # [1, Hs, 1, D] or None-shaped (no fresh merge)
    vf_ref,
    k_ref,  # [1, Hs, bs, D] — page selected by the index map
    v_ref,
    o_ref,  # [1, Hs, 1, G*D]
    m_s,  # VMEM scratch [Hs, G, 128] (lane-padded online-softmax carries)
    l_s,
    acc_s,  # VMEM scratch [Hs, G, D]
    *,
    scale: float,
    bs: int,
    G: int,
    merge_fresh: bool,
):
    """One (b, h, page) grid cell of paged decode/verify attention.

    The page walk is free: the K/V BlockSpec index maps read the prefetched
    block table, so each grid step DMAs pool page ``table[b, j]`` directly —
    the reference's C++ page loop (PagedAttentionKrnl.cpp) becomes index-map
    arithmetic. Online-softmax carries persist in VMEM scratch across the page
    grid dimension (innermost, sequential).

    ``C`` chunk queries per sequence (speculative verify; C=1 is plain
    decode): every page position precedes every chunk position, so the page
    phase needs no causal masking across query rows — only the final
    fresh-chunk phase applies the intra-chunk causal triangle. The C>1 form
    also lifts the dots off the M=1 MXU latency floor.
    """
    Hs, C = k_ref.shape[1], q_ref.shape[2]
    D = k_ref.shape[3]
    b = pl.program_id(0)
    j = pl.program_id(2)
    npages = pl.num_programs(2)
    length = len_ref[b, 0]

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # pages beyond the sequence's frontier contribute nothing — skip compute
    @pl.when(j * bs < length)
    def _():
        # [Hs, C*G, D] — row r is chunk position r // G, query head r % G
        q = q_ref[0].astype(jnp.float32).reshape(Hs, C * G, D) * scale
        k = k_ref[0].astype(jnp.float32)  # [Hs, bs, D]
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [Hs, C*G, bs]
        pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, (Hs, C * G, bs), 2)
        s = jnp.where(pos < length, s, NEG_INF)
        m = m_s[:, :, 0:1]
        l = l_s[:, :, 0:1]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
        l_s[:] = jnp.broadcast_to(l, l_s.shape)

    @pl.when(j == npages - 1)
    def _():
        m = m_s[:, :, 0:1]
        l = l_s[:, :, 0:1]
        acc = acc_s[:]
        if merge_fresh:
            q = q_ref[0].astype(jnp.float32).reshape(Hs, C * G, D) * scale
            kf = kf_ref[0].astype(jnp.float32)  # [Hs, C, D]
            vf = vf_ref[0].astype(jnp.float32)
            sf = jax.lax.dot_general(
                q, kf, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [Hs, C*G, C]
            row_c = jax.lax.broadcasted_iota(jnp.int32, (Hs, C * G, C), 1) // G
            col_c = jax.lax.broadcasted_iota(jnp.int32, (Hs, C * G, C), 2)
            sf = jnp.where(col_c <= row_c, sf, NEG_INF)  # intra-chunk causal
            m_new = jnp.maximum(m, jnp.max(sf, axis=-1, keepdims=True))
            p = jnp.exp(sf - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, vf, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, C, G * D).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "merge_fresh")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, C, N, D] — C=1 decode, C=k+1 speculative verify
    k_pool: jnp.ndarray,  # [L, num_blocks, N_kv, bs, D] stacked paged pool
    v_pool: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    block_table: jnp.ndarray,  # [B, P] int32 (sequence-ordered pages)
    lengths: jnp.ndarray,  # [B] valid tokens (excluding the fresh chunk)
    k_fresh: jnp.ndarray | None = None,  # [B, N_kv, C, D] — merged in-kernel
    v_fresh: jnp.ndarray | None = None,
    scale: float | None = None,
    interpret: bool | None = None,
    merge_fresh: bool | None = None,
) -> jnp.ndarray:
    """Chunk attention over a paged pool; the page walk rides the BlockSpec
    index maps (scalar-prefetched block table + layer index). The fresh chunk
    (this step's C tokens, not yet written to pages) is merged in-kernel with
    the intra-chunk causal triangle."""
    B, C, N, D = q.shape
    L, nb, Nkv, bs, _ = k_pool.shape
    G = N // Nkv
    P = block_table.shape[1]
    scale = scale if scale is not None else D**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if merge_fresh is None:
        merge_fresh = k_fresh is not None
    if k_fresh is None:
        k_fresh = jnp.zeros((B, Nkv, C, D), q.dtype)
        v_fresh = jnp.zeros((B, Nkv, C, D), q.dtype)

    qg = q.reshape(B, C, Nkv, G * D).transpose(0, 2, 1, 3)  # [B, Nkv, C, G*D]
    lengths = jnp.broadcast_to(lengths.astype(jnp.int32), (B,))
    # one KV head-group per cell sized by VMEM (pages are small; use all heads)
    Hs = Nkv
    k_flat = k_pool.reshape(L * nb, Nkv, bs, D)
    v_flat = v_pool.reshape(L * nb, Nkv, bs, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block table + layer index
        grid=(B, Nkv // Hs, P),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h, j, tbl, li: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, C, G * D), lambda b, h, j, tbl, li: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, C, D), lambda b, h, j, tbl, li: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, C, D), lambda b, h, j, tbl, li: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, Hs, bs, D), lambda b, h, j, tbl, li: (li[0] * nb + tbl[b, j], h, 0, 0)
            ),
            pl.BlockSpec(
                (1, Hs, bs, D), lambda b, h, j, tbl, li: (li[0] * nb + tbl[b, j], h, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, Hs, C, G * D), lambda b, h, j, tbl, li: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hs, C * G, 128), jnp.float32),
            pltpu.VMEM((Hs, C * G, 128), jnp.float32),
            pltpu.VMEM((Hs, C * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, scale=scale, bs=bs, G=G, merge_fresh=merge_fresh
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nkv, C, G * D), q.dtype),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        layer_idx.astype(jnp.int32)[None],
        lengths[:, None],
        qg,
        k_fresh.astype(q.dtype),
        v_fresh.astype(q.dtype),
        k_flat,
        v_flat,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, C, N, D)
