"""Preallocated indirect-access KV cache.

TPU-native redesign of the reference's "iakv" cache: the 4-tuple
``(seq_info, key_cache, value_cache, beam_idx)`` allocated on the first token
(intel_extension_for_pytorch/transformers/generation/greedy_search.py:237-282) with
layout ``[max_len, bs, heads, head_dim]`` consumed by the C++ decode kernel
(csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp).

Here the cache is a static-shape pytree ``[L, B, N_kv, S_max, D]`` (head-major: each
head's [S_max, D] plane is contiguous for kernel DMA) updated in place via
``lax.dynamic_update_slice`` (XLA aliases the buffer under jit donation, so updates are
truly in-place on TPU). Beam indirection uses :class:`BeamKVCache`: prompt KV is
stored once per input group and shared by all beams through a static index-map
relation (never copied), and the beam shuffle gathers only the small generated
tail — the TPU-native answer to the reference's in-kernel ``beam_idx`` table.
"""

from __future__ import annotations

from typing import Any

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lia_tpu.config import ModelConfig


class KVCache(NamedTuple):
    """Stacked per-layer KV cache. ``k``/``v``: [L, B, N_kv, S_max, D] (head-major).

    ``length`` is the number of valid positions written (same for every sequence —
    prompts are left-padded to a common bucket, so decode writes at a uniform slot).
    ``mask``: [B, S_max] bool, True where a real (non-pad) token occupies the slot.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32
    mask: jnp.ndarray  # [B, S_max] bool


def init_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16, quantized: bool = False
) -> KVCache:
    """``quantized=True`` stores INT8 planes + per-token f32 scales (the north-star
    "KV-cache held INT8"; reference WOQ kv-cache knob, run.py)."""
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if quantized:
        from lia_tpu.ops.quant import QuantizedKV

        def qzero():
            return QuantizedKV(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32)
            )

        return KVCache(
            k=qzero(),
            v=qzero(),
            length=jnp.zeros((), jnp.int32),
            mask=jnp.zeros((batch, max_len), jnp.bool_),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((), jnp.int32),
        mask=jnp.zeros((batch, max_len), jnp.bool_),
    )


def index_layer_kv(plane: Any, idx) -> Any:
    """Select layer ``idx`` from a stacked K or V plane (array or QuantizedKV)."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False), plane
    )


def set_layer_kv(plane: Any, layer_plane: Any, idx) -> Any:
    """Write layer ``idx`` back into a stacked K or V plane."""
    return jax.tree.map(
        lambda a, l: jax.lax.dynamic_update_index_in_dim(a, l, idx, 0), plane, layer_plane
    )


def _update_plane(plane, new, start):
    """Write new head-major values at [start : start+S_new] into one layer plane.

    ``start`` may be a scalar (aligned batch — every sequence writes the same
    slot) or a per-sequence [B] vector (ragged / continuous-batching mode).
    Handles both raw arrays and :class:`QuantizedKV` planes (fresh values are
    quantized per token on write — the cache write IS the quantization point)."""
    from lia_tpu.ops.quant import QuantizedKV, is_quantized_kv, quantize_kv

    ragged = getattr(start, "ndim", 0) == 1
    zero = jnp.zeros((), jnp.int32)
    if is_quantized_kv(plane):
        newq = new if is_quantized_kv(new) else quantize_kv(new)
        if ragged:
            q = jax.vmap(
                lambda pl_b, nw_b, p: jax.lax.dynamic_update_slice(pl_b, nw_b, (zero, p, zero))
            )(plane.q, newq.q, start)
            sc = jax.vmap(
                lambda pl_b, nw_b, p: jax.lax.dynamic_update_slice(pl_b, nw_b, (zero, p))
            )(plane.s, newq.s, start)
            return QuantizedKV(q, sc)
        q = jax.lax.dynamic_update_slice(plane.q, newq.q, (zero, zero, start, zero))
        sc = jax.lax.dynamic_update_slice(plane.s, newq.s, (zero, zero, start))
        return QuantizedKV(q, sc)
    new = new.astype(plane.dtype)
    if ragged:
        return jax.vmap(
            lambda pl_b, nw_b, p: jax.lax.dynamic_update_slice(pl_b, nw_b, (zero, p, zero))
        )(plane, new, start)
    return jax.lax.dynamic_update_slice(plane, new, (zero, zero, start, zero))


def update_layer(
    k_layer: Any,  # [B, N_kv, S_max, D] (head-major; array or QuantizedKV)
    v_layer: Any,
    new_k: jnp.ndarray,  # [B, N_kv, S_new, D] (head-major)
    new_v: jnp.ndarray,
    start: jnp.ndarray,  # scalar int32 — uniform write offset
):
    """Write new K/V at [start : start+S_new] for one layer."""
    return _update_plane(k_layer, new_k, start), _update_plane(v_layer, new_v, start)


def advance(cache: KVCache, new_mask: jnp.ndarray, n_new: int) -> KVCache:
    """Advance length and slot-occupancy mask after all layers wrote n_new tokens.

    ``new_mask``: [B, n_new] bool — which of the new slots hold real tokens.
    """
    zero = jnp.zeros((), jnp.int32)
    mask = jax.lax.dynamic_update_slice(cache.mask, new_mask, (zero, cache.length))
    return cache._replace(length=cache.length + n_new, mask=mask)


def advance_ragged(cache: KVCache, active: jnp.ndarray) -> KVCache:
    """Per-slot advance for continuous batching: ``cache.length`` is [B];
    only ``active`` slots consumed a new token (their just-written slot becomes
    valid and their length grows)."""
    mask = jax.vmap(
        lambda row, p, a: jax.lax.dynamic_update_slice(row, a[None], (p,))
    )(cache.mask, cache.length, active)
    return cache._replace(length=cache.length + active.astype(jnp.int32), mask=mask)


def insert_slot(cache: KVCache, seg: KVCache, slot) -> KVCache:
    """Insert a freshly-prefilled single-sequence cache segment into batch row
    ``slot`` (continuous batching admission). ``seg`` has batch dim 1 and the
    same S_max; its (scalar) length becomes this slot's length."""
    zeros5 = (jnp.zeros((), jnp.int32),) * 5

    def put5(big, small):
        return jax.tree.map(
            lambda b, s_: jax.lax.dynamic_update_slice(
                b, s_.astype(b.dtype), (zeros5[0], slot) + (jnp.zeros((), jnp.int32),) * (b.ndim - 2)
            ),
            big,
            small,
        )

    mask = jax.lax.dynamic_update_slice(cache.mask, seg.mask, (slot, jnp.zeros((), jnp.int32)))
    length = jax.lax.dynamic_update_slice(
        cache.length, seg.length[None].astype(cache.length.dtype), (slot,)
    )
    return cache._replace(k=put5(cache.k, seg.k), v=put5(cache.v, seg.v), mask=mask, length=length)


def beam_reorder(cache: KVCache, beam_idx: jnp.ndarray) -> KVCache:
    """Reorder the batch axis by ``beam_idx`` [B] (beam-search hypothesis shuffle).

    Gathers the FULL cache — correct but O(cache) HBM traffic per step. The
    production beam path uses :class:`BeamKVCache` (shared prompt + per-beam
    tail) where the per-step gather touches only the generated tail; this
    whole-cache variant remains the golden model and the scheduler's fallback.
    """
    return cache._replace(
        k=jax.tree.map(lambda a: jnp.take(a, beam_idx, axis=1), cache.k),
        v=jax.tree.map(lambda a: jnp.take(a, beam_idx, axis=1), cache.v),
        mask=jnp.take(cache.mask, beam_idx, axis=0),
    )


class BeamKVCache(NamedTuple):
    """Grouped beam-search cache: the prompt's KV is stored ONCE per input
    group and shared (read-only) by all ``nb`` beams; only the generated tail
    is per-beam.

    The reference reaches zero-copy beam reorder with a per-position
    ``beam_idx`` table read inside its CPU kernel
    (csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp, schema
    MaskedMultiHeadAttention.cpp:63-70); per-position row indirection would
    defeat TPU tile DMA, so the indirection is hoisted to source granularity:
    prompt rows are group-indexed forever (beam ``b`` reads group ``b // nb``
    — a static index-map relation, no data movement), and the beam shuffle
    gathers only the [L, B·nb, N_kv, T_max, D] tail (hundreds of KB at
    practical tail lengths, vs the full-cache gather's hundreds of MB).

    ``prompt_k``/``prompt_v``: [L, B0, N_kv, S_p, D] (array or QuantizedKV);
    ``tail_k``/``tail_v``: [L, B0*nb, N_kv, T_max, D];
    ``prompt_len``: scalar (bucketed prompt length);
    ``prompt_mask``: [B0, S_p] validity (left-padded prompts);
    ``tail_len``: scalar — generated tokens committed so far (tail slots
    [0, tail_len) are valid for every live beam).
    """

    prompt_k: Any
    prompt_v: Any
    prompt_len: jnp.ndarray  # scalar int32
    prompt_mask: jnp.ndarray  # [B0, S_p] bool
    tail_k: Any
    tail_v: Any
    tail_len: jnp.ndarray  # scalar int32
    nb: int  # static


# the beam width is structural (it fixes the group/beam shape relation), not data
jax.tree_util.register_pytree_node(
    BeamKVCache,
    lambda c: (
        (c.prompt_k, c.prompt_v, c.prompt_len, c.prompt_mask, c.tail_k, c.tail_v, c.tail_len),
        c.nb,
    ),
    lambda nb, leaves: BeamKVCache(*leaves, nb),
)


def beam_cache_from_prefill(
    cache: KVCache, nb: int, max_new_tokens: int
) -> BeamKVCache:
    """Build a grouped beam cache from a group-level prefill cache (batch B0).

    The prefilled slab becomes the shared prompt segment as-is (no copy — the
    arrays are reused); a fresh zeroed tail is allocated at ``B0*nb`` rows.
    bf16 tails round to a 32 multiple (Mosaic sublane-legal, and 4× less
    per-step gather traffic than the 128 bucket — the tail gather is the beam
    step's dominant extra cost); int8 tails round to 128 because their
    per-token scale planes are LANE-dim sliced in the kernel and Mosaic
    requires dynamic lane offsets provably 128-aligned."""
    bucket = 128 if hasattr(cache.k, "q") else 32
    t_max = -(-max_new_tokens // bucket) * bucket

    def tail_like(plane):
        if hasattr(plane, "q"):  # QuantizedKV
            from lia_tpu.ops.quant import QuantizedKV

            L, B0, Nkv, _, D = plane.q.shape
            return QuantizedKV(
                jnp.zeros((L, B0 * nb, Nkv, t_max, D), plane.q.dtype),
                jnp.zeros((L, B0 * nb, Nkv, t_max), plane.s.dtype),
            )
        L, B0, Nkv, _, D = plane.shape
        return jnp.zeros((L, B0 * nb, Nkv, t_max, D), plane.dtype)

    return BeamKVCache(
        prompt_k=cache.k,
        prompt_v=cache.v,
        prompt_len=cache.length,
        prompt_mask=cache.mask,
        tail_k=tail_like(cache.k),
        tail_v=tail_like(cache.v),
        tail_len=jnp.zeros((), jnp.int32),
        nb=nb,
    )


def beam_tail_reorder(cache: BeamKVCache, flat_src: jnp.ndarray) -> BeamKVCache:
    """Beam shuffle: gather ONLY the generated tail by ``flat_src`` [B0*nb].

    ``flat_src`` stays within each group (beam_select guarantees
    ``flat_src[b] // nb == b // nb``), so the shared prompt needs no touch."""
    return cache._replace(
        tail_k=jax.tree.map(lambda a: jnp.take(a, flat_src, axis=1), cache.tail_k),
        tail_v=jax.tree.map(lambda a: jnp.take(a, flat_src, axis=1), cache.tail_v),
    )


def beam_commit_token(cache: BeamKVCache, k_stack: Any, v_stack: Any) -> BeamKVCache:
    """Commit one decode step's fresh K/V for all layers into the tail
    (the beam analog of :func:`write_token_all`) and advance ``tail_len``."""
    return cache._replace(
        tail_k=write_token_all(cache.tail_k, k_stack, cache.tail_len),
        tail_v=write_token_all(cache.tail_v, v_stack, cache.tail_len),
        tail_len=cache.tail_len + 1,
    )


def write_token_all(plane_full: Any, new_stack: Any, start) -> Any:
    """Write ONE decode step's fresh K or V for ALL layers at once.

    ``plane_full``: [L, B, N_kv, S_max, D] (array or QuantizedKV);
    ``new_stack``: [L, B, N_kv, 1, D] (the layer scan's stacked ys);
    ``start``: scalar or [B] write offset. One dynamic_update_slice per step
    replaces the per-layer write (each XLA op costs ~15µs launch overhead on
    this rig — 2 ops/step vs 2 ops/layer is ~0.7 ms at 24 layers).
    """
    from lia_tpu.ops.quant import QuantizedKV, is_quantized_kv, quantize_kv

    zero = jnp.zeros((), jnp.int32)
    ragged = getattr(start, "ndim", 0) == 1

    def upd(full, val, scale_arr=False):
        if ragged:
            if scale_arr:  # [L, B, N_kv, 1] into [L, B, N_kv, S_max]
                return jax.vmap(
                    lambda fb, vb, p: jax.lax.dynamic_update_slice(
                        fb, vb, (zero, zero, p)
                    ),
                    in_axes=(1, 1, 0),
                    out_axes=1,
                )(full, val, start)
            return jax.vmap(
                lambda fb, vb, p: jax.lax.dynamic_update_slice(
                    fb, vb, (zero, zero, p, zero)
                ),
                in_axes=(1, 1, 0),
                out_axes=1,
            )(full, val, start)
        if scale_arr:
            return jax.lax.dynamic_update_slice(full, val, (zero, zero, zero, start))
        return jax.lax.dynamic_update_slice(
            full, val, (zero, zero, zero, start, zero)
        )

    if is_quantized_kv(plane_full):
        newq = new_stack if is_quantized_kv(new_stack) else quantize_kv(new_stack)
        return QuantizedKV(
            upd(plane_full.q, newq.q), upd(plane_full.s, newq.s, scale_arr=True)
        )
    return upd(plane_full, new_stack.astype(plane_full.dtype))


def write_token(plane_full: Any, new: Any, layer_idx, start) -> Any:
    """Write a decode step's fresh K or V into the FULL stacked cache in place.

    ``plane_full``: [L, B, N_kv, S_max, D] (array or QuantizedKV);
    ``new``: [B, N_kv, S_new, D]; ``start``: scalar or [B] write offset.
    The cheap counterpart of index/update-per-plane: only S_new slots move.
    """
    from lia_tpu.ops.quant import QuantizedKV, is_quantized_kv, quantize_kv

    zero = jnp.zeros((), jnp.int32)
    ragged = getattr(start, "ndim", 0) == 1

    def upd(full, val, scale_arr=False):
        if ragged:
            if scale_arr:  # leaves without the trailing D axis
                return jax.vmap(
                    lambda fb, vb, p: jax.lax.dynamic_update_slice(
                        fb, vb[None], (layer_idx, zero, p)
                    ),
                    in_axes=(1, 0, 0),
                    out_axes=1,
                )(full, val, start)
            return jax.vmap(
                lambda fb, vb, p: jax.lax.dynamic_update_slice(
                    fb, vb[None], (layer_idx, zero, p, zero)
                ),
                in_axes=(1, 0, 0),
                out_axes=1,
            )(full, val, start)
        if scale_arr:
            return jax.lax.dynamic_update_slice(
                full, val[None], (layer_idx, zero, zero, start)
            )
        return jax.lax.dynamic_update_slice(
            full, val[None], (layer_idx, zero, zero, start, zero)
        )

    if is_quantized_kv(plane_full):
        newq = new if is_quantized_kv(new) else quantize_kv(new)
        return QuantizedKV(
            upd(plane_full.q, newq.q), upd(plane_full.s, newq.s, scale_arr=True)
        )
    return upd(plane_full, new.astype(plane_full.dtype))
