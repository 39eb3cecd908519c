"""Preallocated indirect-access KV cache.

TPU-native redesign of the reference's "iakv" cache: the 4-tuple
``(seq_info, key_cache, value_cache, beam_idx)`` allocated on the first token
(intel_extension_for_pytorch/transformers/generation/greedy_search.py:237-282) with
layout ``[max_len, bs, heads, head_dim]`` consumed by the C++ decode kernel
(csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp).

Here the cache is a static-shape pytree ``[L, B, N_kv, S_max, D]`` (head-major: each
head's [S_max, D] plane is contiguous for kernel DMA) updated in place via
``lax.dynamic_update_slice`` (XLA aliases the buffer under jit donation, so updates are
truly in-place on TPU), and beam indirection becomes a batched gather over the batch axis
instead of the reference's ``beam_idx`` table — no copy of past tokens is ever made at
decode time, matching the reference's zero-copy beam reorder goal.
"""

from __future__ import annotations

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
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((), jnp.int32),
        mask=jnp.zeros((batch, max_len), jnp.bool_),
    )


def update_layer(
    k_layer: jnp.ndarray,  # [B, N_kv, S_max, D] (head-major)
    v_layer: jnp.ndarray,
    new_k: jnp.ndarray,  # [B, N_kv, S_new, D] (head-major)
    new_v: jnp.ndarray,
    start: jnp.ndarray,  # scalar int32 — uniform write offset
):
    """Write new K/V at [start : start+S_new] for one layer."""
    zero = jnp.zeros((), jnp.int32)
    k_layer = jax.lax.dynamic_update_slice(
        k_layer, new_k.astype(k_layer.dtype), (zero, zero, start, zero)
    )
    v_layer = jax.lax.dynamic_update_slice(
        v_layer, new_v.astype(v_layer.dtype), (zero, zero, start, zero)
    )
    return k_layer, v_layer


def advance(cache: KVCache, new_mask: jnp.ndarray, n_new: int) -> KVCache:
    """Advance length and slot-occupancy mask after all layers wrote n_new tokens.

    ``new_mask``: [B, n_new] bool — which of the new slots hold real tokens.
    """
    zero = jnp.zeros((), jnp.int32)
    mask = jax.lax.dynamic_update_slice(cache.mask, new_mask, (zero, cache.length))
    return cache._replace(length=cache.length + n_new, mask=mask)


def beam_reorder(cache: KVCache, beam_idx: jnp.ndarray) -> KVCache:
    """Reorder the batch axis by ``beam_idx`` [B] (beam-search hypothesis shuffle).

    The reference does this lazily with a ``beam_idx`` indirection table read inside
    the C++ kernel; on TPU a gather over the batch axis compiles to an efficient
    HBM-local shuffle and keeps every other op free of indirection.
    """
    return cache._replace(
        k=jnp.take(cache.k, beam_idx, axis=1),
        v=jnp.take(cache.v, beam_idx, axis=1),
        mask=jnp.take(cache.mask, beam_idx, axis=0),
    )
