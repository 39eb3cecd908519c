"""Public fused-op API — the ``ipex.llm.modules`` analog.

The reference exposes a stable library of fused building blocks for users who
assemble their own models: ``RotaryEmbedding / RMSNorm / FastLayerNorm /
VarlenAttention / PagedAttention / IndirectAccessKVCacheAttention``
(llm/modules/mha_fusion.py:7-503) and the ``Linear*`` epilogue fusions
(llm/modules/linear_fusion.py:53-284). This module is the functional TPU-native
equivalent: each entry is a jit-friendly function over arrays (or a re-export of
the underlying op), documented with the reference class it replaces.

Two design departures from the reference, both deliberate:

- The ``Linear*`` fusions exist in the reference because eager PyTorch cannot
  fuse an epilogue into a GEMM without a custom TPP kernel. Under XLA the
  composition ``activation(x @ w + b)`` IS the fused form — the compiler emits
  one kernel — so these functions are thin, and their value is the stable name
  + weight-only-quantization dispatch (``w`` may be a ``QuantizedWeight``).
- ``IndirectAccessKVCacheAttention``'s beam-idx indirection table is replaced by
  explicit zero-copy gathers (:func:`lia_tpu.ops.kv_cache.beam_reorder`): TPU
  attention kernels read contiguous cache planes, so beams reorder the cache
  rather than indirecting every read (kv_cache.py design notes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lia_tpu.models.transformer import linear
from lia_tpu.ops.attention import attend_decode
from lia_tpu.ops.kv_cache import KVCache, beam_reorder, init_cache, update_layer
from lia_tpu.ops.norms import layernorm as fast_layer_norm  # noqa: F401
from lia_tpu.ops.norms import rmsnorm as rms_norm  # noqa: F401
from lia_tpu.ops.paged import (  # noqa: F401
    PagedKVCache,
    init_paged_cache,
    paged_attention,
    reshape_and_cache,
)
from lia_tpu.ops.rope import apply_rope

__all__ = [
    "rotary_embedding",
    "rms_norm",
    "fast_layer_norm",
    "varlen_attention",
    "indirect_access_kv_cache_attention",
    "PagedKVCache",
    "init_paged_cache",
    "reshape_and_cache",
    "paged_attention",
    "KVCache",
    "init_cache",
    "beam_reorder",
    "linear_silu",
    "linear_relu",
    "linear_gelu",
    "linear_new_gelu",
    "linear_mul",
    "linear_add",
    "linear_add_add",
    "linear2_silu_mul",
]


# -- MHA building blocks ------------------------------------------------------


def rotary_embedding(
    query: jnp.ndarray,  # [B, S, N, D]
    key: jnp.ndarray,  # [B, S, N_kv, D]
    positions: jnp.ndarray,  # [B, S] int32
    theta: float = 10000.0,
    rotary_dim: Optional[int] = None,
    interleaved: bool = False,
):
    """Rotate Q and K (``ipex.llm.modules.RotaryEmbedding`` /
    ``torch.ops.torch_ipex.rotary_position_embedding`` analog —
    csrc/cpu/aten/RotaryPositionEmbedding.cpp:36). ``interleaved`` selects the
    GPT-J/NeoX rotate-every-two pairing."""
    q = apply_rope(query, positions, theta, rotary_dim, interleaved)
    k = apply_rope(key, positions, theta, rotary_dim, interleaved)
    return q, k


def varlen_attention(
    query: jnp.ndarray,  # [T, N, D] — sequences concatenated along tokens
    key: jnp.ndarray,  # [T, N_kv, D]
    value: jnp.ndarray,  # [T, N_kv, D]
    seqlens: jnp.ndarray,  # [B] int32, sum == T
    scale: Optional[float] = None,
    causal: bool = True,
) -> jnp.ndarray:
    """Packed variable-length causal attention over concatenated sequences
    (``ipex.llm.modules.VarlenAttention`` analog — mha_fusion.py:373-489, the
    vLLM ``varlen_fwd`` schema with cu_seqlens).

    Tokens attend only within their own segment (and causally when ``causal``).
    Segment ids derive from ``seqlens`` so the whole call jits with static
    shapes — pad ``T`` and pass the real lengths. Returns ``[T, N, D]``.
    """
    T, N, D = query.shape
    n_kv = key.shape[1]
    if n_kv != N:  # GQA/MQA: broadcast kv heads over the query groups
        rep = N // n_kv
        key = jnp.repeat(key, rep, axis=1)
        value = jnp.repeat(value, rep, axis=1)
    sc = scale if scale is not None else 1.0 / (D**0.5)
    # segment id per token: tokens past sum(seqlens) land in segment B (padding)
    bounds = jnp.cumsum(seqlens)  # [B]
    tok = jnp.arange(T)
    seg = jnp.sum(tok[:, None] >= bounds[None, :], axis=-1)  # [T]
    valid = tok < bounds[-1]
    same = (seg[:, None] == seg[None, :]) & valid[:, None] & valid[None, :]
    if causal:
        same = same & (tok[:, None] >= tok[None, :])
    logits = jnp.einsum(
        "tnd,snd->nts", query.astype(jnp.float32), key.astype(jnp.float32)
    ) * sc
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(same[None, :, :], logits, neg)
    # fully-masked padding rows softmax to uniform garbage — zero them after
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(valid[None, :, None], probs, 0.0)
    out = jnp.einsum("nts,snd->tnd", probs, value.astype(jnp.float32))
    return out.astype(query.dtype)


def indirect_access_kv_cache_attention(
    query: jnp.ndarray,  # [B, 1, N, D] — decode step
    key: jnp.ndarray,  # [B, 1, N_kv, D] fresh K
    value: jnp.ndarray,  # [B, 1, N_kv, D] fresh V
    cache: KVCache,
    layer_idx: int,
    beam_idx: Optional[jnp.ndarray] = None,  # [B] int32 — beam reorder first
):
    """Decode attention over the preallocated cache
    (``ipex.llm.modules.IndirectAccessKVCacheAttention`` /
    ``masked_multihead_self_attention`` analog —
    csrc/cpu/aten/MaskedMultiHeadAttention.cpp:63-70). The reference reads
    through a ``beam_idx`` indirection table; here beams reorder the cache
    zero-copy up front (``beam_reorder``) and the kernel reads contiguous
    head-major planes. Writes the fresh K/V at slot ``cache.length``, attends
    over ``[0, length]`` inclusive, and returns ``(attn_out [B, 1, N, D],
    cache)``. Call once per layer, then
    :func:`lia_tpu.ops.kv_cache.advance` once per step (seq_info analog).
    """
    import jax.lax as lax

    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.ops.attention import decode_attn_ctx

    if beam_idx is not None:
        cache = beam_reorder(cache, beam_idx)
    k_new = jnp.swapaxes(key, 1, 2)  # head-major [B, N_kv, 1, D]
    v_new = jnp.swapaxes(value, 1, 2)
    kl = kvc.index_layer_kv(cache.k, layer_idx)
    vl = kvc.index_layer_kv(cache.v, layer_idx)
    kl, vl = update_layer(kl, vl, k_new, v_new, cache.length)
    cache = cache._replace(
        k=kvc.set_layer_kv(cache.k, kl, layer_idx),
        v=kvc.set_layer_kv(cache.v, vl, layer_idx),
    )
    # inclusive validity: the just-written slot counts
    B, S_max = cache.mask.shape
    pos = lax.broadcasted_iota(jnp.int32, (B, S_max), 1)
    slot_mask = cache.mask | (pos == jnp.broadcast_to(cache.length, (B,))[:, None])
    ctx = decode_attn_ctx(slot_mask, cache.length + 1)
    out = attend_decode(query, kl, vl, ctx)
    return out, cache


# -- Linear epilogue fusions (llm/modules/linear_fusion.py analogs) -----------
#
# ``w`` may be a raw [K, N] array or a QuantizedWeight — `linear` is the single
# WOQ dispatch point, so every fusion here works quantized (the reference pairs
# each fusion with a woq_linear_* variant; here the pairing is automatic).


def linear_silu(x, w, b=None):
    """silu(x @ w + b) — ``LinearSilu`` (tpp_linear_silu)."""
    return jax.nn.silu(linear(x, w, b))


def linear_relu(x, w, b=None):
    """relu(x @ w + b) — ``LinearRelu``."""
    return jax.nn.relu(linear(x, w, b))


def linear_gelu(x, w, b=None):
    """erf-gelu(x @ w + b) — ``LinearGelu``."""
    return jax.nn.gelu(linear(x, w, b), approximate=False)


def linear_new_gelu(x, w, b=None):
    """tanh-gelu(x @ w + b) — ``LinearNewGelu`` (gpt-j)."""
    return jax.nn.gelu(linear(x, w, b), approximate=True)


def linear_mul(x, w, other, b=None):
    """(x @ w + b) * other — ``LinearMul``."""
    return linear(x, w, b) * other


def linear_add(x, w, other, b=None):
    """(x @ w + b) + other — ``LinearAdd`` (residual fold)."""
    return linear(x, w, b) + other


def linear_add_add(x, w, o1, o2, b=None):
    """(x @ w + b) + o1 + o2 — ``LinearAddAdd``."""
    return linear(x, w, b) + o1 + o2


def linear2_silu_mul(x, w_gate, w_up, b_gate=None, b_up=None):
    """silu(x @ w_gate) * (x @ w_up) — ``Linear2SiluMul`` (SwiGLU gate)."""
    return jax.nn.silu(linear(x, w_gate, b_gate)) * linear(x, w_up, b_up)
