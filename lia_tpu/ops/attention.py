"""Attention ops — XLA reference implementations.

Reference equivalents:
- prefill: csrc/cpu/aten/kernels/FlashAttentionKrnl.cpp (tiled causal flash attention)
- decode:  csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp (indirect-access KV)

These jnp versions are the golden models (fp32 softmax/accumulation) and the fallback
path; the Pallas flash/decode kernels in :mod:`lia_tpu.ops.pallas_attention` are tested
against them (same strategy as the reference's test_masked_mha.py golden comparisons).

Layout convention everywhere: hidden [B, S, H]; Q [B, S, N, D]; K/V **head-major**
[B, N_kv, S_kv, D] — the KV cache layout. Head-major keeps each head's [S, D] plane
contiguous, which is what both the Pallas kernels (full-plane VMEM blocks) and the
per-head DMA patterns want; GQA is expressed by reshaping Q to [B, S, N_kv, G, D] so
no KV head replication is ever materialized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative additive mask; avoids NaNs from true -inf rows


def attend(
    q: jnp.ndarray,  # [B, Sq, N, D]
    k: jnp.ndarray,  # [B, N_kv, Skv, D] (head-major)
    v: jnp.ndarray,  # [B, N_kv, Skv, D]
    mask: jnp.ndarray,  # [B, Sq, Skv] bool — True = attend
    scale: float | None = None,
    bias: jnp.ndarray | None = None,  # [B, N, Skv] key-positional (ALiBi)
) -> jnp.ndarray:
    """General masked attention, fp32 softmax. Returns [B, Sq, N, D].

    ``bias`` is a per-(head, key) additive logit term. ALiBi's relative form
    ``-slope·(q_pos - k_pos)`` reduces to the key-only ``slope·k_pos`` because
    the per-row shift ``-slope·q_pos`` cancels in the softmax — the same trick
    HF Bloom's build_alibi_tensor uses.
    """
    B, Sq, N, D = q.shape
    Nkv = k.shape[1]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5

    qg = q.reshape(B, Sq, Nkv, G, D).astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # scores: [B, Nkv, G, Sq, Skv]
    scores = jnp.einsum("bqhgd,bhkd->bhgqk", qg, kf)
    if bias is not None:
        Skv = k.shape[2]
        scores = scores + bias.reshape(B, Nkv, G, 1, Skv).astype(jnp.float32)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bqhgd", probs, vf)
    return out.reshape(B, Sq, N, D).astype(q.dtype)


def causal_mask(
    input_mask: jnp.ndarray,  # [B, S] bool — True at real-token slots
    window: int | None = None,  # sliding-window attention (mistral)
) -> jnp.ndarray:
    """Causal ∧ padding (∧ sliding-window) mask for prefill: [B, S, S]."""
    S = input_mask.shape[1]
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    if window is not None:
        causal &= jnp.triu(jnp.ones((S, S), jnp.bool_), -(window - 1))
    return causal[None, :, :] & input_mask[:, None, :]


def decode_mask(
    slot_mask: jnp.ndarray,  # [B, S_max] bool — occupied-slot mask from the KV cache
    length: jnp.ndarray,  # scalar or [B] — valid cache length incl. the new token
) -> jnp.ndarray:
    """Key-validity mask for decode: [B, 1, S_max]."""
    B, S_max = slot_mask.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_max), 1)
    lengths = jnp.broadcast_to(length, (B,))[:, None]
    return (slot_mask & (pos < lengths))[:, None, :]


# ---------------------------------------------------------------------------
# Dispatched entry points (Pallas fast path / jnp fallback)
# ---------------------------------------------------------------------------


class PrefillAttn(NamedTuple):
    """Attention context for a prompt chunk (built once, shared by all layers)."""

    input_mask: jnp.ndarray  # [B, S] bool
    mask: jnp.ndarray  # [B, S, S] causal ∧ padding (∧ window)
    window: int | None = None  # static sliding-window width (mistral) or None
    bias: jnp.ndarray | None = None  # [B, N, S] key-positional bias (ALiBi)


class DecodeAttn(NamedTuple):
    """Attention context for one decode step over the KV cache."""

    slot_mask: jnp.ndarray  # [B, S_max] bool, incl. the current token's slot
    length: jnp.ndarray  # scalar int32, incl. the current token
    mask: jnp.ndarray  # [B, 1, S_max]
    bias: jnp.ndarray | None = None  # [B, N, S_max] key-positional bias (ALiBi);
    # fresh-merge callers must pre-fill the fresh token's slot value


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Per-head ALiBi slopes (closed form from the ALiBi paper, matching HF's
    build_alibi_tensor: powers of 2^(-8/n), with odd-tail interpolation for
    non-power-of-two head counts)."""
    import math

    p = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(p) - 3)))
    slopes = [base ** (i + 1) for i in range(p)]
    if p < n_heads:
        # odd-tail interpolation: powers 1, 3, 5, … of the 2p base (HF
        # build_alibi_tensor's extra_powers = arange(1, 2*num_rem, 2))
        base2 = 2.0 ** (-(2.0 ** -(math.log2(2 * p) - 3)))
        slopes += [base2 ** i for i in range(1, 2 * (n_heads - p), 2)]
    return jnp.asarray(slopes, jnp.float32)


def alibi_bias(slopes: jnp.ndarray, key_pos: jnp.ndarray) -> jnp.ndarray:
    """Key-positional ALiBi bias [B, N, S] from logical key positions [B, S]."""
    return slopes[None, :, None] * key_pos.astype(jnp.float32)[:, None, :]


def alibi_prefill_bias(
    n_heads: int, positions: jnp.ndarray, input_mask: jnp.ndarray
) -> jnp.ndarray:
    """Prefill bias [B, N, S]: key positions are the pad-aware logical
    positions (pads → 0, masked out of attention anyway)."""
    key_pos = jnp.maximum(positions, 0) * input_mask
    return alibi_bias(alibi_slopes(n_heads), key_pos)


def alibi_slot_bias(
    n_heads: int,
    slot_mask: jnp.ndarray,  # [B, S_max] valid-slot mask
    length=None,  # scalar or [B] — fresh token's slot index
    fresh_pos: jnp.ndarray | None = None,  # [B, 1] fresh token logical position
) -> jnp.ndarray:
    """Bias over cache slots [B, N, S_max]: each valid slot's logical position
    is its rank among valid slots; optionally pre-fill the (still-invalid)
    fresh slot at ``length`` with the fresh token's position — the fresh-merge
    decode paths read it from there."""
    slot_pos = (jnp.cumsum(slot_mask.astype(jnp.int32), axis=1) - 1) * slot_mask
    if fresh_pos is not None:
        pos = fresh_pos.astype(jnp.int32)
        if getattr(length, "ndim", 0) == 1:  # ragged: per-sequence fresh slot
            slot_pos = jax.vmap(
                lambda row, p, val: jax.lax.dynamic_update_slice(row, val, (p,))
            )(slot_pos, length, pos)
        else:
            slot_pos = jax.lax.dynamic_update_slice(
                slot_pos, pos, (jnp.zeros((), jnp.int32), length)
            )
    return alibi_bias(alibi_slopes(n_heads), slot_pos)


def prefill_attn_ctx(
    input_mask: jnp.ndarray,
    window: int | None = None,
    bias: jnp.ndarray | None = None,
) -> PrefillAttn:
    return PrefillAttn(input_mask, causal_mask(input_mask, window), window, bias)


def decode_attn_ctx(
    slot_mask: jnp.ndarray,
    length: jnp.ndarray,
    window: int | None = None,
    bias: jnp.ndarray | None = None,
) -> DecodeAttn:
    """Build a decode attention context over the cache's valid slots.

    ``length`` follows the caller's convention — past-only (fresh-merge paths:
    the query sits at position ``length``) or inclusive (``length`` counts the
    just-written token). ``window`` (sliding-window attention, mistral) assumes
    the PAST-ONLY convention: slots ``<= length - window`` are dropped from the
    validity mask here, at context-build time, so the query at ``length`` sees
    exactly the last ``window`` positions (itself + ``window-1`` past). Validity
    stays a contiguous range, so every decode kernel (plane / stacked /
    fresh-merge / int8) works unchanged; inclusive-convention callers
    (scheduler host paths) don't pass ``window``."""
    if window is not None:
        B, S_max = slot_mask.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_max), 1)
        lengths = jnp.broadcast_to(length, (B,))[:, None]
        slot_mask = slot_mask & (pos > lengths - window)
    return DecodeAttn(slot_mask, length, decode_mask(slot_mask, length), bias)


def _tp_shard_info(q_heads: int, kv_heads: int, head_dim: int):
    """(ok, mesh) for shard-aware kernel dispatch.

    ``ok`` is True when the kernel is legal at PER-SHARD head counts (heads
    divide the model axis, per-shard GQA shapes pass
    :func:`dispatch.gqa_kernel_ok`); ``mesh`` is the registered TP mesh to
    shard_map over, or None for plain single-device dispatch. ``ok`` False →
    the caller falls back to the jnp path, which GSPMD partitions."""
    from lia_tpu.ops import dispatch
    from lia_tpu.ops import tp_shard as tps

    mesh = dispatch.tp_mesh()
    if mesh is None:
        return dispatch.gqa_kernel_ok(q_heads, kv_heads, head_dim), None
    tp, _ = tps.axis_sizes(mesh)
    ok = (
        q_heads % tp == 0
        and kv_heads % tp == 0
        and dispatch.gqa_kernel_ok(q_heads // tp, kv_heads // tp, head_dim)
    )
    return ok, mesh


def attend_prefill(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, ctx: PrefillAttn
) -> jnp.ndarray:
    """Prefill attention: Pallas flash kernel on TPU (shard_map'd per chip
    under a TP mesh — heads shard on "model"), jnp fallback elsewhere."""
    from functools import partial

    from lia_tpu.ops import dispatch

    S = q.shape[1]
    if ctx.bias is None and dispatch.use_pallas():
        # additive-bias models (ALiBi) take the jnp path
        ok, mesh = _tp_shard_info(q.shape[2], k.shape[1], q.shape[3])
        bq = dispatch.pick_block(S, 256, minimum=16)
        bk = dispatch.pick_block(S, 512, minimum=16)
        if ok and bq is not None and bk is not None:
            from lia_tpu.ops.pallas_attention import flash_attention_prefill

            call = partial(
                flash_attention_prefill, block_q=bq, block_k=bk,
                window=ctx.window, interpret=dispatch.interpret_mode(),
            )
            if mesh is None:
                return call(q, k, v, ctx.input_mask)
            from lia_tpu.ops import tp_shard as tps

            d = tps.batch_axis(mesh, q.shape[0])
            return tps.shard_call(
                call, mesh,
                (tps.qspec(d), tps.kvspec(d), tps.kvspec(d), tps.maskspec(d)),
                tps.qspec(d), q, k, v, ctx.input_mask,
            )
    return attend(q, k, v, ctx.mask, bias=ctx.bias)


def attend_prefill_cached(
    q: jnp.ndarray,  # [B, C, N, D] chunk queries
    k_cache,  # [B, N_kv, S_max, D] cache plane (chunk already written)
    v_cache,
    base,  # scalar or [B] — cache length before the chunk
    slot_mask: jnp.ndarray,  # [B, S_max] validity incl. chunk rows
    window: int | None = None,  # sliding-window attention (mistral)
    bias: jnp.ndarray | None = None,  # [B, N, S_max] key-positional (ALiBi)
) -> jnp.ndarray:
    """Chunk-over-cache causal attention (chunked prefill). Pallas on TPU;
    jnp golden fallback elsewhere / for quantized caches."""
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.quant import dequantize_kv, is_quantized_kv

    if is_quantized_kv(k_cache):
        k_cache = dequantize_kv(k_cache, q.dtype)
        v_cache = dequantize_kv(v_cache, q.dtype)
    B, C = q.shape[:2]
    S_max = k_cache.shape[2]
    if bias is None and dispatch.use_pallas():
        from functools import partial

        ok, mesh = _tp_shard_info(q.shape[2], k_cache.shape[1], q.shape[3])
        bk = dispatch.pick_block(S_max, 512, minimum=64)
        if ok and bk is not None:
            from lia_tpu.ops.pallas_attention import flash_attention_cached

            call = partial(
                flash_attention_cached, block_k=bk, window=window,
                interpret=dispatch.interpret_mode(),
            )
            if mesh is None:
                return call(q, k_cache, v_cache, base, slot_mask)
            from lia_tpu.ops import tp_shard as tps

            d = tps.batch_axis(mesh, B)
            return tps.shard_call(
                call, mesh,
                (tps.qspec(d), tps.kvspec(d), tps.kvspec(d),
                 tps.lenspec(base, d), tps.maskspec(d)),
                tps.qspec(d), q, k_cache, v_cache, base, slot_mask,
            )
    bases = jnp.broadcast_to(base, (B,))
    q_pos = bases[:, None] + jnp.arange(C)[None, :]  # [B, C]
    k_pos = jnp.arange(S_max)[None, None, :]
    mask = (k_pos <= q_pos[:, :, None]) & slot_mask[:, None, :]
    if window is not None:
        mask &= k_pos > q_pos[:, :, None] - window
    return attend(q, k_cache, v_cache, mask, bias=bias)


def attend_decode(
    q: jnp.ndarray, k_cache, v_cache, ctx: DecodeAttn
) -> jnp.ndarray:
    """Decode attention over the cache: Pallas kernel on TPU, jnp fallback.

    INT8 KV planes (:class:`lia_tpu.ops.quant.QuantizedKV`) are dequantized on
    the way in; XLA fuses convert+scale into the attention matmuls, so HBM reads
    stay int8-sized. (Dedicated int8-KV Pallas kernel: follow-up.)"""
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.quant import dequantize_kv, is_quantized_kv

    if is_quantized_kv(k_cache):
        k_cache = dequantize_kv(k_cache, q.dtype)
        v_cache = dequantize_kv(v_cache, q.dtype)
    S_max = k_cache.shape[2]
    if ctx.bias is None and dispatch.use_pallas():
        from functools import partial

        ok, mesh = _tp_shard_info(q.shape[2], k_cache.shape[1], q.shape[3])
        bk = dispatch.pick_block(S_max, 512, minimum=64)
        if ok and bk is not None:
            from lia_tpu.ops.pallas_attention import decode_attention

            call = partial(
                decode_attention, block_k=bk, interpret=dispatch.interpret_mode(),
            )
            if mesh is None:
                return call(q, k_cache, v_cache, ctx.slot_mask, ctx.length)
            from lia_tpu.ops import tp_shard as tps

            d = tps.batch_axis(mesh, q.shape[0])
            return tps.shard_call(
                call, mesh,
                (tps.qspec(d), tps.kvspec(d), tps.kvspec(d),
                 tps.maskspec(d), tps.lenspec(ctx.length, d)),
                tps.qspec(d), q, k_cache, v_cache, ctx.slot_mask, ctx.length,
            )
    return attend(q, k_cache, v_cache, ctx.mask, bias=ctx.bias)


def attend_decode_fresh(
    q: jnp.ndarray,  # [B, 1, N, D]
    k_fresh: jnp.ndarray,  # [B, N_kv, 1, D] (head-major)
    v_fresh: jnp.ndarray,
    k_cache_full,  # [L, B, N_kv, S_max, D] — PAST tokens only (fresh not written)
    v_cache_full,
    layer_idx,
    ctx: DecodeAttn,  # slot_mask/length cover PAST tokens only
) -> jnp.ndarray:
    """Decode attention over the stacked cache with the fresh token merged
    in-kernel (the cache write happens once per step, after the layer scan —
    see :func:`lia_tpu.models.transformer.decode_layers_scan`).

    Fallback (CPU / quantized KV / odd shapes): write the fresh token into a
    local copy of the plane and run :func:`attend_decode` — bit-identical to
    the write-then-attend order the per-layer paths use.
    """
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.quant import dequantize_kv, is_quantized_kv

    quantized = is_quantized_kv(k_cache_full)
    S_max = k_cache_full.q.shape[3] if quantized else k_cache_full.shape[3]
    Nkv = k_cache_full.q.shape[2] if quantized else k_cache_full.shape[2]
    if (
        ctx.bias is None
        and dispatch.use_pallas()
        and dispatch.stacked_kernel_enabled()
    ):
        from functools import partial

        ok, mesh = _tp_shard_info(q.shape[2], Nkv, q.shape[3])
        # int8-KV kernels lane-dim-slice their per-token SCALE planes, and
        # Mosaic requires dynamic lane offsets provably 128-aligned — so the
        # quantized path needs bk to be a 128 multiple (bf16 slices only
        # sublane dims; 64 suffices there)
        bk = dispatch.pick_block(S_max, 512, minimum=128 if quantized else 64)
        if ok and bk is not None:
            from lia_tpu.ops import tp_shard as tps

            d = None if mesh is None else tps.batch_axis(mesh, q.shape[0])
            if quantized:
                from lia_tpu.ops.pallas_attention import decode_attention_fresh_int8

                kf = dequantize_kv(k_fresh, q.dtype) if is_quantized_kv(k_fresh) else k_fresh.astype(q.dtype)
                vf = dequantize_kv(v_fresh, q.dtype) if is_quantized_kv(v_fresh) else v_fresh.astype(q.dtype)
                call = partial(
                    decode_attention_fresh_int8, block_k=bk,
                    interpret=dispatch.interpret_mode(),
                )
                if mesh is None:
                    return call(
                        q, kf, vf, k_cache_full.q, k_cache_full.s,
                        v_cache_full.q, v_cache_full.s,
                        layer_idx, ctx.slot_mask, ctx.length,
                    )
                return tps.shard_call(
                    call, mesh,
                    (tps.qspec(d), tps.kvspec(d), tps.kvspec(d),
                     tps.kv_stacked_spec(d), tps.scale_stacked_spec(d),
                     tps.kv_stacked_spec(d), tps.scale_stacked_spec(d),
                     jax.sharding.PartitionSpec(), tps.maskspec(d),
                     tps.lenspec(ctx.length, d)),
                    tps.qspec(d),
                    q, kf, vf, k_cache_full.q, k_cache_full.s,
                    v_cache_full.q, v_cache_full.s,
                    layer_idx, ctx.slot_mask, ctx.length,
                )
            from lia_tpu.ops.pallas_attention import decode_attention_fresh

            call = partial(
                decode_attention_fresh, block_k=bk,
                interpret=dispatch.interpret_mode(),
            )
            kf = k_fresh.astype(q.dtype)
            vf = v_fresh.astype(q.dtype)
            if mesh is None:
                return call(
                    q, kf, vf, k_cache_full, v_cache_full, layer_idx,
                    ctx.slot_mask, ctx.length,
                )
            return tps.shard_call(
                call, mesh,
                (tps.qspec(d), tps.kvspec(d), tps.kvspec(d),
                 tps.kv_stacked_spec(d), tps.kv_stacked_spec(d),
                 jax.sharding.PartitionSpec(), tps.maskspec(d),
                 tps.lenspec(ctx.length, d)),
                tps.qspec(d),
                q, kf, vf, k_cache_full, v_cache_full, layer_idx,
                ctx.slot_mask, ctx.length,
            )
    from lia_tpu.ops import kv_cache as kvc

    kl = kvc.index_layer_kv(k_cache_full, layer_idx)
    vl = kvc.index_layer_kv(v_cache_full, layer_idx)
    kl, vl = kvc.update_layer(kl, vl, k_fresh, v_fresh, ctx.length)
    new_mask = jnp.ones((q.shape[0], 1), jnp.bool_)
    ragged = getattr(ctx.length, "ndim", 0) == 1
    if ragged:
        slot_mask = jax.vmap(
            lambda row, p, a: jax.lax.dynamic_update_slice(row, a[None], (p,))
        )(ctx.slot_mask, ctx.length, new_mask[:, 0])
    else:
        slot_mask = jax.lax.dynamic_update_slice(
            ctx.slot_mask, new_mask, (jnp.zeros((), jnp.int32), ctx.length)
        )
    inc_ctx = decode_attn_ctx(slot_mask, ctx.length + 1, bias=ctx.bias)
    return attend_decode(q, kl, vl, inc_ctx)


def attend_decode_beam(
    q: jnp.ndarray,  # [B0*nb, 1, N, D]
    k_fresh: jnp.ndarray,  # [B0*nb, N_kv, 1, D] (head-major)
    v_fresh: jnp.ndarray,
    cache,  # lia_tpu.ops.kv_cache.BeamKVCache
    layer_idx,
    bias: jnp.ndarray | None = None,  # [B0*nb, N, S_p + T_max + 1] (ALiBi):
    # prompt slots, tail slots, then the fresh token's slot, in that order
) -> jnp.ndarray:
    """Grouped-beam decode attention: the group's shared prompt plane ∪ this
    beam's generated tail ∪ the fresh token, one online softmax.

    Fast path: :func:`lia_tpu.ops.pallas_attention.decode_beam_attention`
    (prompt selected by a ``b // nb`` index map — zero copies). Fallback
    (CPU / quantized KV / ALiBi / odd shapes): materialize the per-beam
    concatenated view and run the jnp golden path.
    """
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.quant import dequantize_kv, is_quantized_kv

    nb = cache.nb
    quantized = is_quantized_kv(cache.prompt_k)
    kp, vp, kt, vt = cache.prompt_k, cache.prompt_v, cache.tail_k, cache.tail_v
    S_p = kp.q.shape[3] if quantized else kp.shape[3]
    T_max = kt.q.shape[3] if quantized else kt.shape[3]
    Nkv = kp.q.shape[2] if quantized else kp.shape[2]
    prompt_starts = cache.prompt_len - jnp.sum(
        cache.prompt_mask.astype(jnp.int32), axis=1
    )  # [B0]
    bk_min = 128 if quantized else 64  # int8 scale planes are lane-sliced
    ok, mesh = _tp_shard_info(q.shape[2], Nkv, q.shape[3])
    if (
        bias is None
        and dispatch.use_pallas()
        and dispatch.stacked_kernel_enabled()
        and ok
        and dispatch.pick_block(S_p, 512, minimum=bk_min) is not None
        and T_max % (128 if quantized else 8) == 0
    ):
        from functools import partial

        from lia_tpu.ops import tp_shard as tps

        bk = dispatch.pick_block(S_p, 512, minimum=bk_min)
        B0 = q.shape[0] // nb
        # batch shards on "data" only when the GROUP count divides dp (the
        # per-beam arrays then split along whole groups: B = B0 * nb)
        d = None if mesh is None else tps.batch_axis(mesh, B0)
        P_ = jax.sharding.PartitionSpec
        if quantized:
            from lia_tpu.ops.pallas_attention import decode_beam_attention_int8

            kf = dequantize_kv(k_fresh, q.dtype) if is_quantized_kv(k_fresh) else k_fresh.astype(q.dtype)
            vf = dequantize_kv(v_fresh, q.dtype) if is_quantized_kv(v_fresh) else v_fresh.astype(q.dtype)
            call = partial(
                decode_beam_attention_int8, nb=nb, block_k=bk,
                interpret=dispatch.interpret_mode(),
            )
            args = (q, kf, vf, kp.q, kp.s, vp.q, vp.s, kt.q, kt.s, vt.q, vt.s,
                    layer_idx, prompt_starts, cache.prompt_len, cache.tail_len)
            if mesh is None:
                return call(*args)
            return tps.shard_call(
                call, mesh,
                (tps.qspec(d), tps.kvspec(d), tps.kvspec(d),
                 tps.kv_stacked_spec(d), tps.scale_stacked_spec(d),
                 tps.kv_stacked_spec(d), tps.scale_stacked_spec(d),
                 tps.kv_stacked_spec(d), tps.scale_stacked_spec(d),
                 tps.kv_stacked_spec(d), tps.scale_stacked_spec(d),
                 P_(), P_(d), P_(), P_()),
                tps.qspec(d), *args,
            )
        from lia_tpu.ops.pallas_attention import decode_beam_attention

        call = partial(
            decode_beam_attention, nb=nb, block_k=bk,
            interpret=dispatch.interpret_mode(),
        )
        args = (q, k_fresh.astype(q.dtype), v_fresh.astype(q.dtype),
                kp, vp, kt, vt, layer_idx, prompt_starts,
                cache.prompt_len, cache.tail_len)
        if mesh is None:
            return call(*args)
        return tps.shard_call(
            call, mesh,
            (tps.qspec(d), tps.kvspec(d), tps.kvspec(d),
             tps.kv_stacked_spec(d), tps.kv_stacked_spec(d),
             tps.kv_stacked_spec(d), tps.kv_stacked_spec(d),
             P_(), P_(d), P_(), P_()),
            tps.qspec(d), *args,
        )

    # golden fallback: expand the prompt per beam and concatenate the segments
    from lia_tpu.ops import kv_cache as kvc

    B = q.shape[0]
    kp_l = kvc.index_layer_kv(kp, layer_idx)
    vp_l = kvc.index_layer_kv(vp, layer_idx)
    kt_l = kvc.index_layer_kv(kt, layer_idx)
    vt_l = kvc.index_layer_kv(vt, layer_idx)
    if quantized:
        kp_l, vp_l = dequantize_kv(kp_l, q.dtype), dequantize_kv(vp_l, q.dtype)
        kt_l, vt_l = dequantize_kv(kt_l, q.dtype), dequantize_kv(vt_l, q.dtype)
    group = jnp.arange(B, dtype=jnp.int32) // nb
    k_all = jnp.concatenate(
        [jnp.take(kp_l, group, axis=0), kt_l, k_fresh.astype(q.dtype)], axis=2
    )  # [B, Nkv, S_p + T_max + 1, D]
    v_all = jnp.concatenate(
        [jnp.take(vp_l, group, axis=0), vt_l, v_fresh.astype(q.dtype)], axis=2
    )
    pos_t = jnp.arange(T_max)[None, :]
    tail_valid = jnp.broadcast_to(pos_t < cache.tail_len, (B, T_max))
    mask = jnp.concatenate(
        [
            jnp.take(cache.prompt_mask, group, axis=0),
            tail_valid,
            jnp.ones((B, 1), jnp.bool_),
        ],
        axis=1,
    )[:, None, :]  # [B, 1, S_p + T_max + 1]
    return attend(q, k_all, v_all, mask, bias=bias)


def attend_decode_stacked(
    q: jnp.ndarray, k_cache_full, v_cache_full, layer_idx, ctx: DecodeAttn
) -> jnp.ndarray:
    """Decode attention over layer ``layer_idx`` of the FULL stacked cache.

    Fast path: the scalar-prefetch Pallas kernel DMAs straight from the stacked
    buffer (no per-layer plane copy). Fallback (CPU, quantized KV, odd shapes):
    slice the plane out and use :func:`attend_decode`.
    """
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.quant import is_quantized_kv

    if not is_quantized_kv(k_cache_full):
        S_max = k_cache_full.shape[3]
        if (
            ctx.bias is None
            and dispatch.use_pallas()
            and dispatch.stacked_kernel_enabled()
        ):
            from functools import partial

            ok, mesh = _tp_shard_info(q.shape[2], k_cache_full.shape[2], q.shape[3])
            bk = dispatch.pick_block(S_max, 512, minimum=64)
            if ok and bk is not None:
                from lia_tpu.ops.pallas_attention import decode_attention_stacked

                call = partial(
                    decode_attention_stacked, block_k=bk,
                    interpret=dispatch.interpret_mode(),
                )
                if mesh is None:
                    return call(
                        q, k_cache_full, v_cache_full, layer_idx,
                        ctx.slot_mask, ctx.length,
                    )
                from lia_tpu.ops import tp_shard as tps

                d = tps.batch_axis(mesh, q.shape[0])
                return tps.shard_call(
                    call, mesh,
                    (tps.qspec(d), tps.kv_stacked_spec(d), tps.kv_stacked_spec(d),
                     jax.sharding.PartitionSpec(), tps.maskspec(d),
                     tps.lenspec(ctx.length, d)),
                    tps.qspec(d),
                    q, k_cache_full, v_cache_full, layer_idx,
                    ctx.slot_mask, ctx.length,
                )
    from lia_tpu.ops import kv_cache as kvc

    kl = kvc.index_layer_kv(k_cache_full, layer_idx)
    vl = kvc.index_layer_kv(v_cache_full, layer_idx)
    return attend_decode(q, kl, vl, ctx)
