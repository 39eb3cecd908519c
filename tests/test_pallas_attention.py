"""Pallas attention kernels vs the jnp golden model (interpret mode on CPU).

Same op-level golden-comparison strategy as the reference's test_masked_mha.py
(:784 sweeps beam/greedy, first/next token, dtypes, padding) and its flash-attention
coverage: sweep padding patterns, GQA, dtypes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.ops import attention as att
from lia_tpu.ops.pallas_attention import decode_attention, flash_attention_prefill


def make_qkv(rng, B, S, N, Nkv, D, dtype):
    """q [B,S,N,D]; k/v head-major [B,Nkv,S,D] (the cache layout)."""
    q = jnp.asarray(rng.standard_normal((B, S, N, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, Nkv, S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, Nkv, S, D)), dtype)
    return q, k, v


@pytest.mark.parametrize("pads", [(0, 0), (3, 7), (15, 0)])
@pytest.mark.parametrize("gqa", [False, True])
def test_flash_prefill_matches_golden(rng, pads, gqa):
    B, S, N, D = 2, 32, 4, 16
    Nkv = 2 if gqa else N
    q, k, v = make_qkv(rng, B, S, N, Nkv, D, jnp.float32)
    mask = np.ones((B, S), bool)
    for b, p in enumerate(pads):
        mask[b, :p] = False
    mask = jnp.asarray(mask)

    ref = att.attend(q, k, v, att.causal_mask(mask))
    out = flash_attention_prefill(q, k, v, mask, block_q=16, block_k=16, interpret=True)
    # padded query rows are garbage in both — compare valid rows only
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=2e-5, atol=2e-5
    )


def test_flash_prefill_bf16(rng):
    B, S, N, D = 1, 32, 2, 16
    q, k, v = make_qkv(rng, B, S, N, N, D, jnp.bfloat16)
    mask = jnp.ones((B, S), bool)
    ref = att.attend(q, k, v, att.causal_mask(mask))
    out = flash_attention_prefill(q, k, v, mask, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize("length,pads", [(5, (0, 0)), (9, (2, 4)), (16, (0, 3))])
@pytest.mark.parametrize("gqa", [False, True])
def test_decode_matches_golden(rng, length, pads, gqa):
    B, S_max, N, D = 2, 16, 4, 16
    Nkv = 2 if gqa else N
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nkv, S_max, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nkv, S_max, D)), jnp.float32)
    slot_mask = np.zeros((B, S_max), bool)
    for b, p in enumerate(pads):
        slot_mask[b, p:length] = True  # left-padded: pads invalid, then real slots
    slot_mask = jnp.asarray(slot_mask)
    ln = jnp.asarray(length, jnp.int32)

    ref = att.attend(q, k, v, att.decode_mask(slot_mask, ln))
    out = decode_attention(q, k, v, slot_mask, ln, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_ignores_stale_slots(rng):
    """Slots beyond `length` must not leak even if slot_mask is stale there."""
    B, S_max, N, D = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, S_max, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, S_max, D)), jnp.float32)
    mask_all = jnp.ones((B, S_max), bool)
    out_a = decode_attention(q, k, v, mask_all, jnp.asarray(6, jnp.int32), block_k=8, interpret=True)
    k2 = k.at[:, :, 8:].set(99.0)  # poison the tail
    v2 = v.at[:, :, 8:].set(-99.0)
    out_b = decode_attention(q, k2, v2, mask_all, jnp.asarray(6, jnp.int32), block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant", ["prefetch", "dma"])
def test_stacked_decode_matches_plane(rng, variant):
    """Stacked-cache decode kernels (scalar-prefetch + manual-DMA variants) vs the
    per-plane kernel. Both are gated off on hardware whose Mosaic toolchain
    rejects them (see dispatch.stacked_kernel_enabled) but stay correct here."""
    from lia_tpu.ops.pallas_attention import (
        decode_attention_stacked,
        decode_attention_stacked_dma,
    )

    L, B, Nkv, S, D, G = 3, 2, 4, 32, 16, 2
    N = Nkv * G
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.float32)
    sm = jnp.ones((B, S), bool)
    ln = jnp.asarray(21, jnp.int32)
    fn = decode_attention_stacked if variant == "prefetch" else decode_attention_stacked_dma
    a = fn(q, k, v, jnp.asarray(1, jnp.int32), sm, ln, block_k=8, interpret=True)
    b = decode_attention(q, k[1], v[1], sm, ln, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pads", [0, 5])
@pytest.mark.parametrize("gqa", [False, True])
def test_fresh_decode_matches_write_then_attend(rng, pads, gqa):
    """Fresh-token-merge decode kernel vs writing the token first and running
    the per-plane kernel over the updated cache — same math, different op
    schedule (the fresh merge is the last online-softmax tile)."""
    from lia_tpu.ops.pallas_attention import decode_attention_fresh

    L, B, S, D, G = 3, 2, 32, 16, 2 if gqa else 1
    Nkv = 4
    N = Nkv * G
    past = 21  # tokens already in the cache
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.float32)
    sm = (jnp.arange(S)[None, :] < past) & (jnp.arange(S)[None, :] >= pads)
    sm = jnp.broadcast_to(sm, (B, S))
    ln = jnp.asarray(past, jnp.int32)

    out = decode_attention_fresh(
        q, kf, vf, k, v, jnp.asarray(1, jnp.int32), sm, ln, block_k=8, interpret=True
    )

    # golden: write the fresh token into the plane, then per-plane kernel
    k1 = jax.lax.dynamic_update_slice(k[1], kf, (0, 0, past, 0))
    v1 = jax.lax.dynamic_update_slice(v[1], vf, (0, 0, past, 0))
    sm_inc = sm.at[:, past].set(True)
    ref = decode_attention(
        q, k1, v1, sm_inc, jnp.asarray(past + 1, jnp.int32), block_k=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gqa", [False, True])
def test_fresh_decode_int8_matches_dequant_golden(rng, gqa):
    """INT8-cache fresh-merge kernel vs dequantize-then-attend golden: the
    deferred per-token scaling (scores for K, probs for V) must match applying
    the scales to the values."""
    from lia_tpu.ops.pallas_attention import decode_attention_fresh_int8
    from lia_tpu.ops.quant import dequantize_kv, quantize_kv

    L, B, S, D, G = 3, 2, 32, 16, 2 if gqa else 1
    Nkv = 4
    N = Nkv * G
    past = 21
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    kkv = quantize_kv(jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.float32))
    vkv = quantize_kv(jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.float32))
    sm = jnp.broadcast_to(jnp.arange(S)[None, :] < past, (B, S))
    ln = jnp.asarray(past, jnp.int32)

    out = decode_attention_fresh_int8(
        q, kf, vf, kkv.q, kkv.s, vkv.q, vkv.s,
        jnp.asarray(1, jnp.int32), sm, ln, block_k=8, interpret=True,
    )

    kd = dequantize_kv(kkv, jnp.float32)[1]
    vd = dequantize_kv(vkv, jnp.float32)[1]
    k1 = jax.lax.dynamic_update_slice(kd, kf, (0, 0, past, 0))
    v1 = jax.lax.dynamic_update_slice(vd, vf, (0, 0, past, 0))
    ref = decode_attention(
        q, k1, v1, sm.at[:, past].set(True), jnp.asarray(past + 1, jnp.int32),
        block_k=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("gqa", [False, True])
def test_chunked_prefill_matches_full(rng, gqa):
    """Two prefill_chunk calls over a split prompt must match one full prefill
    (logits + cache contents) — the chunked-prefill correctness gate."""
    from functools import partial

    from lia_tpu.models import transformer as T
    from lia_tpu.models.registry import get_config
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.utils.checkpoint import init_dummy_params

    name = "llama-tiny" if gqa else "opt-tiny"
    cfg = get_config(name).replace(dtype="float32")
    params = init_dummy_params(cfg, seed=5, scale=0.03)
    B, n = 2, 19
    toks = rng.integers(3, 500, (B, n)).astype(np.int32)
    C = 16
    total = 32  # two chunks, chunk 0 left-padded by 13
    pad = total - n
    tokens = np.full((B, total), 1, np.int32)
    tokens[:, pad:] = toks
    mask = np.zeros((B, total), bool)
    mask[:, pad:] = True

    full_cache = kvc.init_cache(cfg, B, 64, jnp.float32)
    ref_logits, ref_cache = jax.jit(partial(T.prefill, cfg))(
        jax.device_put(params), jnp.asarray(tokens), jnp.asarray(mask), full_cache
    )

    cache = kvc.init_cache(cfg, B, 64, jnp.float32)
    chunk_f = jax.jit(partial(T.prefill_chunk, cfg))
    p = jax.device_put(params)
    for off in range(0, total, C):
        logits, cache = chunk_f(
            p, jnp.asarray(tokens[:, off : off + C]),
            jnp.asarray(mask[:, off : off + C]), cache,
        )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # pad slots hold implementation-defined garbage (all-masked attention rows
    # feed later layers' pad rows) and are never read back — compare valid slots
    valid = np.asarray(ref_cache.mask)  # [B, S_max]
    ck = np.asarray(cache.k) * valid[None, :, None, :, None]
    rk = np.asarray(ref_cache.k) * valid[None, :, None, :, None]
    np.testing.assert_allclose(ck, rk, rtol=2e-4, atol=2e-4)
    assert int(cache.length) == int(ref_cache.length)
    np.testing.assert_array_equal(np.asarray(cache.mask), np.asarray(ref_cache.mask))


# ---------------------------------------------------------------------------
# Sliding-window attention (mistral) — kernel vs jnp golden
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pads", [(0, 0), (3, 7)])
@pytest.mark.parametrize("window", [8, 24])
def test_flash_prefill_window_matches_golden(rng, pads, window):
    B, S, N, D = 2, 32, 4, 16
    q, k, v = make_qkv(rng, B, S, N, N, D, jnp.float32)
    mask = np.ones((B, S), bool)
    for b, p in enumerate(pads):
        mask[b, :p] = False
    mask = jnp.asarray(mask)

    ref = att.attend(q, k, v, att.causal_mask(mask, window=window))
    out = flash_attention_prefill(
        q, k, v, mask, block_q=16, block_k=16, window=window, interpret=True
    )
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("window", [8, 100])
def test_flash_cached_window_matches_jnp(rng, window):
    """Chunk-over-cache kernel with a sliding window vs the jnp fallback mask."""
    from lia_tpu.ops.pallas_attention import flash_attention_cached

    B, C, S_max, N, D = 2, 8, 32, 4, 16
    base = 12  # cache already holds 12 tokens; chunk rows sit at [12, 20)
    q = jnp.asarray(rng.standard_normal((B, C, N, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, N, S_max, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, N, S_max, D)), jnp.float32)
    slot_mask = np.zeros((B, S_max), bool)
    slot_mask[:, : base + C] = True
    slot_mask = jnp.asarray(slot_mask)
    bases = jnp.full((B,), base, jnp.int32)

    # jnp reference: causal ∧ validity ∧ window
    q_pos = base + np.arange(C)
    k_pos = np.arange(S_max)
    m = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] > q_pos[:, None] - window)
    m = jnp.asarray(m[None] & np.asarray(slot_mask)[:, None, :])
    ref = att.attend(q, kc, vc, m)

    out = flash_attention_cached(
        q, kc, vc, bases, slot_mask, block_k=16, window=window, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_window_drops_old_slots(rng):
    """decode_attn_ctx(window=W): the query at position `length` must attend
    exactly the last W positions (itself + W-1 newest cache slots)."""
    B, S_max, N, D, W = 2, 32, 4, 16, 8
    length = 20
    kc = jnp.asarray(rng.standard_normal((B, N, S_max, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, N, S_max, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, N, 1, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, N, 1, D)), jnp.float32)
    slot_mask = np.zeros((B, S_max), bool)
    slot_mask[:, :length] = True

    ctx = att.decode_attn_ctx(jnp.asarray(slot_mask), jnp.int32(length), window=W)
    out = att.attend_decode_fresh(
        q, kf, vf, kc[None], vc[None], jnp.int32(0), ctx
    )

    # golden: write the fresh token at slot `length`, attend slots (length-W, length]
    kc2 = kc.at[:, :, length, :].set(kf[:, :, 0, :])
    vc2 = vc.at[:, :, length, :].set(vf[:, :, 0, :])
    keep = np.zeros((B, 1, S_max), bool)
    keep[:, :, length - W + 1 : length + 1] = True
    ref = att.attend(q, kc2, vc2, jnp.asarray(keep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gqa", [False, True])
@pytest.mark.parametrize("tlen", [0, 3])
def test_beam_decode_matches_concat_golden(rng, gqa, tlen):
    """Grouped-beam kernel (shared prompt plane + per-beam tail + fresh merge)
    vs the jnp concat golden: beams of one group must read the group's prompt
    and their own tail."""
    from lia_tpu.ops.pallas_attention import decode_beam_attention

    L, B0, nb, N, D = 2, 2, 3, 4, 16
    Nkv = 2 if gqa else N
    G = N // Nkv
    B = B0 * nb
    S_p, T_max = 16, 8
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((L, B0, Nkv, S_p, D)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, B0, Nkv, S_p, D)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((L, B, Nkv, T_max, D)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((L, B, Nkv, T_max, D)), jnp.float32)
    plen = jnp.asarray(12, jnp.int32)  # prompt slots [pstart, 12) valid
    pstart = jnp.asarray([2, 0], jnp.int32)
    tl = jnp.asarray(tlen, jnp.int32)

    layer = jnp.asarray(1, jnp.int32)
    out = decode_beam_attention(
        q, kf, vf, kp, vp, kt, vt, layer, pstart, plen, tl, nb,
        block_k=8, interpret=True,
    )

    # golden: concat [group prompt | own tail | fresh] with validity mask
    group = np.arange(B) // nb
    k_all = jnp.concatenate([jnp.take(kp[1], group, axis=0), kt[1], kf], axis=2)
    v_all = jnp.concatenate([jnp.take(vp[1], group, axis=0), vt[1], vf], axis=2)
    pos_p = np.arange(S_p)[None, :]
    pmask = (pos_p >= np.asarray(pstart)[group][:, None]) & (pos_p < 12)
    tmask = np.broadcast_to(np.arange(T_max)[None, :] < tlen, (B, T_max))
    mask = jnp.asarray(
        np.concatenate([pmask, tmask, np.ones((B, 1), bool)], axis=1)
    )[:, None, :]
    ref = att.attend(q, k_all, v_all, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tlen", [0, 3])
def test_beam_decode_int8_matches_dequant_golden(rng, tlen):
    """INT8-KV grouped-beam kernel (score/prob-matrix dequant) vs the jnp
    golden over the dequantized concat view."""
    from lia_tpu.ops.pallas_attention import decode_beam_attention_int8
    from lia_tpu.ops.quant import dequantize_kv, quantize_kv

    L, B0, nb, N, D = 2, 2, 2, 4, 16
    Nkv = N
    B = B0 * nb
    S_p, T_max = 16, 8
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    kp = quantize_kv(jnp.asarray(rng.standard_normal((L, B0, Nkv, S_p, D)), jnp.float32))
    vp = quantize_kv(jnp.asarray(rng.standard_normal((L, B0, Nkv, S_p, D)), jnp.float32))
    kt = quantize_kv(jnp.asarray(rng.standard_normal((L, B, Nkv, T_max, D)), jnp.float32))
    vt = quantize_kv(jnp.asarray(rng.standard_normal((L, B, Nkv, T_max, D)), jnp.float32))
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    plen = jnp.asarray(12, jnp.int32)
    pstart = jnp.asarray([2, 0], jnp.int32)
    tl = jnp.asarray(tlen, jnp.int32)
    layer = jnp.asarray(1, jnp.int32)

    out = decode_beam_attention_int8(
        q, kf, vf, kp.q, kp.s, vp.q, vp.s, kt.q, kt.s, vt.q, vt.s,
        layer, pstart, plen, tl, nb, block_k=8, interpret=True,
    )

    group = np.arange(B) // nb
    kp_d, vp_d = dequantize_kv(kp, jnp.float32), dequantize_kv(vp, jnp.float32)
    kt_d, vt_d = dequantize_kv(kt, jnp.float32), dequantize_kv(vt, jnp.float32)
    k_all = jnp.concatenate([jnp.take(kp_d[1], group, axis=0), kt_d[1], kf], axis=2)
    v_all = jnp.concatenate([jnp.take(vp_d[1], group, axis=0), vt_d[1], vf], axis=2)
    pos_p = np.arange(S_p)[None, :]
    pmask = (pos_p >= np.asarray(pstart)[group][:, None]) & (pos_p < 12)
    tmask = np.broadcast_to(np.arange(T_max)[None, :] < tlen, (B, T_max))
    mask = jnp.asarray(
        np.concatenate([pmask, tmask, np.ones((B, 1), bool)], axis=1)
    )[:, None, :]
    ref = att.attend(q, k_all, v_all, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pick_heads_int8_sublane_rule():
    """INT8-KV kernels' scale planes are rank-3 — head groups land in the
    sublane dim, so Hs must be an 8-multiple or the full head count (OPT-30B's
    56 heads picked 28 before r5 and failed Mosaic lowering)."""
    from lia_tpu.ops.pallas_attention import _pick_heads_int8

    assert _pick_heads_int8(56, 41) == 8  # 28 is illegal; 8 is the best legal
    assert _pick_heads_int8(56, 60) == 56  # full count always legal
    assert _pick_heads_int8(32, 20) == 16
    assert _pick_heads_int8(32, 100) == 32
    assert _pick_heads_int8(14, 7) == 14  # no legal divisor fits → full count
    assert _pick_heads_int8(8, 1) == 8  # cap too small → full count (legal)
