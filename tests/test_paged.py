"""Paged KV cache tests — golden comparison vs the contiguous cache path
(reference analog: test_paged_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.models.registry import get_config
from lia_tpu.ops import attention as att
from lia_tpu.ops import paged


@pytest.fixture
def cfg():
    return get_config("opt-tiny")  # 4 kv heads, D=16


def test_slot_mapping(cfg):
    table = jnp.asarray([[3, 1, 7], [0, 5, 2]], jnp.int32)
    pos = jnp.asarray([17, 2], jnp.int32)  # block 1 offset 1; block 0 offset 2
    slots = paged.slot_mapping(table, pos, block_size=16)
    np.testing.assert_array_equal(np.asarray(slots), [1 * 16 + 1, 0 * 16 + 2])


def test_paged_matches_contiguous(cfg, rng):
    """Fill a paged pool token by token and compare decode attention against the
    contiguous golden path."""
    B, D, H = 2, cfg.head_dim, cfg.num_kv_heads
    bs = 8
    n_tok = 19
    cache = paged.init_paged_cache(cfg, num_blocks=16, block_size=bs, dtype=jnp.float32)
    # non-trivial block tables (different, shuffled blocks per sequence)
    table = jnp.asarray([[2, 9, 4], [11, 0, 7]], jnp.int32)

    ks = rng.standard_normal((n_tok, B, H, 1, D)).astype(np.float32)
    vs = rng.standard_normal((n_tok, B, H, 1, D)).astype(np.float32)
    for t in range(n_tok):
        slots = paged.slot_mapping(table, jnp.full((B,), t, jnp.int32), bs)
        cache = paged.reshape_and_cache(jnp.asarray(ks[t]), jnp.asarray(vs[t]), cache, slots)

    q = jnp.asarray(rng.standard_normal((B, 1, cfg.num_heads, D)), jnp.float32)
    lengths = jnp.asarray([n_tok, 12], jnp.int32)
    out = paged.paged_attention(q, cache, table, lengths)

    # contiguous golden: same tokens in a flat head-major cache
    k_flat = jnp.asarray(ks[:, :, :, 0, :]).transpose(1, 2, 0, 3)  # [B, H, S, D]
    v_flat = jnp.asarray(vs[:, :, :, 0, :]).transpose(1, 2, 0, 3)
    pos = jnp.arange(n_tok)[None, :]
    mask = (pos < lengths[:, None])[:, None, :]
    ref = att.attend(q, k_flat, v_flat, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_block_reuse_isolation(cfg, rng):
    """Two sequences sharing no blocks must not read each other's tokens."""
    bs = 4
    cache = paged.init_paged_cache(cfg, num_blocks=8, block_size=bs, dtype=jnp.float32)
    table = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    B, H, D = 2, cfg.num_kv_heads, cfg.head_dim
    k0 = jnp.ones((B, H, 1, D)) * jnp.asarray([1.0, 100.0])[:, None, None, None]
    slots = paged.slot_mapping(table, jnp.zeros((B,), jnp.int32), bs)
    cache = paged.reshape_and_cache(k0, k0, cache, slots)
    q = jnp.ones((B, 1, cfg.num_heads, D), jnp.float32)
    out = paged.paged_attention(q, cache, table, jnp.ones((B,), jnp.int32))
    # with a single token, attention output == that token's value vector
    np.testing.assert_allclose(np.asarray(out[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), 100.0, rtol=1e-5)


def test_paged_kernel_matches_gather_golden(rng):
    """Pallas paged decode kernel (block-table walk in the index map) vs the
    XLA gather + jnp golden path; includes ragged lengths and shared pool."""
    from lia_tpu.ops.paged import paged_decode_attention

    cfg = get_config("opt-tiny")
    L, nb, bs = 2, 16, 8
    B, Nkv, D, G = 3, cfg.num_kv_heads, cfg.head_dim, 1
    N = Nkv * G
    P = 4  # pages per sequence
    kp = jnp.asarray(rng.standard_normal((L, nb, Nkv, bs, D)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, nb, Nkv, bs, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    # block 0 reserved; sequences own disjoint pages
    table = jnp.asarray(
        np.arange(1, 1 + B * P).reshape(B, P), jnp.int32
    )
    lengths = jnp.asarray([29, 8, 17], jnp.int32)

    out = paged_decode_attention(
        q, kp, vp, jnp.asarray(1, jnp.int32), table, lengths, interpret=True
    )

    # golden: gather pages, run masked attention
    from lia_tpu.ops import attention as att
    from lia_tpu.ops.paged import PagedKVCache, gather_sequence

    cache = PagedKVCache(kp[1], vp[1])
    ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(table)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, P * bs), 1)
    ref = att.attend(q, ks, vs, (pos < lengths[:, None])[:, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_kernel_fresh_merge(rng):
    """Fresh-token merge path: kernel(cache, fresh) == golden over cache+fresh."""
    from lia_tpu.ops import attention as att
    from lia_tpu.ops.paged import (
        PagedKVCache, gather_sequence, paged_decode_attention,
    )

    L, nb, bs = 1, 8, 8
    B, Nkv, D, G = 2, 4, 16, 2
    N = Nkv * G
    P = 3
    kp = jnp.asarray(rng.standard_normal((L, nb, Nkv, bs, D)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, nb, Nkv, bs, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.float32)
    table = jnp.asarray(np.arange(1, 1 + B * P).reshape(B, P), jnp.int32)
    lengths = jnp.asarray([13, 20], jnp.int32)

    out = paged_decode_attention(
        q, kp, vp, jnp.asarray(0, jnp.int32), table, lengths,
        k_fresh=kf, v_fresh=vf, interpret=True,
    )

    cache = PagedKVCache(kp[0], vp[0])
    ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(table)
    S = P * bs
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    # golden: append the fresh token after the valid prefix per sequence
    ks2 = jnp.concatenate([ks, kf], axis=2)
    vs2 = jnp.concatenate([vs, vf], axis=2)
    mask = jnp.concatenate(
        [pos < lengths[:, None], jnp.ones((B, 1), bool)], axis=1
    )
    ref = att.attend(q, ks2, vs2, mask[:, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_reshape_and_cache_vectorized_matches(rng):
    """The single-scatter reshape_and_cache writes the same slots as a serial
    reference."""
    from lia_tpu.ops.paged import (
        PagedKVCache, init_paged_cache, reshape_and_cache, slot_mapping,
    )

    cfg = get_config("opt-tiny")
    cache = init_paged_cache(cfg, num_blocks=6, block_size=4, dtype=jnp.float32)
    B = 3
    table = jnp.asarray([[1, 2, 0], [3, 0, 0], [4, 5, 0]], jnp.int32)
    positions = jnp.asarray([5, 0, 7], jnp.int32)
    k_new = jnp.asarray(rng.standard_normal((B, cfg.num_kv_heads, 1, cfg.head_dim)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, cfg.num_kv_heads, 1, cfg.head_dim)), jnp.float32)
    slots = slot_mapping(table, positions, 4)
    out = reshape_and_cache(k_new, v_new, cache, slots)
    ref_k = np.zeros_like(np.asarray(cache.k))
    for i in range(B):
        blk, off = int(slots[i]) // 4, int(slots[i]) % 4
        ref_k[blk, :, off, :] = np.asarray(k_new)[i, :, 0, :]
    np.testing.assert_allclose(np.asarray(out.k), ref_k)


def test_write_prompt_paged(rng):
    from lia_tpu.ops.paged import init_paged_cache, write_prompt_paged

    cfg = get_config("opt-tiny")
    cache = init_paged_cache(cfg, num_blocks=8, block_size=4, dtype=jnp.float32)
    H, D = cfg.num_kv_heads, cfg.head_dim
    S, length = 12, 9
    k_seq = jnp.asarray(rng.standard_normal((H, S, D)), jnp.float32)
    v_seq = jnp.asarray(rng.standard_normal((H, S, D)), jnp.float32)
    row = jnp.asarray([2, 5, 7, 0], jnp.int32)
    out = write_prompt_paged(cache, k_seq, v_seq, row, length)
    for t in range(length):
        blk, off = int(row[t // 4]), t % 4
        np.testing.assert_allclose(
            np.asarray(out.k)[blk, :, off, :], np.asarray(k_seq)[:, t, :]
        )
    # positions >= length landed in the reserved null page 0 only
    np.testing.assert_allclose(np.asarray(out.k)[1], 0.0)


def test_seed_prefix_cache_roundtrip(rng):
    """write_prompt_all_layers -> seed_prefix_cache reproduces the original
    prefix KV as a contiguous seg cache (APC admission seed)."""
    L, nb, H, bs, D = 3, 9, 2, 8, 16
    n, base, bucket = 29, 21, 32  # base intentionally not block-aligned
    k_pool = jnp.zeros((L, nb, H, bs, D), jnp.float32)
    v_pool = jnp.zeros((L, nb, H, bs, D), jnp.float32)
    seg_k = jnp.asarray(rng.standard_normal((L, H, bucket, D)), jnp.float32)
    seg_v = jnp.asarray(rng.standard_normal((L, H, bucket, D)), jnp.float32)
    row = np.zeros(8, np.int32)
    row[: -(-n // bs)] = [4, 2, 7, 1]
    k_pool, v_pool = paged.write_prompt_all_layers(
        k_pool, v_pool, seg_k, seg_v, jnp.asarray(row), n
    )
    seed = paged.seed_prefix_cache(
        k_pool, v_pool, jnp.asarray(row), jnp.asarray(base, jnp.int32), bucket
    )
    np.testing.assert_allclose(np.asarray(seed.k[:, 0, :, :base]), np.asarray(seg_k[:, :, :base]))
    np.testing.assert_allclose(np.asarray(seed.v[:, 0, :, :base]), np.asarray(seg_v[:, :, :base]))
    assert int(seed.length) == base
    np.testing.assert_array_equal(
        np.asarray(seed.mask[0]), np.arange(bucket) < base
    )


def test_write_prompt_start_skips_shared_pages(rng):
    """start>0 leaves pages below the boundary untouched (shared prefix pages
    must never be rewritten by a reusing request)."""
    L, nb, H, bs, D = 2, 7, 2, 8, 16
    n, start = 27, 16  # blocks 0,1 shared; write covers [16, 27)
    k_pool = jnp.asarray(rng.standard_normal((L, nb, H, bs, D)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((L, nb, H, bs, D)), jnp.float32)
    k0, v0 = k_pool, v_pool
    seg_k = jnp.asarray(rng.standard_normal((L, H, 32, D)), jnp.float32)
    seg_v = jnp.asarray(rng.standard_normal((L, H, 32, D)), jnp.float32)
    row = np.zeros(8, np.int32)
    row[: -(-n // bs)] = [5, 3, 6, 2]
    k1, v1 = paged.write_prompt_all_layers(
        k_pool, v_pool, seg_k, seg_v, jnp.asarray(row), n,
        start=jnp.asarray(start, jnp.int32),
    )
    # shared pages (5, 3) untouched; null page 0 absorbs out-of-range writes
    for p in (5, 3):
        np.testing.assert_array_equal(np.asarray(k1[:, p]), np.asarray(k0[:, p]))
        np.testing.assert_array_equal(np.asarray(v1[:, p]), np.asarray(v0[:, p]))
    # written region matches the seg values
    for pos in range(start, n):
        blk, off = row[pos // bs], pos % bs
        np.testing.assert_array_equal(
            np.asarray(k1[:, blk, :, off]), np.asarray(seg_k[:, :, pos])
        )
        np.testing.assert_array_equal(
            np.asarray(v1[:, blk, :, off]), np.asarray(seg_v[:, :, pos])
        )
