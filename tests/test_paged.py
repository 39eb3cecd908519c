"""Paged KV cache tests — golden comparison vs the contiguous cache path
(reference analog: test_paged_attention.py)."""

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
