"""Unit tests for the indirect-access KV cache (reference analog: test_masked_mha.py's
cache handling and the beam_idx reorder in _beam_search)."""

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.models.registry import get_config
from lia_tpu.ops import kv_cache as kvc


def _cfg():
    return get_config("opt-tiny")


def test_update_and_advance():
    cfg = _cfg()
    cache = kvc.init_cache(cfg, batch=2, max_len=16, dtype=jnp.float32)
    new_k = jnp.ones((2, cfg.num_kv_heads, 4, cfg.head_dim))
    new_v = 2 * new_k
    k, v = kvc.update_layer(cache.k[0], cache.v[0], new_k, new_v, cache.length)
    assert float(k[:, :, :4].min()) == 1.0 and float(k[:, :, 4:].max()) == 0.0
    assert float(v[:, :, :4].min()) == 2.0

    mask = jnp.array([[True] * 4, [False, True, True, True]])
    cache = kvc.advance(cache, mask, 4)
    assert int(cache.length) == 4
    np.testing.assert_array_equal(np.asarray(cache.mask[:, :4]), np.asarray(mask))
    assert not bool(cache.mask[:, 4:].any())


def test_offset_update():
    cfg = _cfg()
    cache = kvc.init_cache(cfg, batch=1, max_len=8, dtype=jnp.float32)
    cache = cache._replace(length=jnp.asarray(3, jnp.int32))
    new_k = jnp.full((1, cfg.num_kv_heads, 1, cfg.head_dim), 7.0)
    k, _ = kvc.update_layer(cache.k[0], cache.v[0], new_k, new_k, cache.length)
    assert float(k[0, :, 3].min()) == 7.0
    assert float(k[0, :, :3].max()) == 0.0 and float(k[0, :, 4:].max()) == 0.0


def test_beam_reorder_is_gather():
    cfg = _cfg()
    cache = kvc.init_cache(cfg, batch=4, max_len=4, dtype=jnp.float32)
    k = jnp.arange(4, dtype=jnp.float32)[None, :, None, None, None] * jnp.ones_like(cache.k)
    cache = cache._replace(k=k, mask=jnp.eye(4, dtype=bool))
    beam_idx = jnp.array([2, 2, 0, 1])
    re = kvc.beam_reorder(cache, beam_idx)
    np.testing.assert_array_equal(
        np.asarray(re.k[0, :, 0, 0, 0]), np.array([2.0, 2.0, 0.0, 1.0])
    )
    np.testing.assert_array_equal(np.asarray(re.mask), np.asarray(cache.mask)[[2, 2, 0, 1]])
