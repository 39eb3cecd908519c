"""Ring (sequence-parallel) attention vs the single-device golden model.

The reference has no sequence parallelism (SURVEY.md §5) — this capability is
additive. Parity target: ops/attention.attend with a causal∧padding mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.ops import attention as att
from lia_tpu.parallel.mesh import make_mesh
from lia_tpu.parallel.ring_attention import ring_attention, sp_shardings


def _golden(q, k, v, input_mask, causal=True):
    if causal:
        mask = att.causal_mask(input_mask)
    else:
        S = input_mask.shape[1]
        mask = jnp.broadcast_to(input_mask[:, None, :], (q.shape[0], S, S))
    return att.attend(q, k, v, mask)


def _rand(rng, B, S, N, Nkv, D):
    q = jnp.asarray(rng.normal(size=(B, S, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Nkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Nkv, S, D)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("nseq", [2, 4, 8])
def test_ring_matches_golden_causal(rng, nseq):
    mesh = make_mesh((nseq,), ("seq",))
    B, S, N, Nkv, D = 2, 32, 4, 4, 16
    q, k, v = _rand(rng, B, S, N, Nkv, D)
    input_mask = jnp.ones((B, S), bool)
    out = ring_attention(q, k, v, input_mask, mesh)
    ref = _golden(q, k, v, input_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gqa_and_left_padding(rng):
    mesh = make_mesh((4,), ("seq",))
    B, S, N, Nkv, D = 3, 32, 8, 2, 16
    q, k, v = _rand(rng, B, S, N, Nkv, D)
    # left-padded prompts (framework convention): pads at the front
    pads = np.array([0, 5, 17])
    input_mask = jnp.asarray(np.arange(S)[None, :] >= pads[:, None])
    out = ring_attention(q, k, v, input_mask, mesh)
    ref = _golden(q, k, v, input_mask)
    real = np.asarray(input_mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * real, np.asarray(ref) * real, atol=2e-5
    )


def test_ring_non_causal(rng):
    mesh = make_mesh((4,), ("seq",))
    B, S, N, Nkv, D = 2, 16, 4, 4, 8
    q, k, v = _rand(rng, B, S, N, Nkv, D)
    input_mask = jnp.ones((B, S), bool)
    out = ring_attention(q, k, v, input_mask, mesh, causal=False)
    ref = _golden(q, k, v, input_mask, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_composes_with_tp(rng):
    """TP×SP: heads sharded on "model", sequence on "seq" — one mesh, no extra
    code (the SURVEY §5 "additive beyond parity" capability)."""
    mesh = make_mesh((2, 4), ("model", "seq"))
    B, S, N, Nkv, D = 2, 32, 8, 8, 16
    q, k, v = _rand(rng, B, S, N, Nkv, D)
    input_mask = jnp.ones((B, S), bool)
    from jax.sharding import NamedSharding, PartitionSpec as P

    q = jax.device_put(q, NamedSharding(mesh, P(None, "seq", "model", None)))
    k = jax.device_put(k, NamedSharding(mesh, P(None, "model", "seq", None)))
    v = jax.device_put(v, NamedSharding(mesh, P(None, "model", "seq", None)))
    out = ring_attention(q, k, v, input_mask, mesh)
    ref = _golden(q, k, v, input_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sp_shardings_placement(rng):
    mesh = make_mesh((8,), ("seq",))
    B, S, N, D = 2, 64, 4, 16
    q, k, v = _rand(rng, B, S, N, N, D)
    input_mask = jnp.ones((B, S), bool)
    sq, sk, sv, sm = sp_shardings(mesh)
    q, k, v, input_mask = (
        jax.device_put(q, sq), jax.device_put(k, sk),
        jax.device_put(v, sv), jax.device_put(input_mask, sm),
    )
    out = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v, input_mask)
    ref = _golden(q, k, v, input_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_rejects_indivisible():
    mesh = make_mesh((8,), ("seq",))
    q = jnp.zeros((1, 12, 2, 8))
    k = jnp.zeros((1, 2, 12, 8))
    with pytest.raises(ValueError):
        ring_attention(q, k, k, jnp.ones((1, 12), bool), mesh)


@pytest.mark.parametrize("model", ["opt-tiny", "llama-tiny"])
def test_sp_prefill_matches_prefill(model):
    """Model-level SP prefill (S sharded on "seq") == single-device prefill:
    last-token logits and the prompt KV cache."""
    from lia_tpu.models import transformer as T
    from lia_tpu.models.registry import get_config
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.parallel.ring_attention import sp_prefill
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config(model).replace(dtype="float32")
    params = init_dummy_params(cfg, seed=7, scale=0.1)
    B, S = 2, 32
    r = np.random.default_rng(3)
    tokens = jnp.asarray(r.integers(3, cfg.vocab_size, size=(B, S)), jnp.int32)
    pads = np.array([0, 9])
    input_mask = jnp.asarray(np.arange(S)[None, :] >= pads[:, None])
    tokens = jnp.where(input_mask, tokens, 1)

    mesh = make_mesh((4,), ("seq",))
    logits_sp, cache_sp = jax.jit(
        lambda p, t, m: sp_prefill(cfg, p, t, m, mesh)
    )(params, tokens, input_mask)

    cache0 = kvc.init_cache(cfg, B, S, jnp.float32)
    logits_ref, cache_ref = T.prefill(cfg, params, tokens, input_mask, cache0)

    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_ref), atol=3e-5
    )
    real = np.asarray(input_mask)[None, :, None, :, None]  # [1,B,1,S,1]
    np.testing.assert_allclose(
        np.asarray(cache_sp.k) * real, np.asarray(cache_ref.k) * real, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(cache_sp.v) * real, np.asarray(cache_ref.v) * real, atol=3e-5
    )


def test_ring_alibi_matches_golden(rng):
    """ALiBi bias carried around the ring == golden attend(bias=...) —
    key positions rotate with their K/V shard (VERDICT r3 item 9)."""
    mesh = make_mesh((4,), ("seq",))
    B, S, N, Nkv, D = 3, 32, 4, 4, 16
    q, k, v = _rand(rng, B, S, N, Nkv, D)
    pads = np.array([0, 5, 17])
    input_mask = jnp.asarray(np.arange(S)[None, :] >= pads[:, None])
    positions = jnp.cumsum(input_mask.astype(jnp.int32), axis=1) - 1
    key_pos = jnp.maximum(positions, 0) * input_mask
    slopes = att.alibi_slopes(N)
    out = ring_attention(
        q, k, v, input_mask, mesh, alibi_slopes=slopes, key_pos=key_pos
    )
    bias = att.alibi_bias(slopes, key_pos)
    ref = att.attend(q, k, v, att.causal_mask(input_mask), bias=bias)
    real = np.asarray(input_mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * real, np.asarray(ref) * real, atol=2e-5
    )


def test_ring_alibi_args_must_pair():
    mesh = make_mesh((4,), ("seq",))
    q = jnp.zeros((1, 16, 2, 8))
    k = jnp.zeros((1, 2, 16, 8))
    with pytest.raises(ValueError):
        ring_attention(q, k, k, jnp.ones((1, 16), bool), mesh,
                       alibi_slopes=att.alibi_slopes(2))


@pytest.mark.parametrize("model", ["bloom-tiny", "mpt-tiny"])
def test_sp_prefill_alibi_families(model):
    """sp covers the ALiBi families: SP prefill == standard prefill for
    bloom/mpt (the bias is their only positional signal)."""
    from lia_tpu.models import transformer as T
    from lia_tpu.models.registry import get_config
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.parallel.ring_attention import sp_prefill
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config(model).replace(dtype="float32")
    params = init_dummy_params(cfg, seed=7, scale=0.1)
    B, S = 2, 32
    r = np.random.default_rng(3)
    tokens = jnp.asarray(r.integers(3, cfg.vocab_size, size=(B, S)), jnp.int32)
    pads = np.array([0, 9])
    input_mask = jnp.asarray(np.arange(S)[None, :] >= pads[:, None])
    tokens = jnp.where(input_mask, tokens, 1)

    mesh = make_mesh((4,), ("seq",))
    logits_sp, cache_sp = jax.jit(
        lambda p, t, m: sp_prefill(cfg, p, t, m, mesh)
    )(params, tokens, input_mask)

    cache0 = kvc.init_cache(cfg, B, S, jnp.float32)
    logits_ref, _ = T.prefill(cfg, params, tokens, input_mask, cache0)
    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_ref), atol=3e-5
    )
