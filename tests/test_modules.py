"""Public fused-op API (lia_tpu.modules — the ipex.llm.modules analog).

Golden-model style mirrors the reference's op tests (test_mha.py,
test_tpp_linear.py): each module compares against an eager jnp composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu import modules as M


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _dense_causal(q, k, v):
    """Eager per-sequence causal attention reference. q/k/v: [S, N, D]."""
    S, N, D = q.shape
    logits = np.einsum("snd,tnd->nst", q, k) / np.sqrt(D)
    mask = np.tril(np.ones((S, S), bool))
    logits = np.where(mask[None], logits, -np.inf)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("nst,tnd->snd", p, v)


def test_varlen_attention_matches_per_sequence(rng):
    N, D = 4, 16
    lens = [5, 3, 7]
    T = 24  # padded beyond sum(lens)=15
    q = rng.standard_normal((T, N, D), dtype=np.float32) * 0.3
    k = rng.standard_normal((T, N, D), dtype=np.float32) * 0.3
    v = rng.standard_normal((T, N, D), dtype=np.float32) * 0.3
    out = np.asarray(
        M.varlen_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(lens, jnp.int32))
    )
    off = 0
    for L in lens:
        ref = _dense_causal(q[off : off + L], k[off : off + L], v[off : off + L])
        np.testing.assert_allclose(out[off : off + L], ref, rtol=2e-5, atol=2e-5)
        off += L
    assert np.all(out[sum(lens):] == 0)  # padding rows zeroed


def test_varlen_attention_gqa(rng):
    N, N_kv, D = 4, 2, 16
    lens = [4, 4]
    T = 8
    q = rng.standard_normal((T, N, D), dtype=np.float32) * 0.3
    k = rng.standard_normal((T, N_kv, D), dtype=np.float32) * 0.3
    v = rng.standard_normal((T, N_kv, D), dtype=np.float32) * 0.3
    out = np.asarray(
        M.varlen_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(lens, jnp.int32))
    )
    kx = np.repeat(k, N // N_kv, axis=1)
    vx = np.repeat(v, N // N_kv, axis=1)
    for off in (0, 4):
        ref = _dense_causal(q[off : off + 4], kx[off : off + 4], vx[off : off + 4])
        np.testing.assert_allclose(out[off : off + 4], ref, rtol=2e-5, atol=2e-5)


def test_indirect_access_kv_cache_attention_matches_full(rng):
    """Prefill S tokens into the cache layer, decode one more: the module's
    output must equal row S of full causal attention over S+1 tokens."""
    from lia_tpu.config import ModelConfig

    B, S, N, D, L = 2, 6, 4, 16, 2
    cfg = ModelConfig(
        name="m", vocab_size=32, hidden_size=N * D, ffn_size=8, num_layers=L,
        num_heads=N, num_kv_heads=N, head_dim=D, max_position_embeddings=32,
        dtype="float32",
    )
    cache = M.init_cache(cfg, B, 16, jnp.float32)
    seq = rng.standard_normal((B, S + 1, N, D), dtype=np.float32) * 0.3
    kseq = rng.standard_normal((B, S + 1, N, D), dtype=np.float32) * 0.3
    vseq = rng.standard_normal((B, S + 1, N, D), dtype=np.float32) * 0.3

    from lia_tpu.ops import kv_cache as kvc

    # write the first S tokens into layer 1's plane (head-major)
    for li in range(L):
        kl = kvc.index_layer_kv(cache.k, li)
        vl = kvc.index_layer_kv(cache.v, li)
        kl, vl = kvc.update_layer(
            kl, vl,
            jnp.swapaxes(jnp.asarray(kseq[:, :S]), 1, 2),
            jnp.swapaxes(jnp.asarray(vseq[:, :S]), 1, 2),
            jnp.int32(0),
        )
        cache = cache._replace(
            k=kvc.set_layer_kv(cache.k, kl, li), v=kvc.set_layer_kv(cache.v, vl, li)
        )
    cache = kvc.advance(cache, jnp.ones((B, S), bool), S)

    out, cache2 = M.indirect_access_kv_cache_attention(
        jnp.asarray(seq[:, S:]), jnp.asarray(kseq[:, S:]), jnp.asarray(vseq[:, S:]),
        cache, layer_idx=1,
    )
    out = np.asarray(out)
    for b in range(B):
        ref = _dense_causal(seq[b], kseq[b], vseq[b])[S]
        np.testing.assert_allclose(out[b, 0], ref, rtol=2e-4, atol=2e-4)


def test_rotary_embedding_shapes(rng):
    B, S, N, D = 2, 5, 4, 16
    q = jnp.asarray(rng.standard_normal((B, S, N, D), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, 2, D), dtype=np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    q2, k2 = M.rotary_embedding(q, k, pos)
    assert q2.shape == q.shape and k2.shape == k.shape
    # position 0 is a no-op rotation
    np.testing.assert_allclose(np.asarray(q2[:, 0]), np.asarray(q[:, 0]), atol=1e-6)
    assert not np.allclose(np.asarray(q2[:, 1]), np.asarray(q[:, 1]))


def test_linear_fusions_match_compositions(rng):
    x = jnp.asarray(rng.standard_normal((3, 32), dtype=np.float32) * 0.3)
    w = rng.standard_normal((32, 16), dtype=np.float32) * 0.1
    wu = rng.standard_normal((32, 16), dtype=np.float32) * 0.1
    b = rng.standard_normal(16, dtype=np.float32) * 0.1
    other = jnp.asarray(rng.standard_normal((3, 16), dtype=np.float32))
    jw, jwu, jb = jnp.asarray(w), jnp.asarray(wu), jnp.asarray(b)
    y = x @ jw + jb
    np.testing.assert_allclose(M.linear_silu(x, jw, jb), jax.nn.silu(y), rtol=1e-5)
    np.testing.assert_allclose(M.linear_relu(x, jw, jb), jax.nn.relu(y), rtol=1e-5)
    np.testing.assert_allclose(
        M.linear_gelu(x, jw, jb), jax.nn.gelu(y, approximate=False), rtol=1e-5
    )
    np.testing.assert_allclose(
        M.linear_new_gelu(x, jw, jb), jax.nn.gelu(y, approximate=True), rtol=1e-5
    )
    np.testing.assert_allclose(M.linear_add(x, jw, other, jb), y + other, rtol=1e-5)
    np.testing.assert_allclose(
        M.linear_add_add(x, jw, other, other, jb), y + 2 * other, rtol=1e-5
    )
    np.testing.assert_allclose(M.linear_mul(x, jw, other, jb), y * other, rtol=1e-5)
    np.testing.assert_allclose(
        M.linear2_silu_mul(x, jw, jwu),
        jax.nn.silu(x @ jw) * (x @ jwu), rtol=1e-5,
    )


def test_linear_fusion_quantized(rng):
    """Fusions dispatch WOQ weights through the same entry point."""
    from lia_tpu.config import QuantConfig
    from lia_tpu.ops.quant import quantize_weight

    x = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32) * 0.3)
    w = rng.standard_normal((64, 16), dtype=np.float32) * 0.1
    rec = jax.device_put(quantize_weight(w, QuantConfig(weight_dtype="int8")))
    got = np.asarray(M.linear_silu(x, rec))
    ref = np.asarray(jax.nn.silu(x @ jnp.asarray(w)))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel
