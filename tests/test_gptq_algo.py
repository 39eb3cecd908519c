"""GPTQ algorithm tests (reference: quantization/_GPTQ/ + test strategy of
tests/cpu/test_quantization_default_recipe.py — solver vs golden criteria,
then end-to-end flow on tiny configs)."""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig, QuantConfig
from lia_tpu.models.registry import get_config
from lia_tpu.ops.gptq import gptq_quantize_matrix, gptq_quantize_params
from lia_tpu.utils.checkpoint import init_dummy_params


def _correlated_hessian(K: int, n: int, rng) -> np.ndarray:
    """XᵀX of correlated features — the regime where error feedback pays."""
    base = rng.standard_normal((n, K // 4))
    X = np.repeat(base, 4, axis=1) + 0.3 * rng.standard_normal((n, K))
    X *= 1.0 + 3.0 * (rng.random(K) < 0.05)  # a few outlier channels
    return X.T @ X


def _weighted_err(w, deq, H):
    d = (w - deq).astype(np.float64)
    return float(np.trace(d.T @ H @ d))


@pytest.mark.parametrize("group_size", [-1, 32])
@pytest.mark.parametrize("bits", [4, 8])
def test_gptq_beats_rtn_in_hessian_norm(bits, group_size):
    """GPTQ's defining property: lower Hessian-weighted reconstruction error
    than round-to-nearest at the same grid. H = I degenerates the solver to
    exact RTN, so the comparison is like-for-like (same format, same params)."""
    rng = np.random.default_rng(0)
    K, N = 64, 48
    w = rng.standard_normal((K, N)).astype(np.float32)
    H = _correlated_hessian(K, 256, rng)

    def deq(codes, s, z):
        g = K // s.shape[0]
        grp = np.arange(K) // g
        if bits == 4:
            return (codes - z[grp]) * s[grp]
        return codes * s[grp]

    c_g, s_g, z_g = gptq_quantize_matrix(w, H, bits=bits, group_size=group_size)
    c_r, s_r, z_r = gptq_quantize_matrix(
        w, np.eye(K), bits=bits, group_size=group_size
    )
    err_gptq = _weighted_err(w, deq(c_g, s_g, z_g), H)
    err_rtn = _weighted_err(w, deq(c_r, s_r, z_r), H)
    assert err_gptq < err_rtn, (err_gptq, err_rtn)


def test_gptq_identity_hessian_is_rtn():
    """With H = I the error-feedback terms vanish: plain nearest rounding."""
    rng = np.random.default_rng(1)
    K, N = 32, 16
    w = rng.standard_normal((K, N)).astype(np.float32)
    codes, s, z = gptq_quantize_matrix(w, np.eye(K), bits=4, group_size=-1)
    expect = np.clip(np.rint(w / s[0]) + z[0], 0, 15)
    np.testing.assert_allclose(codes, expect)


def test_gptq_actorder_static_groups():
    """act-order walks rows by Hessian diagonal but emits groups contiguous in
    the ORIGINAL order (static-groups variant) — codes stay kernel-compatible."""
    rng = np.random.default_rng(2)
    K, N = 64, 32
    w = rng.standard_normal((K, N)).astype(np.float32)
    H = _correlated_hessian(K, 256, rng)
    c, s, z = gptq_quantize_matrix(w, H, bits=4, group_size=16, actorder=True)
    assert c.shape == (K, N) and s.shape == (K // 16, N)
    assert np.all(c >= 0) and np.all(c <= 15)
    err = _weighted_err(w, (c - z[np.arange(K) // 16]) * s[np.arange(K) // 16], H)
    c_r, s_r, z_r = gptq_quantize_matrix(w, np.eye(K), bits=4, group_size=16)
    err_rtn = _weighted_err(
        w, (c_r - z_r[np.arange(K) // 16]) * s_r[np.arange(K) // 16], H
    )
    assert err < err_rtn


@pytest.mark.parametrize("model", ["opt-tiny", "llama-tiny"])
def test_gptq_end_to_end(model):
    """Full flow on a tiny config: structure, formats, and the quantized model
    generating through the standard engine path."""
    import jax

    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.config import RuntimeConfig
    from lia_tpu.ops.quant import QuantizedWeight

    cfg = get_config(model)
    params = init_dummy_params(cfg)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(4, cfg.vocab_size - 4, size=24)) for _ in range(2)]

    qp = gptq_quantize_params(cfg, params, prompts, bits=4, group_size=16)
    layers = qp["layers"]
    for grp, wn in [("attn", "wq"), ("attn", "wo"), ("mlp", "w2")]:
        rec = layers[grp][wn]
        assert isinstance(rec, QuantizedWeight) and rec.fmt == "woq_int4z"
        assert rec.q.shape[0] == cfg.num_layers
        assert rec.z is not None

    engine = InferenceEngine(cfg, qp, RuntimeConfig())
    res = engine.generate(prompts, GenerationConfig(max_new_tokens=4))
    assert len(res.sequences[0]) > 0
    jax.clear_caches()


def test_gptq_end_to_end_int8_no_worse_than_rtn():
    """Sequential GPTQ int8 should track the fp model at least as closely as
    plain RTN int8 on the calibration prompts (KL of next-token dists)."""
    import jax
    import jax.numpy as jnp

    from lia_tpu.engine.engine import pack_prompts
    from lia_tpu.models import transformer as T
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.ops.quant import quantize_params

    cfg = get_config("opt-tiny")
    params = init_dummy_params(cfg)
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(4, cfg.vocab_size - 4, size=24)) for _ in range(2)]
    tokens, mask = pack_prompts(prompts, cfg.pad_token_id)
    B, S = tokens.shape

    @jax.jit
    def logprobs(p):
        cache = kvc.init_cache(cfg, B, S, jnp.dtype(cfg.dtype))
        return T.score_logprobs(cfg, p, jnp.asarray(tokens), jnp.asarray(mask), cache)

    lp_ref = logprobs(jax.device_put(params))
    valid = jnp.asarray(mask)[:, :, None].astype(jnp.float32)

    def mean_kl(p):
        lp_q = logprobs(jax.device_put(p))
        kl = jnp.sum(jnp.exp(lp_ref) * (lp_ref - lp_q), axis=-1, keepdims=True)
        return float(jnp.sum(kl * valid) / jnp.sum(valid))

    kl_gptq = mean_kl(gptq_quantize_params(cfg, params, prompts, bits=8, group_size=-1))
    kl_rtn = mean_kl(
        quantize_params(cfg, params, QuantConfig(weight_dtype="int8", group_size=-1))
    )
    # calibration-set guarantee, with slack for the tiny random-weight regime
    assert kl_gptq <= kl_rtn * 1.10 + 1e-6, (kl_gptq, kl_rtn)
    jax.clear_caches()
