"""GPTQ ingestion tests: synthesize AutoGPTQ-format tensors, unpack, compare."""

import numpy as np
import pytest

from lia_tpu.utils.gptq import unpack_gptq


def pack_gptq(w_q: np.ndarray, zeros: np.ndarray, scales: np.ndarray):
    """Inverse of unpack: build (qweight, qzeros) from nibble arrays.

    w_q: [K, N] uint values in [0, 15]; zeros: [K/g, N] (stored as zero-1);
    scales: [K/g, N].
    """
    K, N = w_q.shape
    per = 8
    qweight = np.zeros((K // per, N), np.uint32)
    for i in range(per):
        qweight |= w_q[i::per].astype(np.uint32) << (4 * i)
    zm1 = (zeros - 1).astype(np.uint32)
    qzeros = np.zeros((zeros.shape[0], N // per), np.uint32)
    for i in range(per):
        qzeros |= zm1[:, i::per] << (4 * i)
    return qweight.astype(np.int32), qzeros.astype(np.int32)


def test_unpack_roundtrip(rng):
    K, N, g = 64, 32, 16
    ng = K // g
    w_q = rng.integers(0, 16, (K, N)).astype(np.uint32)
    zeros = rng.integers(1, 16, (ng, N)).astype(np.uint32)
    scales = (rng.random((ng, N), dtype=np.float32) * 0.1 + 0.01)
    qweight, qzeros = pack_gptq(w_q, zeros, scales)
    out = unpack_gptq(qweight, qzeros, scales)
    grp = np.arange(K) // g
    expect = (w_q.astype(np.float32) - zeros[grp]) * scales[grp]
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_unpack_with_g_idx(rng):
    K, N, g = 32, 16, 8
    ng = K // g
    w_q = rng.integers(0, 16, (K, N)).astype(np.uint32)
    zeros = rng.integers(1, 16, (ng, N)).astype(np.uint32)
    scales = (rng.random((ng, N), dtype=np.float32) * 0.1 + 0.01)
    g_idx = rng.integers(0, ng, K).astype(np.int32)  # act-order permutation
    qweight, qzeros = pack_gptq(w_q, zeros, scales)
    out = unpack_gptq(qweight, qzeros, scales, g_idx=g_idx)
    expect = (w_q.astype(np.float32) - zeros[g_idx]) * scales[g_idx]
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_params_from_gptq_runs_generation(rng):
    """End-to-end: a synthesized GPTQ OPT checkpoint must load and generate."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    from lia_tpu.config import GenerationConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.gptq import params_from_gptq_state_dict

    cfg = get_config("opt-tiny").replace(dtype="float32")
    torch.manual_seed(0)
    hf = OPTForCausalLM(
        OPTConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size, ffn_dim=cfg.ffn_size,
            num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
            max_position_embeddings=cfg.max_position_embeddings,
            do_layer_norm_before=True, word_embed_proj_dim=cfg.hidden_size,
            activation_function="relu",
        )
    ).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # convert every decoder linear to GPTQ format (round-trip through nibbles)
    g = 16
    gptq_sd = dict(sd)
    for name in list(sd):
        if not name.endswith(".weight"):
            continue
        if not any(t in name for t in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")):
            continue
        w = sd[name].T.astype(np.float32)  # [K, N]
        K, N = w.shape
        ng = K // g
        wg = w.reshape(ng, g, N)
        mn, mx = wg.min(1), wg.max(1)
        scales = np.maximum((mx - mn) / 15.0, 1e-8)
        zeros = np.clip(np.rint(-mn / scales), 1, 15)
        grp = np.arange(K) // g
        w_q = np.clip(np.rint(w / scales[grp] + zeros[grp]), 0, 15).astype(np.uint32)
        qweight, qzeros = pack_gptq(w_q, zeros.astype(np.uint32), scales)
        pre = name[: -len(".weight")]
        gptq_sd[pre + ".qweight"] = qweight
        gptq_sd[pre + ".qzeros"] = qzeros
        gptq_sd[pre + ".scales"] = scales
        del gptq_sd[name]
    params = params_from_gptq_state_dict(cfg, gptq_sd, group_size=g)
    eng = InferenceEngine(cfg, params)
    res = eng.generate([[5, 9, 23, 41]], GenerationConfig(max_new_tokens=4))
    assert res.sequences.shape == (1, 4)
    # fp reference tokens for sanity (int4 round trip => close but not exact)
    from lia_tpu.utils.checkpoint import params_from_hf_state_dict

    fp = InferenceEngine(cfg, params_from_hf_state_dict(cfg, sd)).generate(
        [[5, 9, 23, 41]], GenerationConfig(max_new_tokens=4)
    )
    assert (res.sequences == fp.sequences).mean() >= 0.5


def test_woq4z_matmul_matches_dequant(rng):
    """Asymmetric int4 Pallas kernel vs the XLA dequantize golden path."""
    import jax
    import jax.numpy as jnp

    from lia_tpu.ops.pallas_matmul import woq4z_matmul
    from lia_tpu.ops.quant import QuantizedWeight, dequantize

    M, K, N, g = 16, 256, 128, 16
    ng = K // g
    codes = rng.integers(0, 16, (K, N)).astype(np.uint8)
    s = (rng.random((ng, N)).astype(np.float32) * 0.05 + 0.01)
    z = rng.integers(1, 16, (ng, N)).astype(np.float32)
    packed = (codes[: K // 2] & 0xF) | (codes[K // 2 :] << 4)
    rec = QuantizedWeight(jnp.asarray(packed), jnp.asarray(s), "woq_int4z", jnp.asarray(z))
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

    ref = x @ dequantize(rec, jnp.float32)
    out = woq4z_matmul(
        x, rec.q, rec.s, rec.z, g, block_m=16, block_n=128, block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_gptq_native_ingestion_is_lossless(rng):
    """Without act-order, ingestion keeps codes+scales+zeros (woq_int4z): the
    dequantized weight must EXACTLY equal the GPTQ unpack — no sym re-quant
    error (round-1 gap: utils/gptq.py:14-16 lossy path)."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    import jax.numpy as jnp

    from lia_tpu.models.registry import get_config
    from lia_tpu.ops.quant import dequantize
    from lia_tpu.utils.gptq import params_from_gptq_state_dict, unpack_gptq

    cfg = get_config("opt-tiny").replace(dtype="float32")
    torch.manual_seed(0)
    hf = OPTForCausalLM(
        OPTConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            ffn_dim=cfg.ffn_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            max_position_embeddings=cfg.max_position_embeddings,
        )
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items() if "lm_head" not in k}
    g = 16
    gptq_sd = dict(sd)
    expected = {}
    for key in list(sd):
        if key.endswith(".weight") and any(
            t in key for t in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")
        ):
            w = sd[key].T.astype(np.float32)  # [K, N]
            K, N = w.shape
            ng = K // g
            codes = rng.integers(0, 16, (K, N)).astype(np.uint32)
            zeros = rng.integers(1, 16, (ng, N)).astype(np.uint32)
            scales = (rng.random((ng, N)).astype(np.float32) * 0.05 + 0.01)
            qweight, qzeros = pack_gptq(codes, zeros, scales)
            prefix = key[: -len(".weight")]
            gptq_sd.pop(key)
            gptq_sd[prefix + ".qweight"] = qweight
            gptq_sd[prefix + ".qzeros"] = qzeros
            gptq_sd[prefix + ".scales"] = scales
            expected[prefix] = unpack_gptq(qweight, qzeros, scales)
    params = params_from_gptq_state_dict(cfg, gptq_sd, group_size=g)
    wq0 = params["layers"]["attn"]["wq"]
    assert wq0.fmt == "woq_int4z" and wq0.z is not None
    deq = np.asarray(dequantize(wq0, jnp.float32))  # [L, K, N]
    for l in range(cfg.num_layers):
        pref = f"model.decoder.layers.{l}.self_attn.q_proj"
        np.testing.assert_allclose(deq[l], expected[pref], rtol=1e-5, atol=1e-5)
