"""Golden-model parity tests vs HuggingFace transformers (torch CPU).

Same strategy as the reference's module-surgery tests
(tests/cpu/test_ipex_optimize_transformers.py:77-160: build a tiny HF config, run the
optimized stack, assert output equality vs the unmodified model): we instantiate a
randomly-initialized torch OPT/Llama, map its state dict into our pytree, and compare
logits for prefill and stepwise KV-cache decode.
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.engine import InferenceEngine, pack_prompts
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import params_from_hf_state_dict

torch = pytest.importorskip("torch")


def _to_numpy_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def opt_pair():
    from transformers import OPTConfig, OPTForCausalLM

    cfg = get_config("opt-tiny").replace(dtype="float32")
    hf_cfg = OPTConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        do_layer_norm_before=True,
        word_embed_proj_dim=cfg.hidden_size,
        activation_function="relu",
    )
    torch.manual_seed(0)
    hf = OPTForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def llama_pair():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = get_config("llama-tiny").replace(dtype="float32")
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def gptj_pair():
    from transformers import GPTJConfig, GPTJForCausalLM

    cfg = get_config("gptj-tiny").replace(dtype="float32")
    hf_cfg = GPTJConfig(
        vocab_size=cfg.vocab_size,
        n_embd=cfg.hidden_size,
        n_inner=cfg.ffn_size,
        n_layer=cfg.num_layers,
        n_head=cfg.num_heads,
        n_positions=cfg.max_position_embeddings,
        rotary_dim=cfg.rotary_dim,
        activation_function="gelu_new",
        tie_word_embeddings=False,
        layer_norm_epsilon=cfg.norm_eps,
    )
    torch.manual_seed(0)
    hf = GPTJForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def neox_pair():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = get_config("neox-tiny").replace(dtype="float32")
    hf_cfg = GPTNeoXConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rotary_pct=cfg.rotary_dim / cfg.head_dim,
        rotary_emb_base=cfg.rope_theta,
        hidden_act="gelu",
        use_parallel_residual=True,
        tie_word_embeddings=False,
        layer_norm_eps=cfg.norm_eps,
    )
    torch.manual_seed(0)
    hf = GPTNeoXForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def falcon_pair():
    from transformers import FalconConfig, FalconForCausalLM

    cfg = get_config("falcon-tiny").replace(dtype="float32")
    hf_cfg = FalconConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        ffn_hidden_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        multi_query=True,
        parallel_attn=True,
        new_decoder_architecture=False,
        bias=False,
        alibi=False,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=True,
        layer_norm_epsilon=cfg.norm_eps,
    )
    torch.manual_seed(0)
    hf = FalconForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def mistral_pair():
    from transformers import MistralConfig, MistralForCausalLM

    # window=8 so it actually BINDS for the test's prompt+decode lengths
    cfg = get_config("mistral-tiny").replace(dtype="float32", sliding_window=8)
    hf_cfg = MistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        sliding_window=8,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = MistralForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def qwen2_pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = get_config("qwen2-tiny").replace(dtype="float32")
    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        tie_word_embeddings=False,
        use_sliding_window=False,
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def mixtral_pair():
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = get_config("mixtral-tiny").replace(dtype="float32")
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        num_local_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        sliding_window=None,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = MixtralForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def bloom_pair():
    from transformers import BloomConfig, BloomForCausalLM

    cfg = get_config("bloom-tiny").replace(dtype="float32")
    hf_cfg = BloomConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        n_layer=cfg.num_layers,
        n_head=cfg.num_heads,
        layer_norm_epsilon=cfg.norm_eps,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = BloomForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def mpt_pair():
    from transformers import MptConfig, MptForCausalLM

    cfg = get_config("mpt-tiny").replace(dtype="float32")
    hf_cfg = MptConfig(
        d_model=cfg.hidden_size,
        n_heads=cfg.num_heads,
        n_layers=cfg.num_layers,
        vocab_size=cfg.vocab_size,
        max_seq_len=cfg.max_position_embeddings,
        expansion_ratio=cfg.ffn_size // cfg.hidden_size,
    )
    torch.manual_seed(0)
    hf = MptForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def gptbigcode_pair():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    cfg = get_config("gptbigcode-tiny").replace(dtype="float32")
    hf_cfg = GPTBigCodeConfig(
        vocab_size=cfg.vocab_size,
        n_embd=cfg.hidden_size,
        n_inner=cfg.ffn_size,
        n_layer=cfg.num_layers,
        n_head=cfg.num_heads,
        n_positions=cfg.max_position_embeddings,
        multi_query=True,
        layer_norm_epsilon=cfg.norm_eps,
    )
    torch.manual_seed(0)
    hf = GPTBigCodeForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def stablelm_pair():
    from transformers import StableLmConfig, StableLmForCausalLM

    cfg = get_config("stablelm-tiny").replace(dtype="float32")
    hf_cfg = StableLmConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        partial_rotary_factor=cfg.rotary_dim / cfg.head_dim,
        layer_norm_eps=cfg.norm_eps,
        use_qkv_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = StableLmForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def codegen_pair():
    from transformers import CodeGenConfig, CodeGenForCausalLM

    cfg = get_config("codegen-tiny").replace(dtype="float32")
    hf_cfg = CodeGenConfig(
        vocab_size=cfg.vocab_size,
        n_embd=cfg.hidden_size,
        n_inner=cfg.ffn_size,
        n_layer=cfg.num_layers,
        n_head=cfg.num_heads,
        n_positions=cfg.max_position_embeddings,
        rotary_dim=cfg.rotary_dim,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = CodeGenForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def baichuan_pair():
    """Baichuan-7B ≡ llama math with a packed W_pack qkv (its HF modeling is
    remote-code, unavailable offline): golden against HF Llama by renaming a
    tiny Llama state dict into the baichuan key layout (q|k|v rows → W_pack)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = get_config("baichuan-tiny").replace(dtype="float32")
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(3)
    hf = LlamaForCausalLM(hf_cfg).eval()
    sd = _to_numpy_sd(hf)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.self_attn."
        sd[p + "W_pack.weight"] = np.concatenate(
            [sd.pop(p + "q_proj.weight"), sd.pop(p + "k_proj.weight"),
             sd.pop(p + "v_proj.weight")]
        )
    params = params_from_hf_state_dict(cfg, sd)
    return cfg, hf, params


ALL_PAIRS = [
    "opt_pair", "llama_pair", "gptj_pair", "neox_pair",
    "falcon_pair", "mistral_pair", "qwen2_pair", "mixtral_pair",
    "bloom_pair", "mpt_pair", "gptbigcode_pair", "stablelm_pair",
    "codegen_pair", "baichuan_pair",
]


def _hf_greedy(hf, tokens, mask, n_new, pad_id):
    out = hf.generate(
        torch.tensor(tokens, dtype=torch.long),
        attention_mask=torch.tensor(mask, dtype=torch.long),
        max_new_tokens=n_new,
        do_sample=False,
        pad_token_id=pad_id,
        use_cache=True,
    )
    return out[:, tokens.shape[1]:].numpy()


@pytest.mark.parametrize("pair", ALL_PAIRS)
def test_prefill_logits_match_hf(pair, request):
    cfg, hf, params = request.getfixturevalue(pair)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(3, 200, size=n)) for n in (7, 12, 3)]
    tokens, mask = pack_prompts(prompts, pad_id=1)

    kw = {}
    if cfg.family == "gptbigcode":
        # HF GPTBigCode's raw forward defaults position_ids to arange (pads
        # included); only generate() derives them from the mask. Our positions
        # are always pad-aware, so pass the explicit pad-aware ids here.
        pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
        kw["position_ids"] = torch.tensor(pos, dtype=torch.long)
    with torch.no_grad():
        hf_logits = hf(
            torch.tensor(tokens, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            **kw,
        ).logits[:, -1, :].numpy()

    import jax.numpy as jnp
    from lia_tpu.models import transformer as T
    from lia_tpu.ops import kv_cache as kvc

    cache = kvc.init_cache(cfg, tokens.shape[0], tokens.shape[1] + 4, jnp.float32)
    logits, _ = T.prefill(cfg, __import__("jax").device_put(params), jnp.asarray(tokens), jnp.asarray(mask), cache)
    # XLA:CPU routes f32 GEMMs through oneDNN/AMX-bf16 on this host, so parity vs
    # torch's strict-f32 GEMM is bf16-level — same tolerance class the reference
    # uses for its AMX-bf16-vs-eager golden tests (tests/cpu/test_masked_mha.py).
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-2, atol=8e-3)


@pytest.mark.parametrize("pair", ALL_PAIRS)
def test_greedy_generation_matches_hf(pair, request):
    cfg, hf, params = request.getfixturevalue(pair)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(3, 200, size=n)) for n in (9, 5)]
    tokens, mask = pack_prompts(prompts, pad_id=1)
    n_new = 10

    hf_out = _hf_greedy(hf, tokens, mask, n_new, pad_id=1)

    eng = InferenceEngine(cfg, params)
    res = eng.generate(prompts, GenerationConfig(max_new_tokens=n_new, pad_token_id=1))
    np.testing.assert_array_equal(res.sequences, hf_out)


@pytest.mark.parametrize("pair", ["opt_pair"])
def test_fused_matches_stepwise(pair, request):
    cfg, hf, params = request.getfixturevalue(pair)
    prompts = [[4, 5, 6, 7, 8], [9, 10]]
    eng = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    a = eng.generate(prompts, gen)
    b = eng.generate(prompts, gen, fused=True)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def test_bucket_invariance(opt_pair):
    """Extra left-padding (a larger bucket) must not change greedy output."""
    cfg, hf, params = opt_pair
    prompts = [[4, 5, 6, 7, 8, 9, 11]]
    eng = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=5, pad_token_id=1)
    a = eng.generate(prompts, gen)

    tokens, mask = pack_prompts(prompts, pad_id=1, bucket=32)
    import jax.numpy as jnp
    from lia_tpu.models import transformer as T
    from lia_tpu.ops import kv_cache as kvc
    import jax

    cache = kvc.init_cache(cfg, 1, 32 + 5, jnp.float32)
    logits, cache = T.prefill(cfg, jax.device_put(params), jnp.asarray(tokens), jnp.asarray(mask), cache)
    first = int(np.argmax(np.asarray(logits), -1)[0])
    assert first == int(a.sequences[0, 0])


def test_baichuan2_alibi_norm_head():
    """Baichuan-13B/2 variant: ALiBi + NormHead. The alibi semantics are already
    HF-golden via bloom/mpt; here check (a) the NormHead mapping produces unit-L2
    lm_head rows, and (b) the alibi variant is internally consistent (fused ==
    stepwise greedy; bucket-size invariant)."""
    cfg = get_config("baichuan2-tiny").replace(dtype="float32")
    rng = np.random.default_rng(7)
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((cfg.vocab_size, cfg.hidden_size), np.float32) * 0.05,
        "model.norm.weight": np.ones(cfg.hidden_size, np.float32),
        "lm_head.weight": rng.standard_normal((cfg.vocab_size, cfg.hidden_size), np.float32),
    }
    H, F = cfg.hidden_size, cfg.ffn_size
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.W_pack.weight"] = rng.standard_normal((3 * H, H), np.float32) * 0.05
        sd[p + "self_attn.o_proj.weight"] = rng.standard_normal((H, H), np.float32) * 0.05
        sd[p + "mlp.gate_proj.weight"] = rng.standard_normal((F, H), np.float32) * 0.05
        sd[p + "mlp.up_proj.weight"] = rng.standard_normal((F, H), np.float32) * 0.05
        sd[p + "mlp.down_proj.weight"] = rng.standard_normal((H, F), np.float32) * 0.05
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
    params = params_from_hf_state_dict(cfg, sd)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(params["lm_head"], np.float32), axis=0),
        np.ones(cfg.vocab_size), rtol=1e-5,
    )
    prompts = [[4, 5, 6, 7, 8], [9, 10]]
    eng = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=6, pad_token_id=0)
    a = eng.generate(prompts, gen)
    b = eng.generate(prompts, gen, fused=True)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def _chatglm_tiny_sd(cfg, rng):
    H, F = cfg.hidden_size, cfg.ffn_size
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim
    sd = {
        "transformer.embedding.word_embeddings.weight": rng.standard_normal(
            (cfg.vocab_size, H), np.float32) * 0.05,
        "transformer.encoder.final_layernorm.weight": np.ones(H, np.float32),
        "transformer.output_layer.weight": rng.standard_normal(
            (cfg.vocab_size, H), np.float32) * 0.05,
    }
    for i in range(cfg.num_layers):
        p = f"transformer.encoder.layers.{i}."
        sd[p + "self_attention.query_key_value.weight"] = (
            rng.standard_normal((QD + 2 * KD, H), np.float32) * 0.05)
        sd[p + "self_attention.query_key_value.bias"] = (
            rng.standard_normal(QD + 2 * KD, np.float32) * 0.02)
        sd[p + "self_attention.dense.weight"] = rng.standard_normal((H, QD), np.float32) * 0.05
        sd[p + "mlp.dense_h_to_4h.weight"] = rng.standard_normal((2 * F, H), np.float32) * 0.05
        sd[p + "mlp.dense_4h_to_h.weight"] = rng.standard_normal((H, F), np.float32) * 0.05
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
    return sd


def test_chatglm_mapping_roundtrip():
    """The packed query_key_value / dense_h_to_4h splits must land in the right
    pytree slots: q rows first, then k·groups, then v·groups; gate before up."""
    cfg = get_config("chatglm-tiny").replace(dtype="float32")
    rng = np.random.default_rng(11)
    sd = _chatglm_tiny_sd(cfg, rng)
    params = params_from_hf_state_dict(cfg, sd)
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim
    F = cfg.ffn_size
    w0 = sd["transformer.encoder.layers.0.self_attention.query_key_value.weight"]
    np.testing.assert_allclose(params["layers"]["attn"]["wq"][0], w0[:QD].T)
    np.testing.assert_allclose(params["layers"]["attn"]["wk"][0], w0[QD:QD + KD].T)
    np.testing.assert_allclose(params["layers"]["attn"]["wv"][0], w0[QD + KD:].T)
    m0 = sd["transformer.encoder.layers.0.mlp.dense_h_to_4h.weight"]
    np.testing.assert_allclose(params["layers"]["mlp"]["wg"][0], m0[:F].T)
    np.testing.assert_allclose(params["layers"]["mlp"]["w1"][0], m0[F:].T)


def test_chatglm_rotary_matches_glm_reference():
    """Our apply_rope(rotary_dim=D/2, interleaved=True) vs a self-contained
    replica of ChatGLM2's RotaryEmbedding/apply_rotary_pos_emb (rotate the
    first half of each head dim, (2i, 2i+1) pairing, inv-freq over D/2)."""
    from lia_tpu.ops.rope import apply_rope
    import jax.numpy as jnp

    D, S, N = 16, 5, 2
    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, S, N, D), np.float32)
    pos = np.arange(S, dtype=np.int32)[None, :]

    # GLM reference math
    n_elem = D // 2
    theta = 1.0 / (10000.0 ** (np.arange(0, n_elem, 2, dtype=np.float32) / n_elem))
    idx = np.outer(np.arange(S, dtype=np.float32), theta)  # [S, n_elem/2]
    cos, sin = np.cos(idx), np.sin(idx)
    xr = x[..., :n_elem].reshape(1, S, N, n_elem // 2, 2)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = np.stack(
        [xr[..., 0] * c - xr[..., 1] * s, xr[..., 1] * c + xr[..., 0] * s], -1
    ).reshape(1, S, N, n_elem)
    want = np.concatenate([out, x[..., n_elem:]], -1)

    got = apply_rope(jnp.asarray(x), jnp.asarray(pos), 10000.0, rotary_dim=n_elem,
                     interleaved=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_chatglm_consistency():
    cfg = get_config("chatglm-tiny").replace(dtype="float32")
    params = params_from_hf_state_dict(cfg, _chatglm_tiny_sd(cfg, np.random.default_rng(13)))
    prompts = [[4, 5, 6, 7, 8], [9, 10]]
    eng = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=6, pad_token_id=0)
    a = eng.generate(prompts, gen)
    b = eng.generate(prompts, gen, fused=True)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def test_alibi_slopes_match_hf_all_head_counts():
    """Pinned vs HF build_alibi_tensor incl. non-power-of-two head counts
    (code-review finding: the odd-tail exponents were off by one power)."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from lia_tpu.ops.attention import alibi_slopes

    for n in (4, 6, 12, 16, 71, 112):
        mask = torch.ones(1, 3)
        hf = build_alibi_tensor(mask, n, torch.float32)[:, 0, 1].numpy()
        np.testing.assert_allclose(np.asarray(alibi_slopes(n)), hf, rtol=1e-6)
