"""Model registry: named architecture configs for the OPT and Llama families.

Mirrors the reference's per-model load configs
(examples/cpu/inference/python/llm/utils/model_class/*.py) and its OPT size ladder
(README.md:11-15: OPT 125M…175B; Llama-2/3 in the companion image). Sizes follow the
published HF configs; OPT-175B matches the FlexGen-style dummy-weight generator
(examples/cpu/inference/python/llm/utils/opt-weight-gen.py:8-40).
"""

from __future__ import annotations

from lia_tpu.config import Activation, ModelConfig, Norm


def _opt(name, h, ffn, l, heads, vocab=50272, max_pos=2048, **kw) -> ModelConfig:
    return ModelConfig(
        name=name,
        vocab_size=vocab,
        hidden_size=h,
        ffn_size=ffn,
        num_layers=l,
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=h // heads,
        max_position_embeddings=max_pos,
        activation=Activation.RELU,
        norm=Norm.LAYERNORM,
        learned_pos=True,
        rope=False,
        tie_embeddings=True,
        **kw,
    )


def _llama(name, h, ffn, l, heads, kv_heads, vocab, max_pos=8192, theta=500000.0, **kw) -> ModelConfig:
    return ModelConfig(
        name=name,
        vocab_size=vocab,
        hidden_size=h,
        ffn_size=ffn,
        num_layers=l,
        num_heads=heads,
        num_kv_heads=kv_heads,
        head_dim=h // heads,
        max_position_embeddings=max_pos,
        activation=Activation.SILU,
        norm=Norm.RMSNORM,
        learned_pos=False,
        rope=True,
        rope_theta=theta,
        tie_embeddings=False,
        attn_bias=False,
        mlp_bias=False,
        norm_eps=1e-5,
        pad_token_id=0,  # llama tokenizers have no pad; 0 (<unk>) is the convention
        **kw,
    )


REGISTRY = {
    # --- OPT family (facebook/opt-*) ---
    "opt-125m": _opt("opt-125m", 768, 3072, 12, 12),
    "opt-350m": _opt(
        "opt-350m", 1024, 4096, 24, 16, word_embed_proj_dim=512, pre_norm=False, final_norm=False
    ),
    "opt-1.3b": _opt("opt-1.3b", 2048, 8192, 24, 32),
    "opt-2.7b": _opt("opt-2.7b", 2560, 10240, 32, 32),
    "opt-6.7b": _opt("opt-6.7b", 4096, 16384, 32, 32),
    "opt-13b": _opt("opt-13b", 5120, 20480, 40, 40),
    "opt-30b": _opt("opt-30b", 7168, 28672, 48, 56),
    "opt-66b": _opt("opt-66b", 9216, 36864, 64, 72),
    "opt-175b": _opt("opt-175b", 12288, 49152, 96, 96),
    # --- Llama family ---
    "llama-2-7b": _llama("llama-2-7b", 4096, 11008, 32, 32, 32, 32000, max_pos=4096, theta=10000.0),
    "llama-2-13b": _llama("llama-2-13b", 5120, 13824, 40, 40, 40, 32000, max_pos=4096, theta=10000.0),
    "llama-3-8b": _llama("llama-3-8b", 4096, 14336, 32, 32, 8, 128256),
    "llama-3-70b": _llama("llama-3-70b", 8192, 28672, 80, 64, 8, 128256),
    # --- tiny configs for tests (analog of tests/cpu/hf_configs/) ---
    "opt-tiny": _opt("opt-tiny", 64, 256, 2, 4, vocab=503, max_pos=128),
    "llama-tiny": _llama("llama-tiny", 64, 128, 2, 4, 2, 503, max_pos=128, theta=10000.0),
}


def get_config(name: str) -> ModelConfig:
    key = name.lower().replace("facebook/", "").replace("meta-llama/", "").replace("_", "-")
    if key not in REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {sorted(REGISTRY)}")
    return REGISTRY[key]
