"""LLaVA golden parity vs HF transformers (torch CPU).

Covers the CLIP tower's layer-(-2) feature tap, the 2-layer GELU projector,
image-token embedding splice, and cached decode — the reference's optional
llava branch (run_quantization.py:249-271, optimize.py:188,673).
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.vlm import LlavaEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import params_from_hf_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def llava_pair():
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig
    from transformers import LlavaForConditionalGeneration

    cfg = get_config("llava-tiny").replace(dtype="float32")
    hf_cfg = LlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=cfg.vision_hidden,
            num_hidden_layers=cfg.vision_layers,
            num_attention_heads=cfg.vision_heads,
            intermediate_size=cfg.vision_ffn,
            patch_size=cfg.vision_patch,
            image_size=cfg.vision_image_size,
        ).to_dict(),
        text_config=LlamaConfig(
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
        ).to_dict(),
        image_token_index=cfg.image_token_id,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    params = params_from_hf_state_dict(
        cfg, {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    )
    return cfg, hf, params


def _inputs(cfg, B=2, seed=8):
    rng = np.random.default_rng(seed)
    s = cfg.vision_image_size
    px = rng.standard_normal((B, 3, s, s), np.float32)
    n_patch = (s // cfg.vision_patch) ** 2
    prompts = []
    for b in range(B):
        pre = list(rng.integers(3, 400, size=3 + b))
        post = list(rng.integers(3, 400, size=4))
        prompts.append(pre + [cfg.image_token_id] * n_patch + post)
    return px, prompts


def test_prefill_logits_match_hf(llava_pair):
    cfg, hf, params = llava_pair
    px, prompts = _inputs(cfg)
    # uniform length for the HF side (no pad handling needed there)
    prompts = [p[: min(len(q) for q in prompts)] for p in prompts]
    tokens = np.asarray(prompts, np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.ones_like(torch.tensor(tokens)),
            pixel_values=torch.tensor(px),
        ).logits[:, -1, :].numpy()

    import jax
    import jax.numpy as jnp

    eng = LlavaEngine(cfg, params)
    feats = eng._features(eng.params, jnp.asarray(px))
    B, S = tokens.shape
    embeds = jnp.take(eng.params["embed_tokens"], jnp.asarray(tokens.astype(np.int32)),
                      axis=0, mode="clip").astype(jnp.float32)
    img_pos = np.stack([np.flatnonzero(tokens[b] == cfg.image_token_id) for b in range(B)])
    bidx = jnp.arange(B)[:, None]
    embeds = embeds.at[bidx, jnp.asarray(img_pos)].set(feats)

    from lia_tpu.models import transformer as T
    from lia_tpu.ops import kv_cache as kvc

    cache = kvc.init_cache(cfg, B, S + 4, jnp.float32)
    logits, _ = T.prefill_embeds(
        cfg, eng.params, embeds, jnp.ones((B, S), bool), cache
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-2, atol=8e-3)


def test_greedy_generation_matches_hf(llava_pair):
    cfg, hf, params = llava_pair
    px, prompts = _inputs(cfg, seed=9)
    n_new = 8
    maxlen = max(len(p) for p in prompts)
    tokens = np.zeros((len(prompts), maxlen), np.int64)
    attn = np.zeros((len(prompts), maxlen), np.int64)
    for b, p in enumerate(prompts):  # left-pad for HF decoder-only generate
        tokens[b, maxlen - len(p):] = p
        attn[b, maxlen - len(p):] = 1
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(px),
            max_new_tokens=n_new,
            do_sample=False,
            pad_token_id=0,
        ).numpy()[:, maxlen:]

    eng = LlavaEngine(cfg, params)
    res = eng.generate(px, prompts, GenerationConfig(max_new_tokens=n_new, pad_token_id=0))
    np.testing.assert_array_equal(res.sequences, hf_out)


def test_single_image_token_expansion(llava_pair):
    """The compact one-<image>-token prompt form must match the pre-expanded form."""
    cfg, hf, params = llava_pair
    px, prompts = _inputs(cfg, seed=10)
    compact = []
    n = (cfg.vision_image_size // cfg.vision_patch) ** 2
    for p in prompts:
        i = p.index(cfg.image_token_id)
        compact.append(p[:i] + [cfg.image_token_id] + p[i + n:])
    eng = LlavaEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=5, pad_token_id=0)
    a = eng.generate(px, prompts, gen)
    b = eng.generate(px, compact, gen)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def test_processors_match_hf(llava_pair):
    """LLaVA generation with repetition_penalty + no_repeat_ngram matches HF
    (history over un-expanded ids — one <image> token, HF input_ids form)."""
    cfg, hf, params = llava_pair
    px, prompts = _inputs(cfg, seed=9)
    n_new = 8
    maxlen = max(len(p) for p in prompts)
    tokens = np.zeros((len(prompts), maxlen), np.int64)
    attn = np.zeros((len(prompts), maxlen), np.int64)
    for b, p in enumerate(prompts):
        tokens[b, maxlen - len(p):] = p
        attn[b, maxlen - len(p):] = 1
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(px),
            max_new_tokens=n_new, do_sample=False, pad_token_id=0,
            repetition_penalty=1.5, no_repeat_ngram_size=2,
        ).numpy()[:, maxlen:]

    eng = LlavaEngine(cfg, params)
    res = eng.generate(
        px, prompts,
        GenerationConfig(
            max_new_tokens=n_new, pad_token_id=0,
            repetition_penalty=1.5, no_repeat_ngram_size=2,
        ),
    )
    np.testing.assert_array_equal(res.sequences, hf_out)


def test_beam_matches_hf(llava_pair):
    """LLaVA beam search matches HF (fixed length, no EOS)."""
    cfg, hf, params = llava_pair
    px, prompts = _inputs(cfg, seed=9)
    n_new = 6
    maxlen = max(len(p) for p in prompts)
    tokens = np.zeros((len(prompts), maxlen), np.int64)
    attn = np.zeros((len(prompts), maxlen), np.int64)
    for b, p in enumerate(prompts):
        tokens[b, maxlen - len(p):] = p
        attn[b, maxlen - len(p):] = 1
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(px),
            max_new_tokens=n_new, num_beams=3, do_sample=False,
            eos_token_id=None, pad_token_id=0, early_stopping=False,
            length_penalty=1.0,
        ).numpy()[:, maxlen:]

    eng = LlavaEngine(cfg, params)
    res = eng.generate_beam(
        px, prompts,
        GenerationConfig(
            max_new_tokens=n_new, num_beams=3, eos_token_id=None,
            pad_token_id=0, length_penalty=0.0,
        ),
    )
    np.testing.assert_array_equal(res.sequences, hf_out)
