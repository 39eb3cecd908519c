"""GIT (image→text) golden parity vs HF transformers (torch CPU).

Covers the vision tower (CLIP-style ViT), the visual projection, the prefix-LM
mask, and the cached decode loop — reference model class:
examples/.../utils/model_class/git.py.
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.vlm import GitEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import params_from_hf_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def git_pair():
    from transformers import GitConfig, GitForCausalLM, GitVisionConfig

    cfg = get_config("git-tiny").replace(dtype="float32")
    hf_cfg = GitConfig(
        vision_config=GitVisionConfig(
            hidden_size=cfg.vision_hidden,
            num_hidden_layers=cfg.vision_layers,
            num_attention_heads=cfg.vision_heads,
            intermediate_size=cfg.vision_ffn,
            patch_size=cfg.vision_patch,
            image_size=cfg.vision_image_size,
        ).to_dict(),
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ffn_size,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = GitForCausalLM(hf_cfg).eval()
    params = params_from_hf_state_dict(
        cfg, {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    )
    return cfg, hf, params


def _pixels(cfg, B=2, seed=5):
    rng = np.random.default_rng(seed)
    s = cfg.vision_image_size
    return rng.standard_normal((B, 3, s, s), np.float32)


def test_prefill_logits_match_hf(git_pair):
    cfg, hf, params = git_pair
    px = _pixels(cfg)
    tokens = np.array([[101, 7, 8], [101, 9, 10]], np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.ones_like(torch.tensor(tokens)),
            pixel_values=torch.tensor(px),
        ).logits[:, -1, :].numpy()

    import jax
    import jax.numpy as jnp
    from lia_tpu.models import git as G

    p = jax.device_put(params)
    img = G.image_prefix(cfg, p, jnp.asarray(px))
    S_img, S_txt = img.shape[1], tokens.shape[1]
    logits, _, _ = G.prefill(
        cfg, p, img, jnp.asarray(tokens.astype(np.int32)),
        jnp.ones((2, S_txt), bool), S_img + S_txt + 4,
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-2, atol=8e-3)


def test_greedy_caption_matches_hf(git_pair):
    cfg, hf, params = git_pair
    px = _pixels(cfg, seed=6)
    n_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            pixel_values=torch.tensor(px),
            input_ids=torch.tensor([[101]] * 2),
            attention_mask=torch.ones(2, 1, dtype=torch.long),
            max_new_tokens=n_new,
            do_sample=False,
        ).numpy()[:, 1:]

    eng = GitEngine(cfg, params)
    res = eng.generate(
        px, GenerationConfig(max_new_tokens=n_new, eos_token_id=102, pad_token_id=0)
    )
    T_hf = hf_out.shape[1]
    np.testing.assert_array_equal(res.sequences[:, :T_hf], hf_out)


def test_processors_match_hf(git_pair):
    """GIT generation with repetition_penalty + no_repeat_ngram matches HF
    (processors run over the text ids, image tokens excluded)."""
    cfg, hf, params = git_pair
    px = _pixels(cfg, seed=6)
    n_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            pixel_values=torch.tensor(px),
            input_ids=torch.tensor([[101]] * 2),
            attention_mask=torch.ones(2, 1, dtype=torch.long),
            max_new_tokens=n_new, do_sample=False,
            repetition_penalty=1.5, no_repeat_ngram_size=2,
        ).numpy()[:, 1:]

    eng = GitEngine(cfg, params)
    res = eng.generate(
        px,
        GenerationConfig(
            max_new_tokens=n_new, eos_token_id=102, pad_token_id=0,
            repetition_penalty=1.5, no_repeat_ngram_size=2,
        ),
    )
    T_hf = hf_out.shape[1]
    np.testing.assert_array_equal(res.sequences[:, :T_hf], hf_out)


def test_beam_matches_hf(git_pair):
    """GIT beam captioning (the reference runner's default decode is
    num_beams=4) matches HF beam search (no EOS -> fixed length, scorer
    reduces to frozen-beam semantics)."""
    cfg, hf, params = git_pair
    px = _pixels(cfg, seed=6)
    n_new = 6
    with torch.no_grad():
        hf_out = hf.generate(
            pixel_values=torch.tensor(px),
            input_ids=torch.tensor([[101]] * 2),
            attention_mask=torch.ones(2, 1, dtype=torch.long),
            max_new_tokens=n_new, num_beams=3, do_sample=False,
            eos_token_id=None, pad_token_id=0, early_stopping=False,
            length_penalty=1.0,
        ).numpy()[:, 1:]

    eng = GitEngine(cfg, params)
    res = eng.generate_beam(
        px,
        GenerationConfig(
            max_new_tokens=n_new, num_beams=3, eos_token_id=None,
            pad_token_id=0, length_penalty=0.0,
        ),
    )
    np.testing.assert_array_equal(res.sequences, hf_out)
