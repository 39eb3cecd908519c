"""Sampling op tests (greedy/top-k/top-p)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.ops import sampling


def test_greedy():
    logits = jnp.array([[0.1, 5.0, -1.0], [2.0, 0.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(sampling.greedy(logits)), [1, 2])


def test_top_k_masks_rest():
    logits = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    out = sampling.apply_top_k(logits, 2)
    assert float(out[0, 3]) == 4.0 and float(out[0, 2]) == 3.0
    assert float(out[0, 0]) <= sampling.NEG_INF and float(out[0, 1]) <= sampling.NEG_INF


def test_top_p_keeps_top_token():
    logits = jnp.array([[10.0, 0.0, -10.0]])
    out = sampling.apply_top_p(logits, 0.01)  # tiny p: only the argmax survives
    assert float(out[0, 0]) == 10.0
    assert float(out[0, 1]) <= sampling.NEG_INF


def test_sample_respects_masking():
    gen = GenerationConfig(do_sample=True, temperature=1.0, top_k=1)
    logits = jnp.tile(jnp.array([[0.0, 3.0, 1.0]]), (8, 1))
    toks = sampling.sample(logits, jax.random.PRNGKey(0), gen)
    np.testing.assert_array_equal(np.asarray(toks), np.ones(8, np.int32))


def test_sample_distribution_sane():
    gen = GenerationConfig(do_sample=True, temperature=1.0)
    logits = jnp.tile(jnp.array([[0.0, 5.0]]), (512, 1))
    toks = np.asarray(sampling.sample(logits, jax.random.PRNGKey(1), gen))
    assert toks.mean() > 0.9  # overwhelmingly the high-logit token


def test_repetition_penalty_matches_hf():
    """process_logits vs HF RepetitionPenaltyLogitsProcessor on random logits."""
    torch = pytest.importorskip("torch")
    from transformers import RepetitionPenaltyLogitsProcessor

    from lia_tpu.config import GenerationConfig
    from lia_tpu.ops.sampling import process_logits, seen_from_prompt

    rng = np.random.default_rng(0)
    B, S, V = 3, 7, 29
    tokens = rng.integers(0, V, (B, S))
    mask = rng.random((B, S)) > 0.2
    mask[:, -1] = True
    logits = rng.standard_normal((B, V)).astype(np.float32)

    # HF applies the penalty over input_ids (pads included) — emulate mask by
    # replacing pads with the row's last real token (idempotent for presence)
    ids = np.where(mask, tokens, tokens[:, -1:])
    hf = RepetitionPenaltyLogitsProcessor(penalty=1.7)
    want = hf(torch.tensor(ids), torch.tensor(logits.copy())).numpy()

    gen = GenerationConfig(repetition_penalty=1.7)
    seen = seen_from_prompt(jnp.asarray(tokens), jnp.asarray(mask), V)
    got = process_logits(jnp.asarray(logits), gen, seen, 0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_min_new_tokens_suppresses_eos():
    from lia_tpu.config import GenerationConfig
    from lia_tpu.ops.sampling import process_logits

    gen = GenerationConfig(min_new_tokens=3, eos_token_id=5)
    logits = jnp.zeros((2, 8), jnp.float32)
    early = np.asarray(process_logits(logits, gen, None, 1))
    late = np.asarray(process_logits(logits, gen, None, 3))
    assert early[:, 5].max() < -1e20
    assert late[:, 5].max() == 0.0


def test_engine_repetition_penalty_paths_agree():
    """Stepwise, fused, and scheduler loops apply the processors identically."""
    from lia_tpu.config import GenerationConfig, RuntimeConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=3, scale=0.12)
    prompts = [[5, 9, 23, 41, 9, 5], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=8, repetition_penalty=1.5,
                           min_new_tokens=4, eos_token_id=2)
    eng = InferenceEngine(cfg, params)
    a = eng.generate(prompts, gen).sequences
    b = eng.generate(prompts, gen, fused=True).sequences
    np.testing.assert_array_equal(a, b[:, : a.shape[1]])

    # the penalty must change behavior vs the unpenalized run on a looping model
    base = eng.generate(prompts, GenerationConfig(max_new_tokens=8)).sequences
    assert not np.array_equal(a, base)

    # tiered scheduler path (50% resident) bit-matches the resident loop
    sched = InferenceEngine(
        cfg, params, RuntimeConfig(hbm_percentage=50, prefill_policy=0, decode_policy=0)
    )
    c = sched.generate(prompts, gen).sequences
    np.testing.assert_array_equal(a, c[:, : a.shape[1]])


def test_no_repeat_ngram_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import NoRepeatNGramLogitsProcessor

    from lia_tpu.config import GenerationConfig
    from lia_tpu.ops.sampling import ban_repeated_ngrams

    rng = np.random.default_rng(5)
    B, L, V, n = 3, 12, 31, 3
    # histories with forced repeats so bans actually trigger
    hist = rng.integers(0, 6, (B, L)).astype(np.int64)
    logits = rng.standard_normal((B, V)).astype(np.float32)

    hf = NoRepeatNGramLogitsProcessor(ngram_size=n)
    want = hf(torch.tensor(hist), torch.tensor(logits.copy())).numpy()

    got = np.asarray(
        ban_repeated_ngrams(jnp.asarray(logits), jnp.asarray(hist.astype(np.int32)),
                            jnp.int32(L), n)
    )
    # HF sets banned logits to -inf; we use a large negative — compare the BAN
    # PATTERN and unbanned values
    np.testing.assert_array_equal(np.isinf(want) & (want < 0), got <= -1e29)
    keep = ~(np.isinf(want) & (want < 0))
    np.testing.assert_allclose(got[keep], want[keep], rtol=1e-6)


def test_engine_no_repeat_ngram_paths_agree():
    """Greedy with no_repeat_ngram: fused == stepwise == scheduler; and the
    2-gram ban prevents any repeated bigram in the output."""
    from lia_tpu.config import GenerationConfig, RuntimeConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=3, scale=0.12)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=10, no_repeat_ngram_size=2)
    eng = InferenceEngine(cfg, params)
    a = eng.generate(prompts, gen).sequences
    b = eng.generate(prompts, gen, fused=True).sequences
    np.testing.assert_array_equal(a, b)
    sched = InferenceEngine(
        cfg, params, RuntimeConfig(hbm_percentage=50, prefill_policy=0, decode_policy=0)
    )
    c = sched.generate(prompts, gen).sequences
    np.testing.assert_array_equal(a, c)

    # a tiny random model greedy-decodes into a cycle; the 2-gram ban must
    # break it: no bigram may repeat across prompt+output
    for b_i in range(2):
        seq = prompts[b_i] + [int(t) for t in a[b_i]]
        bigrams = list(zip(seq, seq[1:]))
        assert len(bigrams) == len(set(bigrams))


def test_no_repeat_ngram_size_one():
    """n=1 (HF edge case: ban every seen token) must not crash and must match
    HF's processor."""
    torch = pytest.importorskip("torch")
    from transformers import NoRepeatNGramLogitsProcessor

    from lia_tpu.ops.sampling import ban_repeated_ngrams

    hist = np.array([[3, 4, 3, 0], [1, 2, 5, 6]], np.int64)
    logits = np.zeros((2, 9), np.float32)
    want = NoRepeatNGramLogitsProcessor(ngram_size=1)(
        torch.tensor(hist), torch.tensor(logits.copy())
    ).numpy()
    got = np.asarray(ban_repeated_ngrams(
        jnp.asarray(logits), jnp.asarray(hist.astype(np.int32)), jnp.int32(4), 1
    ))
    np.testing.assert_array_equal(np.isinf(want) & (want < 0), got <= -1e29)
