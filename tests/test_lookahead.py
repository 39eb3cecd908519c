"""Prompt-lookup speculative decoding: exact greedy parity + step savings."""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.engine.lookahead import propose_ngram
from lia_tpu.models.registry import get_config
from lia_tpu.ops.quant import quantize_params
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def model():
    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=21, scale=0.12)
    return cfg, params


def test_propose_ngram():
    h = [1, 2, 3, 4, 1, 2, 3]
    assert propose_ngram(h, ngram=3, k=3, pad_id=0) == [4, 1, 2]
    assert propose_ngram([5, 6, 7], ngram=2, k=2, pad_id=0) == [0, 0]  # no match
    # shorter-n fallback: trailing [9] matched earlier
    assert propose_ngram([9, 8, 9], ngram=3, k=1, pad_id=0) == [8]


def test_speculative_matches_greedy_random(model):
    """Random prompts → proposals rarely land; output must still be exactly
    the stepwise greedy sequence, and steps never exceed max_new_tokens."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [50, 60]]
    ref = eng.generate(prompts, gen).sequences
    seqs, steps = eng.generate_speculative(prompts, gen, ngram=3, k=3)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    assert 1 <= steps <= gen.max_new_tokens


def test_speculative_saves_steps_on_repetitive_model(model):
    """A tiny random model decodes into a short cycle (argmax loops), which is
    exactly where prompt-lookup pays: verify-step count must drop well below
    max_new_tokens while the output stays bit-equal."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=24)
    prompts = [[7, 7, 8, 7, 7, 8, 7, 7, 8]]
    ref = eng.generate(prompts, gen).sequences
    seqs, steps = eng.generate_speculative(prompts, gen, ngram=3, k=4)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    assert steps < gen.max_new_tokens, steps


def test_speculative_quantized(model):
    cfg, params = model
    qp = quantize_params(cfg, params, QuantConfig(weight_dtype="int8", group_size=-1))
    eng = InferenceEngine(cfg, qp, RuntimeConfig(quant=QuantConfig(weight_dtype="int8")))
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41, 5, 9, 23]]
    ref = eng.generate(prompts, gen).sequences
    seqs, steps = eng.generate_speculative(prompts, gen)
    np.testing.assert_array_equal(seqs, np.asarray(ref))


def test_draft_speculative_matches_greedy(model):
    """A weak draft (different weights) proposes; output must be bit-equal to
    the target's stepwise greedy, step count within [ceil(N/(k+1)), N]."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    dcfg = get_config("opt-tiny").replace(dtype="float32")
    draft = InferenceEngine(dcfg, init_dummy_params(dcfg, seed=77, scale=0.12))
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [50, 60]]
    ref = eng.generate(prompts, gen).sequences
    seqs, steps = eng.generate_speculative_draft(draft, prompts, gen, k=3)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    assert 2 <= steps <= gen.max_new_tokens


def test_draft_speculative_perfect_draft_saves_steps(model):
    """Draft == target → every proposal is the target's own argmax, so each
    verify pass accepts all k+1 tokens: steps == ceil(N / (k+1))."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    draft = InferenceEngine(cfg, params)  # identical weights
    gen = GenerationConfig(max_new_tokens=12)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    ref = eng.generate(prompts, gen).sequences
    k = 3
    seqs, steps = eng.generate_speculative_draft(draft, prompts, gen, k=k)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    assert steps == -(-gen.max_new_tokens // (k + 1))


@pytest.mark.parametrize("mode", ["lookup", "draft"])
def test_speculative_eos_early_exit(model, mode):
    """EOS truncation parity vs the stepwise loop: pick an eos id that the
    model actually emits mid-sequence, then require identical (pad-filled)
    output from the speculative paths."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    free = eng.generate(prompts, GenerationConfig(max_new_tokens=10)).sequences
    eos = int(free[0, 4])  # something emitted mid-sequence in row 0
    gen = GenerationConfig(max_new_tokens=10, eos_token_id=eos, pad_token_id=1)
    ref = eng.generate(prompts, gen).sequences  # may stop early (all finished)

    if mode == "lookup":
        seqs, steps = eng.generate_speculative(prompts, gen, ngram=3, k=3)
    else:
        draft = InferenceEngine(cfg, params)
        seqs, steps = eng.generate_speculative_draft(draft, prompts, gen, k=3)
    T_ref = ref.shape[1]
    np.testing.assert_array_equal(seqs[:, :T_ref], np.asarray(ref))
    assert np.all(seqs[:, T_ref:] == gen.pad_token_id)


def test_sampled_draft_topk1_equals_greedy(model):
    """Acceptance sampling with top_k=1 degenerates to one-hot p and q, so the
    sampled path must reproduce the greedy output bit-for-bit."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    dcfg = get_config("opt-tiny").replace(dtype="float32")
    draft = InferenceEngine(dcfg, init_dummy_params(dcfg, seed=77, scale=0.12))
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    ref = eng.generate(prompts, GenerationConfig(max_new_tokens=8)).sequences
    gen = GenerationConfig(max_new_tokens=8, do_sample=True, top_k=1)
    seqs, steps = eng.generate_speculative_draft(draft, prompts, gen, k=3)
    np.testing.assert_array_equal(seqs, np.asarray(ref))


def test_sampled_draft_identical_models_accepts_all(model):
    """draft == target → p/q ≡ 1 → every proposal accepted: steps == ceil(N/(k+1))
    and the output is a valid sample (finite tokens in-vocab)."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    draft = InferenceEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=12, do_sample=True, temperature=0.9, top_p=0.95)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    k = 3
    seqs, steps = eng.generate_speculative_draft(draft, prompts, gen, k=k, seed=3)
    assert steps == -(-gen.max_new_tokens // (k + 1))
    assert seqs.shape == (2, 12) and (seqs >= 0).all() and (seqs < cfg.vocab_size).all()


def test_draft_speculative_quantized_target(model):
    """Draft speculation with an int8-weight + int8-KV TARGET must bit-match
    that target's own stepwise greedy (verify pass runs over the quantized
    cache like chunked prefill)."""
    cfg, params = model
    qc = QuantConfig(weight_dtype="int8", group_size=-1, kv_cache_dtype="int8")
    qp = quantize_params(cfg, params, QuantConfig(weight_dtype="int8", group_size=-1))
    eng = InferenceEngine(cfg, qp, RuntimeConfig(quant=qc))
    draft = InferenceEngine(cfg, init_dummy_params(cfg, seed=77, scale=0.12))
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    ref = eng.generate(prompts, gen).sequences
    seqs, steps = eng.generate_speculative_draft(draft, prompts, gen, k=3)
    np.testing.assert_array_equal(seqs, np.asarray(ref))


# -- speculation under TIERING (scheduler.verify_pass) ------------------------
#
# The chunked verify pass streams each layer's weights ONCE per k+1 candidate
# tokens — streamed decode's dominant cost drops by the acceptance factor.


def test_speculative_scheduler_matches_resident(model):
    """Prompt-lookup speculation with tiered (streamed) weights must emit the
    resident engine's exact greedy sequence and save verify steps on a
    repetitive workload."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=24)
    prompts = [[7, 7, 8, 7, 7, 8, 7, 7, 8], [5, 9, 23, 41]]
    ref = InferenceEngine(cfg, params).generate(prompts, gen).sequences
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    eng = InferenceEngine(cfg, params, rt)
    seqs, steps = eng.generate_speculative(prompts, gen, ngram=3, k=4)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    assert steps < gen.max_new_tokens, steps


def test_speculative_scheduler_fully_streamed(model):
    """hbm_percentage=0: every layer streams; the verify chunk rides the
    per-layer prefetch pipeline."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [[7, 7, 8, 7, 7, 8], [100, 7, 3]]
    ref = InferenceEngine(cfg, params).generate(prompts, gen).sequences
    rt = RuntimeConfig(hbm_percentage=0, stream_weights=True)
    eng = InferenceEngine(cfg, params, rt)
    seqs, steps = eng.generate_speculative(prompts, gen, ngram=3, k=3)
    np.testing.assert_array_equal(seqs, np.asarray(ref))


def test_speculative_scheduler_int8_kv(model):
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [[7, 7, 8, 7, 7, 8, 9]]
    rt_res = RuntimeConfig(quant=QuantConfig(kv_cache_dtype="int8"))
    ref = InferenceEngine(cfg, params, rt_res).generate(prompts, gen).sequences
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True,
                       quant=QuantConfig(kv_cache_dtype="int8"))
    eng = InferenceEngine(cfg, params, rt)
    seqs, _ = eng.generate_speculative(prompts, gen, ngram=3, k=3)
    np.testing.assert_array_equal(seqs, np.asarray(ref))


def test_draft_speculative_scheduler_target(model):
    """Two-model speculation with a TIERED target (the flagship composition:
    a resident draft proposes, the streamed target verifies k+1 tokens per
    weight transfer)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=10)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    ref = InferenceEngine(cfg, params).generate(prompts, gen).sequences
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    target = InferenceEngine(cfg, params, rt)
    draft = InferenceEngine(cfg, params)  # perfect draft (same model)
    seqs, steps = target.generate_speculative_draft(draft, prompts, gen, k=4)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    # perfect draft => every proposal accepted => steps ~ max_new/(k+1)
    assert steps <= -(-gen.max_new_tokens // 5) + 1


def test_speculative_scheduler_host_policy_raises(model):
    cfg, params = model
    rt = RuntimeConfig(hbm_percentage=50, prefill_policy=0, decode_policy=0)
    eng = InferenceEngine(cfg, params, rt)
    with pytest.raises(NotImplementedError, match="TPU-KV"):
        eng.generate_speculative([[7, 7, 8, 7, 7, 8]],
                                 GenerationConfig(max_new_tokens=4))


def test_draft_speculative_sampled_scheduler_target(model):
    """SAMPLED two-model speculation with a tiered target: top_k=1 warping
    makes the acceptance math degenerate to greedy-exact, so the streamed
    composition (scheduler.verify_pass(probs_gen=...)) is pinnable bit-for-
    bit against the plain greedy reference."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=10, do_sample=True, top_k=1)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    ref = InferenceEngine(cfg, params).generate(
        prompts, GenerationConfig(max_new_tokens=10)
    ).sequences
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    target = InferenceEngine(cfg, params, rt)
    draft = InferenceEngine(cfg, params)  # perfect draft (same model)
    seqs, steps = target.generate_speculative_draft(draft, prompts, gen, k=4)
    np.testing.assert_array_equal(seqs, np.asarray(ref))
    assert steps <= -(-gen.max_new_tokens // 5) + 1


def test_draft_speculative_sampled_scheduler_target_stochastic(model):
    """Stochastic smoke on the tiered sampled path: valid tokens, right
    shapes, and the resident-path sampler with the same seed agrees (the two
    paths share the acceptance math and per-step RNG stream)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8, do_sample=True, temperature=0.9, top_k=20)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    draft = InferenceEngine(cfg, params)
    res_seqs, _ = InferenceEngine(cfg, params).generate_speculative_draft(
        draft, prompts, gen, k=3, seed=7
    )
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    tiered = InferenceEngine(cfg, params, rt)
    seqs, steps = tiered.generate_speculative_draft(draft, prompts, gen, k=3, seed=7)
    assert seqs.shape == (2, gen.max_new_tokens)
    assert (seqs >= 0).all() and (seqs < cfg.vocab_size).all()
    np.testing.assert_array_equal(seqs, res_seqs)
