"""Beam search + loglikelihood scoring tests (reference parity: _beam_search and the
run_accuracy.py BaseLM loglikelihood adapter)."""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def eng():
    cfg = get_config("opt-tiny").replace(dtype="float32")
    return InferenceEngine(cfg, init_dummy_params(cfg, seed=11, scale=0.02))


def test_beam1_equals_greedy(eng):
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=6)
    greedy = eng.generate(prompts, gen)
    beam = eng.generate_beam(prompts, gen.replace(num_beams=1))
    np.testing.assert_array_equal(beam.sequences, greedy.sequences)


def test_beam_scores_at_least_greedy(eng):
    """The best beam's loglikelihood must be >= the greedy sequence's."""
    prompts = [[5, 9, 23, 41]]
    gen = GenerationConfig(max_new_tokens=5)
    greedy = eng.generate(prompts, gen)
    beam = eng.generate_beam(prompts, gen.replace(num_beams=4))
    ll_greedy = eng.loglikelihood(prompts, [list(greedy.sequences[0])])
    ll_beam = eng.loglikelihood(prompts, [list(beam.sequences[0])])
    assert ll_beam[0] >= ll_greedy[0] - 1e-4, (ll_beam, ll_greedy)


def test_loglikelihood_prefers_greedy_over_random(eng):
    prompts = [[5, 9, 23, 41]]
    gen = GenerationConfig(max_new_tokens=4)
    greedy = eng.generate(prompts, gen)
    ll = eng.loglikelihood(prompts * 2, [list(greedy.sequences[0]), [444, 3, 77, 402]])
    assert ll[0] > ll[1]


def test_loglikelihood_additivity(eng):
    """ll(context, a+b) == ll(context, a) + ll(context+a, b)."""
    ctx = [5, 9, 23]
    a, b = [41, 100], [7]
    ll_ab = eng.loglikelihood([ctx], [a + b])[0]
    ll_a = eng.loglikelihood([ctx], [a])[0]
    ll_b = eng.loglikelihood([ctx + a], [b])[0]
    np.testing.assert_allclose(ll_ab, ll_a + ll_b, rtol=1e-4, atol=1e-4)


def test_beam_sample_runs_and_differs(eng):
    """_beam_sample parity: stochastic beams produce valid, generally different
    sequences from deterministic beam search."""
    prompts = [[5, 9, 23, 41]]
    det = eng.generate_beam(prompts, GenerationConfig(max_new_tokens=6, num_beams=4))
    sto = eng.generate_beam(
        prompts,
        GenerationConfig(max_new_tokens=6, num_beams=4, do_sample=True, temperature=2.0),
    )
    assert sto.sequences.shape == det.sequences.shape
    assert (sto.sequences >= 0).all()


def test_beam_sample_deterministic_given_seed(eng):
    prompts = [[5, 9, 23, 41]]
    gen = GenerationConfig(max_new_tokens=5, num_beams=3, do_sample=True, temperature=1.5)
    a = eng.generate_beam(prompts, gen, seed=7)
    b = eng.generate_beam(prompts, gen, seed=7)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def test_length_penalty_prefers_shorter_finished_beam():
    """select_best with length_penalty normalizes score by tokens-through-EOS
    (HF BeamSearchScorer): a short finished beam with a modest raw score must
    beat a long beam once normalized."""
    from lia_tpu.config import GenerationConfig
    from lia_tpu.engine.beam import select_best

    history = np.array([[[7, 2, 0, 0, 0],      # EOS(=2) at step 1 → len 2
                         [8, 9, 10, 11, 12]]], np.int32)  # full length 5
    scores = np.array([[-4.0, -6.0]], np.float32)
    gen_raw = GenerationConfig(eos_token_id=2)  # lp=0 → raw: beam 0 wins anyway
    np.testing.assert_array_equal(select_best(history, scores, gen_raw)[0], history[0, 0])

    scores = np.array([[-4.0, -5.0]], np.float32)  # raw prefers beam 0 (-4)
    gen_lp = GenerationConfig(eos_token_id=2, length_penalty=1.0)
    # normalized: -4/2 = -2.0 vs -5/5 = -1.0 → beam 1 wins under lp=1
    np.testing.assert_array_equal(select_best(history, scores, gen_lp)[0], history[0, 1])


# -- logits processors in beam search ---------------------------------------


def test_beam1_with_mask_processors_equals_greedy(eng):
    """num_beams=1 with min_new_tokens + no_repeat_ngram reduces exactly to
    the (HF-golden-tested) greedy processor path: -inf masks are invariant to
    the logits-vs-logprobs domain difference."""
    prompts = [[5, 9, 5, 9, 23], [100, 7, 3]]
    gen = GenerationConfig(
        max_new_tokens=6, no_repeat_ngram_size=2, min_new_tokens=4, eos_token_id=2
    )
    greedy = eng.generate(prompts, gen)
    beam = eng.generate_beam(prompts, gen.replace(num_beams=1))
    np.testing.assert_array_equal(beam.sequences, greedy.sequences)


def test_beam_processors_match_hf():
    """Beam search with repetition penalty + no-repeat-ngram matches HF
    transformers' beam_search on the same tiny OPT (no EOS, fixed length, so
    the BeamSearchScorer reduces to our frozen-beam semantics)."""
    torch = pytest.importorskip("torch")
    from transformers import OPTConfig, OPTForCausalLM

    from lia_tpu.models.registry import get_config as _gc
    from lia_tpu.utils.checkpoint import params_from_hf_state_dict

    cfg = _gc("opt-tiny").replace(dtype="float32")
    hf_cfg = OPTConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        do_layer_norm_before=True, word_embed_proj_dim=cfg.hidden_size,
        activation_function="relu",
    )
    torch.manual_seed(0)
    hf = OPTForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(cfg, sd)

    prompts = [[5, 9, 5, 9, 23, 41], [100, 7, 3, 100, 7]]
    n_new = 6
    import torch as _t

    toks = [_t.tensor([p]) for p in prompts]
    hf_out = []
    for t in toks:  # one prompt at a time: no padding skew in HF beam scores
        with _t.no_grad():
            o = hf.generate(
                t, max_new_tokens=n_new, min_new_tokens=n_new, num_beams=3,
                do_sample=False, repetition_penalty=1.5, no_repeat_ngram_size=2,
                eos_token_id=None, pad_token_id=1, early_stopping=False,
                length_penalty=1.0,
            )
        hf_out.append(o[0, t.shape[1]:].numpy())

    eng2 = InferenceEngine(cfg, params)
    gen = GenerationConfig(
        max_new_tokens=n_new, num_beams=3, repetition_penalty=1.5,
        no_repeat_ngram_size=2, eos_token_id=None, pad_token_id=1,
        length_penalty=0.0,
    )
    for p, want in zip(prompts, hf_out):
        got = eng2.generate_beam([p], gen).sequences[0]
        np.testing.assert_array_equal(got, want)


def test_beam_processors_scheduler_matches_resident():
    """Tiered (streamed) beam search applies processors bit-identically to
    the resident fused beam scan."""
    from lia_tpu.config import RuntimeConfig

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    prompts = [[5, 9, 5, 9, 23], [100, 7, 3]]
    gen = GenerationConfig(
        max_new_tokens=6, num_beams=3, repetition_penalty=1.4,
        no_repeat_ngram_size=2, min_new_tokens=3, eos_token_id=2,
    )
    res = InferenceEngine(cfg, params).generate_beam(prompts, gen).sequences
    sched = InferenceEngine(
        cfg, params,
        RuntimeConfig(hbm_percentage=50, prefill_policy=0, decode_policy=0),
    ).generate_beam(prompts, gen).sequences
    np.testing.assert_array_equal(res, sched)


# -- grouped beam cache (shared prompt + per-beam tail) ----------------------


def test_grouped_beam_matches_expanded(eng):
    """The BeamKVCache production path must reproduce the whole-cache-gather
    golden path bit-for-bit (greedy beams, ragged prompts, EOS freezing)."""
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=6, num_beams=4, eos_token_id=2)
    a = eng.generate_beam(prompts, gen, grouped=True).sequences
    b = eng.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


def test_grouped_beam_sample_matches_expanded(eng):
    """Stochastic beams: same seed → same Gumbel draws → same sequences in
    both cache layouts."""
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(
        max_new_tokens=5, num_beams=3, do_sample=True, temperature=1.5
    )
    a = eng.generate_beam(prompts, gen, seed=7, grouped=True).sequences
    b = eng.generate_beam(prompts, gen, seed=7, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


def test_grouped_beam_processors_match_expanded(eng):
    prompts = [[5, 9, 5, 9, 23], [100, 7, 3]]
    gen = GenerationConfig(
        max_new_tokens=6, num_beams=3, repetition_penalty=1.4,
        no_repeat_ngram_size=2, min_new_tokens=3, eos_token_id=2,
    )
    a = eng.generate_beam(prompts, gen, grouped=True).sequences
    b = eng.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


def test_grouped_beam_int8_kv_matches_expanded():
    """INT8 KV beams: the grouped fallback path quantizes fresh K/V before
    attention exactly like the expanded path, so results must match."""
    from lia_tpu.config import QuantConfig, RuntimeConfig

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    rt = RuntimeConfig(quant=QuantConfig(kv_cache_dtype="int8"))
    e = InferenceEngine(cfg, params, rt)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=5, num_beams=3)
    a = e.generate_beam(prompts, gen, grouped=True).sequences
    b = e.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


# -- grouped beam under the streaming scheduler (tail-only reorder) -----------


def test_grouped_beam_scheduler_matches_expanded():
    """Tiered (streamed-weights) beam search on the grouped BeamKVCache must
    reproduce the whole-cache-gather scheduled path bit-for-bit — the round-3
    trade-off (scheduler.reorder_state gathered BOTH caches wholesale) closed:
    the shuffle now touches only the generated tails of both segments."""
    from lia_tpu.config import RuntimeConfig

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=6, num_beams=4, eos_token_id=2)
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    e = InferenceEngine(cfg, params, rt)
    assert e.scheduler is not None and e.scheduler.grouped_beam_ok
    a = e.generate_beam(prompts, gen, grouped=True).sequences
    b = e.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)
    # and both match the resident engine (same model, same beams)
    r = InferenceEngine(cfg, params).generate_beam(prompts, gen).sequences
    np.testing.assert_array_equal(a, r)


def test_grouped_beam_scheduler_fully_streamed():
    """hbm_percentage=0: no resident segment — the grouped path runs entirely
    through the per-layer streamed beam step (prefetch pipeline)."""
    from lia_tpu.config import RuntimeConfig

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    prompts = [[5, 9, 23, 41]]
    gen = GenerationConfig(max_new_tokens=5, num_beams=3)
    rt = RuntimeConfig(hbm_percentage=0, stream_weights=True)
    e = InferenceEngine(cfg, params, rt)
    a = e.generate_beam(prompts, gen, grouped=True).sequences
    b = e.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


def test_grouped_beam_scheduler_int8_kv():
    from lia_tpu.config import QuantConfig, RuntimeConfig

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True,
                       quant=QuantConfig(kv_cache_dtype="int8"))
    e = InferenceEngine(cfg, params, rt)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=5, num_beams=3)
    a = e.generate_beam(prompts, gen, grouped=True).sequences
    b = e.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


def test_grouped_beam_scheduler_alibi():
    """ALiBi families carry the key-positional bias through the grouped
    [prompt | tail | fresh] slot layout under tiering too."""
    from lia_tpu.config import RuntimeConfig

    cfg = get_config("bloom-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=5, num_beams=3)
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    e = InferenceEngine(cfg, params, rt)
    a = e.generate_beam(prompts, gen, grouped=True).sequences
    b = e.generate_beam(prompts, gen, grouped=False).sequences
    np.testing.assert_array_equal(a, b)


def test_grouped_beam_scheduler_host_policy_falls_back():
    """Host-placement plans have no grouped host kernel: generate_beam must
    silently use the whole-cache-gather path and still match the resident
    engine."""
    from lia_tpu.config import RuntimeConfig

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    rt = RuntimeConfig(hbm_percentage=50, prefill_policy=0, decode_policy=0)
    e = InferenceEngine(cfg, params, rt)
    assert not e.scheduler.grouped_beam_ok
    prompts = [[5, 9, 23, 41]]
    gen = GenerationConfig(max_new_tokens=5, num_beams=3)
    a = e.generate_beam(prompts, gen, grouped=True).sequences
    r = InferenceEngine(cfg, params).generate_beam(prompts, gen).sequences
    np.testing.assert_array_equal(a, r)
