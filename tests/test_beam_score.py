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
