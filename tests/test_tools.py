"""Tooling tests: hypertune knob search and the accuracy runner."""

import json

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params
from lia_tpu.utils.hypertune import Hypertune


def test_hypertune_search_space_and_run():
    cfg = get_config("opt-tiny").replace(num_layers=2, dtype="float32")
    params = init_dummy_params(cfg, seed=41, scale=0.02)
    ht = Hypertune(
        cfg, params,
        gen=GenerationConfig(max_new_tokens=3),
        batch=2, input_tokens=8,
        prefill_policies=(3,), decode_policies=(2, 3),
        hbm_percentages=(50, 100), num_minibatches=(1,),
    )
    cands = ht.candidates()
    # 100% residency only pairs with (3,3); 50% pairs with both decode policies
    assert len(cands) == 3
    results = ht.run(verbose=False)
    assert len(results) == 3
    assert results[0].tokens_per_s >= results[-1].tokens_per_s
    best = ht.best()
    assert best is not None and best.tokens_per_s > 0


def test_run_accuracy_self_test(capsys):
    import run_accuracy

    rc = run_accuracy.main(
        ["-m", "opt-tiny", "--dummy-weights", "--dtype", "float32",
         "--self-test", "--limit", "8", "--batch-size", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["n"] == 8
    # self-consistency: the model's own greedy continuations must be its argmax
    assert rep["accuracy"] == 1.0
    assert rep["ppl"] > 0


def test_run_accuracy_dataset(tmp_path, capsys):
    import run_accuracy

    ds = tmp_path / "data.jsonl"
    rng = np.random.default_rng(0)
    with open(ds, "w") as f:
        for _ in range(4):
            f.write(json.dumps({
                "context": [int(x) for x in rng.integers(3, 400, size=6)],
                "continuation": [int(rng.integers(3, 400))],
            }) + "\n")
    rc = run_accuracy.main(
        ["-m", "opt-tiny", "--dummy-weights", "--dtype", "float32",
         "--dataset", str(ds), "--limit", "4", "--batch-size", "2"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n"] == 4 and 0.0 <= rep["accuracy"] <= 1.0


class StubTokenizer:
    """Whitespace word→id tokenizer for adapter tests (ids are stable hashes)."""

    eos_token_id = 2

    def encode(self, s, add_special_tokens=False):
        return [3 + (hash(w) % 400) for w in s.split()]

    def decode(self, ids):
        return " ".join(f"t{i}" for i in ids)


def _tiny_engine():
    from lia_tpu.config import RuntimeConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-tiny")
    return InferenceEngine(cfg, init_dummy_params(cfg, seed=7), RuntimeConfig())


def test_lm_eval_adapter_loglikelihood_matches_engine_score():
    """Adapter core: (ctx, cont) strings → engine.score batches; empty context
    conditions on the eot token (lm-eval convention)."""
    from lia_tpu.utils.lm_eval_adapter import LiaTPULM

    eng = _tiny_engine()
    tok = StubTokenizer()
    lm = LiaTPULM(eng, tok, batch_size=2, max_length=64)
    pairs = [
        ("the quick brown fox", "jumps over"),
        ("", "hello world"),
        ("a b c d e", "f"),
    ]
    out = lm.loglikelihood_pairs(pairs)
    assert len(out) == 3
    for ll, greedy in out:
        assert np.isfinite(ll) and ll <= 0.0
        assert isinstance(greedy, bool)
    # direct engine cross-check for the first record
    c, t = lm._encode_pair("the quick brown fox", "jumps over")
    ll_ref, _ = eng.score([c], [t])
    np.testing.assert_allclose(out[0][0], float(ll_ref[0]), rtol=1e-6)


def test_lm_eval_adapter_generate_until_stops():
    from lia_tpu.utils.lm_eval_adapter import LiaTPULM

    eng = _tiny_engine()
    lm = LiaTPULM(eng, StubTokenizer(), batch_size=2, max_length=64, max_gen_toks=8)
    outs = lm.generate_until_pairs(
        [("some prompt text", {"until": [" "], "max_gen_toks": 4})]
    )
    assert len(outs) == 1
    assert " " not in outs[0]  # truncated at the first stop string


def test_lm_eval_adapter_rolling():
    from lia_tpu.utils.lm_eval_adapter import LiaTPULM

    eng = _tiny_engine()
    lm = LiaTPULM(eng, StubTokenizer(), batch_size=2, max_length=16)
    (ll,) = lm.loglikelihood_rolling_texts(["one two three four five six seven"])
    assert np.isfinite(ll) and ll < 0.0


def test_engine_score_is_greedy_flag():
    """score() flags records whose continuation is the model's own argmax."""
    from lia_tpu.config import GenerationConfig

    eng = _tiny_engine()
    rng = np.random.default_rng(0)
    ctxs = [list(rng.integers(3, 500, size=12)) for _ in range(4)]
    greedy_tok = eng.generate(ctxs, GenerationConfig(max_new_tokens=1)).sequences[:, 0]
    ll, greedy = eng.score(ctxs, [[int(t)] for t in greedy_tok])
    assert bool(greedy.all())
    wrong = [[(int(t) + 1) % 500] for t in greedy_tok]
    _, greedy2 = eng.score(ctxs, wrong)
    assert not bool(greedy2.any())
