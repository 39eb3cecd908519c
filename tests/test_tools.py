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
