"""SmoothQuant tests: exact-at-fp folding + outlier-robust int8."""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig, QuantConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.ops.quant import quantize_params
from lia_tpu.ops.smoothquant import apply_smoothquant, collect_act_scales
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def model():
    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=31, scale=0.02)
    # inject activation outliers: blow up a few ln1 scale channels
    for ch in (3, 17, 40):
        params["layers"]["ln1"]["scale"][:, ch] *= 30.0
    return cfg, params


def test_folding_is_exact_at_fp(model):
    cfg, params = model
    prompts = [[5, 9, 23, 41, 8, 77], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=6)
    base = InferenceEngine(cfg, params).generate(prompts, gen)
    scales = collect_act_scales(cfg, params, prompts)
    folded = apply_smoothquant(cfg, params, scales, alpha=0.5)
    out = InferenceEngine(cfg, folded).generate(prompts, gen)
    np.testing.assert_array_equal(out.sequences, base.sequences)


def test_scales_shapes(model):
    cfg, params = model
    scales = collect_act_scales(cfg, params, [[5, 9, 23]])
    assert scales["qkv"].shape == (cfg.num_layers, cfg.hidden_size)
    assert scales["mlp_in"].shape == (cfg.num_layers, cfg.hidden_size)
    assert (scales["qkv"] >= 0).all()


def test_smoothquant_improves_int8_match(model):
    """With outlier channels, int8-after-smoothquant should track fp at least as
    well as plain int8 (per-token greedy agreement)."""
    cfg, params = model
    prompts = [[5, 9, 23, 41, 8, 77], [100, 7, 3], [50, 60, 2, 9]]
    gen = GenerationConfig(max_new_tokens=8)
    fp = InferenceEngine(cfg, params).generate(prompts, gen)
    qc = QuantConfig(weight_dtype="int8", group_size=-1)

    plain = InferenceEngine(cfg, quantize_params(cfg, params, qc)).generate(prompts, gen)
    scales = collect_act_scales(cfg, params, prompts)
    folded = apply_smoothquant(cfg, params, scales, alpha=0.5)
    sq = InferenceEngine(cfg, quantize_params(cfg, folded, qc)).generate(prompts, gen)

    agree_plain = (plain.sequences == fp.sequences).mean()
    agree_sq = (sq.sequences == fp.sequences).mean()
    assert agree_sq >= agree_plain - 1e-9, (agree_sq, agree_plain)


def test_autotune_alpha_picks_best_and_flow_runs(model):
    """Alpha autotune sweeps the grid and returns the KL-minimizing alpha
    (reference: quantization/_autotune.py grid search); the one-stop flow
    produces a quantized tree usable by the engine."""
    from lia_tpu.config import GenerationConfig, QuantConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.ops.smoothquant import autotune_alpha, smoothquant_quantize

    cfg, params = model
    prompts = [[5, 9, 23, 41, 8, 77], [100, 7, 3]]
    qc = QuantConfig(weight_dtype="int8", group_size=32)
    best, report = autotune_alpha(cfg, params, prompts, qc, alphas=(0.3, 0.5, 0.7))
    assert best in (0.3, 0.5, 0.7)
    assert len(report) == 3 and all(np.isfinite(v) for v in report.values())
    assert report[best] == min(report.values())

    qp, used = smoothquant_quantize(cfg, params, prompts, qc, alpha=best)
    assert used == best
    out = InferenceEngine(cfg, qp).generate(prompts, GenerationConfig(max_new_tokens=3))
    assert out.sequences.shape[1] == 3
