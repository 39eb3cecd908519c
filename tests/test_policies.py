"""Placement-policy tests: every policy must generate the same greedy tokens as the
all-resident path (closing the reference's LIA-scheduler test gap — SURVEY §4).

On the CPU test backend "host" and "TPU" are the same device, so these validate
the control flow, cache splitting, and transfer seams; device placement itself is
exercised on hardware via run.py (see .claude/skills/verify).
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.runtime.policy import Plan, phase_plans, plan_for
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("opt-tiny").replace(num_layers=4, dtype="float32")
    params = init_dummy_params(cfg, seed=13, scale=0.02)
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8], [50, 60]]
    ref = InferenceEngine(cfg, params).generate(prompts, gen)
    return cfg, params, gen, prompts, ref


def test_plan_table():
    assert plan_for(1).all_host
    assert plan_for(2).hybrid and plan_for(4).hybrid
    assert plan_for(0).kv == "host" and plan_for(0).attention == "tpu"
    assert plan_for(3).kv == "hbm"
    with pytest.raises(ValueError):
        plan_for(7)


@pytest.mark.parametrize("policy", [0, 1, 2, 4])
def test_policy_matches_resident(setup, policy):
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(
        prefill_policy=policy, decode_policy=policy, hbm_percentage=0, stream_weights=True
    )
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_mixed_policies_with_residency(setup):
    """LIA flagship shape: prefill 0 (TPU streamed, host KV), decode 2 (TPU
    linears, host attention), 50% resident layers."""
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(prefill_policy=0, decode_policy=2, hbm_percentage=50, stream_weights=True)
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_policy0_prefill_policy1_decode(setup):
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(prefill_policy=0, decode_policy=1, hbm_percentage=25, stream_weights=True)
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_policy_with_minibatch(setup):
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(
        prefill_policy=3, decode_policy=2, hbm_percentage=50, stream_weights=True, num_minibatch=2
    )
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)
