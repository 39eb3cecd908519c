"""Streaming scheduler tests: tiered residency must be bit-identical to resident.

Closes the reference's test gap — its LIA policy scheduler had NO in-repo tests
(SURVEY §4: "no test touches prefill_policy/CUDA streams"); here the host-only
CPU backend exercises the full streaming pipeline.
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.runtime.weight_manager import TieredWeightManager
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("opt-tiny").replace(num_layers=4, dtype="float32")
    params = init_dummy_params(cfg, seed=7, scale=0.02)
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8], [50, 60]]
    ref = InferenceEngine(cfg, params).generate(prompts, gen)
    return cfg, params, gen, prompts, ref


@pytest.mark.parametrize("hbm_pct", [0, 50, 100])
def test_streaming_matches_resident(setup, hbm_pct):
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(hbm_percentage=hbm_pct, stream_weights=(hbm_pct < 100))
    eng = InferenceEngine(cfg, params, rt)
    res = eng.generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_streaming_no_overlap_matches(setup):
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(hbm_percentage=25, stream_weights=True, overlap=False)
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_minibatch_prefill_matches(setup):
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True, num_minibatch=2)
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


@pytest.mark.parametrize("window", [1, 3])
def test_inflight_window_matches(setup, window):
    """The dispatch-run-ahead throttle (max_inflight_layers) must only pace
    execution, never change results — window 1 (fully serialized-ish) and a
    wide window generate identically to the resident reference."""
    cfg, params, gen, prompts, ref = setup
    rt = RuntimeConfig(
        hbm_percentage=25, stream_weights=True, max_inflight_layers=window
    )
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_weight_manager_reports_residency():
    cfg = get_config("opt-tiny")
    params = init_dummy_params(cfg)
    wm = TieredWeightManager(params["layers"], cfg.num_layers, hbm_percentage=50)
    rep = wm.memory_report()
    assert rep["resident_layers"] == cfg.num_layers // 2
    assert 0.4 < rep["hbm_resident_frac"] < 0.6
    wm.close()


def test_prefetch_pipeline_returns_same_weights():
    cfg = get_config("opt-tiny")
    params = init_dummy_params(cfg, seed=1)
    wm = TieredWeightManager(params["layers"], cfg.num_layers, hbm_percentage=0)
    wm.prefetch(0)
    wm.prefetch(1)
    l0 = wm.get_layer(0)
    np.testing.assert_array_equal(
        np.asarray(l0["attn"]["wq"]), np.asarray(params["layers"]["attn"]["wq"][0])
    )
    l1 = wm.get_layer(1)  # was prefetched
    np.testing.assert_array_equal(
        np.asarray(l1["mlp"]["w1"]), np.asarray(params["layers"]["mlp"]["w1"][1])
    )
    wm.close()


def test_packed_streaming_bit_exact():
    """Packed byte-buffer streaming must reproduce every leaf bit-for-bit
    (bf16/f32/int8 bitcasts, QuantizedWeight nodes, biases)."""
    import jax
    import numpy as np

    from lia_tpu.config import QuantConfig
    from lia_tpu.models.registry import get_config
    from lia_tpu.ops.quant import quantize_params
    from lia_tpu.runtime.weight_manager import TieredWeightManager, slice_layer
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-125m").replace(num_layers=4)
    params = quantize_params(
        cfg, init_dummy_params(cfg, seed=7), QuantConfig(weight_dtype="int8", group_size=32)
    )
    layers = params["layers"]
    for packed in (False, True):
        wm = TieredWeightManager(layers, 4, hbm_percentage=25, packed=packed)
        assert (wm._packed is not None) == packed
        for idx in (1, 3):
            got = wm.get_layer(idx)
            want = slice_layer(layers, idx)
            for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        wm.close()


def test_alibi_model_streams_identically():
    """ALiBi (bloom) composes with tiered streaming: the scheduler's ctx
    builders carry the key-positional bias, so streamed == resident."""
    cfg = get_config("bloom-tiny").replace(num_layers=4, dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    gen = GenerationConfig(max_new_tokens=5, pad_token_id=3)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    ref = InferenceEngine(cfg, params).generate(prompts, gen)
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    res = InferenceEngine(cfg, params, rt).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_streaming_tp_mesh_matches(setup):
    """scheduler×mesh: TP-sharded tiered execution (sharded resident prefix,
    per-layer sharded streamed puts, head-sharded segment KV) is bit-identical
    to the single-device resident engine. The AutoTP analog composed with the
    LIA tiering — reference TP and tiering never compose in-repo."""
    import jax
    from jax.sharding import Mesh

    cfg, params, gen, prompts, _ = setup
    cfg2 = cfg.replace(vocab_size=512)  # 503 doesn't tile the model axis
    params2 = init_dummy_params(cfg2, seed=7, scale=0.02)
    ref = InferenceEngine(cfg2, params2).generate(prompts, gen)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    res = InferenceEngine(cfg2, params2, rt, mesh=mesh).generate(prompts, gen)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_streaming_tp_mesh_rejects_host_policies(setup):
    import jax
    from jax.sharding import Mesh

    cfg, params, gen, prompts, _ = setup
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    for rt in (
        RuntimeConfig(decode_policy=0, hbm_percentage=50),
        RuntimeConfig(decode_policy=1, hbm_percentage=50),
        RuntimeConfig(prefill_policy=2, hbm_percentage=50),
    ):
        with pytest.raises(ValueError, match="per-host"):
            InferenceEngine(cfg.replace(vocab_size=512),
                            init_dummy_params(cfg.replace(vocab_size=512), seed=7, scale=0.02),
                            rt, mesh=mesh)
