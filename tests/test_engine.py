"""Engine-level tests: packing, EOS early-exit, latency bookkeeping."""

import numpy as np

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.engine import InferenceEngine, bucket_length, pack_prompts
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params


def test_bucket_length():
    assert bucket_length(1) == 16
    assert bucket_length(16) == 16
    assert bucket_length(17) == 32
    assert bucket_length(100) == 128


def test_pack_prompts_left_pads():
    tokens, mask = pack_prompts([[1, 2, 3], [4]], pad_id=0)
    assert tokens.shape == (2, 16)
    np.testing.assert_array_equal(tokens[0, -3:], [1, 2, 3])
    np.testing.assert_array_equal(tokens[1, -1:], [4])
    assert mask[0, -3:].all() and not mask[0, :-3].any()
    assert mask[1, -1] and not mask[1, :-1].any()


def test_generate_shapes_and_latency():
    cfg = get_config("opt-tiny")
    eng = InferenceEngine(cfg, init_dummy_params(cfg))
    res = eng.generate([[3, 4, 5]], GenerationConfig(max_new_tokens=5))
    assert res.sequences.shape == (1, 5)
    assert len(res.latency.token_latencies_s) == 5
    s = res.summary()
    assert s["first_token_latency_s"] > 0
    assert s["decode_tokens_per_s"] > 0


def test_eos_early_exit():
    cfg = get_config("opt-tiny")
    eng = InferenceEngine(cfg, init_dummy_params(cfg))
    # dummy tied-embedding models echo the last token; use it as the EOS to trigger stop
    probe = eng.generate([[7, 8, 9]], GenerationConfig(max_new_tokens=3))
    eos = int(probe.sequences[0, 0])
    res = eng.generate(
        [[7, 8, 9]], GenerationConfig(max_new_tokens=50, eos_token_id=eos, pad_token_id=1)
    )
    assert res.sequences.shape[1] < 50  # stopped early
    assert int(res.sequences[0, 0]) == eos


def test_device_dummy_params_matches_host_structure():
    """device_dummy_params (zero-H2D bench staging) must mirror the host
    synthesizer exactly: same treedef, same shapes/dtypes/quant formats —
    any drift would silently bench a different model."""
    import jax

    from lia_tpu.config import QuantConfig
    from lia_tpu.utils.checkpoint import device_dummy_params

    cfg = get_config("opt-tiny")
    for quant in (
        None,
        QuantConfig(weight_dtype="int8", group_size=-1, act_quant="dynamic"),
        QuantConfig(weight_dtype="int4", group_size=16, act_quant="dynamic"),
    ):
        host = init_dummy_params(cfg, quant=quant)
        dev = device_dummy_params(cfg, quant=quant)
        hl, htd = jax.tree.flatten(host)
        dl, dtd = jax.tree.flatten(dev)
        assert htd == dtd
        for h, d in zip(hl, dl):
            assert np.shape(h) == d.shape
            assert np.dtype(np.asarray(h).dtype) == np.dtype(d.dtype)
        # the engine runs end-to-end on the device tree
        eng = InferenceEngine(cfg, dev)
        res = eng.generate([[3, 4, 5]], GenerationConfig(max_new_tokens=3))
        assert res.sequences.shape == (1, 3)
