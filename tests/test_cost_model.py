"""Cost model tests: capacity budgeting and placement choices."""

import pytest

from lia_tpu.config import QuantConfig, RuntimeConfig
from lia_tpu.models.registry import get_config
from lia_tpu.runtime.cost_model import CostModel, SystemProfile, resolve_auto_policies


def test_small_model_fully_resident():
    cm = CostModel(get_config("opt-1.3b"), SystemProfile())
    pf, dec, pct = cm.choose(B=8, in_len=256, out_len=32)
    assert (pf, dec, pct) == (3, 3, 100)


def test_30b_does_not_fit_and_streams():
    cm = CostModel(get_config("opt-30b"), SystemProfile())
    pf, dec, pct = cm.choose(B=64, in_len=256, out_len=32)
    assert pct < 100
    assert pf in (0, 1) and dec in (0, 1, 2)


def test_int8_doubles_residency():
    cfg = get_config("opt-30b")
    fp = CostModel(cfg, SystemProfile()).max_resident_layers(64, 288)
    q8 = CostModel(cfg, SystemProfile(), QuantConfig(weight_dtype="int8")).max_resident_layers(64, 288)
    assert q8 > fp


def test_resolve_auto_fills_only_requested():
    cfg = get_config("opt-30b")
    rt = RuntimeConfig(prefill_policy=-1, decode_policy=2, hbm_percentage=-1)
    out = resolve_auto_policies(cfg, rt, 64, 256, 32)
    assert out.prefill_policy != -1
    assert out.decode_policy == 2
    assert 0 <= out.hbm_percentage < 100
    assert out.stream_weights


def test_report_keys():
    cm = CostModel(get_config("opt-6.7b"), SystemProfile())
    r = cm.report(32, 256, 32)
    assert r["weight_bytes_per_layer"] > 0
    assert r["t_decode_hybrid"] > 0


def test_prediction_accuracy_vs_measured():
    """The default v5e profile must predict MEASURED decode step times within
    -25%/+35% across every weight format (round-1 gap: defaults/derates never
    validated against reality). Anchors: RESULTS.md round-2 table, TPU v5e,
    fused decode, 256-in/272-ctx; per-format bw derates in SystemProfile were
    fit against exactly these numbers, so this test pins model<->hardware drift."""
    from lia_tpu.config import QuantConfig
    from lia_tpu.models.registry import get_config
    from lia_tpu.runtime.cost_model import CostModel, SystemProfile

    measured = [
        # (model, quant, batch, ctx, measured step seconds)
        ("opt-1.3b", QuantConfig(), 8, 272, 6.89e-3),
        ("opt-6.7b", QuantConfig(weight_dtype="int8", act_quant="dynamic"),
         16, 272, 16.12e-3),
        ("opt-6.7b", QuantConfig(weight_dtype="int8", kv_cache_dtype="int8"),
         16, 272, 20.10e-3),
        ("llama-3-8b", QuantConfig(weight_dtype="int8", act_quant="dynamic",
                                   kv_cache_dtype="int8"), 8, 272, 12.58e-3),
        ("llama-3-8b", QuantConfig(weight_dtype="int8"), 8, 272, 18.93e-3),
        ("llama-3-8b", QuantConfig(weight_dtype="int4", group_size=128),
         8, 272, 18.44e-3),
    ]
    prof = SystemProfile()
    for name, qc, B, ctx, t_meas in measured:
        cm = CostModel(get_config(name), prof, qc)
        pred = cm.predict_decode_step(B, ctx)
        ratio = t_meas / pred
        assert 0.75 <= ratio <= 1.35, (
            f"{name} {qc.weight_dtype}/{qc.act_quant}: predicted "
            f"{pred*1e3:.2f} ms vs measured {t_meas*1e3:.2f} ms"
        )
