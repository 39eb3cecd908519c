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
    ±15% across every weight format. Anchors: RESULTS.md round-2/3 tables, TPU
    v5e, fused decode, 256-in/272-ctx; SystemProfile's derates were grid-fit
    against exactly these seven numbers (round 3: 0.89-1.10 achieved band), so
    this test pins model<->hardware drift."""
    from lia_tpu.config import QuantConfig
    from lia_tpu.models.registry import get_config
    from lia_tpu.runtime.cost_model import CostModel, SystemProfile

    measured = [
        # (model, quant, batch, ctx, measured step seconds)
        ("opt-1.3b", QuantConfig(), 8, 272, 6.89e-3),
        ("opt-6.7b", QuantConfig(weight_dtype="int8", act_quant="dynamic"),
         16, 272, 16.12e-3),
        # round-3 headline (driver bench 2026-08-19: 1016.8-1028.7 tok/s)
        ("opt-6.7b", QuantConfig(weight_dtype="int8", act_quant="dynamic",
                                 kv_cache_dtype="int8"), 16, 272, 15.74e-3),
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
        assert 0.85 <= ratio <= 1.15, (
            f"{name} {qc.weight_dtype}/{qc.act_quant}: predicted "
            f"{pred*1e3:.2f} ms vs measured {t_meas*1e3:.2f} ms"
        )


def test_auto_picks_empirically_best_decode_policy():
    """`auto` must side with the round-1/3 MEASUREMENTS on both sides of the
    streamed-vs-host crossover for OPT-30B int8 b64:

    - at deployment host-link bandwidth (8 GB/s), streaming a 617 MB int8
      layer costs ~77 ms ≪ the host's compute time (round-1 measurement:
      host execution ran ~46 s/token ≈ ~1 s/layer on this host class) →
      policy 0 (TPU streamed) must win;
    - at the relay's measured sustained 0.094 GB/s (round 3: 6.55 s/layer
      transfer, RESULTS.md T_layer), host execution is the faster option →
      a host-side decode policy (1 or 2) must win."""
    from lia_tpu.config import QuantConfig
    from lia_tpu.models.registry import get_config
    from lia_tpu.runtime.cost_model import CostModel, SystemProfile

    cfg = get_config("opt-30b")
    qc = QuantConfig(weight_dtype="int8", kv_cache_dtype="int8")

    deploy = SystemProfile(h2d_bw=8e9)
    _, dec, _ = CostModel(cfg, deploy, qc).choose(B=64, in_len=32, out_len=8)
    # 0 and 2 are both TPU-compute-with-streamed-weights (the model scores
    # them within 2% here); the measured discriminator is that HOST execution
    # (policy 1, ~0.5 s/layer on this host class) must lose at deployment bw
    assert dec in (0, 2), f"deployment profile picked decode policy {dec}, expected TPU-side"

    relay = SystemProfile(h2d_bw=0.094e9)
    _, dec, _ = CostModel(cfg, relay, qc).choose(B=64, in_len=32, out_len=8)
    assert dec in (1, 2), f"relay profile picked decode policy {dec}, expected host-side"


def test_h2d_alpha_beta_fit_recovers_synthetic_link():
    """Two-point α-β fit: given a link with 0.3 s fixed latency + 1 GB/s
    bandwidth (this rig's tunnel class), the fit recovers both terms. A
    single-size probe conflates them — the r4 policy-2 experiment showed the
    pure-bandwidth model underpredicting streamed steps 33-53×."""
    from lia_tpu.runtime.cost_model import Microbench

    alpha_true, beta_true = 0.3, 1.0e9
    calls = []

    def fake_measure(nbytes):
        calls.append(nbytes)
        return alpha_true + nbytes / beta_true

    alpha, beta = Microbench.h2d_alpha_beta(measure=fake_measure)
    assert abs(alpha - alpha_true) / alpha_true < 1e-6
    assert abs(beta - beta_true) / beta_true < 1e-6
    assert len(calls) >= 3  # warm + two sizes (each possibly repeated)


def test_h2d_alpha_beta_noise_floor_fallback():
    """If the large put is not slower than the small one (pure noise), the
    fit degrades to bandwidth-only rather than producing a negative β."""
    from lia_tpu.runtime.cost_model import Microbench

    alpha, beta = Microbench.h2d_alpha_beta(measure=lambda n: 0.1)
    assert alpha == 0.0
    assert beta > 0


def test_transfer_latency_dominates_small_puts_on_relay_profile():
    """On a relay-class profile (α=0.3 s), a 14 MB opt-125m layer put costs
    ~α — 24× the pure-bandwidth charge — matching the r4 HW observation that
    per-put fixed latency, not bytes, sets streamed step time at small model
    scale (experiments/bench_policy2_hw.py: measured 860 ms/streamed-layer
    vs 13 ms bandwidth-only prediction)."""
    cfg = get_config("opt-125m")
    relay = SystemProfile(h2d_bw=1.085e9, h2d_latency_s=0.3)
    cm = CostModel(cfg, relay, QuantConfig())
    per_layer = cm.h2d_time(cm.weight_bytes_per_layer())
    assert per_layer > 0.3
    bandwidth_only = cm.weight_bytes_per_layer() / relay.h2d_bw
    assert per_layer / bandwidth_only > 20
    # and the streamed layer time inherits the floor
    t = cm.tpu_layer_time(8, 1, 128, weights_resident=False)
    assert t >= 0.3


def test_alpha_default_is_negligible_on_direct_links():
    """The default α (30 µs, PCIe DMA-setup scale) must not disturb the
    deployment-profile policy choice or the resident-decode anchors."""
    cfg = get_config("opt-30b")
    qc = QuantConfig(weight_dtype="int8", kv_cache_dtype="int8")
    deploy = SystemProfile(h2d_bw=8e9)
    t_stream = CostModel(cfg, deploy, qc).tpu_layer_time(
        64, 1, 36, weights_resident=False
    )
    t_stream_no_alpha = CostModel(
        cfg, SystemProfile(h2d_bw=8e9, h2d_latency_s=0.0), qc
    ).tpu_layer_time(64, 1, 36, weights_resident=False)
    assert abs(t_stream - t_stream_no_alpha) / t_stream_no_alpha < 0.01
