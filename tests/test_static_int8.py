"""Static-INT8 (W8A8) tests: calibrated activation scales + int8x int8 MXU matmul.

TPU analog of the reference's static quantization subsystem
(intel_extension_for_pytorch/quantization/_smooth_quant.py observers +
static qconfig convert; quantization/__init__.py:1-21).
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.ops.quant import quantize_weight_static, quantized_matmul
from lia_tpu.ops.smoothquant import collect_act_scales, static_int8_quantize
from lia_tpu.utils.checkpoint import init_dummy_params

PROMPTS = [[5, 9, 23, 41, 8, 77], [100, 7, 3], [50, 60, 2, 9]]


def test_static_matmul_matches_fp():
    """W8A8 matmul tracks the fp product when the static scale covers the input."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 96)).astype(np.float32)
    w = (rng.standard_normal((96, 128)) * 0.05).astype(np.float32)
    rec = quantize_weight_static(w, act_amax=np.abs(x).max())
    assert rec.fmt == "static_int8"
    got = np.asarray(quantized_matmul(x, rec))
    ref = x @ w
    # int8 x int8 with per-out-channel weight scales: ~1% relative error budget
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.02


def test_static_matmul_stacked_layers():
    """[L, K, N] stacked weights with per-layer act scales (pre-scan form)."""
    rng = np.random.default_rng(1)
    L, K, N = 3, 64, 80
    w = (rng.standard_normal((L, K, N)) * 0.04).astype(np.float32)
    x = rng.standard_normal((L, 2, K)).astype(np.float32)
    rec = quantize_weight_static(w, act_amax=np.abs(x).max(axis=(1, 2)))
    assert rec.q.shape == (L, K, N) and rec.z.shape == (L,)
    # per-layer slices behave like independently quantized 2-D records
    for i in range(L):
        from lia_tpu.ops.quant import QuantizedWeight

        sub = QuantizedWeight(rec.q[i], rec.s[i], "static_int8", rec.z[i])
        got = np.asarray(quantized_matmul(x[i], sub))
        ref = x[i] @ w[i]
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02


def test_collect_act_scales_all_taps():
    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=7, scale=0.02)
    scales = collect_act_scales(cfg, params, PROMPTS[:2])
    L, H, F = cfg.num_layers, cfg.hidden_size, cfg.ffn_size
    assert scales["qkv"].shape == (L, H)
    assert scales["mlp_in"].shape == (L, H)
    assert scales["wo_in"].shape == (L, cfg.num_heads * cfg.head_dim)
    assert scales["w2_in"].shape == (L, F)
    for v in scales.values():
        assert (v >= 0).all() and np.isfinite(v).all()


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny", "gptj-tiny"])
def test_static_int8_end_to_end(name):
    """Full W8A8 flow generates tokens that track the fp model closely."""
    cfg = get_config(name).replace(dtype="float32")
    params = init_dummy_params(cfg, seed=11, scale=0.02)
    gen = GenerationConfig(max_new_tokens=8)
    fp = InferenceEngine(cfg, params).generate(PROMPTS, gen)
    qp, alpha = static_int8_quantize(cfg, params, PROMPTS, alpha=0.5)
    assert alpha == 0.5
    out = InferenceEngine(cfg, qp).generate(PROMPTS, gen)
    agree = (out.sequences == fp.sequences).mean()
    assert agree >= 0.75, agree


def test_static_int8_checkpoint_roundtrip(tmp_path):
    """static_int8 trees (with z act scales) survive save/load bit-exactly."""
    from lia_tpu.utils.checkpoint import load_params, save_params

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=3, scale=0.02)
    qp, _ = static_int8_quantize(cfg, params, PROMPTS[:2], alpha=None)
    path = tmp_path / "w8a8.npz"
    save_params(qp, str(path))
    back = load_params(str(path))
    wq = back["layers"]["attn"]["wq"]
    assert wq.fmt == "static_int8" and wq.z is not None
    np.testing.assert_array_equal(np.asarray(wq.q), np.asarray(qp["layers"]["attn"]["wq"].q))
    np.testing.assert_array_equal(np.asarray(wq.z), np.asarray(qp["layers"]["attn"]["wq"].z))
    gen = GenerationConfig(max_new_tokens=4)
    a = InferenceEngine(cfg, qp).generate(PROMPTS[:2], gen)
    b = InferenceEngine(cfg, back).generate(PROMPTS[:2], gen)
    np.testing.assert_array_equal(a.sequences, b.sequences)
