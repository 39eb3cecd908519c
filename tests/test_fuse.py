"""Projection-fusion parity: fused wqkv/wg1 trees must reproduce the unfused
model output for raw bf16, grouped WOQ int8/int4, asymmetric int4, and W8A8
static-int8 weights (the fusion is an exact N-axis concat — ops/fuse.py).

The reference reaches the same fused-projection shape through its concat-linear
CPU fusions (models/cpu/fusions/linear_fusion.py); there the check is module
surgery, here it is a pure pytree rewrite, so parity is a numeric assertion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.ops.fuse import fuse_projections
from lia_tpu.ops.quant import quantize_params
from lia_tpu.utils.checkpoint import init_dummy_params


def _small(name):
    cfg = get_config(name)
    return cfg.replace(num_layers=2, max_position_embeddings=128)


def _gen():
    return GenerationConfig(max_new_tokens=6)


@pytest.mark.parametrize("model", ["opt-125m", "llama-3-8b"])
@pytest.mark.parametrize("wdtype,gs", [("none", -1), ("int8", -1), ("int4", 32)])
def test_fused_matches_unfused(model, wdtype, gs):
    cfg = _small(model)
    if model == "llama-3-8b":  # shrink to test size
        cfg = cfg.replace(hidden_size=256, ffn_size=512, num_heads=4, num_kv_heads=2,
                          head_dim=64, vocab_size=512)
    params = init_dummy_params(cfg, seed=0)
    if wdtype != "none":
        params = quantize_params(cfg, params, QuantConfig(weight_dtype=wdtype, group_size=gs))
    prompts = [[5, 9, 2, 11], [7, 3]]
    out_unfused = InferenceEngine(
        cfg, params, RuntimeConfig(fuse_projections=False)
    ).generate(prompts, _gen())
    out_fused = InferenceEngine(cfg, params, RuntimeConfig()).generate(prompts, _gen())
    np.testing.assert_array_equal(
        np.asarray(out_unfused.sequences), np.asarray(out_fused.sequences)
    )

    # fusion must have actually happened (keys rewritten)
    fp = fuse_projections(cfg, params)
    a = fp["layers"]["attn"]
    assert "wqkv" in a and "wq" not in a
    if model == "llama-3-8b":
        assert "wg1" in fp["layers"]["mlp"]
    # and the original tree must be untouched
    assert "wq" in params["layers"]["attn"]


def test_fused_bias_concat_exact():
    """OPT carries q/k/v biases — the concat must place them exactly."""
    cfg = _small("opt-125m")
    params = init_dummy_params(cfg, seed=1)
    rng = np.random.default_rng(3)
    for k in ("bq", "bk", "bv"):
        params["layers"]["attn"][k] = rng.standard_normal(
            params["layers"]["attn"][k].shape
        ).astype(np.float32)
    fp = fuse_projections(cfg, params)
    b = np.asarray(fp["layers"]["attn"]["bqkv"], np.float32)
    a = params["layers"]["attn"]
    ref = np.concatenate(
        [np.asarray(a["bq"], np.float32), np.asarray(a["bk"], np.float32),
         np.asarray(a["bv"], np.float32)], axis=-1)
    np.testing.assert_array_equal(b, ref)


def test_fused_static_int8_act_scale_guard():
    """static_int8 fuses only when the q/k/v activation scales agree."""
    from lia_tpu.ops.smoothquant import static_int8_quantize

    cfg = _small("opt-125m")
    params = init_dummy_params(cfg, seed=2)
    calib = [np.arange(1, 17, dtype=np.int32).tolist()]
    qparams, _ = static_int8_quantize(cfg, params, calib)
    fp = fuse_projections(cfg, qparams)
    a = fp["layers"]["attn"]
    assert "wqkv" in a, "same-input act scales must coincide and fuse"
    # perturb one branch's act scale — fusion must back off, not mis-fuse
    bad = dict(qparams)
    layers = dict(bad["layers"])
    attn = dict(layers["attn"])
    wk = attn["wk"]
    attn["wk"] = type(wk)(wk.q, wk.s, wk.fmt, np.asarray(wk.z) * 2.0)
    layers["attn"] = attn
    bad["layers"] = layers
    fp2 = fuse_projections(cfg, bad)
    assert "wq" in fp2["layers"]["attn"] and "wqkv" not in fp2["layers"]["attn"]
