"""Fused W4A8 Pallas kernel vs golden int8-act × dequantized-int4 math.

The kernel (ops/pallas_matmul.py `w4a8_matmul`) unpacks nibbles in VMEM and
runs int8×int8 MXU dots; these tests pin its output to the explicit
quantize-act → dequantize-weight → fp32 matmul reference (the math the XLA
woq_int4_dyn / woq_int4z_dyn paths implement). Reference analog: lowp-mode
INT8 checks in test_quantization_default_recipe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.config import QuantConfig
from lia_tpu.ops.pallas_matmul import w4a8_matmul
from lia_tpu.ops.quant import QuantizedWeight, dequantize, quantize_weight, quantized_matmul


def _quant_act(x):
    sx = np.maximum(np.abs(x).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = np.rint(x / sx).astype(np.int8)
    return xq, sx.astype(np.float32)


@pytest.mark.parametrize("gs", [-1, 32])
def test_w4a8_matches_dequant(rng, gs):
    M, K, N = 16, 128, 64
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    rec = jax.tree.map(
        jnp.asarray,
        quantize_weight(w, QuantConfig(weight_dtype="int4", group_size=gs, act_quant="dynamic")),
    )
    xq, sx = _quant_act(x)
    ref = (xq.astype(np.float32) @ np.asarray(dequantize(rec, jnp.float32))) * sx
    out = w4a8_matmul(
        jnp.asarray(xq), jnp.asarray(sx), rec.q, rec.s, None,
        group_size=gs, block_m=8, block_n=32, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("gs", [-1, 32])
def test_w4a8z_matches_dequant(rng, gs):
    """Asymmetric variant: raw codes 0..15 with per-group zero-points."""
    M, K, N = 8, 128, 64
    ng = 1 if gs == -1 else K // gs
    x = rng.standard_normal((M, K)).astype(np.float32)
    codes = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
    z = rng.uniform(4.0, 12.0, size=(ng, N)).astype(np.float32)
    s = rng.uniform(0.01, 0.1, size=(ng, N)).astype(np.float32)
    Kh = K // 2
    packed = (codes[:Kh] & 0xF) | (codes[Kh:] << 4)
    g = K // ng
    w = (codes.astype(np.float32) - np.repeat(z, g, axis=0)) * np.repeat(s, g, axis=0)
    xq, sx = _quant_act(x)
    ref = (xq.astype(np.float32) @ w) * sx
    out = w4a8_matmul(
        jnp.asarray(xq), jnp.asarray(sx), jnp.asarray(packed), jnp.asarray(s),
        jnp.asarray(z), group_size=gs, block_m=8, block_n=32, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_w4a8_multi_k_tiles(rng):
    """Several packed K tiles per grid row exercise the accumulator carry."""
    M, K, N = 8, 512, 32
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    rec = jax.tree.map(
        jnp.asarray,
        quantize_weight(w, QuantConfig(weight_dtype="int4", group_size=32, act_quant="dynamic")),
    )
    xq, sx = _quant_act(x)
    ref = (xq.astype(np.float32) @ np.asarray(dequantize(rec, jnp.float32))) * sx
    out = w4a8_matmul(
        jnp.asarray(xq), jnp.asarray(sx), rec.q, rec.s, None,
        group_size=32, block_m=8, block_n=32, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_quantized_matmul_pallas_route_parity(rng, monkeypatch):
    """quantized_matmul routed through the Pallas kernel (forced on) matches
    the XLA dyn path (forced off) bit-for-nearly-bit."""
    from lia_tpu.ops import dispatch

    M, K, N = 16, 256, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    for fmt_kwargs in (dict(weight_dtype="int4", group_size=-1, act_quant="dynamic"),):
        rec = jax.tree.map(jnp.asarray, quantize_weight(w, QuantConfig(**fmt_kwargs)))
        monkeypatch.setattr(dispatch, "_FORCE", False)
        ref = np.asarray(quantized_matmul(x, rec))
        monkeypatch.setattr(dispatch, "_FORCE", True)
        out = np.asarray(quantized_matmul(x, rec))
        monkeypatch.setattr(dispatch, "_FORCE", None)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_quantized_matmul_pallas_route_zp_parity(rng, monkeypatch):
    """Asym (woq_int4z_dyn) route parity, grouped scales."""
    from lia_tpu.ops import dispatch

    M, K, N = 16, 256, 128
    ng = 2
    g = K // ng
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    codes = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
    z = rng.uniform(4.0, 12.0, size=(ng, N)).astype(np.float32)
    s = rng.uniform(0.01, 0.1, size=(ng, N)).astype(np.float32)
    Kh = K // 2
    packed = (codes[:Kh] & 0xF) | (codes[Kh:] << 4)
    rec = QuantizedWeight(
        jnp.asarray(packed), jnp.asarray(s), "woq_int4z_dyn", jnp.asarray(z)
    )
    monkeypatch.setattr(dispatch, "_FORCE", False)
    ref = np.asarray(quantized_matmul(x, rec))
    monkeypatch.setattr(dispatch, "_FORCE", True)
    out = np.asarray(quantized_matmul(x, rec))
    monkeypatch.setattr(dispatch, "_FORCE", None)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_w4a8_stacked_matches_per_layer(rng):
    """Scalar-prefetch stacked kernel == per-layer w4a8_matmul for every
    layer index (the fused-decode-scan path that avoids the hidden
    dynamic-slice copy)."""
    from lia_tpu.ops.pallas_matmul import w4a8_matmul_stacked

    L, M, K, N = 3, 16, 256, 128
    gs = 32
    x = rng.standard_normal((M, K)).astype(np.float32)
    xq, sx = _quant_act(x)
    recs = [
        jax.tree.map(
            jnp.asarray,
            quantize_weight(
                rng.standard_normal((K, N)).astype(np.float32) * 0.1,
                QuantConfig(weight_dtype="int4", group_size=gs, act_quant="dynamic"),
            ),
        )
        for _ in range(L)
    ]
    q_stack = jnp.stack([r.q for r in recs])
    s_stack = jnp.stack([r.s for r in recs])
    for l, rec in enumerate(recs):
        ref = w4a8_matmul(
            jnp.asarray(xq), jnp.asarray(sx), rec.q, rec.s, None,
            group_size=gs, block_m=8, block_n=64, block_k=128, interpret=True,
        )
        out = w4a8_matmul_stacked(
            jnp.asarray(xq), jnp.asarray(sx), q_stack, s_stack, None,
            jnp.int32(l), group_size=gs, block_m=8, block_n=64, block_k=128,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_w4a8z_stacked_matches_per_layer(rng):
    """Asymmetric stacked variant parity across layer indices."""
    from lia_tpu.ops.pallas_matmul import w4a8_matmul_stacked

    L, M, K, N = 2, 8, 256, 128
    ng = 4
    g = K // ng
    Kh = K // 2
    x = rng.standard_normal((M, K)).astype(np.float32)
    xq, sx = _quant_act(x)
    packs, ss, zs = [], [], []
    for _ in range(L):
        codes = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
        packs.append((codes[:Kh] & 0xF) | (codes[Kh:] << 4))
        ss.append(rng.uniform(0.01, 0.1, size=(ng, N)).astype(np.float32))
        zs.append(rng.uniform(4.0, 12.0, size=(ng, N)).astype(np.float32))
    q_stack = jnp.asarray(np.stack(packs))
    s_stack = jnp.asarray(np.stack(ss))
    z_stack = jnp.asarray(np.stack(zs))
    for l in range(L):
        ref = w4a8_matmul(
            jnp.asarray(xq), jnp.asarray(sx), q_stack[l], s_stack[l], z_stack[l],
            group_size=g, block_m=8, block_n=64, block_k=128, interpret=True,
        )
        out = w4a8_matmul_stacked(
            jnp.asarray(xq), jnp.asarray(sx), q_stack, s_stack, z_stack,
            jnp.int32(l), group_size=g, block_m=8, block_n=64, block_k=128,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_decode_scan_stacked_ref_parity(rng, monkeypatch):
    """End-to-end: the fused decode scan with stacked W4A8 weights pulled out
    of the scan xs (QuantizedWeightRef -> scalar-prefetch kernel, pallas
    forced on in interpreter mode) produces the same hidden states as the
    plain sliced-xs path (pallas off)."""
    from lia_tpu.models import transformer as T
    from lia_tpu.models.registry import get_config
    from lia_tpu.ops import attention as att
    from lia_tpu.ops import dispatch
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.ops.quant import quantize_params
    from lia_tpu.config import QuantConfig
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-125m").replace(num_layers=2)
    qc = QuantConfig(weight_dtype="int4", group_size=128, act_quant="dynamic")
    params = jax.tree.map(jnp.asarray, init_dummy_params(cfg, quant=qc))
    B, S_max = 2, 64
    cache = kvc.init_cache(cfg, B, S_max, jnp.float32)
    n_past = 5
    x = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)), jnp.float32)
    positions = jnp.full((B, 1), n_past, jnp.int32)
    slot_mask = (jnp.arange(S_max) < n_past + 1)[None, :].repeat(B, 0)
    ctx = att.DecodeAttn(
        slot_mask=slot_mask,
        length=jnp.asarray(n_past + 1, jnp.int32),
        mask=att.decode_mask(slot_mask, jnp.asarray(n_past + 1, jnp.int32)),
    )
    start = jnp.asarray(n_past, jnp.int32)

    def run():
        h, ck, cv = T.decode_layers_scan(
            cfg, params["layers"], x, cache.k, cache.v, start, ctx,
            positions, cfg.num_layers,
        )
        return np.asarray(h)

    monkeypatch.setattr(dispatch, "_FORCE", False)
    ref = run()
    monkeypatch.setattr(dispatch, "_FORCE", True)
    monkeypatch.setattr(dispatch, "_INTERPRET", True)
    monkeypatch.setattr(dispatch, "_STACKED_W4A8", True)  # gate default-off
    # _TP_ACTIVE is process-sticky (set by any earlier TP-mesh test) and
    # would silently turn use_pallas() off — neutralize for this test
    monkeypatch.setattr(dispatch, "_TP_ACTIVE", False)
    from lia_tpu.ops import quant as Q

    assert any(
        Q.stackable_ref(leaf)
        for leaf in jax.tree.leaves(params["layers"], is_leaf=Q.is_quantized)
    ), "test must exercise the QuantizedWeightRef pullout"
    out = run()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
