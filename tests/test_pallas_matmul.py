"""Fused dequant-matmul kernel vs golden (reference analog: WoqTppKrnl tests in
test_quantization_default_recipe.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.config import QuantConfig
from lia_tpu.ops.pallas_matmul import woq_matmul
from lia_tpu.ops.quant import dequantize, quantize_weight

import jax


@pytest.mark.parametrize("gs", [-1, 32, 64])
@pytest.mark.parametrize("wdtype", ["int8", "int4"])
def test_woq_matmul_matches_dequant(rng, wdtype, gs):
    M, K, N = 16, 128, 64
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.1
    rec = jax.tree.map(jnp.asarray, quantize_weight(w, QuantConfig(weight_dtype=wdtype, group_size=gs)))
    ref = np.asarray(x) @ np.asarray(dequantize(rec, jnp.float32))
    # int4 tiles must span whole groups (half-split packing)
    bk = 32 if wdtype == "int8" else max(32, gs if gs > 0 else 128)
    out = woq_matmul(
        x, rec.q, rec.s, gs, int4=(wdtype == "int4"),
        block_m=8, block_n=32, block_k=bk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_woq_matmul_multiple_k_tiles_per_group(rng):
    """group 64, K tile 32: two K tiles share one scale row."""
    M, K, N = 8, 128, 32
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N), dtype=np.float32)
    rec = jax.tree.map(jnp.asarray, quantize_weight(w, QuantConfig(weight_dtype="int8", group_size=64)))
    ref = np.asarray(x) @ np.asarray(dequantize(rec, jnp.float32))
    out = woq_matmul(x, rec.q, rec.s, 64, block_m=8, block_n=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("gs", [-1, 32, 64])
def test_nf4_matmul_matches_dequant(rng, gs):
    """Select-tree LUT kernel == XLA codebook-gather dequant, exactly."""
    M, K, N = 16, 128, 64
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.1
    rec = jax.tree.map(
        jnp.asarray, quantize_weight(w, QuantConfig(weight_dtype="nf4", group_size=gs))
    )
    ref = np.asarray(x) @ np.asarray(dequantize(rec, jnp.float32))
    bk = max(32, gs if gs > 0 else 128)
    out = woq_matmul(
        x, rec.q, rec.s, gs, int4=True, nf4=True,
        block_m=8, block_n=32, block_k=bk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_nf4_decode_is_exact_lut():
    """The 15-select binary tree reproduces the codebook for all 16 codes."""
    from lia_tpu.ops.pallas_matmul import _nf4_decode
    from lia_tpu.ops.quant import NF4_CODEBOOK

    codes = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
    vals = np.asarray(_nf4_decode(codes, jnp.float32))
    np.testing.assert_array_equal(vals.reshape(-1), NF4_CODEBOOK)
