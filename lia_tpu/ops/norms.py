"""Fused normalization ops.

Reference equivalents: csrc/cpu/aten/{LayerNorm,RMSNorm,AddLayerNorm}.cpp and the
Python wrappers _IPEXRMSNormCPU/_IPEXFastLayerNormCPU
(intel_extension_for_pytorch/transformers/models/cpu/fusions/mha_fusion.py:298-334).
On TPU these are pure-XLA: the compiler fuses the reductions and elementwise chain into
the surrounding computation, so no Pallas kernel is needed — fp32 accumulation is the
only thing we must enforce by hand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """LayerNorm over the last axis with fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def rmsnorm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5):
    """RMSNorm over the last axis with fp32 statistics (llama-style)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * scale.astype(jnp.float32)).astype(dtype)
