"""Rotary position embeddings.

Reference equivalent: csrc/cpu/aten/RotaryPositionEmbedding.cpp (fused RoPE apply) and
_IPEXRopeCPU (models/cpu/fusions/mha_fusion.py:37-123). On TPU the rotation is a cheap
elementwise op that XLA fuses into the surrounding QKV projection, so it is implemented
directly in jnp; the Pallas attention kernels consume already-rotated Q/K.

Uses the llama "half-rotation" convention (rotate_half), matching HF's
LlamaRotaryEmbedding.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float) -> jnp.ndarray:
    """Inverse frequencies, shape [head_dim // 2], fp32."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponent)


def apply_rope(
    x: jnp.ndarray,  # [B, S, N, D]
    positions: jnp.ndarray,  # [B, S] int32
    theta: float,
) -> jnp.ndarray:
    """Rotate Q or K by position-dependent angles. fp32 math, cast back to x.dtype."""
    d = x.shape[-1]
    inv_freq = rope_frequencies(d, theta)  # [D/2]
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, S, D/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
