"""Rotary position embeddings.

Reference equivalent: csrc/cpu/aten/RotaryPositionEmbedding.cpp (fused RoPE apply) and
_IPEXRopeCPU (models/cpu/fusions/mha_fusion.py:37-123). On TPU the rotation is a cheap
elementwise op that XLA fuses into the surrounding QKV projection, so it is implemented
directly in jnp; the Pallas attention kernels consume already-rotated Q/K.

Two pairing conventions (both appear in the reference's RoPE kernel,
RotaryPositionEmbeddingKnl.cpp, selected by ``rotary_ndims``/offset args):
- llama "half-rotation" (rotate_half): pair (x[i], x[i+D/2]);
- gpt-j/gpt-neox "interleaved" (rotate_every_two): pair (x[2i], x[2i+1]).
Partial rotary (``rotary_dim`` < head_dim, gpt-j/neox) rotates only the leading
dims and passes the rest through.
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
    rotary_dim: int | None = None,  # rotate only the first rotary_dim dims
    interleaved: bool = False,  # gpt-j/neox rotate_every_two pairing
) -> jnp.ndarray:
    """Rotate Q or K by position-dependent angles. fp32 math, cast back to x.dtype."""
    d = x.shape[-1]
    r = rotary_dim if rotary_dim is not None else d
    inv_freq = rope_frequencies(r, theta)  # [r/2]
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, S, r/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, r/2]
    sin = jnp.sin(angles)[:, :, None, :]
    xf = x[..., :r].astype(jnp.float32)
    if interleaved:
        # pair lanes (2i, 2i+1): view as [..., r/2, 2]
        xp = xf.reshape(*xf.shape[:-1], r // 2, 2)
        x1, x2 = xp[..., 0], xp[..., 1]
        rot = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        rot = rot.reshape(*xf.shape[:-1], r)
    else:
        x1, x2 = xf[..., : r // 2], xf[..., r // 2 :]
        rot = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    rot = rot.astype(x.dtype)
    if r == d:
        return rot
    return jnp.concatenate([rot, x[..., r:]], axis=-1)
