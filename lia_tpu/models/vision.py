"""CLIP-style ViT vision tower (shared by GIT and LLaVA).

Reference scope: IPEX optimizes GIT (``git.image_encoder`` = CLIP ViT copy) and
LLaVA (``vision_tower`` = CLIPVisionModel) as part of its supported model list
(intel_extension_for_pytorch/transformers/optimize.py:188,673 llava multimodal
prep; examples model classes git.py/llava.py). The tower is a pure function
over a parameter pytree, pre-LN transformer encoder:

    patches = conv(P×P, stride P)  →  [CLS] + patches + learned positions
    → pre-LN → L × (x += MHA(ln1 x); x += MLP(ln2 x)) → post-LN

Patch extraction is done as a reshape + one matmul (a stride-P conv over
non-overlapping patches IS a matmul on [P·P·C] pixel blocks) — MXU-friendly,
no conv lowering needed.

``hidden_states_at``: LLaVA consumes the hidden states from layer -2 (HF
``vision_feature_layer``), before post-LN, minus the CLS token; GIT consumes
the final post-LN output including CLS.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, C, H, W] → [B, (H/P)·(W/P), P·P·C] non-overlapping patch rows.

    Flattened in HF's conv-output order: channel-major within a patch
    (conv weight [H_out, C, P, P] flattens to [C·P·P] per output), so the
    matmul weight is the conv kernel reshaped [C·P·P, H_out]."""
    B, C, H, W = pixels.shape
    hp, wp = H // patch, W // patch
    x = pixels.reshape(B, C, hp, patch, wp, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, hp, wp, C, P, P]
    return x.reshape(B, hp * wp, C * patch * patch)


def vit_attention(p: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    B, S, H = x.shape
    D = H // n_heads
    q = _linear(x, p["wq"], p["bq"]).reshape(B, S, n_heads, D)
    k = _linear(x, p["wk"], p["bk"]).reshape(B, S, n_heads, D)
    v = _linear(x, p["wv"], p["bv"]).reshape(B, S, n_heads, D)
    scores = jnp.einsum(
        "bqnd,bknd->bnqk", q.astype(jnp.float32) * (D**-0.5), k.astype(jnp.float32)
    )
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v.astype(jnp.float32))
    return _linear(out.reshape(B, S, H).astype(x.dtype), p["wo"], p["bo"])


def vit_encode(
    params: Params,
    pixels: jnp.ndarray,  # [B, C, H, W]
    n_heads: int,
    patch: int,
    eps: float = 1e-5,
    hidden_layer: Optional[int] = None,  # e.g. -2 for LLaVA; None → all layers
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (final post-LN states [B, 1+np, H], layer-``hidden_layer``
    pre-post-LN states — the tuple lets GIT and LLaVA share one forward)."""
    B = pixels.shape[0]
    x = jax.lax.dot_general(
        patchify(pixels, patch).astype(params["patch"].dtype), params["patch"],
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(params["cls"].dtype)
    cls = jnp.broadcast_to(params["cls"], (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][None]
    x = _ln(params["pre_ln"], x, eps)

    n_layers = params["layers"]["ln1"]["scale"].shape[0]
    # HF hidden_states is [embeddings, after-layer-0, …, after-layer-(n-1)];
    # hidden_states[hl] for negative hl → after layer index (n_layers + hl - 1 + 1)
    # − 1 = n_layers + hl; for positive hl → after layer index hl − 1.
    take = None
    if hidden_layer is not None:
        take = hidden_layer - 1 if hidden_layer >= 0 else n_layers + hidden_layer

    def body(carry, per_layer):
        h, picked = carry
        lp, idx = per_layer
        h = h + vit_attention(lp["attn"], _ln(lp["ln1"], h, eps), n_heads)
        m = _linear(_ln(lp["ln2"], h, eps), lp["mlp"]["w1"], lp["mlp"]["b1"])
        h = h + _linear(quick_gelu(m), lp["mlp"]["w2"], lp["mlp"]["b2"])
        if take is not None:
            picked = jnp.where(idx == take, h, picked)
        return (h, picked), None

    idxs = jnp.arange(n_layers, dtype=jnp.int32)
    (x, picked), _ = jax.lax.scan(body, (x, x), (params["layers"], idxs))
    return _ln(params["post_ln"], x, eps), picked
