"""T5 / Flan-T5 encoder-decoder core (functional, TPU-first).

Reference support surface: IPEX patches ``T5Attention``, ``T5DenseActDense``,
``T5DenseGatedActDense`` and ``T5Block`` in place
(intel_extension_for_pytorch/transformers/optimize.py:310-326,363,430) and the
example runner drives ``T5ForConditionalGeneration``
(examples/.../single_instance/run_generation.py:41 MODEL_CLASSES["t5"]).

Here the model is a pure function over a stacked-layer pytree, like
:mod:`lia_tpu.models.transformer` — but with the three T5-specific mechanisms
implemented natively rather than bolted onto the decoder-only core:

- **relative position bias** (HF ``T5Attention._relative_position_bucket``):
  a learned [num_buckets, N] table on the FIRST encoder/decoder layer, shared
  by all layers. Bucketing is integer jnp math (static shapes, scan-friendly).
- **unscaled attention**: T5 omits the 1/sqrt(d) factor (cfg.attn_scale=1.0).
- **cross-attention** over encoder output, with per-layer K/V computed once at
  encode time and treated as read-only decode state (the seq2seq analog of a
  prefilled KV cache).

d_kv (head_dim) is independent of hidden_size/num_heads in T5 checkpoints —
``cfg.head_dim`` is authoritative, and the attention inner dim is
``num_heads * head_dim``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lia_tpu.config import Activation, ModelConfig
from lia_tpu.models.transformer import activation_fn, linear
from lia_tpu.ops.norms import rmsnorm

Params = Dict[str, Any]

NEG_INF = jnp.float32(-1e9)


# ---------------------------------------------------------------------------
# Relative position bias (T5Attention.compute_bias)
# ---------------------------------------------------------------------------


def relative_position_bucket(
    rel: jnp.ndarray, bidirectional: bool, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """HF ``T5Attention._relative_position_bucket`` in jnp (int32 in/out).

    ``rel`` = memory_position - query_position.
    """
    ret = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    relf = jnp.maximum(rel.astype(jnp.float32), 1.0)  # guard log(0)
    large = max_exact + (
        jnp.log(relf / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, rel, large)


def rel_bias(
    cfg: ModelConfig,
    table: jnp.ndarray,  # [num_buckets, N]
    query_pos: jnp.ndarray,  # [Sq] int32
    key_pos: jnp.ndarray,  # [Skv] int32
    bidirectional: bool,
) -> jnp.ndarray:
    """Bias logits [N, Sq, Skv] from the learned bucket table."""
    rel = key_pos[None, :] - query_pos[:, None]  # [Sq, Skv]
    buckets = relative_position_bucket(
        rel, bidirectional, cfg.rel_buckets, cfg.rel_max_distance
    )
    bias = jnp.take(table, buckets, axis=0)  # [Sq, Skv, N]
    return bias.transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Attention / layer pieces
# ---------------------------------------------------------------------------


def _heads(cfg: ModelConfig, x: jnp.ndarray, B: int, S: int) -> jnp.ndarray:
    return x.reshape(B, S, cfg.num_heads, cfg.head_dim)


def _attend(
    q: jnp.ndarray,  # [B, Sq, N, D]
    k: jnp.ndarray,  # [B, N, Skv, D] head-major
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, Sq, Skv] bool
    bias: Optional[jnp.ndarray],  # [N, Sq, Skv] or None
) -> jnp.ndarray:
    """Unscaled attention with a full (query×key) additive bias, fp32 softmax."""
    B, Sq, N, D = q.shape
    scores = jnp.einsum(
        "bqnd,bnkd->bnqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    if bias is not None:
        scores = scores + bias[None].astype(jnp.float32)
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnqk,bnkd->bqnd", probs, v.astype(jnp.float32))
    return out.reshape(B, Sq, N * D).astype(q.dtype)


def _mlp(cfg: ModelConfig, m: Params, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.gated_mlp:  # flan: T5DenseGatedActDense
        gate = activation_fn(cfg, linear(x, m["wg"], tp_split="col"))
        return linear(gate * linear(x, m["w1"], tp_split="col"), m["w2"], tp_split="row")
    return linear(activation_fn(cfg, linear(x, m["w1"], tp_split="col")), m["w2"], tp_split="row")


def _self_attention(
    cfg: ModelConfig, a: Params, x: jnp.ndarray, mask, bias
) -> jnp.ndarray:
    B, S, _ = x.shape
    q = _heads(cfg, linear(x, a["wq"], tp_split="col"), B, S)
    k = _heads(cfg, linear(x, a["wk"], tp_split="col"), B, S).transpose(0, 2, 1, 3)
    v = _heads(cfg, linear(x, a["wv"], tp_split="col"), B, S).transpose(0, 2, 1, 3)
    return linear(_attend(q, k, v, mask, bias), a["wo"], tp_split="row")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, S] right-padded
    input_mask: jnp.ndarray,  # [B, S] bool
) -> jnp.ndarray:
    """Bidirectional encoder stack → [B, S, H] (final-norm applied)."""
    enc = params["enc"]
    x = jnp.take(params["embed_tokens"], tokens, axis=0, mode="clip").astype(
        jnp.dtype(cfg.dtype)
    )
    S = tokens.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)
    bias = rel_bias(cfg, enc["rel_bias"], pos, pos, bidirectional=True)
    mask = input_mask[:, None, :] & jnp.ones((S, 1), jnp.bool_)  # [B, S, S]

    def body(h, lp):
        y = _self_attention(cfg, lp["attn"], rmsnorm(h, lp["ln1"]["scale"], cfg.norm_eps), mask, bias)
        h = h + y
        y = _mlp(cfg, lp["mlp"], rmsnorm(h, lp["ln2"]["scale"], cfg.norm_eps))
        return h + y, None

    x, _ = jax.lax.scan(body, x, enc["layers"])
    return rmsnorm(x, enc["final_norm"]["scale"], cfg.norm_eps)


def cross_kv(cfg: ModelConfig, params: Params, enc_out: jnp.ndarray):
    """Per-decoder-layer cross-attention K/V from the encoder output.

    Returns stacked [L, B, N, S_enc, D] arrays — computed once per request,
    read-only during decode (the fixed half of the seq2seq KV state)."""
    B, S, _ = enc_out.shape
    dec = params["dec"]

    def per_layer(carry, lp):
        c = lp["cross"]
        k = _heads(cfg, linear(enc_out, c["wk"]), B, S).transpose(0, 2, 1, 3)
        v = _heads(cfg, linear(enc_out, c["wv"]), B, S).transpose(0, 2, 1, 3)
        return carry, (k, v)

    _, (ks, vs) = jax.lax.scan(per_layer, None, dec["layers"])
    return ks, vs


# ---------------------------------------------------------------------------
# Decoder (step-wise over a self-attention KV cache)
# ---------------------------------------------------------------------------


def decode_step(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, 1] current decoder tokens
    step: jnp.ndarray,  # scalar int32 — 0-based decoder position
    self_k: jnp.ndarray,  # [L, B, N, T_max, D] self-attn cache
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,  # [L, B, N, S_enc, D] (read-only)
    cross_v: jnp.ndarray,
    enc_mask: jnp.ndarray,  # [B, S_enc] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder step. Returns (logits [B, V], new self_k, new self_v)."""
    dec = params["dec"]
    B = tokens.shape[0]
    T_max = self_k.shape[3]
    x = jnp.take(params["embed_tokens"], tokens, axis=0, mode="clip").astype(
        jnp.dtype(cfg.dtype)
    )

    slots = jnp.arange(T_max, dtype=jnp.int32)
    self_bias = rel_bias(
        cfg, dec["rel_bias"], step[None], slots, bidirectional=False
    )  # [N, 1, T_max]
    self_mask = (slots[None, None, :] <= step) & jnp.ones((B, 1, 1), jnp.bool_)
    cross_mask = enc_mask[:, None, :]

    def body(h, per_layer):
        lp, kl, vl, ck, cv = per_layer
        # self-attention (causal over the cache incl. this step's slot)
        hn = rmsnorm(h, lp["ln1"]["scale"], cfg.norm_eps)
        a = lp["attn"]
        q = _heads(cfg, linear(hn, a["wq"]), B, 1)
        k1 = _heads(cfg, linear(hn, a["wk"]), B, 1).transpose(0, 2, 1, 3)
        v1 = _heads(cfg, linear(hn, a["wv"]), B, 1).transpose(0, 2, 1, 3)
        kl = jax.lax.dynamic_update_slice(kl, k1, (0, 0, step, 0))
        vl = jax.lax.dynamic_update_slice(vl, v1, (0, 0, step, 0))
        h = h + linear(_attend(q, kl, vl, self_mask, self_bias), a["wo"])
        # cross-attention (no positional bias)
        hn = rmsnorm(h, lp["ln2"]["scale"], cfg.norm_eps)
        c = lp["cross"]
        qc = _heads(cfg, linear(hn, c["wq"]), B, 1)
        h = h + linear(_attend(qc, ck, cv, cross_mask, None), c["wo"])
        # feed-forward
        h = h + _mlp(cfg, lp["mlp"], rmsnorm(h, lp["ln3"]["scale"], cfg.norm_eps))
        return h, (kl, vl)

    x, (k_new, v_new) = jax.lax.scan(
        body, x, (dec["layers"], self_k, self_v, cross_k, cross_v)
    )
    x = rmsnorm(x, dec["final_norm"]["scale"], cfg.norm_eps)
    if cfg.tie_embeddings:
        # HF T5: tied head scales hidden by d_model**-0.5 before the projection
        x = x * (cfg.hidden_size**-0.5)
        logits = jax.lax.dot_general(
            x[:, 0, :], params["embed_tokens"].T,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    else:  # WOQ-dispatching (flan untied head quantizes with the stacks)
        from lia_tpu.ops.quant import is_quantized, quantized_matmul

        w = params["lm_head"]
        if is_quantized(w):
            logits = quantized_matmul(x[:, 0, :], w).astype(jnp.float32)
        else:
            logits = jax.lax.dot_general(
                x[:, 0, :], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return logits, k_new, v_new
