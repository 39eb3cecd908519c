"""GIT (GenerativeImage2Text) — image-conditioned causal text decoder.

Reference support surface: MODEL_CLASSES["git"] in the example runners
(examples/.../single_instance/run_generation.py:47, run_quantization.py:245)
with its own load class (examples/.../utils/model_class/git.py); IPEX patches
``GitVisionEncoder``/GIT attention like the other families.

Architecture (HF modeling_git): a CLIP-ViT image encoder
(:mod:`lia_tpu.models.vision`), a linear+LN visual projection, and a BERT-style
**post-norm** text decoder over the concatenation ``[image tokens | text]``
with a prefix-LM mask — image tokens attend only among themselves, text tokens
attend to all image tokens plus causally to text (HF
``GitModel.create_attention_mask``). Learned absolute positions apply to TEXT
tokens only (image tokens consume no position ids).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lia_tpu.config import ModelConfig
from lia_tpu.models.transformer import linear as qlinear  # WOQ-dispatching
from lia_tpu.models.vision import _linear, _ln, vit_encode

Params = Dict[str, Any]
NEG_INF = jnp.float32(-1e9)


def image_prefix(cfg: ModelConfig, params: Params, pixels: jnp.ndarray) -> jnp.ndarray:
    """Pixels → projected image tokens [B, 1+np, H] (CLS kept, HF GIT)."""
    final, _ = vit_encode(
        params["vision"], pixels, cfg.vision_heads, cfg.vision_patch,
        eps=cfg.vision_norm_eps,
    )
    x = _linear(final.astype(jnp.dtype(cfg.dtype)), params["proj"]["w"], params["proj"]["b"])
    return _ln(params["proj"]["ln"], x, cfg.vision_norm_eps)


def _attend_rows(q, k, v, mask, n_heads):
    """Standard scaled MHA over explicit [B, Sq, Skv] mask; head-major K/V."""
    B, Sq, H = q.shape
    D = H // n_heads
    qh = q.reshape(B, Sq, n_heads, D)
    scores = jnp.einsum(
        "bqnd,bnkd->bnqk", qh.astype(jnp.float32) * (D**-0.5), k.astype(jnp.float32)
    )
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnqk,bnkd->bqnd", probs, v.astype(jnp.float32))
    return out.reshape(B, Sq, H).astype(q.dtype)


def _layer(cfg: ModelConfig, lp: Params, x, k_all, v_all, mask):
    """Post-norm BERT block given this layer's full K/V planes."""
    a = lp["attn"]
    attn_out = _attend_rows(
        qlinear(x, a["wq"], a["bq"]), k_all, v_all, mask, cfg.num_heads
    )
    x = _ln(lp["ln1"], x + qlinear(attn_out, a["wo"], a["bo"]), cfg.norm_eps)
    m = qlinear(x, lp["mlp"]["w1"], lp["mlp"]["b1"])
    m = qlinear(jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(x.dtype),
                lp["mlp"]["w2"], lp["mlp"]["b2"])
    return _ln(lp["ln2"], x + m, cfg.norm_eps)


def _kv(cfg: ModelConfig, lp: Params, x):
    B, S, H = x.shape
    a = lp["attn"]
    k = qlinear(x, a["wk"], a["bk"]).reshape(B, S, cfg.num_heads, cfg.head_dim)
    v = qlinear(x, a["wv"], a["bv"]).reshape(B, S, cfg.num_heads, cfg.head_dim)
    return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)


def prefill(
    cfg: ModelConfig,
    params: Params,
    img_tokens: jnp.ndarray,  # [B, S_img, H] projected image prefix
    tokens: jnp.ndarray,  # [B, S_txt] right-padded text (BOS first)
    text_mask: jnp.ndarray,  # [B, S_txt] bool
    cache_len: int,  # total preallocated sequence slots (≥ S_img+S_txt+new)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run image prefix + text prompt; returns (last-token logits [B, V],
    k_cache, v_cache [L, B, N, cache_len, D])."""
    B, S_txt = tokens.shape
    S_img = img_tokens.shape[1]
    S = S_img + S_txt
    pos = jnp.arange(S_txt, dtype=jnp.int32)
    te = jnp.take(params["embed_tokens"], tokens, axis=0, mode="clip")
    te = te + jnp.take(params["embed_positions"], pos, axis=0)[None]
    te = _ln(params["embed_ln"], te.astype(jnp.dtype(cfg.dtype)), cfg.norm_eps)
    x = jnp.concatenate([img_tokens, te], axis=1)

    # prefix-LM mask: image rows see image cols only; text rows see image cols
    # + causal text (HF GitModel.create_attention_mask). Padded text slots are
    # masked as keys.
    causal = jnp.tril(jnp.ones((S_txt, S_txt), jnp.bool_))
    img_rows = jnp.concatenate(
        [jnp.ones((S_img, S_img), jnp.bool_), jnp.zeros((S_img, S_txt), jnp.bool_)], 1
    )
    txt_rows = jnp.concatenate([jnp.ones((S_txt, S_img), jnp.bool_), causal], 1)
    mask = jnp.concatenate([img_rows, txt_rows], 0)[None]  # [1, S, S]
    key_valid = jnp.concatenate(
        [jnp.ones((B, S_img), jnp.bool_), text_mask], axis=1
    )
    mask = mask & key_valid[:, None, :]

    L, N, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
    k_cache = jnp.zeros((L, B, N, cache_len, D), jnp.dtype(cfg.dtype))
    v_cache = jnp.zeros_like(k_cache)

    def body(h, per_layer):
        lp, kc, vc = per_layer
        k, v = _kv(cfg, lp, h)
        kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, 0, 0))
        h = _layer(cfg, lp, h, k, v, mask)
        return h, (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(body, x, (params["layers"], k_cache, v_cache))
    logits = qlinear(x[:, -1:, :], params["output"]["w"], params["output"]["b"])
    return logits[:, 0, :].astype(jnp.float32), k_cache, v_cache


def decode_step(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, 1]
    text_pos: jnp.ndarray,  # scalar int32 — position id of this text token
    seq_pos: jnp.ndarray,  # scalar int32 — slot in the full [img|text] sequence
    k_cache: jnp.ndarray,  # [L, B, N, S_max, D]
    v_cache: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step; attends over slots [0, seq_pos]."""
    B = tokens.shape[0]
    S_max = k_cache.shape[3]
    te = jnp.take(params["embed_tokens"], tokens, axis=0, mode="clip")
    te = te + params["embed_positions"][text_pos][None, None]
    x = _ln(params["embed_ln"], te.astype(jnp.dtype(cfg.dtype)), cfg.norm_eps)

    slots = jnp.arange(S_max, dtype=jnp.int32)
    mask = (slots[None, None, :] <= seq_pos) & jnp.ones((B, 1, 1), jnp.bool_)

    def body(h, per_layer):
        lp, kc, vc = per_layer
        k1, v1 = _kv(cfg, lp, h)
        kc = jax.lax.dynamic_update_slice(kc, k1, (0, 0, seq_pos, 0))
        vc = jax.lax.dynamic_update_slice(vc, v1, (0, 0, seq_pos, 0))
        h = _layer(cfg, lp, h, kc, vc, mask)
        return h, (kc, vc)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params["layers"], k_cache, v_cache))
    logits = qlinear(x, params["output"]["w"], params["output"]["b"])
    return logits[:, 0, :].astype(jnp.float32), k_new, v_new
