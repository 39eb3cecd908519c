"""Functional transformer decoder core shared by the OPT and Llama families.

TPU-first redesign of the reference's module-surgery stack: where IPEX patches HF
modules in place (`_IPEXAttentionRef`/`_IPEXDecoderLayerRef`,
intel_extension_for_pytorch/transformers/optimize.py:118-437) and LIA re-implements
`OPTDecoder.forward` as an imperative CUDA-stream scheduler (lia/modeling_opt.py:1021),
here the model is a pure function over an explicit parameter pytree:

- layer parameters are **stacked** with a leading ``[L, ...]`` axis, so the resident
  fast path is a single ``lax.scan`` over layers (one XLA compilation, full fusion),
  and the streamed path (weight tiering) just slices one layer's subtree out —
  the same pytree serves both execution modes;
- prefill and decode are separate jitted functions with static shapes (bucketed
  lengths replace the reference's preallocated ``tgt_len+max_new_tokens`` caches,
  lia/modeling_opt.py:1277-1279);
- OPT quirks (offset-2 learned positions computed from the attention mask,
  lia/modeling_opt.py:357-378; opt-350m word_embed_proj; pre/post-LN) are expressed
  in config, not subclassing.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lia_tpu.config import Activation, ModelConfig, Norm
from lia_tpu.ops import attention as att
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.ops.norms import layernorm, rmsnorm
from lia_tpu.ops.rope import apply_rope

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Linear / norm helpers
# ---------------------------------------------------------------------------


def linear(
    x: jnp.ndarray, w: Any, b: Optional[jnp.ndarray] = None,
    tp_split: Optional[str] = None,
) -> jnp.ndarray:
    """x @ w (+ b) with fp32 MXU accumulation; returns x.dtype.

    ``w`` may be a raw ``[in, out]`` array or a quantized weight record (dispatched
    in :mod:`lia_tpu.ops.quant`) — the single dispatch point that lets WOQ slot in
    underneath every projection, mirroring how the reference routes every linear
    through tpp_linear*/woq_linear* (models/cpu/fusions/linear_fusion.py:14-422).

    ``tp_split`` names the weight's TP sharding ("col": output dim on "model";
    "row": input dim on "model") so the WOQ kernels can run per shard under a
    mesh (quant._tp_quantized_matmul) — the call site knows the split, the
    trace-time array does not.
    """
    from lia_tpu.ops.quant import is_quantized, quantized_matmul

    if is_quantized(w):
        y = quantized_matmul(x, w, tp_split=tp_split)
    else:
        y = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def norm(cfg: ModelConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.norm == Norm.RMSNORM:
        return rmsnorm(x, p["scale"], cfg.norm_eps)
    return layernorm(x, p["scale"], p["bias"], cfg.norm_eps)


def activation_fn(cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.activation == Activation.RELU:
        return jax.nn.relu(x)
    if cfg.activation == Activation.GELU:  # exact erf gelu (HF "gelu")
        return jax.nn.gelu(x, approximate=False)
    if cfg.activation == Activation.GELU_NEW:  # tanh approx (HF "gelu_new", gpt-j)
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------


def qkv_project(
    cfg: ModelConfig, lp: Params, x: jnp.ndarray, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project hidden → (q, k, v) heads and apply RoPE if configured.

    x: [B, S, H]; positions: [B, S] logical token positions (pad-aware).
    """
    B, S, _ = x.shape
    a = lp["attn"]
    if "wqkv" in a:
        # fused projection (ops/fuse.py): one [H, qd+2*kd] matmul, sliced apart
        qd = cfg.num_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim
        y = linear(x, a["wqkv"], a.get("bqkv"), tp_split="col")
        q = y[..., :qd].reshape(B, S, cfg.num_heads, cfg.head_dim)
        k = y[..., qd : qd + kd].reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
        v = y[..., qd + kd :].reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = linear(x, a["wq"], a.get("bq"), tp_split="col").reshape(B, S, cfg.num_heads, cfg.head_dim)
        k = linear(x, a["wk"], a.get("bk"), tp_split="col").reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
        v = linear(x, a["wv"], a.get("bv"), tp_split="col").reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    if cfg.rope:
        q = apply_rope(q, positions, cfg.rope_theta, cfg.rotary_dim, cfg.rope_interleaved)
        k = apply_rope(k, positions, cfg.rope_theta, cfg.rotary_dim, cfg.rope_interleaved)
    # K/V to head-major [B, N_kv, S, D] — the cache/attention layout
    return q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)


def moe_mlp(cfg: ModelConfig, m: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Mixture-of-experts SwiGLU block (Mixtral ``block_sparse_moe``).

    TPU-first redesign of the reference's fused MoE ops
    (csrc/cpu/aten/MoE.cpp ``mixtral_moe*`` — per-expert token-index gather
    lists, i.e. data-dependent shapes XLA cannot compile): here every token's
    FFN output is a dense batched-expert einsum weighted by a [T, E] combine
    matrix that is zero outside the router's top-k — static shapes, exact
    routing (no capacity drops). Decode (T = B) is weight-bandwidth-bound, so
    computing all experts costs nothing extra; prefill pays E/k× MLP FLOPs for
    compile stability. Expert weights are stacked [E, K, N] (quantized leaves
    dequantize on the way into the dot); TP shards the F axis, EP the E axis
    (parallel/sharding.py).
    """
    from lia_tpu.ops.quant import is_quantized, dequantize

    B, S, H = x.shape
    T = B * S
    xt = x.reshape(T, H)
    router_logits = linear(xt, m["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)  # [T, E]
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topw = topw / jnp.maximum(jnp.sum(topw, -1, keepdims=True), 1e-9)  # renorm (HF)
    comb = jnp.sum(
        jax.nn.one_hot(topi, cfg.num_experts, dtype=jnp.float32) * topw[..., None],
        axis=1,
    )  # [T, E] — zero outside top-k

    def ew(w):
        return dequantize(w, x.dtype) if is_quantized(w) else w

    gate = jnp.einsum(
        "th,ehf->etf", xt, ew(m["wg"]), preferred_element_type=jnp.float32
    )
    up = jnp.einsum(
        "th,ehf->etf", xt, ew(m["w1"]), preferred_element_type=jnp.float32
    )
    inter = (jax.nn.silu(gate) * up).astype(x.dtype)
    y = jnp.einsum(
        "etf,efh->eth", inter, ew(m["w2"]), preferred_element_type=jnp.float32
    )
    out = jnp.einsum("te,eth->th", comb, y)
    return out.astype(x.dtype).reshape(B, S, H)


def mlp(cfg: ModelConfig, lp: Params, x: jnp.ndarray) -> jnp.ndarray:
    m = lp["mlp"]
    if cfg.num_experts:
        return moe_mlp(cfg, m, x)
    if cfg.activation == Activation.SILU:  # SwiGLU (llama)
        if "wg1" in m:  # fused gate|up (ops/fuse.py)
            y = linear(x, m["wg1"], None).astype(jnp.float32)
            gate = jax.nn.silu(y[..., : cfg.ffn_size])
            up = y[..., cfg.ffn_size :]
        else:
            gate = jax.nn.silu(linear(x, m["wg"], None, tp_split="col").astype(jnp.float32))
            up = linear(x, m["w1"], None, tp_split="col").astype(jnp.float32)
        return linear((gate * up).astype(x.dtype), m["w2"], m.get("b2"), tp_split="row")
    h = activation_fn(cfg, linear(x, m["w1"], m.get("b1"), tp_split="col"))
    return linear(h, m["w2"], m.get("b2"), tp_split="row")


# The layer is split at the attention boundary into composable pieces so the
# policy scheduler can place each operator group independently (the TPU analog of
# the reference's per-operator policy dispatch inside OPTDecoderLayer_forward,
# models/reference/modules/decoder.py:172-335: gpu_ln/gpu_linear vs AMX ops).
# attn_in → (attention core: cache update + attend) → attn_post_mlp.


def attn_in(cfg: ModelConfig, lp: Params, x: jnp.ndarray, positions: jnp.ndarray):
    """LN1 + QKV projection (+RoPE). Returns (q, k, v) with head-major k/v."""
    with jax.named_scope("attn_in"):
        h = norm(cfg, lp["ln1"], x) if cfg.pre_norm else x
        return qkv_project(cfg, lp, h, positions)


def attn_core_prefill(
    cfg: ModelConfig,
    q: jnp.ndarray,  # [B, S, N, D]
    k: jnp.ndarray,  # [B, N_kv, S, D] fresh keys (head-major)
    v: jnp.ndarray,
    k_layer: jnp.ndarray,  # [B, N_kv, S_max, D] cache plane
    v_layer: jnp.ndarray,
    start: jnp.ndarray,
    attn_ctx: att.PrefillAttn,
):
    """Prompt-chunk attention over the fresh chunk + cache write-back."""
    attn_out = att.attend_prefill(q, k, v, attn_ctx)
    k_layer, v_layer = kvc.update_layer(k_layer, v_layer, k, v, start)
    return attn_out, k_layer, v_layer


def attn_core_decode(
    cfg: ModelConfig,
    q: jnp.ndarray,  # [B, 1, N, D]
    k: jnp.ndarray,  # [B, N_kv, 1, D] fresh key (head-major)
    v: jnp.ndarray,
    k_layer: jnp.ndarray,
    v_layer: jnp.ndarray,
    start: jnp.ndarray,
    attn_ctx: att.DecodeAttn,
):
    """Decode attention over the full cache (update then attend).

    This is the piece policies 1/2/4 run on the host over host-resident KV
    (reference: attentions.py:421-424 ships q/k/v to CPU, KV never leaves it).
    """
    k_layer, v_layer = kvc.update_layer(k_layer, v_layer, k, v, start)
    attn_out = att.attend_decode(q, k_layer, v_layer, attn_ctx)
    return attn_out, k_layer, v_layer


def attn_post_mlp(cfg: ModelConfig, lp: Params, residual: jnp.ndarray, attn_out):
    """Out-proj + residual + LN2 + MLP + residual (post-attention operator group)."""
    with jax.named_scope("attn_post_mlp"):
        return _attn_post_mlp(cfg, lp, residual, attn_out)


def _attn_post_mlp(cfg: ModelConfig, lp: Params, residual: jnp.ndarray, attn_out):
    B, S = attn_out.shape[:2]
    h = linear(attn_out.reshape(B, S, -1), lp["attn"]["wo"], lp["attn"].get("bo"),
               tp_split="row")
    if cfg.parallel_residual:
        # single residual stream: out = x + attn(ln1(x)) + mlp(ln_mlp(x)), where
        # ln_mlp is ln1 itself (gpt-j / falcon-7b shared norm) or a separate ln2
        # (gpt-neox use_parallel_residual). HF GPTJBlock / GPTNeoXLayer.
        mlp_norm = lp["ln1"] if cfg.parallel_shared_norm else lp["ln2"]
        m = mlp(cfg, lp, norm(cfg, mlp_norm, residual))
        return residual + h + m
    x = residual + h
    if not cfg.pre_norm:
        x = norm(cfg, lp["ln1"], x)

    if cfg.pre_norm and _fused_mlp_viable(cfg, lp, x):
        return _fused_mlp_call(cfg, lp, x)

    residual = x
    h = norm(cfg, lp["ln2"], x) if cfg.pre_norm else x
    h = mlp(cfg, lp, h)
    x = residual + h
    if not cfg.pre_norm:
        x = norm(cfg, lp["ln2"], x)
    return x


def _fused_mlp_viable(cfg: ModelConfig, lp: Params, x: jnp.ndarray) -> bool:
    """One-launch MLP kernel gate: TPU, bf16 weights, small row count (decode),
    tile-legal shapes. ~5 XLA launches → 1 pallas_call (≈15µs/op on this rig)."""
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.quant import is_quantized

    if not dispatch.use_pallas() or not dispatch.fused_mlp_enabled():
        return False
    if dispatch.tp_mesh() is not None:  # fused-MLP kernel has no shard_map wrap
        return False
    m = lp["mlp"]
    if "w1" not in m:  # fused gate|up layout (ops/fuse.py) — kernel expects split
        return False
    if any(is_quantized(m.get(k)) for k in ("w1", "wg", "w2") if m.get(k) is not None):
        return False
    B, S, H = x.shape
    F = m["w1"].shape[-1]
    rows = B * S
    return rows <= 256 and H % 128 == 0 and F % 512 == 0


def _fused_mlp_call(cfg: ModelConfig, lp: Params, x: jnp.ndarray) -> jnp.ndarray:
    from lia_tpu.ops import dispatch
    from lia_tpu.ops.pallas_mlp import fused_mlp

    B, S, H = x.shape
    m = lp["mlp"]
    ln = lp["ln2"]
    swiglu = cfg.activation == Activation.SILU
    F = m["w1"].shape[-1]
    # bound double-buffered weight tiles to ~8 MB of VMEM
    k_mats = 3 if swiglu else 2
    cap = max(512, (8 * 2**20) // (k_mats * H * 2 * 2) // 512 * 512)
    bf = dispatch.pick_block(F, cap, minimum=512) or F
    y = fused_mlp(
        x.reshape(B * S, H),
        ln["scale"],
        ln.get("bias"),
        m["w1"],
        m.get("b1"),
        m.get("wg") if swiglu else None,
        m["w2"],
        m.get("b2"),
        activation=cfg.activation.value,
        rms=cfg.norm == Norm.RMSNORM,
        eps=cfg.norm_eps,
        block_f=bf,
        interpret=dispatch.interpret_mode(),
    )
    return y.reshape(B, S, H)


def decoder_layer_prefill(
    cfg: ModelConfig,
    lp: Params,
    x: jnp.ndarray,  # [B, S, H]
    k_layer: jnp.ndarray,  # [B, N_kv, S_max, D] (head-major)
    v_layer: jnp.ndarray,
    start: jnp.ndarray,  # scalar write offset into the cache
    attn_ctx: att.PrefillAttn,
    positions: jnp.ndarray,  # [B, S]
):
    """One decoder layer over a full (bucketed) prompt chunk (all-TPU composition)."""
    q, k, v = attn_in(cfg, lp, x, positions)
    attn_out, k_layer, v_layer = attn_core_prefill(
        cfg, q, k, v, k_layer, v_layer, start, attn_ctx
    )
    x = attn_post_mlp(cfg, lp, x, attn_out)
    return x, k_layer, v_layer


def decoder_layer_decode(
    cfg: ModelConfig,
    lp: Params,
    x: jnp.ndarray,  # [B, 1, H]
    k_layer: jnp.ndarray,  # [B, N_kv, S_max, D] (head-major)
    v_layer: jnp.ndarray,
    start: jnp.ndarray,  # scalar write slot (== cache length before this token)
    attn_ctx: att.DecodeAttn,
    positions: jnp.ndarray,  # [B, 1]
):
    """One decoder layer for a single decode step (all-TPU composition).

    Parity: the decode path of _OPTAttention_forward + masked_multihead_self_attention
    (models/reference/modules/attentions.py:312-557; MaskedMultiHeadAttentionKrnl.cpp).
    """
    q, k, v = attn_in(cfg, lp, x, positions)
    attn_out, k_layer, v_layer = attn_core_decode(
        cfg, q, k, v, k_layer, v_layer, start, attn_ctx
    )
    x = attn_post_mlp(cfg, lp, x, attn_out)
    return x, k_layer, v_layer


# ---------------------------------------------------------------------------
# Embedding / head
# ---------------------------------------------------------------------------


def embed(
    cfg: ModelConfig, params: Params, tokens: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """Token + (learned position) embedding. positions: [B, S] logical positions."""
    # mode="clip": jnp.take's jit default fills OOB rows with NaN, and a pad id
    # outside the vocab (e.g. GPT-J's 50256 against a truncated test vocab) would
    # poison valid rows through attention (0-weight × NaN V = NaN). Clamped pad
    # embeddings are masked out of attention anyway.
    x = jnp.take(params["embed_tokens"], tokens, axis=0, mode="clip")
    if "proj_in" in params:
        x = linear(x, params["proj_in"])
    if cfg.embed_layernorm:  # bloom: word_embeddings_layernorm
        x = norm(cfg, params["embed_norm"], x)
    if cfg.learned_pos:
        # OPT offset-2 quirk: learned table row = position + 2; pad slots clamp to
        # row `pos_offset - 1` (HF uses cumsum(mask)-1 → -1+2 = 1 for pads, which is
        # masked out of attention anyway). (lia/modeling_opt.py:357-378)
        pos = jnp.maximum(positions, -1) + cfg.pos_offset
        x = x + jnp.take(params["embed_positions"], pos, axis=0, mode="clip")
    return x.astype(jnp.dtype(cfg.dtype))


def lm_head(cfg: ModelConfig, params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Hidden → vocab logits (fp32). x: [B, S, H] (callers slice to last token first —
    the `lm_head_generation` parity trick, models/reference/models.py:424-431)."""
    with jax.named_scope("lm_head"):
        return _lm_head(cfg, params, x)


def _lm_head(cfg: ModelConfig, params: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "final_norm" in params:
        x = norm(cfg, params["final_norm"], x)
    if "proj_out" in params:
        x = linear(x, params["proj_out"])
    if "lm_head" in params:
        from lia_tpu.ops.quant import is_quantized, quantized_matmul

        w = params["lm_head"]
        if is_quantized(w):
            # WOQ lm_head (reference WOQ converts lm_head like any Linear);
            # the vocab projection is the single largest per-step HBM read
            # after the decoder stack, so it quantizes with the layers.
            y = quantized_matmul(x, w, tp_split="col")  # vocab split
            if y.shape[-1] != cfg.vocab_size:
                # quantize_head_2d pads the vocab to the W4A8 kernel's 128
                # tiling; the pad columns are exact zeros but MUST be sliced
                # off before bias/sampling (a 0 logit can win an argmax)
                y = y[..., : cfg.vocab_size]
        else:
            y = jax.lax.dot_general(
                x, w, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:  # tied embeddings — the fp table also feeds the token gather
        w = params["embed_tokens"].T
        y = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if "lm_head_bias" in params:  # gpt-j ships a bias on lm_head
        y = y + params["lm_head_bias"].astype(jnp.float32)
    return y


# ---------------------------------------------------------------------------
# Full-model prefill / decode (resident fast path: scan over stacked layers)
# ---------------------------------------------------------------------------


def run_prefill_layers(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, S] left-padded to the bucket
    input_mask: jnp.ndarray,  # [B, S] bool
    cache: kvc.KVCache,
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, H] — precomputed
    # embeddings override the token gather (multimodal prefixes: LLaVA splices
    # projected image patches into the text embedding sequence)
) -> Tuple[jnp.ndarray, kvc.KVCache]:
    """Embed + all decoder layers; returns (hidden [B, S, H], updated cache)."""
    positions = jnp.cumsum(input_mask.astype(jnp.int32), axis=1) - 1  # pad-aware
    x = embed(cfg, params, tokens, positions) if inputs_embeds is None else inputs_embeds
    bias = att.alibi_prefill_bias(cfg.num_heads, positions, input_mask) if cfg.alibi else None
    ctx = att.prefill_attn_ctx(input_mask, cfg.sliding_window, bias=bias)
    start = cache.length

    def body(h, per_layer):
        lp, kl, vl = per_layer
        h, kl, vl = decoder_layer_prefill(cfg, lp, h, kl, vl, start, ctx, positions)
        return h, (kl, vl)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    cache = cache._replace(k=k_new, v=v_new)
    cache = kvc.advance(cache, input_mask, tokens.shape[1])
    return x, cache


def prefill(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, S] left-padded to the bucket
    input_mask: jnp.ndarray,  # [B, S] bool
    cache: kvc.KVCache,
) -> Tuple[jnp.ndarray, kvc.KVCache]:
    """Run the prompt; returns (last-token logits [B, V], updated cache).

    Only the last position goes through the lm_head — the `lm_head_generation`
    parity trick (models/reference/models.py:424-431)."""
    x, cache = run_prefill_layers(cfg, params, tokens, input_mask, cache)
    logits = lm_head(cfg, params, x[:, -1:, :])[:, 0, :]
    return logits, cache


def prefill_embeds(
    cfg: ModelConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,  # [B, S, H] left-padded to the bucket
    input_mask: jnp.ndarray,  # [B, S] bool
    cache: kvc.KVCache,
) -> Tuple[jnp.ndarray, kvc.KVCache]:
    """:func:`prefill` over precomputed embeddings (LLaVA multimodal prefix —
    the analog of the reference's prepare_inputs_labels_for_multimodal_llavallama,
    optimize.py:188,673)."""
    x, cache = run_prefill_layers(
        cfg, params, jnp.zeros(input_mask.shape, jnp.int32), input_mask, cache,
        inputs_embeds=inputs_embeds,
    )
    logits = lm_head(cfg, params, x[:, -1:, :])[:, 0, :]
    return logits, cache


def prefill_chunk(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, C] — the next C prompt tokens
    chunk_mask: jnp.ndarray,  # [B, C] bool — False ONLY as a prefix of the
    # FIRST chunk (left-padding keeps cache validity contiguous [start, length))
    cache: kvc.KVCache,
) -> Tuple[jnp.ndarray, kvc.KVCache]:
    """Process ONE chunk of a longer prompt against the existing cache.

    Chunked prefill: admission/serving can interleave prompt chunks with decode
    steps (bounding TTFT inflation for running requests), and prompts longer
    than any bucket stream through in slices. Each layer writes the chunk into
    its cache plane, then attends over [start, base + C) — past + chunk — via
    :func:`lia_tpu.ops.attention.attend_prefill_cached`. Returns the chunk's
    last-token logits and the updated cache. The reference prefills whole
    prompts only (lia/modeling_opt.py minibatches over BATCH, not sequence).
    """
    B, C = tokens.shape
    base = cache.length
    # logical positions continue from the REAL (non-pad) tokens cached so far
    prev_real = jnp.sum(cache.mask.astype(jnp.int32), axis=1)  # [B]
    positions = prev_real[:, None] + jnp.cumsum(chunk_mask.astype(jnp.int32), axis=1) - 1
    x = embed(cfg, params, tokens, positions)
    slot_mask = jax.lax.dynamic_update_slice(cache.mask, chunk_mask, (0, base))
    bias = att.alibi_slot_bias(cfg.num_heads, slot_mask) if cfg.alibi else None

    def body(h, per_layer):
        lp, kl, vl = per_layer
        residual = h
        q, k, v = attn_in(cfg, lp, h, positions)
        kl, vl = kvc.update_layer(kl, vl, k, v, base)
        attn_out = att.attend_prefill_cached(
            q, kl, vl, base, slot_mask, cfg.sliding_window, bias=bias
        )
        h = attn_post_mlp(cfg, lp, residual, attn_out)
        return h, (kl, vl)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    cache = cache._replace(k=k_new, v=v_new)
    cache = kvc.advance(cache, chunk_mask, C)
    logits = lm_head(cfg, params, x[:, -1:, :])[:, 0, :]
    return logits, cache


def score_logprobs(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, S]
    input_mask: jnp.ndarray,  # [B, S] bool
    cache: kvc.KVCache,
) -> jnp.ndarray:
    """Per-position next-token log-probs for scoring (lm-eval loglikelihood path,
    reference: single_instance/run_accuracy.py BaseLM adapter).

    Returns [B, S, V] log-probs where entry [b, t] scores token[b, t+1].
    """
    x, _ = run_prefill_layers(cfg, params, tokens, input_mask, cache)
    logits = lm_head(cfg, params, x)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)




def _split_stacked_quant(layer_params):
    """(xs_tree, rebuild(idx, xs_slice)) — pull stacked W4A8 weights out of
    the scan xs so they ride as closure constants addressed through
    :class:`~lia_tpu.ops.quant.QuantizedWeightRef` (scalar-prefetch Pallas
    kernel reads blocks straight from the stacked buffer). Scanning them as
    xs would hand the pallas_call a materialized per-layer slice — a hidden
    copy ≈ 2.6× the int4 bytes that made model-level W4A8 lose to int8-dyn
    (RESULTS.md r4). Formats without a stacked kernel scan as before."""
    from lia_tpu.ops import quant as Q

    pulled = False

    def strip(node):
        nonlocal pulled
        if Q.stackable_ref(node):
            pulled = True
            return jnp.zeros((node.q.shape[0], 1), jnp.int8)  # cheap xs stub
        return node

    xs = jax.tree.map(strip, layer_params, is_leaf=Q.is_quantized)
    if not pulled:
        return layer_params, lambda idx, sl: sl

    def rebuild(idx, sliced):
        def f(orig, sl):
            if Q.stackable_ref(orig):
                return Q.QuantizedWeightRef(orig.q, orig.s, orig.fmt, orig.z, idx)
            return sl

        return jax.tree.map(f, layer_params, sliced, is_leaf=Q.is_quantized)

    return xs, rebuild


def decode_layers_scan(
    cfg: ModelConfig,
    layer_params: Params,  # stacked [n, ...]
    x: jnp.ndarray,  # [B, 1, H]
    ck,  # [n, B, N_kv, S_max, D] stacked K cache (array or QuantizedKV)
    cv,
    start,  # scalar or [B] write offset
    ctx: att.DecodeAttn,
    positions: jnp.ndarray,  # [B, 1]
    n_layers: int,
):
    """Scan all decode layers; the cache is read-only inside the scan.

    Each layer's attention merges the fresh token in-kernel
    (:func:`lia_tpu.ops.attention.attend_decode_fresh`) instead of writing the
    cache first; the scan stacks every layer's fresh K/V as ys and ONE
    ``dynamic_update_slice`` per step commits them all
    (:func:`lia_tpu.ops.kv_cache.write_token_all`). This trades 2 cache-write
    ops per LAYER for 2 per STEP — significant on hardware where every op
    carries ~15µs launch overhead. ``ctx``/``start`` describe the cache BEFORE
    this token (past tokens only)."""
    from lia_tpu.ops.quant import is_quantized_kv, quantize_kv

    quantized = is_quantized_kv(ck)
    xs, rebuild = _split_stacked_quant(layer_params)

    def body(h, inputs):
        lp, idx = inputs
        lp = rebuild(idx, lp)
        residual = h
        q, k, v = attn_in(cfg, lp, h, positions)
        if quantized:
            k, v = quantize_kv(k), quantize_kv(v)
        attn_out = att.attend_decode_fresh(q, k, v, ck, cv, idx, ctx)
        h = attn_post_mlp(cfg, lp, residual, attn_out)
        return h, (k, v)

    x, (k_stack, v_stack) = jax.lax.scan(
        body, x, (xs, jnp.arange(n_layers, dtype=jnp.int32))
    )
    ck = kvc.write_token_all(ck, k_stack, start)
    cv = kvc.write_token_all(cv, v_stack, start)
    return x, ck, cv


def beam_decode_layers_scan(
    cfg: ModelConfig,
    layer_params: Params,
    x: jnp.ndarray,  # [B0*nb, 1, H]
    cache: "kvc.BeamKVCache",
    bias,  # [B0*nb, N, S_p + T_max + 1] ALiBi bias or None
    positions: jnp.ndarray,  # [B0*nb, 1]
    n_layers: int,
):
    """Scan all decode layers over the grouped beam cache (read-only inside the
    scan; one tail commit per step, same trade as :func:`decode_layers_scan`)."""
    from lia_tpu.ops.quant import dequantize_kv, is_quantized_kv, quantize_kv

    quantized = is_quantized_kv(cache.tail_k)

    def body(h, inputs):
        lp, idx = inputs
        residual = h
        q, k, v = attn_in(cfg, lp, h, positions)
        if quantized:
            # quantize first so attention sees exactly what later steps will
            # read back from the tail (same convention as decode_layers_scan)
            kq, vq = quantize_kv(k), quantize_kv(v)
            kf, vf = dequantize_kv(kq, h.dtype), dequantize_kv(vq, h.dtype)
        else:
            kq, vq, kf, vf = k, v, k, v
        attn_out = att.attend_decode_beam(q, kf, vf, cache, idx, bias=bias)
        h = attn_post_mlp(cfg, lp, residual, attn_out)
        return h, (kq, vq)

    x, (k_stack, v_stack) = jax.lax.scan(
        body, x, (layer_params, jnp.arange(n_layers, dtype=jnp.int32))
    )
    cache = kvc.beam_commit_token(cache, k_stack, v_stack)
    return x, cache


def _alibi_beam_bias(cfg: ModelConfig, cache: "kvc.BeamKVCache", positions: jnp.ndarray):
    """ALiBi key-positional bias over the beam cache's [prompt | tail | fresh]
    slot layout: [B0*nb, N, S_p + T_max + 1], or None for non-ALiBi models."""
    if not cfg.alibi:
        return None
    B = positions.shape[0]
    nb = cache.nb
    group = jnp.arange(B, dtype=jnp.int32) // nb
    pmask = jnp.take(cache.prompt_mask, group, axis=0)  # [B, S_p]
    prompt_pos = (jnp.cumsum(pmask.astype(jnp.int32), axis=1) - 1) * pmask
    real_len = jnp.sum(pmask.astype(jnp.int32), axis=1, keepdims=True)  # [B, 1]
    T_max = cache.tail_k.q.shape[3] if hasattr(cache.tail_k, "q") else cache.tail_k.shape[3]
    tail_pos = real_len + jnp.arange(T_max, dtype=jnp.int32)[None, :]
    key_pos = jnp.concatenate([prompt_pos, tail_pos, positions.astype(jnp.int32)], axis=1)
    return att.alibi_bias(att.alibi_slopes(cfg.num_heads), key_pos)


def beam_decode_step(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B0*nb, 1]
    positions: jnp.ndarray,  # [B0*nb, 1]
    cache: "kvc.BeamKVCache",
) -> Tuple[jnp.ndarray, "kvc.BeamKVCache"]:
    """One beam decode step over the grouped cache; returns (logits, cache)."""
    x = embed(cfg, params, tokens, positions)
    bias = _alibi_beam_bias(cfg, cache, positions)
    x, cache = beam_decode_layers_scan(
        cfg, params["layers"], x, cache, bias, positions, cfg.num_layers
    )
    logits = lm_head(cfg, params, x)[:, 0, :]
    return logits, cache


def _alibi_decode_bias(cfg: ModelConfig, cache: kvc.KVCache, positions: jnp.ndarray):
    """Key-positional ALiBi bias over cache slots for one decode step, with the
    fresh token's slot (at ``cache.length``) pre-filled with its logical
    position — the fresh-merge attention paths read it from there. ``positions``
    is [B, 1] int32. Returns [B, N, S_max] or None for non-ALiBi models."""
    if not cfg.alibi:
        return None
    return att.alibi_slot_bias(cfg.num_heads, cache.mask, cache.length, positions)


def decode_step(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, 1]
    positions: jnp.ndarray,  # [B, 1] logical positions of these tokens
    cache: kvc.KVCache,
) -> Tuple[jnp.ndarray, kvc.KVCache]:
    """One greedy/sampling decode step; returns (logits [B, V], updated cache)."""
    x = embed(cfg, params, tokens, positions)
    # ctx covers PAST tokens only; the fresh token is merged inside attention
    ctx = att.decode_attn_ctx(
        cache.mask, cache.length, cfg.sliding_window,
        bias=_alibi_decode_bias(cfg, cache, positions),
    )
    start = cache.length

    x, k_new, v_new = decode_layers_scan(
        cfg, params["layers"], x, cache.k, cache.v, start, ctx, positions,
        cfg.num_layers,
    )
    cache = cache._replace(k=k_new, v=v_new)
    cache = kvc.advance(cache, jnp.ones((tokens.shape[0], 1), jnp.bool_), 1)
    logits = lm_head(cfg, params, x)[:, 0, :]
    return logits, cache


def decode_step_ragged(
    cfg: ModelConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, 1]
    logical_pos: jnp.ndarray,  # [B] pad-aware logical positions of these tokens
    cache: kvc.KVCache,  # ragged: cache.length is [B] per-slot write positions
    active: jnp.ndarray,  # [B] bool — slots currently serving a sequence
) -> Tuple[jnp.ndarray, kvc.KVCache]:
    """One decode step over a ragged batch (continuous-batching mode).

    Unlike :func:`decode_step`, every slot has its own cache length; inactive
    slots still compute (static shapes) but neither their cache writes persist as
    valid slots nor do their lengths advance.
    """
    B = tokens.shape[0]
    x = embed(cfg, params, tokens, logical_pos[:, None])
    # ctx covers PAST tokens only; the fresh token is merged inside attention.
    # Inactive slots compute garbage attention (their outputs are discarded and
    # their mask/length never advance) — same as the previous per-layer path.
    ctx = att.decode_attn_ctx(
        cache.mask, cache.length, cfg.sliding_window,
        bias=_alibi_decode_bias(cfg, cache, logical_pos[:, None]),
    )
    start = cache.length  # [B] → ragged writes inside write_token_all

    x, k_new, v_new = decode_layers_scan(
        cfg, params["layers"], x, cache.k, cache.v, start, ctx,
        logical_pos[:, None], cfg.num_layers,
    )
    cache = cache._replace(k=k_new, v=v_new)
    cache = kvc.advance_ragged(cache, active)
    logits = lm_head(cfg, params, x)[:, 0, :]
    return logits, cache
