"""Parameter initialization and checkpoint I/O.

Covers the reference's checkpoint surface (SURVEY §5): HF ``from_pretrained``-style
loading (here: safetensors state dicts mapped into our pytree), the FlexGen-style
dummy-weight generator for giant configs
(examples/cpu/inference/python/llm/utils/opt-weight-gen.py:8-40), and native
save/load of (possibly quantized) parameter trees.

All loaders return **host-resident numpy trees** with layers stacked ``[L, ...]``:
host residency is the natural starting state for the tiered weight manager
(the CXL/DRAM analog), and ``jax.device_put`` of the whole tree is the resident path.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from lia_tpu.config import Activation, ModelConfig, Norm

Params = Dict[str, Any]

_DTYPES = {"bfloat16": np.dtype("float32"), "float32": np.dtype("float32")}


def _np_dtype(name: str):
    # numpy has no bfloat16; use ml_dtypes (shipped with jax)
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def init_dummy_params(
    cfg: ModelConfig, seed: int = 0, scale: float = 0.006, quant=None,
    meta: bool = False,
) -> Params:
    """Random weights for any config size (OPT-175B dummy-weight analog).

    Generated layer-group by layer-group to bound peak host memory; small init
    scale keeps logits finite for arbitrary depth. With ``quant`` (a QuantConfig),
    layer matmul weights are synthesized **directly in quantized form** (native
    randn_int8 — no multi-GB fp transient at 30B+ scale).

    ``meta=True`` skips value synthesis for the big stacked weights (zero-pages
    via ``np.zeros``) — shapes/dtypes/quant formats are exact, values are not.
    Used by :func:`device_dummy_params`, which regenerates every leaf on device
    anyway; a 7 GB host randn pass costs ~2 min on this host just to be thrown
    away. Small structural leaves (norms, the tied-head quantization decision)
    still run for real.
    """
    if cfg.encoder_decoder:
        return _init_dummy_t5(cfg, seed, scale)
    if cfg.family == "git":
        return _init_dummy_git(cfg, seed, scale)
    rng = np.random.default_rng(seed)
    dt = _np_dtype(cfg.dtype)
    H, F, L = cfg.hidden_size, cfg.ffn_size, cfg.num_layers
    E = cfg.embed_dim
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim
    _seed = [seed]

    def w(*shape):
        if meta:
            return np.zeros(shape, dt)
        if cfg.dtype == "bfloat16":
            # native multithreaded generator (liahost.cpp) — minutes→seconds at 30B+
            from lia_tpu import native

            _seed[0] += 1
            return native.randn_bf16(shape, _seed[0], scale)
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(dt)

    def wq(*shape):
        """Stacked [*lead, K, N] layer weight — quantized directly when requested
        (lead is [L] for dense layers, [L, E] for stacked experts)."""
        if quant is None or not quant.enabled:
            return w(*shape)
        from lia_tpu import native
        from lia_tpu.ops.quant import QuantizedWeight

        *lead, K, N = shape
        nl = int(np.prod(lead))
        g = K if quant.group_size <= 0 else quant.group_size
        _seed[0] += 1
        # one native fill over the stacked [prod(lead)*K, N] buffer: groups tile
        # evenly (nl*K/g == nl*ng), so no per-layer loop and no stack copy
        if quant.weight_dtype in ("int4", "nf4"):
            if quant.weight_dtype == "nf4":
                fmt4 = "woq_nf4"  # random nibbles are valid codebook indices
            else:
                fmt4 = "woq_int4_dyn" if quant.act_quant == "dynamic" else "woq_int4"
            if meta:
                return QuantizedWeight(
                    np.zeros((*lead, K // 2, N), np.uint8),
                    np.full((*lead, K // g, N), scale / 4.3205, np.float32), fmt4,
                )
            q, sarr = native.randn_int4(nl * K, N, g, _seed[0], scale)
            q = q.reshape(*lead, K // 2, N)
            sarr = sarr.reshape(*lead, K // g, N)
            return QuantizedWeight(q, sarr, fmt4)
        fmt8 = "woq_int8_dyn" if quant.act_quant == "dynamic" else "woq_int8"
        if meta:
            return QuantizedWeight(
                np.zeros((*lead, K, N), np.int8),
                np.full((*lead, K // g, N), scale * 3.0 / 127.0, np.float32), fmt8,
            )
        q, sarr = native.randn_int8(nl * K, N, g, _seed[0], scale)
        q = q.reshape(*lead, K, N)
        sarr = sarr.reshape(*lead, K // g, N)
        return QuantizedWeight(q, sarr, fmt8)

    def zeros(*shape):
        return np.zeros(shape, dt)

    def ones(*shape):
        return np.ones(shape, dt)

    def norm_p():
        p = {"scale": ones(L, H)}
        if cfg.norm == Norm.LAYERNORM:
            p["bias"] = zeros(L, H)
        return p

    attn: Params = {"wq": wq(L, H, QD), "wk": wq(L, H, KD), "wv": wq(L, H, KD), "wo": wq(L, QD, H)}
    if cfg.attn_bias:
        attn.update(bq=zeros(L, QD), bk=zeros(L, KD), bv=zeros(L, KD))
    if cfg.o_bias if cfg.o_bias is not None else cfg.attn_bias:  # qwen2: qkv bias, no bo
        attn["bo"] = zeros(L, H)
    if cfg.num_experts:
        # mixtral block-sparse MoE: router fp + experts stacked [L, E, K, N]
        Ex = cfg.num_experts
        mlp: Params = {
            "router": w(L, H, Ex),
            "wg": wq(L, Ex, H, F),
            "w1": wq(L, Ex, H, F),
            "w2": wq(L, Ex, F, H),
        }
    elif cfg.activation == Activation.SILU:
        mlp = {"wg": wq(L, H, F), "w1": wq(L, H, F), "w2": wq(L, F, H)}
    else:
        mlp = {"w1": wq(L, H, F), "w2": wq(L, F, H)}
        if cfg.mlp_bias:
            mlp.update(b1=zeros(L, F), b2=zeros(L, H))

    layers: Params = {"ln1": norm_p(), "attn": attn, "mlp": mlp}
    if not cfg.parallel_shared_norm:  # gpt-j/falcon-7b have no ln2 at all
        layers["ln2"] = norm_p()
    params: Params = {"embed_tokens": w(cfg.vocab_size, E), "layers": layers}
    if cfg.embed_layernorm:  # bloom word_embeddings_layernorm
        params["embed_norm"] = {"scale": np.ones((H,), dt), "bias": np.zeros((H,), dt)}
    if cfg.learned_pos:
        params["embed_positions"] = w(cfg.max_position_embeddings + cfg.pos_offset, H)
    if cfg.word_embed_proj_dim:
        params["proj_in"] = w(E, H)
        params["proj_out"] = w(H, E)
    if cfg.final_norm:
        fn = {"scale": np.ones((H,), dt)}
        if cfg.norm == Norm.LAYERNORM:
            fn["bias"] = np.zeros((H,), dt)
        params["final_norm"] = fn
    if not cfg.tie_embeddings:
        # quantize the untied lm_head like quantize_params does (same
        # divisibility guard), so dummy-weight engines match checkpoint-loaded
        # ones in footprint and per-step HBM traffic
        g_head = E if (quant is None or quant.group_size <= 0) else quant.group_size
        if quant is not None and quant.enabled and quant.quant_lm_head and E % g_head == 0:
            if quant.weight_dtype == "int4" and cfg.vocab_size % 128:
                # vocab fails the W4A8 kernel tiling: synthesize fp and run the
                # padding/fallback head quantizer (quant.quantize_head_2d)
                from lia_tpu.ops.quant import quantize_head_2d

                params["lm_head"] = quantize_head_2d(
                    np.asarray(w(E, cfg.vocab_size), np.float32), quant
                )
            else:
                params["lm_head"] = wq(E, cfg.vocab_size)
        else:
            params["lm_head"] = w(E, cfg.vocab_size)
        if cfg.lm_head_bias:
            params["lm_head_bias"] = np.zeros((cfg.vocab_size,), dt)
    elif quant is not None and quant.enabled and quant.quant_lm_head:
        # tied embeddings: add the quantized transposed head copy (see
        # quant.quantize_tied_head) so dummy engines match quantize_params'
        # footprint — the fp table stays for the gather, the head matmul
        # reads int8/int4 bytes instead of the full bf16 table per step
        from lia_tpu.ops.quant import quantize_tied_head

        params["lm_head"] = quantize_tied_head(params["embed_tokens"], quant)
    if cfg.family == "llava":  # vision tower + projector on top of the llama LM
        params["vision"] = _init_dummy_vit(cfg, rng, dt, scale)
        params["proj"] = {
            "w1": (rng.standard_normal((cfg.vision_hidden, H), np.float32) * scale).astype(dt),
            "b1": np.zeros((H,), dt),
            "w2": (rng.standard_normal((H, H), np.float32) * scale).astype(dt),
            "b2": np.zeros((H,), dt),
        }
    return params


def device_dummy_params(
    cfg: ModelConfig, seed: int = 0, scale: float = 0.006, quant=None
) -> Params:
    """Dummy parameter tree generated **directly on device** — zero H2D bytes.

    :func:`init_dummy_params` builds host arrays that then crawl through the
    host→device link (this rig's relay moves ~0.1 GB/s: OPT-6.7B int8 staged
    80 s in BENCH_r02, w4a8 40 s in BENCH_r03 — before a single measured
    token). For benchmarks the *values* are irrelevant; only shapes, dtypes,
    and quantized formats matter. The host tree is built normally (native
    synthesis, seconds — it owns all shape/format decisions) and each leaf is
    REGENERATED on device with the TPU's own RNG; the host values are dropped
    untransferred. Quantized codes become random bytes, fp leaves small
    positive uniforms — same memory footprint, same kernel dispatch, zero
    relay bytes. Per-leaf jit calls keep the RNG transient at one leaf's size
    (a whole-tree program would double peak HBM). TPU kernel time is
    value-independent, so numbers stay comparable with staged-weight runs.
    """
    import functools

    import jax
    import jax.numpy as jnp

    host = init_dummy_params(cfg, seed=seed, scale=scale, quant=quant, meta=True)

    @functools.lru_cache(maxsize=None)
    def gen(kind: str, shape, dtype_name: str):
        dtype = jnp.dtype(dtype_name)

        @jax.jit
        def f(key):
            if kind == "bytes":
                bits = jax.random.bits(key, shape, dtype=jnp.uint8)
                return jax.lax.bitcast_convert_type(bits, dtype)
            # fp leaf: small positive values — keeps quantization scales and
            # norm gains sane; magnitude is irrelevant to TPU kernel timing
            u = jax.random.uniform(key, shape, jnp.float32, 0.5, 1.5) * scale
            return u.astype(dtype)

        return f

    counter = [0]

    def fill(a):
        counter[0] += 1
        key = jax.random.key(seed * 100003 + counter[0])
        a = np.asarray(a)
        kind = "bytes" if a.dtype.kind in "iu" else "fp"
        return gen(kind, a.shape, a.dtype.name)(key)

    return jax.tree.map(fill, host)


def _init_dummy_vit(cfg: ModelConfig, rng, dt, scale: float) -> Params:
    """Dummy CLIP-style vision tower (models/vision.py layout)."""
    Hv, Lv, Fv = cfg.vision_hidden, cfg.vision_layers, cfg.vision_ffn
    P = cfg.vision_patch
    n_pos = 1 + (cfg.vision_image_size // P) ** 2

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(dt)

    def lnp(n=Hv, L=None):
        if L is None:
            return {"scale": np.ones((n,), dt), "bias": np.zeros((n,), dt)}
        return {"scale": np.ones((L, n), dt), "bias": np.zeros((L, n), dt)}

    return {
        "patch": w(3 * P * P, Hv),
        "cls": w(Hv),
        "pos": w(n_pos, Hv),
        "pre_ln": lnp(),
        "post_ln": lnp(),
        "layers": {
            "attn": {
                "wq": w(Lv, Hv, Hv), "bq": np.zeros((Lv, Hv), dt),
                "wk": w(Lv, Hv, Hv), "bk": np.zeros((Lv, Hv), dt),
                "wv": w(Lv, Hv, Hv), "bv": np.zeros((Lv, Hv), dt),
                "wo": w(Lv, Hv, Hv), "bo": np.zeros((Lv, Hv), dt),
            },
            "ln1": lnp(L=Lv),
            "ln2": lnp(L=Lv),
            "mlp": {
                "w1": w(Lv, Hv, Fv), "b1": np.zeros((Lv, Fv), dt),
                "w2": w(Lv, Fv, Hv), "b2": np.zeros((Lv, Hv), dt),
            },
        },
    }


def _init_dummy_git(cfg: ModelConfig, seed: int, scale: float) -> Params:
    """Dummy weights for the GIT pytree (models/git.py layout)."""
    rng = np.random.default_rng(seed)
    dt = _np_dtype(cfg.dtype)
    H, F, L, V = cfg.hidden_size, cfg.ffn_size, cfg.num_layers, cfg.vocab_size

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(dt)

    def lnp(L=None):
        if L is None:
            return {"scale": np.ones((H,), dt), "bias": np.zeros((H,), dt)}
        return {"scale": np.ones((L, H), dt), "bias": np.zeros((L, H), dt)}

    return {
        "vision": _init_dummy_vit(cfg, rng, dt, scale),
        "proj": {"w": w(cfg.vision_hidden, H), "b": np.zeros((H,), dt), "ln": lnp()},
        "embed_tokens": w(V, H),
        "embed_positions": w(cfg.max_position_embeddings, H),
        "embed_ln": lnp(),
        "layers": {
            "attn": {
                "wq": w(L, H, H), "bq": np.zeros((L, H), dt),
                "wk": w(L, H, H), "bk": np.zeros((L, H), dt),
                "wv": w(L, H, H), "bv": np.zeros((L, H), dt),
                "wo": w(L, H, H), "bo": np.zeros((L, H), dt),
            },
            "ln1": lnp(L),
            "mlp": {
                "w1": w(L, H, F), "b1": np.zeros((L, F), dt),
                "w2": w(L, F, H), "b2": np.zeros((L, H), dt),
            },
            "ln2": lnp(L),
        },
        "output": {"w": w(H, V), "b": np.zeros((V,), dt)},
    }


def _init_dummy_t5(cfg: ModelConfig, seed: int, scale: float) -> Params:
    """Dummy weights for the T5 encoder-decoder pytree (models/t5.py layout)."""
    rng = np.random.default_rng(seed)
    dt = _np_dtype(cfg.dtype)
    H, F, L = cfg.hidden_size, cfg.ffn_size, cfg.num_layers
    inner = cfg.num_heads * cfg.head_dim

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(dt)

    def attn_tree():
        return {"wq": w(L, H, inner), "wk": w(L, H, inner), "wv": w(L, H, inner),
                "wo": w(L, inner, H)}

    def mlp_tree():
        m = {"w1": w(L, H, F), "w2": w(L, F, H)}
        if cfg.gated_mlp:
            m["wg"] = w(L, H, F)
        return m

    def ln():
        return {"scale": np.ones((L, H), dt)}

    def stack_tree(cross: bool):
        t = {"ln1": ln(), "attn": attn_tree(), "ln2": ln(), "mlp": mlp_tree()}
        if cross:
            t["cross"] = attn_tree()
            t["ln3"] = ln()
        return t

    params: Params = {
        "embed_tokens": w(cfg.vocab_size, H),
        "enc": {
            "layers": stack_tree(cross=False),
            "final_norm": {"scale": np.ones((H,), dt)},
            "rel_bias": w(cfg.rel_buckets, cfg.num_heads),
        },
        "dec": {
            "layers": stack_tree(cross=True),
            "final_norm": {"scale": np.ones((H,), dt)},
            "rel_bias": w(cfg.rel_buckets, cfg.num_heads),
        },
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = w(H, cfg.vocab_size)
    return params


# ---------------------------------------------------------------------------
# HF state-dict mapping (OPT / Llama+Mistral+Qwen2 / GPT-J / GPT-NeoX / Falcon)
# ---------------------------------------------------------------------------


def params_from_hf_state_dict(cfg: ModelConfig, sd: Dict[str, np.ndarray]) -> Params:
    """Map an HF state dict (numpy arrays) into our stacked pytree.

    HF linears store ``weight`` as [out, in]; we store [in, out] for ``x @ w``.
    Dispatch on ``cfg.family`` — the TPU analog of the reference's per-model
    load classes (examples/.../utils/model_class/{opt,llama,gptj,gptneox,
    falcon}.py): opt per modeling_opt; llama (also mistral/qwen2, which share
    the key layout modulo biases) per modeling_llama; gptj/gpt_neox/falcon per
    their HF modeling files, including fused-QKV de-interleaving.
    """
    dt = _np_dtype(cfg.dtype)
    L = cfg.num_layers

    def get(key):
        arr = sd[key]
        return np.asarray(arr, dtype=np.float32)

    def wT(key):
        return get(key).T.astype(dt)

    def raw(key):
        return get(key).astype(dt)

    def stack(fmt, transpose=False):
        f = wT if transpose else raw
        return np.stack([f(fmt.format(i)) for i in range(L)])

    if cfg.family == "gptj":
        return _params_gptj(cfg, raw, wT, stack)
    if cfg.family == "gpt_neox":
        return _params_gpt_neox(cfg, get, raw, wT, stack, dt)
    if cfg.family == "falcon":
        return _params_falcon(cfg, get, raw, wT, stack, dt)
    if cfg.family == "bloom":
        return _params_bloom(cfg, get, raw, stack, dt)
    if cfg.family == "mpt":
        return _params_mpt(cfg, get, raw, stack, dt)
    if cfg.family == "gptbigcode":
        return _params_gptbigcode(cfg, get, raw, stack, dt)
    if cfg.family == "codegen":
        return _params_codegen(cfg, get, raw, stack, dt)
    if cfg.family == "baichuan":
        return _params_baichuan(cfg, get, raw, wT, stack, dt)
    if cfg.family == "chatglm":
        return _params_chatglm(cfg, get, raw, stack, dt)
    if cfg.family == "t5":
        return _params_t5(cfg, get, raw, wT, stack, dt)
    if cfg.family == "git":
        return _params_git(cfg, get, raw, wT, stack, dt)
    if cfg.family == "llava":
        return _params_llava(cfg, sd, get, raw, dt)

    is_opt = cfg.family == "opt"
    if is_opt:
        pre = "model.decoder."
        params: Params = {"embed_tokens": raw(pre + "embed_tokens.weight")}
        params["embed_positions"] = raw(pre + "embed_positions.weight")
        if cfg.word_embed_proj_dim:
            params["proj_in"] = wT(pre + "project_in.weight")
            params["proj_out"] = wT(pre + "project_out.weight")
        if cfg.final_norm:
            params["final_norm"] = {
                "scale": raw(pre + "final_layer_norm.weight"),
                "bias": raw(pre + "final_layer_norm.bias"),
            }
        lp = pre + "layers.{}."
        attn = {
            "wq": stack(lp + "self_attn.q_proj.weight", True),
            "wk": stack(lp + "self_attn.k_proj.weight", True),
            "wv": stack(lp + "self_attn.v_proj.weight", True),
            "wo": stack(lp + "self_attn.out_proj.weight", True),
            "bq": stack(lp + "self_attn.q_proj.bias"),
            "bk": stack(lp + "self_attn.k_proj.bias"),
            "bv": stack(lp + "self_attn.v_proj.bias"),
            "bo": stack(lp + "self_attn.out_proj.bias"),
        }
        params["layers"] = {
            "ln1": {
                "scale": stack(lp + "self_attn_layer_norm.weight"),
                "bias": stack(lp + "self_attn_layer_norm.bias"),
            },
            "attn": attn,
            "ln2": {
                "scale": stack(lp + "final_layer_norm.weight"),
                "bias": stack(lp + "final_layer_norm.bias"),
            },
            "mlp": {
                "w1": stack(lp + "fc1.weight", True),
                "b1": stack(lp + "fc1.bias"),
                "w2": stack(lp + "fc2.weight", True),
                "b2": stack(lp + "fc2.bias"),
            },
        }
        return params

    pre = "model."
    from lia_tpu.config import Norm

    ln_bias = cfg.norm == Norm.LAYERNORM  # stablelm: llama layout + LayerNorm
    params = {"embed_tokens": raw(pre + "embed_tokens.weight")}
    params["final_norm"] = {"scale": raw(pre + "norm.weight")}
    if ln_bias:
        params["final_norm"]["bias"] = raw(pre + "norm.bias")
    if not cfg.tie_embeddings:
        params["lm_head"] = wT("lm_head.weight")
    lp = pre + "layers.{}."
    attn = {
        "wq": stack(lp + "self_attn.q_proj.weight", True),
        "wk": stack(lp + "self_attn.k_proj.weight", True),
        "wv": stack(lp + "self_attn.v_proj.weight", True),
        "wo": stack(lp + "self_attn.o_proj.weight", True),
    }
    if cfg.attn_bias:  # qwen2 ships qkv biases in the llama layout
        attn["bq"] = stack(lp + "self_attn.q_proj.bias")
        attn["bk"] = stack(lp + "self_attn.k_proj.bias")
        attn["bv"] = stack(lp + "self_attn.v_proj.bias")
    if cfg.o_bias if cfg.o_bias is not None else cfg.attn_bias:
        attn["bo"] = stack(lp + "self_attn.o_proj.bias")
    if cfg.num_experts:
        # mixtral block-sparse MoE (HF modeling_mixtral): gate.weight [E, H] →
        # router [H, E]; experts.M.{w1=gate, w3=up, w2=down} stacked over [L, E]
        ep = lp + "block_sparse_moe.experts.{}."

        def estack(suffix):
            return np.stack([
                np.stack([wT(ep.format(i, e) + suffix) for e in range(cfg.num_experts)])
                for i in range(L)
            ])

        mlp: Params = {
            "router": stack(lp + "block_sparse_moe.gate.weight", True),
            "wg": estack("w1.weight"),
            "w1": estack("w3.weight"),
            "w2": estack("w2.weight"),
        }
    else:
        mlp = {
            "wg": stack(lp + "mlp.gate_proj.weight", True),
            "w1": stack(lp + "mlp.up_proj.weight", True),
            "w2": stack(lp + "mlp.down_proj.weight", True),
        }
    ln1 = {"scale": stack(lp + "input_layernorm.weight")}
    ln2 = {"scale": stack(lp + "post_attention_layernorm.weight")}
    if ln_bias:
        ln1["bias"] = stack(lp + "input_layernorm.bias")
        ln2["bias"] = stack(lp + "post_attention_layernorm.bias")
    params["layers"] = {"ln1": ln1, "attn": attn, "ln2": ln2, "mlp": mlp}
    return params


def _params_gptj(cfg: ModelConfig, raw, wT, stack) -> Params:
    """GPT-J (HF modeling_gptj): parallel residual with a SINGLE shared ln_1,
    separate q/k/v projections (no biases), fc_in/fc_out MLP with biases,
    untied lm_head WITH bias, interleaved partial rotary."""
    params: Params = {"embed_tokens": raw("transformer.wte.weight")}
    params["final_norm"] = {
        "scale": raw("transformer.ln_f.weight"),
        "bias": raw("transformer.ln_f.bias"),
    }
    params["lm_head"] = wT("lm_head.weight")
    params["lm_head_bias"] = raw("lm_head.bias")
    lp = "transformer.h.{}."
    params["layers"] = {
        "ln1": {
            "scale": stack(lp + "ln_1.weight"),
            "bias": stack(lp + "ln_1.bias"),
        },
        "attn": {
            "wq": stack(lp + "attn.q_proj.weight", True),
            "wk": stack(lp + "attn.k_proj.weight", True),
            "wv": stack(lp + "attn.v_proj.weight", True),
            "wo": stack(lp + "attn.out_proj.weight", True),
        },
        "mlp": {
            "w1": stack(lp + "mlp.fc_in.weight", True),
            "b1": stack(lp + "mlp.fc_in.bias"),
            "w2": stack(lp + "mlp.fc_out.weight", True),
            "b2": stack(lp + "mlp.fc_out.bias"),
        },
    }
    return params


def _params_gpt_neox(cfg: ModelConfig, get, raw, wT, stack, dt) -> Params:
    """GPT-NeoX / Pythia (HF modeling_gpt_neox): parallel residual with separate
    post_attention_layernorm, FUSED query_key_value whose out-dim is laid out
    head-by-head as [q|k|v] per head — de-interleave into our separate wq/wk/wv."""
    N, D, L = cfg.num_heads, cfg.head_dim, cfg.num_layers

    def split_qkv(i):
        w = get(f"gpt_neox.layers.{i}.attention.query_key_value.weight")  # [3H, H]
        b = get(f"gpt_neox.layers.{i}.attention.query_key_value.bias")  # [3H]
        wv = w.reshape(N, 3 * D, -1)  # per-head [q(D) | k(D) | v(D)] rows
        bv = b.reshape(N, 3 * D)
        out = []
        for j in range(3):
            wj = wv[:, j * D : (j + 1) * D, :].reshape(N * D, -1)
            bj = bv[:, j * D : (j + 1) * D].reshape(N * D)
            out.append((wj.T.astype(dt), bj.astype(dt)))
        return out

    qkv = [split_qkv(i) for i in range(L)]
    lp = "gpt_neox.layers.{}."
    params: Params = {"embed_tokens": raw("gpt_neox.embed_in.weight")}
    params["final_norm"] = {
        "scale": raw("gpt_neox.final_layer_norm.weight"),
        "bias": raw("gpt_neox.final_layer_norm.bias"),
    }
    params["lm_head"] = wT("embed_out.weight")
    params["layers"] = {
        "ln1": {
            "scale": stack(lp + "input_layernorm.weight"),
            "bias": stack(lp + "input_layernorm.bias"),
        },
        "attn": {
            "wq": np.stack([q[0][0] for q in qkv]),
            "bq": np.stack([q[0][1] for q in qkv]),
            "wk": np.stack([q[1][0] for q in qkv]),
            "bk": np.stack([q[1][1] for q in qkv]),
            "wv": np.stack([q[2][0] for q in qkv]),
            "bv": np.stack([q[2][1] for q in qkv]),
            "wo": stack(lp + "attention.dense.weight", True),
            "bo": stack(lp + "attention.dense.bias"),
        },
        "ln2": {
            "scale": stack(lp + "post_attention_layernorm.weight"),
            "bias": stack(lp + "post_attention_layernorm.bias"),
        },
        "mlp": {
            "w1": stack(lp + "mlp.dense_h_to_4h.weight", True),
            "b1": stack(lp + "mlp.dense_h_to_4h.bias"),
            "w2": stack(lp + "mlp.dense_4h_to_h.weight", True),
            "b2": stack(lp + "mlp.dense_4h_to_h.bias"),
        },
    }
    return params


def _params_falcon(cfg: ModelConfig, get, raw, wT, stack, dt) -> Params:
    """Falcon-7B-style (HF modeling_falcon, multi_query=True, parallel_attn=True,
    new_decoder_architecture=False): parallel residual sharing input_layernorm,
    fused QKV laid out [q heads... | k | v] along the out-dim (simple splits for
    multi-query), no biases, tied embeddings. The 40B new-arch per-group
    interleave is not supported — use num_kv_heads==1 configs."""
    assert cfg.num_kv_heads == 1, "falcon mapping supports multi_query (=1 kv head)"
    N, D, L = cfg.num_heads, cfg.head_dim, cfg.num_layers

    def split_qkv(i):
        w = get(f"transformer.h.{i}.self_attention.query_key_value.weight")
        wq = w[: N * D, :].T.astype(dt)
        wk = w[N * D : (N + 1) * D, :].T.astype(dt)
        wv = w[(N + 1) * D :, :].T.astype(dt)
        return wq, wk, wv

    qkv = [split_qkv(i) for i in range(L)]
    lp = "transformer.h.{}."
    params: Params = {"embed_tokens": raw("transformer.word_embeddings.weight")}
    params["final_norm"] = {
        "scale": raw("transformer.ln_f.weight"),
        "bias": raw("transformer.ln_f.bias"),
    }
    params["layers"] = {
        "ln1": {
            "scale": stack(lp + "input_layernorm.weight"),
            "bias": stack(lp + "input_layernorm.bias"),
        },
        "attn": {
            "wq": np.stack([q[0] for q in qkv]),
            "wk": np.stack([q[1] for q in qkv]),
            "wv": np.stack([q[2] for q in qkv]),
            "wo": stack(lp + "self_attention.dense.weight", True),
        },
        "mlp": {
            "w1": stack(lp + "mlp.dense_h_to_4h.weight", True),
            "w2": stack(lp + "mlp.dense_4h_to_h.weight", True),
        },
    }
    return params


def _params_bloom(cfg: ModelConfig, get, raw, stack, dt) -> Params:
    """Bloom (HF modeling_bloom): ALiBi attention (no positional embeddings),
    LayerNorm right after the token embed (word_embeddings_layernorm), fused
    query_key_value with PER-HEAD [q|k|v] interleaving along the out-dim,
    gelu-tanh MLP, tied embeddings."""
    N, D, L, H = cfg.num_heads, cfg.head_dim, cfg.num_layers, cfg.hidden_size

    def split_qkv(i):
        w = get(f"transformer.h.{i}.self_attention.query_key_value.weight")
        b = get(f"transformer.h.{i}.self_attention.query_key_value.bias")
        w3 = w.reshape(N, 3, D, H)  # out-dim is [head][q|k|v][dim]
        b3 = b.reshape(N, 3, D)
        out = []
        for j in range(3):
            wj = w3[:, j].reshape(N * D, H).T.astype(dt)  # [H, N*D]
            bj = b3[:, j].reshape(N * D).astype(dt)
            out.append((wj, bj))
        return out

    qkv = [split_qkv(i) for i in range(L)]
    lp = "transformer.h.{}."
    params: Params = {"embed_tokens": raw("transformer.word_embeddings.weight")}
    params["embed_norm"] = {
        "scale": raw("transformer.word_embeddings_layernorm.weight"),
        "bias": raw("transformer.word_embeddings_layernorm.bias"),
    }
    params["final_norm"] = {
        "scale": raw("transformer.ln_f.weight"),
        "bias": raw("transformer.ln_f.bias"),
    }
    params["layers"] = {
        "ln1": {
            "scale": stack(lp + "input_layernorm.weight"),
            "bias": stack(lp + "input_layernorm.bias"),
        },
        "attn": {
            "wq": np.stack([q[0][0] for q in qkv]),
            "bq": np.stack([q[0][1] for q in qkv]),
            "wk": np.stack([q[1][0] for q in qkv]),
            "bk": np.stack([q[1][1] for q in qkv]),
            "wv": np.stack([q[2][0] for q in qkv]),
            "bv": np.stack([q[2][1] for q in qkv]),
            "wo": stack(lp + "self_attention.dense.weight", True),
            "bo": stack(lp + "self_attention.dense.bias"),
        },
        "ln2": {
            "scale": stack(lp + "post_attention_layernorm.weight"),
            "bias": stack(lp + "post_attention_layernorm.bias"),
        },
        "mlp": {
            "w1": stack(lp + "mlp.dense_h_to_4h.weight", True),
            "b1": stack(lp + "mlp.dense_h_to_4h.bias"),
            "w2": stack(lp + "mlp.dense_4h_to_h.weight", True),
            "b2": stack(lp + "mlp.dense_4h_to_h.bias"),
        },
    }
    return params


def _params_mpt(cfg: ModelConfig, get, raw, stack, dt) -> Params:
    """MPT (HF modeling_mpt, no_bias=True): ALiBi attention, sequential-split
    fused Wqkv, bias-free linears AND layernorms (zero biases synthesized so
    the shared LayerNorm path applies), exact-gelu MLP, tied embeddings."""
    N, D, L, H = cfg.num_heads, cfg.head_dim, cfg.num_layers, cfg.hidden_size

    def split_qkv(i):
        w = get(f"transformer.blocks.{i}.attn.Wqkv.weight")  # [3H, H] = [q;k;v]
        return (
            w[:H, :].T.astype(dt),
            w[H : 2 * H, :].T.astype(dt),
            w[2 * H :, :].T.astype(dt),
        )

    qkv = [split_qkv(i) for i in range(L)]
    lp = "transformer.blocks.{}."
    zerosL = np.zeros((L, H), dt)
    params: Params = {"embed_tokens": raw("transformer.wte.weight")}
    params["final_norm"] = {
        "scale": raw("transformer.norm_f.weight"),
        "bias": np.zeros((H,), dt),
    }
    params["layers"] = {
        "ln1": {"scale": stack(lp + "norm_1.weight"), "bias": zerosL},
        "attn": {
            "wq": np.stack([q[0] for q in qkv]),
            "wk": np.stack([q[1] for q in qkv]),
            "wv": np.stack([q[2] for q in qkv]),
            "wo": stack(lp + "attn.out_proj.weight", True),
        },
        "ln2": {"scale": stack(lp + "norm_2.weight"), "bias": zerosL},
        "mlp": {
            "w1": stack(lp + "ffn.up_proj.weight", True),
            "w2": stack(lp + "ffn.down_proj.weight", True),
        },
    }
    return params


def _params_gptbigcode(cfg: ModelConfig, get, raw, stack, dt) -> Params:
    """GPTBigCode / StarCoder (HF modeling_gpt_bigcode, multi_query=True):
    learned absolute positions (no OPT offset), fused c_attn laid out
    [all q heads | k | v] along the out-dim, gelu-tanh MLP, tied embeddings."""
    N, D, L, H = cfg.num_heads, cfg.head_dim, cfg.num_layers, cfg.hidden_size

    def split_qkv(i):
        w = get(f"transformer.h.{i}.attn.c_attn.weight")  # [H + 2D, H]
        b = get(f"transformer.h.{i}.attn.c_attn.bias")
        return (
            (w[:H, :].T.astype(dt), b[:H].astype(dt)),
            (w[H : H + D, :].T.astype(dt), b[H : H + D].astype(dt)),
            (w[H + D :, :].T.astype(dt), b[H + D :].astype(dt)),
        )

    qkv = [split_qkv(i) for i in range(L)]
    lp = "transformer.h.{}."
    params: Params = {
        "embed_tokens": raw("transformer.wte.weight"),
        "embed_positions": raw("transformer.wpe.weight"),
    }
    params["final_norm"] = {
        "scale": raw("transformer.ln_f.weight"),
        "bias": raw("transformer.ln_f.bias"),
    }
    params["layers"] = {
        "ln1": {
            "scale": stack(lp + "ln_1.weight"),
            "bias": stack(lp + "ln_1.bias"),
        },
        "attn": {
            "wq": np.stack([q[0][0] for q in qkv]),
            "bq": np.stack([q[0][1] for q in qkv]),
            "wk": np.stack([q[1][0] for q in qkv]),
            "bk": np.stack([q[1][1] for q in qkv]),
            "wv": np.stack([q[2][0] for q in qkv]),
            "bv": np.stack([q[2][1] for q in qkv]),
            "wo": stack(lp + "attn.c_proj.weight", True),
            "bo": stack(lp + "attn.c_proj.bias"),
        },
        "ln2": {
            "scale": stack(lp + "ln_2.weight"),
            "bias": stack(lp + "ln_2.bias"),
        },
        "mlp": {
            "w1": stack(lp + "mlp.c_fc.weight", True),
            "b1": stack(lp + "mlp.c_fc.bias"),
            "w2": stack(lp + "mlp.c_proj.weight", True),
            "b2": stack(lp + "mlp.c_proj.bias"),
        },
    }
    return params


def _params_codegen(cfg: ModelConfig, get, raw, stack, dt) -> Params:
    """CodeGen (HF modeling_codegen): GPT-J-style parallel residual with a
    single shared ln_1 and interleaved partial rotary, but the fused qkv_proj
    is laid out in mp_num=4 blocks of [query | value | key] chunks (a TPU-v4
    sharding artifact of the original training code — modeling_codegen.py
    CodeGenAttention.forward). Biased MLP + lm_head; no attention biases."""
    L, H = cfg.num_layers, cfg.hidden_size
    mp = 4

    def split_qkv(i):
        w = get(f"transformer.h.{i}.attn.qkv_proj.weight")  # [3H, H]
        blocks = w.reshape(mp, 3, H // mp, H)  # block m: [q | v | k] chunks
        q = blocks[:, 0].reshape(H, H).T.astype(dt)
        v = blocks[:, 1].reshape(H, H).T.astype(dt)
        k = blocks[:, 2].reshape(H, H).T.astype(dt)
        return q, k, v

    qkv = [split_qkv(i) for i in range(L)]
    lp = "transformer.h.{}."
    params: Params = {"embed_tokens": raw("transformer.wte.weight")}
    params["final_norm"] = {
        "scale": raw("transformer.ln_f.weight"),
        "bias": raw("transformer.ln_f.bias"),
    }
    params["lm_head"] = get("lm_head.weight").T.astype(dt)
    params["lm_head_bias"] = raw("lm_head.bias")
    params["layers"] = {
        "ln1": {
            "scale": stack(lp + "ln_1.weight"),
            "bias": stack(lp + "ln_1.bias"),
        },
        "attn": {
            "wq": np.stack([q[0] for q in qkv]),
            "wk": np.stack([q[1] for q in qkv]),
            "wv": np.stack([q[2] for q in qkv]),
            "wo": stack(lp + "attn.out_proj.weight", True),
        },
        "mlp": {
            "w1": stack(lp + "mlp.fc_in.weight", True),
            "b1": stack(lp + "mlp.fc_in.bias"),
            "w2": stack(lp + "mlp.fc_out.weight", True),
            "b2": stack(lp + "mlp.fc_out.bias"),
        },
    }
    return params


def _params_baichuan(cfg: ModelConfig, get, raw, wT, stack, dt) -> Params:
    """Baichuan(-2) (baichuan-inc remote-code modeling_baichuan; reference model
    class utils/model_class/baichuan.py): the llama key layout with a single
    packed ``W_pack`` qkv projection [3H, H] (no biases anywhere). 7B variants
    are rope; 13B variants are ALiBi. Baichuan2's NormHead L2-normalizes each
    lm_head row at inference — baked into the mapped weight here (inference-only
    framework, so load-time normalization is exact)."""
    L, H = cfg.num_layers, cfg.hidden_size

    def split_qkv(i):
        w = get(f"model.layers.{i}.self_attn.W_pack.weight")  # [3H, H]
        return (
            w[:H].T.astype(dt),
            w[H : 2 * H].T.astype(dt),
            w[2 * H :].T.astype(dt),
        )

    qkv = [split_qkv(i) for i in range(L)]
    lp = "model.layers.{}."
    params: Params = {"embed_tokens": raw("model.embed_tokens.weight")}
    params["final_norm"] = {"scale": raw("model.norm.weight")}
    head = get("lm_head.weight")  # [V, H]
    if cfg.norm_head:
        head = head / np.maximum(np.linalg.norm(head, axis=1, keepdims=True), 1e-12)
    params["lm_head"] = head.T.astype(dt)
    params["layers"] = {
        "ln1": {"scale": stack(lp + "input_layernorm.weight")},
        "attn": {
            "wq": np.stack([q[0] for q in qkv]),
            "wk": np.stack([q[1] for q in qkv]),
            "wv": np.stack([q[2] for q in qkv]),
            "wo": stack(lp + "self_attn.o_proj.weight", True),
        },
        "ln2": {"scale": stack(lp + "post_attention_layernorm.weight")},
        "mlp": {
            "wg": stack(lp + "mlp.gate_proj.weight", True),
            "w1": stack(lp + "mlp.up_proj.weight", True),
            "w2": stack(lp + "mlp.down_proj.weight", True),
        },
    }
    return params


def _params_chatglm(cfg: ModelConfig, get, raw, stack, dt) -> Params:
    """ChatGLM2/3 (THUDM remote-code modeling_chatglm; reference
    _GLM2Attention_forward split, attentions.py:994-1029): packed
    ``query_key_value`` [(Nq+2·Nkv)·D, H] with bias splits sequentially into
    q | k | v; ``dense_h_to_4h`` [2F, H] packs gate|up for SwiGLU
    (``torch.chunk(2)`` → silu(x0)·x1); ``dense``/``dense_4h_to_h`` carry no
    bias; untied ``output_layer``."""
    L, H = cfg.num_layers, cfg.hidden_size
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim
    F = cfg.ffn_size
    lp = "transformer.encoder.layers.{}."

    def split_qkv(i):
        w = get(lp.format(i) + "self_attention.query_key_value.weight")
        b = get(lp.format(i) + "self_attention.query_key_value.bias")
        return (
            w[:QD].T.astype(dt), w[QD : QD + KD].T.astype(dt), w[QD + KD :].T.astype(dt),
            b[:QD].astype(dt), b[QD : QD + KD].astype(dt), b[QD + KD :].astype(dt),
        )

    def split_mlp(i):
        w = get(lp.format(i) + "mlp.dense_h_to_4h.weight")  # [2F, H]
        return w[:F].T.astype(dt), w[F:].T.astype(dt)  # gate, up

    qkv = [split_qkv(i) for i in range(L)]
    gu = [split_mlp(i) for i in range(L)]
    params: Params = {
        "embed_tokens": raw("transformer.embedding.word_embeddings.weight"),
        "final_norm": {"scale": raw("transformer.encoder.final_layernorm.weight")},
        "lm_head": get("transformer.output_layer.weight").T.astype(dt),
    }
    params["layers"] = {
        "ln1": {"scale": stack(lp + "input_layernorm.weight")},
        "attn": {
            "wq": np.stack([t[0] for t in qkv]),
            "wk": np.stack([t[1] for t in qkv]),
            "wv": np.stack([t[2] for t in qkv]),
            "bq": np.stack([t[3] for t in qkv]),
            "bk": np.stack([t[4] for t in qkv]),
            "bv": np.stack([t[5] for t in qkv]),
            "wo": stack(lp + "self_attention.dense.weight", True),
        },
        "ln2": {"scale": stack(lp + "post_attention_layernorm.weight")},
        "mlp": {
            "wg": np.stack([t[0] for t in gu]),
            "w1": np.stack([t[1] for t in gu]),
            "w2": stack(lp + "mlp.dense_4h_to_h.weight", True),
        },
    }
    return params


def _params_t5(cfg: ModelConfig, get, raw, wT, stack, dt) -> Params:
    """T5 / Flan-T5 (HF modeling_t5): ``shared`` embedding, per-stack blocks
    ``{encoder,decoder}.block.{i}.layer.{j}`` where encoder j = [self-attn, ffn]
    and decoder j = [self-attn, cross-attn, ffn]; the relative-position bias
    table lives only on block 0's self-attention (shared by all layers).
    Non-gated MLP: ``wi``/``wo``; gated (flan): ``wi_0`` (gate) / ``wi_1``."""
    L = cfg.num_layers

    def attn_tree(prefix, attn_name):
        return {
            "wq": np.stack([wT(prefix.format(i) + f"{attn_name}.q.weight") for i in range(L)]),
            "wk": np.stack([wT(prefix.format(i) + f"{attn_name}.k.weight") for i in range(L)]),
            "wv": np.stack([wT(prefix.format(i) + f"{attn_name}.v.weight") for i in range(L)]),
            "wo": np.stack([wT(prefix.format(i) + f"{attn_name}.o.weight") for i in range(L)]),
        }

    def ln_tree(fmt):
        return {"scale": np.stack([raw(fmt.format(i)) for i in range(L)])}

    def mlp_tree(prefix):
        if cfg.gated_mlp:
            return {
                "wg": np.stack([wT(prefix.format(i) + "wi_0.weight") for i in range(L)]),
                "w1": np.stack([wT(prefix.format(i) + "wi_1.weight") for i in range(L)]),
                "w2": np.stack([wT(prefix.format(i) + "wo.weight") for i in range(L)]),
            }
        return {
            "w1": np.stack([wT(prefix.format(i) + "wi.weight") for i in range(L)]),
            "w2": np.stack([wT(prefix.format(i) + "wo.weight") for i in range(L)]),
        }

    eb = "encoder.block.{}.layer."
    db = "decoder.block.{}.layer."
    params: Params = {
        "embed_tokens": raw("shared.weight"),
        "enc": {
            "layers": {
                "ln1": ln_tree(eb + "0.layer_norm.weight"),
                "attn": attn_tree(eb + "0.", "SelfAttention"),
                "ln2": ln_tree(eb + "1.layer_norm.weight"),
                "mlp": mlp_tree(eb + "1.DenseReluDense."),
            },
            "final_norm": {"scale": raw("encoder.final_layer_norm.weight")},
            "rel_bias": raw(
                "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
            ),
        },
        "dec": {
            "layers": {
                "ln1": ln_tree(db + "0.layer_norm.weight"),
                "attn": attn_tree(db + "0.", "SelfAttention"),
                "ln2": ln_tree(db + "1.layer_norm.weight"),
                "cross": attn_tree(db + "1.", "EncDecAttention"),
                "ln3": ln_tree(db + "2.layer_norm.weight"),
                "mlp": mlp_tree(db + "2.DenseReluDense."),
            },
            "final_norm": {"scale": raw("decoder.final_layer_norm.weight")},
            "rel_bias": raw(
                "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
            ),
        },
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = wT("lm_head.weight")
    return params


def _vit_params(prefix: str, n_layers: int, get, raw, wT, dt) -> Params:
    """CLIP-style vision tower (HF CLIPVisionModel / GitVisionModel key layout;
    note HF's 'pre_layrnorm' typo). The patch conv [Hv, C, P, P] becomes the
    patchify matmul weight [C·P·P, Hv] (models/vision.py layout)."""
    pw = get(prefix + "embeddings.patch_embedding.weight")  # [Hv, C, P, P]
    Hv = pw.shape[0]

    def lnp(key):
        return {"scale": raw(key + ".weight"), "bias": raw(key + ".bias")}

    lp = prefix + "encoder.layers.{}."

    def attn(i):
        p = lp.format(i) + "self_attn."
        return {
            "wq": get(p + "q_proj.weight").T.astype(dt), "bq": raw(p + "q_proj.bias"),
            "wk": get(p + "k_proj.weight").T.astype(dt), "bk": raw(p + "k_proj.bias"),
            "wv": get(p + "v_proj.weight").T.astype(dt), "bv": raw(p + "v_proj.bias"),
            "wo": get(p + "out_proj.weight").T.astype(dt), "bo": raw(p + "out_proj.bias"),
        }

    def stacked(fn):
        trees = [fn(i) for i in range(n_layers)]
        return {k: np.stack([t[k] for t in trees]) for k in trees[0]}

    return {
        "patch": pw.reshape(Hv, -1).T.astype(dt),
        "cls": raw(prefix + "embeddings.class_embedding"),
        "pos": raw(prefix + "embeddings.position_embedding.weight"),
        "pre_ln": lnp(prefix + "pre_layrnorm"),
        "post_ln": lnp(prefix + "post_layernorm"),
        "layers": {
            "attn": stacked(attn),
            "ln1": stacked(lambda i: lnp(lp.format(i) + "layer_norm1")),
            "ln2": stacked(lambda i: lnp(lp.format(i) + "layer_norm2")),
            "mlp": stacked(lambda i: {
                "w1": get(lp.format(i) + "mlp.fc1.weight").T.astype(dt),
                "b1": raw(lp.format(i) + "mlp.fc1.bias"),
                "w2": get(lp.format(i) + "mlp.fc2.weight").T.astype(dt),
                "b2": raw(lp.format(i) + "mlp.fc2.bias"),
            }),
        },
    }


def _params_git(cfg: ModelConfig, get, raw, wT, stack, dt) -> Params:
    """GIT (HF modeling_git): CLIP tower under ``git.image_encoder``, the
    Sequential(Linear, LayerNorm) visual projection, BERT-style text blocks
    under ``git.encoder.layer``, untied biased ``output`` head."""
    L = cfg.num_layers

    def lnp(key):
        return {"scale": raw(key + ".weight"), "bias": raw(key + ".bias")}

    lp = "git.encoder.layer.{}."

    def stacked(fn):
        trees = [fn(i) for i in range(L)]
        return {k: np.stack([t[k] for t in trees]) for k in trees[0]}

    return {
        "vision": _vit_params(
            "git.image_encoder.vision_model.", cfg.vision_layers, get, raw, wT, dt
        ),
        "proj": {
            "w": get("git.visual_projection.visual_projection.0.weight").T.astype(dt),
            "b": raw("git.visual_projection.visual_projection.0.bias"),
            "ln": lnp("git.visual_projection.visual_projection.1"),
        },
        "embed_tokens": raw("git.embeddings.word_embeddings.weight"),
        "embed_positions": raw("git.embeddings.position_embeddings.weight"),
        "embed_ln": lnp("git.embeddings.LayerNorm"),
        "layers": {
            "attn": stacked(lambda i: {
                "wq": get(lp.format(i) + "attention.self.query.weight").T.astype(dt),
                "bq": raw(lp.format(i) + "attention.self.query.bias"),
                "wk": get(lp.format(i) + "attention.self.key.weight").T.astype(dt),
                "bk": raw(lp.format(i) + "attention.self.key.bias"),
                "wv": get(lp.format(i) + "attention.self.value.weight").T.astype(dt),
                "bv": raw(lp.format(i) + "attention.self.value.bias"),
                "wo": get(lp.format(i) + "attention.output.dense.weight").T.astype(dt),
                "bo": raw(lp.format(i) + "attention.output.dense.bias"),
            }),
            "ln1": stacked(lambda i: lnp(lp.format(i) + "attention.output.LayerNorm")),
            "mlp": stacked(lambda i: {
                "w1": get(lp.format(i) + "intermediate.dense.weight").T.astype(dt),
                "b1": raw(lp.format(i) + "intermediate.dense.bias"),
                "w2": get(lp.format(i) + "output.dense.weight").T.astype(dt),
                "b2": raw(lp.format(i) + "output.dense.bias"),
            }),
            "ln2": stacked(lambda i: lnp(lp.format(i) + "output.LayerNorm")),
        },
        "output": {"w": get("output.weight").T.astype(dt), "b": raw("output.bias")},
    }


def _params_llava(cfg: ModelConfig, sd: Dict[str, np.ndarray], get, raw, dt) -> Params:
    """LLaVA (HF modeling_llava, transformers ≥4.52 key layout): the language
    model is a llama under ``model.language_model.`` — rename those keys into
    the standard llama layout and reuse its mapping — plus the CLIP tower under
    ``model.vision_tower.vision_model.`` and the 2-layer GELU projector."""
    lm_sd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            lm_sd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            lm_sd[k] = v
    params = params_from_hf_state_dict(cfg.replace(family="llama"), lm_sd)

    def wT2(key):
        return get(key).T.astype(dt)

    params["vision"] = _vit_params(
        "model.vision_tower.vision_model.", cfg.vision_layers, get, raw, wT2, dt
    )
    params["proj"] = {
        "w1": wT2("model.multi_modal_projector.linear_1.weight"),
        "b1": raw("model.multi_modal_projector.linear_1.bias"),
        "w2": wT2("model.multi_modal_projector.linear_2.weight"),
        "b2": raw("model.multi_modal_projector.linear_2.bias"),
    }
    return params


def load_hf_checkpoint(cfg: ModelConfig, path: str) -> Params:
    """Load HF safetensors shards from a local directory into our pytree."""
    from safetensors.numpy import load_file

    sd: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        sd.update(load_file(os.path.join(path, f)))
    return params_from_hf_state_dict(cfg, sd)


# ---------------------------------------------------------------------------
# Native flat save/load
# ---------------------------------------------------------------------------


# Quantized leaves flatten to two tensors tagged with the format:
#   "<key>#q#woq_int8" / "<key>#s#woq_int8"   (QuantizedWeight)
#   "<key>#kvq#" / "<key>#kvs#"               (QuantizedKV)
# so quantized models round-trip through save_params/load_params — the analog of
# the reference persisting quantized checkpoints as best_model.pt
# (examples run.py:59-61,463-470); without this every run re-quantizes from scratch.


def _flatten(tree: Params, prefix="") -> Dict[str, np.ndarray]:
    from lia_tpu.ops.quant import QuantizedKV, QuantizedWeight

    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        elif isinstance(v, QuantizedWeight):
            out[f"{key}#q#{v.fmt}"] = np.asarray(v.q)
            out[f"{key}#s#{v.fmt}"] = np.asarray(v.s)
            if v.z is not None:
                out[f"{key}#z#{v.fmt}"] = np.asarray(v.z)
        elif isinstance(v, QuantizedKV):
            out[f"{key}#kvq#"] = np.asarray(v.q)
            out[f"{key}#kvs#"] = np.asarray(v.s)
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    from lia_tpu.ops.quant import QuantizedKV, QuantizedWeight

    tree: Params = {}
    pending: Dict[str, Dict[str, Any]] = {}
    for key, v in flat.items():
        if "#" in key:
            base, part, fmt = key.split("#")
            rec = pending.setdefault(base, {"fmt": fmt})
            rec[part] = v
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    for base, rec in pending.items():
        parts = base.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if "kvq" in rec:
            node[parts[-1]] = QuantizedKV(rec["kvq"], rec["kvs"])
        else:
            node[parts[-1]] = QuantizedWeight(
                rec["q"], rec["s"], rec["fmt"], rec.get("z")
            )
    return tree


def save_params(params: Params, path: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(params)
    # safetensors has no bfloat16-in-numpy issue via ml_dtypes views; store raw bytes
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


def load_params(path: str) -> Params:
    from safetensors.numpy import load_file

    return _unflatten(load_file(path))
