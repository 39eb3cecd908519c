"""SmoothQuant-style activation-outlier migration.

Reference equivalent: the static-INT8/SmoothQuant recipe stack
(intel_extension_for_pytorch/quantization/_smooth_quant.py + the alpha autotune in
_autotune.py, CLI knobs run.py:68-107). The technique: per-input-channel scales
``s = act_max^alpha / w_max^(1-alpha)`` migrate activation outliers into the
weights before quantization — mathematically exact at fp (the preceding
LayerNorm's affine absorbs ``1/s``), and it tightens weight-only quantization of
the LN-fed projections (qkv via ln1, fc1/gate/up via ln2).

Calibration runs the fp model over sample prompts and records per-channel
activation maxima at each LN output; ``apply_smoothquant`` folds, then the
standard WOQ flow (:func:`lia_tpu.ops.quant.quantize_params`) quantizes.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import attention as att
from lia_tpu.ops import kv_cache as kvc


def collect_act_scales(
    cfg: ModelConfig,
    params,
    prompts: Sequence[Sequence[int]],
    pad_id: int = 1,
) -> Dict[str, np.ndarray]:
    """Per-channel |activation| maxima at every linear's input.

    Returns (fp32): ``qkv`` [L, H] (LN1 out), ``mlp_in`` [L, H] (MLP-input norm
    out), ``wo_in`` [L, N·D] (attention context), ``w2_in`` [L, F] (post-
    activation MLP intermediate). The reference analog is the per-module minmax
    observer pass of the static-INT8 qconfig flow (quantization/_smooth_quant.py).
    """
    from lia_tpu.engine.engine import pack_prompts

    if cfg.num_experts:
        raise NotImplementedError(
            "SmoothQuant calibration taps the dense MLP path; MoE experts use "
            "RTN WOQ (quantize_params) for now"
        )
    tokens, mask = pack_prompts(prompts, pad_id)
    device_params = jax.device_put(params)

    valid = jnp.asarray(mask)[:, :, None]

    def chan_max(a):
        # pad positions carry arbitrary values (OOB-embed fill, garbage attention
        # rows) — they must not set activation scales
        return jnp.max(jnp.where(valid, jnp.abs(a.astype(jnp.float32)), 0.0), axis=(0, 1))

    @jax.jit
    def run_full(p, tokens, mask):
        positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        x = T.embed(cfg, p, tokens, positions)
        bias = att.alibi_prefill_bias(cfg.num_heads, positions, mask) if cfg.alibi else None
        ctx = att.prefill_attn_ctx(mask, cfg.sliding_window, bias=bias)
        B, S = tokens.shape
        cache = kvc.init_cache(cfg, B, S, jnp.dtype(cfg.dtype))
        start = cache.length

        def mlp_observed(lp, a2):
            """T.mlp with a tap on the w2 input (post-activation intermediate)."""
            m = lp["mlp"]
            from lia_tpu.config import Activation

            if cfg.activation == Activation.SILU:
                gate = jax.nn.silu(T.linear(a2, m["wg"], None).astype(jnp.float32))
                up = T.linear(a2, m["w1"], None).astype(jnp.float32)
                inter = (gate * up).astype(a2.dtype)
                return T.linear(inter, m["w2"], m.get("b2")), chan_max(inter)
            inter = T.activation_fn(cfg, T.linear(a2, m["w1"], m.get("b1")))
            return T.linear(inter, m["w2"], m.get("b2")), chan_max(inter)

        def body(carry, inputs):
            h, ck, cv = carry
            lp, idx = inputs
            residual = h
            a1 = T.norm(cfg, lp["ln1"], h) if cfg.pre_norm else h
            m1 = chan_max(a1)
            q, k, v = T.qkv_project(cfg, lp, a1, positions)
            kl = kvc.index_layer_kv(ck, idx)
            vl = kvc.index_layer_kv(cv, idx)
            attn_out, kl, vl = T.attn_core_prefill(cfg, q, k, v, kl, vl, start, ctx)
            B2, S2 = attn_out.shape[:2]
            ao = attn_out.reshape(B2, S2, -1)
            mo = chan_max(ao)
            hh = T.linear(ao, lp["attn"]["wo"], lp["attn"].get("bo"))
            if cfg.parallel_residual:
                # single-stream families: mlp input is ln1 out (shared) or ln2(x)
                a2 = a1 if cfg.parallel_shared_norm else T.norm(cfg, lp["ln2"], residual)
                m2 = chan_max(a2)
                mm, md = mlp_observed(lp, a2)
                xx2 = residual + hh + mm
            else:
                xx = residual + hh
                if not cfg.pre_norm:
                    xx = T.norm(cfg, lp["ln1"], xx)
                a2 = T.norm(cfg, lp["ln2"], xx) if cfg.pre_norm else xx
                m2 = chan_max(a2)
                mm, md = mlp_observed(lp, a2)
                xx2 = xx + mm
                if not cfg.pre_norm:
                    xx2 = T.norm(cfg, lp["ln2"], xx2)
            return (
                (xx2, kvc.set_layer_kv(ck, kl, idx), kvc.set_layer_kv(cv, vl, idx)),
                (m1, m2, mo, md),
            )

        (_, _, _), (m1s, m2s, mos, mds) = jax.lax.scan(
            body, (x, cache.k, cache.v),
            (p["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
        )
        return m1s, m2s, mos, mds

    m1s, m2s, mos, mds = run_full(device_params, jnp.asarray(tokens), jnp.asarray(mask))
    return {
        "qkv": np.asarray(m1s),
        "mlp_in": np.asarray(m2s),
        "wo_in": np.asarray(mos),
        "w2_in": np.asarray(mds),
    }


def autotune_alpha(
    cfg: ModelConfig,
    params,
    prompts: Sequence[Sequence[int]],
    qc,
    alphas: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8),
    pad_id: int | None = None,
) -> tuple[float, Dict[float, float]]:
    """Sweep migration alphas and pick the one minimizing quantized-vs-fp
    divergence on the calibration prompts.

    Reference equivalent: the SmoothQuant alpha autotune
    (intel_extension_for_pytorch/quantization/_autotune.py — grid search over
    alpha scored by an accuracy criterion). Here the criterion is mean KL
    divergence of next-token distributions over all calibration positions —
    checkpoint- and task-free, so it runs in zero-egress environments.

    Returns (best_alpha, {alpha: kl}).
    """
    from lia_tpu.engine.engine import pack_prompts
    from lia_tpu.ops.quant import quantize_params

    pad_id = cfg.pad_token_id if pad_id is None else pad_id
    tokens, mask = pack_prompts(prompts, pad_id)
    B, S = tokens.shape
    tok_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)

    @jax.jit
    def logprobs(p):
        cache = kvc.init_cache(cfg, B, S, jnp.dtype(cfg.dtype))
        return T.score_logprobs(cfg, p, tok_j, mask_j, cache)

    lp_ref = logprobs(jax.device_put(params))
    valid = mask_j[:, :, None].astype(jnp.float32)

    @jax.jit
    def mean_kl(lp_q):
        kl = jnp.sum(jnp.exp(lp_ref) * (lp_ref - lp_q), axis=-1, keepdims=True)
        return jnp.sum(kl * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    act = collect_act_scales(cfg, params, prompts, pad_id=pad_id)
    report: Dict[float, float] = {}
    best_alpha, best = None, np.inf
    for a in alphas:
        folded = apply_smoothquant(cfg, params, act, alpha=float(a))
        qp = quantize_params(cfg, folded, qc)
        kl = float(mean_kl(logprobs(jax.device_put(qp))))
        report[float(a)] = kl
        if kl < best:
            best, best_alpha = kl, float(a)
    return best_alpha, report


def smoothquant_quantize(
    cfg: ModelConfig,
    params,
    prompts: Sequence[Sequence[int]],
    qc,
    alpha: float | str = "auto",
    pad_id: int | None = None,
    alphas: Sequence[float] | None = None,
):
    """One-stop SmoothQuant flow: calibrate → (autotune) → fold → quantize.

    ``alpha="auto"`` runs :func:`autotune_alpha` over ``alphas`` (or its
    default sweep — the reference's --alpha-min/--alpha-max/--alpha-step
    autotune grid, quantization/_autotune.py); a float uses it directly.
    Mirrors the reference recipe pipeline (quantization/_smooth_quant.py +
    run_quantization.py --alpha auto knobs).
    """
    from lia_tpu.ops.quant import quantize_params

    if alpha == "auto":
        kw = {} if alphas is None else {"alphas": tuple(alphas)}
        alpha, _ = autotune_alpha(cfg, params, prompts, qc, pad_id=pad_id, **kw)
    act = collect_act_scales(cfg, params, prompts, pad_id=pad_id or cfg.pad_token_id)
    folded = apply_smoothquant(cfg, params, act, alpha=float(alpha))
    return quantize_params(cfg, folded, qc), float(alpha)


def static_int8_quantize(
    cfg: ModelConfig,
    params,
    prompts: Sequence[Sequence[int]],
    alpha: float | str | None = 0.5,
    pad_id: int | None = None,
):
    """One-stop static-INT8 (W8A8) flow: [smoothquant fold →] calibrate → quantize.

    The full reference recipe (quantization/__init__.py: SmoothQuant observers →
    static qconfig → convert): migration first balances activation outliers so
    the STATIC per-tensor activation scales bind tightly, then every decoder
    linear becomes an int8×int8 MXU matmul (:func:`lia_tpu.ops.quant.
    quantize_params_static`). ``alpha=None`` skips migration; ``"auto"``
    autotunes it (KL criterion, weight-only proxy).
    """
    from lia_tpu.config import QuantConfig
    from lia_tpu.ops.quant import quantize_params_static

    pad = cfg.pad_token_id if pad_id is None else pad_id
    if alpha is not None:
        if alpha == "auto":
            qc = QuantConfig(weight_dtype="int8", group_size=-1)
            alpha, _ = autotune_alpha(cfg, params, prompts, qc, pad_id=pad)
        act = collect_act_scales(cfg, params, prompts, pad_id=pad)
        params = apply_smoothquant(cfg, params, act, alpha=float(alpha))
    # re-calibrate on the (folded) model — these maxima set the static act scales
    act = collect_act_scales(cfg, params, prompts, pad_id=pad)
    return quantize_params_static(cfg, params, act), (
        float(alpha) if alpha is not None else None
    )


def apply_smoothquant(
    cfg: ModelConfig, params, act_scales: Dict[str, np.ndarray], alpha: float = 0.5
):
    """Fold migration scales into (ln1 → wq/wk/wv) and (ln2 → w1/wg) pairs.

    Exact at fp: LN affine output is divided by ``s`` per channel and the
    consuming weights' input rows are multiplied by ``s``. Only pre-norm models
    qualify (post-norm models feed residuals directly — skipped).
    """
    if not cfg.pre_norm:
        return params

    out = {k: v for k, v in params.items() if k != "layers"}
    layers = {g: dict(v) for g, v in params["layers"].items()}

    def group_of(wk):
        return layers["attn"] if wk in ("wq", "wk", "wv") else layers["mlp"]

    mlp_in_keys = tuple(k for k in ("w1", "wg") if k in layers["mlp"])
    if cfg.parallel_shared_norm:
        # gpt-j/falcon: one shared LN feeds qkv AND the MLP — fold jointly so a
        # single migration scale serves every consumer of ln1's output
        folds = (("ln1", ("wq", "wk", "wv") + mlp_in_keys, act_scales["qkv"]),)
    else:
        folds = (
            ("ln1", ("wq", "wk", "wv"), act_scales["qkv"]),
            ("ln2", mlp_in_keys, act_scales["mlp_in"]),
        )
    for ln_key, w_keys, amax in folds:
        ws = [np.asarray(group_of(k)[k], np.float32) for k in w_keys]
        wmax = np.maximum.reduce([np.abs(w).max(axis=2) for w in ws])  # [L, H]
        a = np.maximum(np.asarray(amax, np.float32), 1e-5)
        wm = np.maximum(wmax, 1e-5)
        s = np.clip((a**alpha) / (wm ** (1 - alpha)), 0.1, 10.0)  # [L, H]
        ln = dict(layers[ln_key])
        for fld in ("scale", "bias"):
            if fld in ln:
                dt = np.asarray(ln[fld]).dtype
                ln[fld] = (np.asarray(ln[fld], np.float32) / s).astype(dt)
        layers[ln_key] = ln
        for k, w in zip(w_keys, ws):
            grp = group_of(k)
            dt = np.asarray(grp[k]).dtype
            grp[k] = (w * s[:, :, None]).astype(dt)
    out["layers"] = layers
    return out
