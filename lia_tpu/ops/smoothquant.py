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
    """Per-channel |activation| maxima at each layer's LN1/LN2 outputs.

    Returns {"qkv": [L, H], "mlp_in": [L, H]} (fp32).
    """
    from lia_tpu.engine.engine import pack_prompts

    tokens, mask = pack_prompts(prompts, pad_id)
    device_params = jax.device_put(params)

    @jax.jit
    def run_full(p, tokens, mask):
        positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        x = T.embed(cfg, p, tokens, positions)
        ctx = att.prefill_attn_ctx(mask)
        B, S = tokens.shape
        cache = kvc.init_cache(cfg, B, S, jnp.dtype(cfg.dtype))
        start = cache.length

        def body(carry, inputs):
            h, ck, cv = carry
            lp, idx = inputs
            residual = h
            a1 = T.norm(cfg, lp["ln1"], h) if cfg.pre_norm else h
            m1 = jnp.max(jnp.abs(a1.astype(jnp.float32)), axis=(0, 1))
            q, k, v = T.qkv_project(cfg, lp, a1, positions)
            kl = kvc.index_layer_kv(ck, idx)
            vl = kvc.index_layer_kv(cv, idx)
            attn_out, kl, vl = T.attn_core_prefill(cfg, q, k, v, kl, vl, start, ctx)
            B2, S2 = attn_out.shape[:2]
            hh = T.linear(attn_out.reshape(B2, S2, -1), lp["attn"]["wo"], lp["attn"].get("bo"))
            xx = residual + hh
            if not cfg.pre_norm:
                xx = T.norm(cfg, lp["ln1"], xx)
            a2 = T.norm(cfg, lp["ln2"], xx) if cfg.pre_norm else xx
            m2 = jnp.max(jnp.abs(a2.astype(jnp.float32)), axis=(0, 1))
            hh = T.mlp(cfg, lp, a2)
            xx2 = xx + hh
            if not cfg.pre_norm:
                xx2 = T.norm(cfg, lp["ln2"], xx2)
            return (xx2, kvc.set_layer_kv(ck, kl, idx), kvc.set_layer_kv(cv, vl, idx)), (m1, m2)

        (_, _, _), (m1s, m2s) = jax.lax.scan(
            body, (x, cache.k, cache.v),
            (p["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
        )
        return m1s, m2s

    m1s, m2s = run_full(device_params, jnp.asarray(tokens), jnp.asarray(mask))
    return {"qkv": np.asarray(m1s), "mlp_in": np.asarray(m2s)}


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
):
    """One-stop SmoothQuant flow: calibrate → (autotune) → fold → quantize.

    ``alpha="auto"`` runs :func:`autotune_alpha`; a float uses it directly.
    Mirrors the reference recipe pipeline (quantization/_smooth_quant.py +
    run_quantization.py --alpha auto knobs).
    """
    from lia_tpu.ops.quant import quantize_params

    if alpha == "auto":
        alpha, _ = autotune_alpha(cfg, params, prompts, qc, pad_id=pad_id)
    act = collect_act_scales(cfg, params, prompts, pad_id=pad_id or cfg.pad_token_id)
    folded = apply_smoothquant(cfg, params, act, alpha=float(alpha))
    return quantize_params(cfg, folded, qc), float(alpha)


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

    for ln_key, w_keys, amax in (
        ("ln1", ("wq", "wk", "wv"), act_scales["qkv"]),
        ("ln2", tuple(k for k in ("w1", "wg") if k in layers["mlp"]), act_scales["mlp_in"]),
    ):
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
