"""Host-side projection fusion: concat q/k/v (and SwiGLU gate/up) weights.

Decode at small batch is per-call-cost-bound on this hardware, not
bandwidth-bound: three back-to-back [H, H']-ish projections cost measurably more
than one [H, 3H'] matmul over the same bytes (measured on v5e: 3x 4096x4096 int8
WOQ = 0.177 ms vs 1x 4096x12288 = 0.111 ms — a ~0.07 ms/layer saving;
experiments/bench_layer_breakdown.py). The reference reaches the same shape via
its ``concat_linear`` / linear-silu-mul fusions on CPU
(intel_extension_for_pytorch/transformers/models/cpu/fusions/linear_fusion.py),
where the motivation is cache reuse rather than dispatch cost — the TPU analog
fuses the *weights on the host once* and lets one MXU matmul replace three.

The transform is a pure pytree rewrite applied at engine construction (after
quantization, before device placement): per decoder layer,

- ``attn.wq/wk/wv [+ bq/bk/bv]``  →  ``attn.wqkv [+ bqkv]``  (concat on N)
- ``mlp.wg/w1``                   →  ``mlp.wg1``             (SwiGLU gate|up)

Works for raw arrays and every :class:`QuantizedWeight` format: quantization
groups run along K (the input dim), so an N-axis concat of codes, scales, and
per-group zero-points is exact — no re-quantization. ``static_int8`` carries a
per-tensor *activation* scale in ``z``; q/k/v (and gate/up) read the same input
tensor so their calibrated scales coincide, which we assert rather than assume.

TP note: a plain N-concat is NOT column-shardable (a contiguous device slice
would straddle the q/k boundary), so the mesh-backed paths
(``parallel.sharding.shard_params`` callers) keep the unfused tree; only the
single-device engine fuses. ``qkv_project``/``mlp`` accept both layouts.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from lia_tpu.config import Activation, ModelConfig
from lia_tpu.ops.quant import QuantizedWeight, is_quantized


class _Unfusable(Exception):
    pass


def _cat(arrs: List[Any]):
    """N-axis concat that stays on the host for numpy leaves."""
    if all(isinstance(a, np.ndarray) for a in arrs):
        return np.concatenate(arrs, axis=-1)
    import jax.numpy as jnp

    return jnp.concatenate(arrs, axis=-1)


def _cat_weights(ws: List[Any]):
    if not any(is_quantized(w) for w in ws):
        return _cat(ws)
    if not all(is_quantized(w) for w in ws):
        raise _Unfusable("mixed raw/quantized projections")
    fmts = {w.fmt for w in ws}
    if len(fmts) != 1:
        raise _Unfusable(f"mixed quant formats {fmts}")
    fmt = fmts.pop()
    ngs = {w.s.shape[-2] for w in ws}
    if len(ngs) != 1:
        raise _Unfusable("mismatched group counts")
    q = _cat([w.q for w in ws])
    s = _cat([w.s for w in ws])
    z = None
    if fmt.startswith("woq_int4z"):
        z = _cat([w.z for w in ws])
    elif fmt == "static_int8":
        # z is the calibrated per-layer activation scale — identical inputs must
        # have produced identical amax; refuse to fuse if calibration disagrees.
        z0 = np.asarray(ws[0].z, np.float32)
        for w in ws[1:]:
            if not np.allclose(z0, np.asarray(w.z, np.float32), rtol=1e-6):
                raise _Unfusable("static act scales differ across q/k/v")
        z = ws[0].z
    return QuantizedWeight(q, s, fmt, z)


def _cat_biases(a: Dict[str, Any], keys: List[str], widths: List[int], L: int):
    """Concat biases; synthesize zeros for absent ones when any is present."""
    if not any(k in a for k in keys):
        return None
    parts = []
    for k, n in zip(keys, widths):
        if k in a:
            parts.append(a[k])
        else:
            ref = next(a[j] for j in keys if j in a)
            parts.append(np.zeros((L, n), np.asarray(ref).dtype))
    return _cat(parts)


def fuse_projections(cfg: ModelConfig, params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a shallow-copied params tree with per-layer projections fused.

    Leaves the input tree untouched; falls back to the unfused layout per
    projection group if any constraint fails (mixed formats, disagreeing static
    activation scales).
    """
    if "layers" not in params:
        return params
    layers = dict(params["layers"])
    qd = cfg.num_heads * cfg.head_dim
    kd = cfg.num_kv_heads * cfg.head_dim
    a = dict(layers["attn"])
    if all(k in a for k in ("wq", "wk", "wv")):
        try:
            wqkv = _cat_weights([a["wq"], a["wk"], a["wv"]])
        except _Unfusable:
            wqkv = None
        if wqkv is not None:
            L = cfg.num_layers
            bqkv = _cat_biases(a, ["bq", "bk", "bv"], [qd, kd, kd], L)
            for k in ("wq", "wk", "wv", "bq", "bk", "bv"):
                a.pop(k, None)
            a["wqkv"] = wqkv
            if bqkv is not None:
                a["bqkv"] = bqkv
            layers["attn"] = a
    m = dict(layers["mlp"])
    # MoE experts route through batched einsums, not linear() — leave unfused
    if cfg.num_experts == 0 and cfg.activation == Activation.SILU and "wg" in m and "w1" in m:
        try:
            wg1 = _cat_weights([m["wg"], m["w1"]])
        except _Unfusable:
            wg1 = None
        if wg1 is not None:
            m.pop("wg")
            m.pop("w1")
            m["wg1"] = wg1
            layers["mlp"] = m
    out = dict(params)
    out["layers"] = layers
    return out
