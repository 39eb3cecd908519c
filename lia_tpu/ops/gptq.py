"""GPTQ quantization algorithm (Hessian-guided, error-compensated rounding).

Reference equivalent: ``ipex.quantization.gptq`` (quantization/__init__.py:21,
quantization/_GPTQ/ — per-linear Hessians accumulated from calibration
activations, Cholesky factorization, column-sequential quantization with error
feedback into the not-yet-quantized columns) and its driver
examples/.../utils/run_gptq.py. The ingestion path (lia_tpu/utils/gptq.py)
consumes externally produced AutoGPTQ checkpoints; this module PRODUCES
GPTQ-quantized weights natively from calibration prompts.

TPU-first split of the work:

- **Hessian collection** runs on device: one jitted per-layer tapped forward
  computes the layer's four linear-input Gram matrices ``XᵀX`` on the MXU
  (masked so pad positions contribute nothing), layer by layer so only one
  [F, F] Hessian is alive at a time.
- **The solver** runs host-side in numpy float64 at load time (the same
  placement as quantize-on-load): GPTQ is a one-shot offline transform with
  data-dependent sequential structure — exactly what does NOT belong under jit.
- **Sequential propagation** mirrors the reference: layer *l*'s calibration
  inputs are produced by the already-quantized layers 0..l-1, so later layers
  compensate earlier layers' quantization error.

Output formats are the framework's native ones (:mod:`lia_tpu.ops.quant`):
``woq_int4z`` (asymmetric per-group zero-points, global half-split packing —
consumed by the zero-point-aware Pallas kernel) for 4-bit, ``woq_int8``
(symmetric) for 8-bit.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import attention as att
from lia_tpu.ops import kv_cache as kvc

__all__ = ["gptq_quantize_matrix", "gptq_quantize_params"]


# ---------------------------------------------------------------------------
# Core solver (host-side, numpy float64)
# ---------------------------------------------------------------------------


def _group_params(slab: np.ndarray, bits: int) -> Tuple[np.ndarray, np.ndarray]:
    """Asym (4-bit) or sym (8-bit) quantization params for one group slab [g, N].

    Returns (scale [N], zero [N]); symmetric formats use zero == 0 with codes
    in [-qmax, qmax].
    """
    if bits == 4:
        qmax = 15.0
        wmin = np.minimum(slab.min(axis=0), 0.0)
        wmax = np.maximum(slab.max(axis=0), 0.0)
        scale = (wmax - wmin) / qmax
        scale = np.where(scale <= 1e-12, 1.0, scale)
        zero = np.clip(np.rint(-wmin / scale), 0.0, qmax)
        return scale, zero
    scale = np.maximum(np.abs(slab).max(axis=0) / 127.0, 1e-12)
    return scale, np.zeros_like(scale)


def _quant_row(
    row: np.ndarray, scale: np.ndarray, zero: np.ndarray, bits: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Round one in-channel row to the grid. Returns (codes, dequantized)."""
    if bits == 4:
        q = np.clip(np.rint(row / scale) + zero, 0.0, 15.0)
        return q, (q - zero) * scale
    q = np.clip(np.rint(row / scale), -127.0, 127.0)
    return q, q * scale


def gptq_quantize_matrix(
    w: np.ndarray,
    H: np.ndarray,
    bits: int = 4,
    group_size: int = -1,
    percdamp: float = 0.01,
    actorder: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GPTQ-quantize one weight ``[K, N]`` (x @ w convention: rows = in-channels,
    the Hessian axis) against the input Gram matrix ``H`` [K, K].

    The algorithm (reference quantization/_GPTQ/): damp H's diagonal, take the
    upper Cholesky factor U of H⁻¹, then walk in-channels sequentially — at each
    row, round to the grid and push the scaled residual ``(w_i − q_i)/U_ii`` into
    every not-yet-quantized row via U's off-diagonal, so later rounding decisions
    absorb earlier rounding error. ``H = I`` degenerates to plain RTN.

    ``actorder`` quantizes rows in decreasing-Hessian-diagonal order with
    STATIC per-group params (the reference's act-order + static-groups variant),
    so the emitted groups stay contiguous in the original row order and remain
    compatible with the half-split packed kernels.

    Returns (codes [K, N] float — biased [0,15] for 4-bit, signed [-127,127]
    for 8-bit; scales [ng, N] f32; zeros [ng, N] f32).
    """
    w = np.array(w, dtype=np.float64)
    H = np.array(H, dtype=np.float64)
    K, N = w.shape
    g = K if group_size <= 0 or group_size >= K else int(group_size)
    assert K % g == 0, f"in-dim {K} not divisible by group size {g}"
    ng = K // g

    dead = np.diag(H) == 0
    if dead.any():
        H[dead, dead] = 1.0
        w[dead, :] = 0.0
    mean_diag = float(np.mean(np.diag(H)))
    H[np.arange(K), np.arange(K)] += percdamp * max(mean_diag, 1e-12)

    if actorder:
        perm = np.argsort(-np.diag(H), kind="stable")
        inv_perm = np.argsort(perm)
        w = w[perm]
        H = H[perm][:, perm]
    else:
        perm = inv_perm = None

    # upper Cholesky factor U of H⁻¹ (H⁻¹ = UᵀU): the row walk reads U's rows
    Hinv = np.linalg.inv(H)
    Hinv = (Hinv + Hinv.T) * 0.5
    try:
        U = np.linalg.cholesky(Hinv).T
    except np.linalg.LinAlgError:
        # heavier damping fallback for near-singular calibration Hessians
        Hinv += np.eye(K) * (1e-6 * max(np.abs(np.diag(Hinv)).max(), 1.0))
        U = np.linalg.cholesky(Hinv).T

    scales = np.zeros((ng, N), dtype=np.float64)
    zeros = np.zeros((ng, N), dtype=np.float64)
    codes = np.zeros((K, N), dtype=np.float64)

    if actorder:
        # static groups: params from the original (unpermuted) slabs up front
        w0 = w[inv_perm]
        for gi in range(ng):
            scales[gi], zeros[gi] = _group_params(w0[gi * g : (gi + 1) * g], bits)
        row_group = (np.asarray(perm) // g) if perm is not None else None

    # block size aligned to group boundaries so group params are computed from
    # fully error-updated rows (lazy find_params at each group start)
    B = g if (not actorder and 1 < g <= 256) else min(128, K)
    i1 = 0
    while i1 < K:
        i2 = min(i1 + B, K)
        W1 = w[i1:i2].copy()
        Err1 = np.zeros_like(W1)
        U1 = U[i1:i2, i1:i2]
        for i in range(i2 - i1):
            r = i1 + i
            if actorder:
                gi = int(row_group[r])
            else:
                gi = r // g
                if r % g == 0:
                    scales[gi], zeros[gi] = _group_params(w[r : r + g], bits)
            d = U1[i, i]
            q, deq = _quant_row(W1[i], scales[gi], zeros[gi], bits)
            codes[r] = q
            err = (W1[i] - deq) / d
            if i + 1 < i2 - i1:
                W1[i + 1 :] -= np.outer(U1[i, i + 1 :], err)
            Err1[i] = err
        w[i1:i2] = W1
        if i2 < K:
            w[i2:] -= U[i1:i2, i2:].T @ Err1
        i1 = i2

    if actorder:
        codes = codes[inv_perm]
    return codes, scales.astype(np.float32), zeros.astype(np.float32)


def _to_quantized_weight(codes: np.ndarray, s: np.ndarray, z: np.ndarray, bits: int):
    """Per-layer (codes, scales, zeros) → stackable raw arrays for the native
    formats: 4-bit → half-split packed uint8 + zeros; 8-bit → int8, no zeros."""
    K = codes.shape[0]
    if bits == 4:
        b = codes.astype(np.uint8)
        packed = (b[: K // 2, :] & 0xF) | (b[K // 2 :, :] << 4)
        return packed, s, z
    return codes.astype(np.int8), s, None


# ---------------------------------------------------------------------------
# Calibration-driven end-to-end flow
# ---------------------------------------------------------------------------


def _make_layer_tap(cfg: ModelConfig, B: int, S: int):
    """Jitted per-layer forward that also returns the four linear-input Gram
    matrices (masked XᵀX): qkv-in (ln1 out), wo-in (attention context), mlp-in
    (w1/wg input), w2-in (post-activation intermediate). Mirrors the observed
    flow of :func:`lia_tpu.ops.smoothquant.collect_act_scales` but taps the
    activations themselves rather than channel maxima."""
    from lia_tpu.config import Activation

    cfg1 = cfg.replace(num_layers=1)

    def xtx(a, valid):
        af = (a.astype(jnp.float32) * valid).reshape(-1, a.shape[-1])
        return af.T @ af

    @jax.jit
    def tap(lp, x, positions, ctx, valid):
        cache = kvc.init_cache(cfg1, B, S, jnp.dtype(cfg.dtype))
        start = cache.length
        kl = kvc.index_layer_kv(cache.k, jnp.int32(0))
        vl = kvc.index_layer_kv(cache.v, jnp.int32(0))
        residual = x
        a1 = T.norm(cfg, lp["ln1"], x) if cfg.pre_norm else x
        q, k, v = T.qkv_project(cfg, lp, a1, positions)
        attn_out, _, _ = T.attn_core_prefill(cfg, q, k, v, kl, vl, start, ctx)
        ao = attn_out.reshape(B, S, -1)
        h = T.linear(ao, lp["attn"]["wo"], lp["attn"].get("bo"))

        def mlp_tapped(a2):
            m = lp["mlp"]
            if cfg.activation == Activation.SILU:
                gate = jax.nn.silu(T.linear(a2, m["wg"], None).astype(jnp.float32))
                up = T.linear(a2, m["w1"], None).astype(jnp.float32)
                inter = (gate * up).astype(a2.dtype)
                return T.linear(inter, m["w2"], m.get("b2")), inter
            inter = T.activation_fn(cfg, T.linear(a2, m["w1"], m.get("b1")))
            return T.linear(inter, m["w2"], m.get("b2")), inter

        if cfg.parallel_residual:
            a2 = a1 if cfg.parallel_shared_norm else T.norm(cfg, lp["ln2"], residual)
            mm, inter = mlp_tapped(a2)
            x2 = residual + h + mm
        else:
            xx = residual + h
            if not cfg.pre_norm:
                xx = T.norm(cfg, lp["ln1"], xx)
            a2 = T.norm(cfg, lp["ln2"], xx) if cfg.pre_norm else xx
            mm, inter = mlp_tapped(a2)
            x2 = xx + mm
            if not cfg.pre_norm:
                x2 = T.norm(cfg, lp["ln2"], x2)
        return x2, xtx(a1, valid), xtx(ao, valid), xtx(a2, valid), xtx(inter, valid)

    return tap


def gptq_quantize_params(
    cfg: ModelConfig,
    params,
    prompts: Sequence[Sequence[int]],
    bits: int = 4,
    group_size: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    pad_id: Optional[int] = None,
):
    """End-to-end GPTQ: calibrate → quantize every decoder linear, sequentially.

    Walks the stack layer by layer: collect layer *l*'s linear-input Hessians by
    running it in fp on the (already partially quantized) hidden stream, solve
    GPTQ for its seven weights host-side, then re-run the layer with quantized
    weights to produce layer *l+1*'s calibration inputs — the reference's
    sequential block scheme (quantization/_GPTQ/). Embeddings, norms, biases,
    and lm_head stay high-precision (same scope as quantize-on-load WOQ).

    Returns the params pytree with stacked :class:`QuantizedWeight` leaves
    (``woq_int4z`` for 4-bit, ``woq_int8`` for 8-bit).
    """
    from lia_tpu.engine.engine import pack_prompts
    from lia_tpu.ops.quant import QuantizedWeight

    assert bits in (4, 8), f"unsupported GPTQ bit-width {bits}"
    if cfg.num_experts:
        raise NotImplementedError(
            "GPTQ calibration taps the dense MLP path; MoE experts use "
            "RTN WOQ (quantize_params) for now"
        )
    tokens, mask = pack_prompts(prompts, cfg.pad_token_id if pad_id is None else pad_id)
    B, S = tokens.shape
    tok_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
    positions = jnp.cumsum(mask_j.astype(jnp.int32), axis=1) - 1
    bias = att.alibi_prefill_bias(cfg.num_heads, positions, mask_j) if cfg.alibi else None
    ctx = att.prefill_attn_ctx(mask, cfg.sliding_window, bias=bias)
    valid = mask_j[:, :, None].astype(jnp.float32)
    x = jax.jit(lambda p, t: T.embed(cfg, p, t, positions))(
        jax.device_put(params), tok_j
    )

    def eff_group(K: int) -> int:
        # per-channel fallback when groups would straddle the half-split packing
        # boundary (keeps the Pallas woq4z kernel viable; packing itself is
        # layout-only, so this is a perf choice, not a correctness one)
        if bits == 4 and 0 < group_size < K and (K // 2) % group_size != 0:
            return -1
        return group_size

    tap = _make_layer_tap(cfg, B, S)
    layers = params["layers"]
    L = cfg.num_layers
    # (group, weight-name) → which Hessian feeds it
    w_to_h = {
        ("attn", "wq"): 0, ("attn", "wk"): 0, ("attn", "wv"): 0,
        ("attn", "wo"): 1,
        ("mlp", "w1"): 2, ("mlp", "wg"): 2,
        ("mlp", "w2"): 3,
    }
    per_layer: list[Dict[Tuple[str, str], tuple]] = []
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], layers)
        _, H1, Ho, H2, Hd = tap(lp, x, positions, ctx, valid)
        hs = [np.asarray(h, np.float64) for h in (H1, Ho, H2, Hd)]
        q_lp = {g: dict(v) for g, v in lp.items()}
        recs: Dict[Tuple[str, str], tuple] = {}
        for (grp, wn), hi in w_to_h.items():
            if wn not in lp.get(grp, {}):
                continue
            w_np = np.asarray(lp[grp][wn], np.float32)
            codes, s, z = gptq_quantize_matrix(
                w_np, hs[hi], bits=bits, group_size=eff_group(w_np.shape[0]),
                percdamp=percdamp, actorder=actorder,
            )
            qarr, s, z = _to_quantized_weight(codes, s, z, bits)
            recs[(grp, wn)] = (qarr, s, z)
            fmt = "woq_int4z" if bits == 4 else "woq_int8"
            q_lp[grp][wn] = QuantizedWeight(
                jnp.asarray(qarr), jnp.asarray(s), fmt,
                jnp.asarray(z) if z is not None else None,
            )
        per_layer.append(recs)
        # propagate the hidden stream through the QUANTIZED layer
        x = tap(q_lp, x, positions, ctx, valid)[0]

    out = dict(params)
    new_layers = {g: dict(v) for g, v in layers.items()}
    fmt = "woq_int4z" if bits == 4 else "woq_int8"
    for (grp, wn) in per_layer[0]:
        qs = np.stack([per_layer[l][(grp, wn)][0] for l in range(L)])
        ss = np.stack([per_layer[l][(grp, wn)][1] for l in range(L)])
        if bits == 4:
            zs = np.stack([per_layer[l][(grp, wn)][2] for l in range(L)])
            new_layers[grp][wn] = QuantizedWeight(qs, ss, fmt, zs)
        else:
            new_layers[grp][wn] = QuantizedWeight(qs, ss, fmt)
    out["layers"] = new_layers
    return out
