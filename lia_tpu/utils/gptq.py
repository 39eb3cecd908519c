"""GPTQ checkpoint ingestion.

Parity surface: the reference consumes GPTQ low-precision checkpoints
(``ipex.quantization.gptq``, quantization/_GPTQ/, CLI knobs run.py:138-156). This
module unpacks the AutoGPTQ tensor format —

  qweight: int32 [K/8, N]   (eight 4-bit values per int32, packed along K)
  qzeros:  int32 [K/g, N/8] (eight 4-bit zero-points per int32, packed along N)
  scales:  f16/f32 [K/g, N]
  g_idx:   int32 [K]        (optional K→group permutation, act-order)

— and ingests it losslessly into the framework's asymmetric
:class:`~lia_tpu.ops.quant.QuantizedWeight` ``woq_int4z`` form (zero-point-aware
Pallas kernel in :mod:`lia_tpu.ops.pallas_matmul`), preserving the checkpoint's
exact dequantized values. Act-order checkpoints (non-trivial ``g_idx``) fall
back to dequantize + symmetric int4 re-quantization; ``keep_fp=True`` ingests
at full precision instead.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from lia_tpu.config import ModelConfig, QuantConfig


def unpack_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
    bits: int = 4,
) -> np.ndarray:
    """Dequantize one AutoGPTQ-format weight to fp32 [K, N]."""
    assert bits == 4, "only 4-bit GPTQ supported"
    per = 32 // bits
    K = qweight.shape[0] * per
    N = qweight.shape[1]
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :, None]
    w = ((qweight.astype(np.uint32)[:, None, :] >> shifts) & 0xF).reshape(K, N)
    z = ((qzeros.astype(np.uint32)[:, :, None] >> shifts.transpose(0, 2, 1)) & 0xF)
    z = z.reshape(qzeros.shape[0], N)  # [K/g, N]
    # AutoGPTQ stores zero-1 (the +1 convention); many exporters vary — the +1
    # variant is the upstream default
    z = z + 1
    scales = np.asarray(scales, np.float32)
    ng = scales.shape[0]
    g = K // ng
    if g_idx is not None:
        grp = np.asarray(g_idx, np.int64)
    else:
        grp = np.arange(K) // g
    return (w.astype(np.float32) - z[grp].astype(np.float32)) * scales[grp]


def unpack_gptq_codes(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
):
    """Unpack AutoGPTQ tensors WITHOUT dequantizing: returns (codes [K, N]
    uint8 in [0,15], scales [K/g, N] f32, zeros [K/g, N] f32 incl. the +1)."""
    assert bits == 4, "only 4-bit GPTQ supported"
    per = 32 // bits
    K = qweight.shape[0] * per
    N = qweight.shape[1]
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :, None]
    codes = ((qweight.astype(np.uint32)[:, None, :] >> shifts) & 0xF).reshape(K, N)
    z = ((qzeros.astype(np.uint32)[:, :, None] >> shifts.transpose(0, 2, 1)) & 0xF)
    z = z.reshape(qzeros.shape[0], N).astype(np.float32) + 1.0
    return codes.astype(np.uint8), np.asarray(scales, np.float32), z


def _pack_half_split(codes: np.ndarray) -> np.ndarray:
    """[..., K, N] uint8 nibble codes → [..., K/2, N] global half-split bytes."""
    K = codes.shape[-2]
    return (codes[..., : K // 2, :] & 0xF) | (codes[..., K // 2 :, :] << 4)


def params_from_gptq_state_dict(
    cfg: ModelConfig,
    sd: Dict[str, np.ndarray],
    group_size: int = 128,
    keep_fp: bool = False,
):
    """Map an AutoGPTQ OPT/Llama state dict into our pytree.

    Linear layers arrive as (qweight, qzeros, scales[, g_idx]) triples keyed like
    ``model.decoder.layers.N.self_attn.q_proj.qweight``; everything else (embeds,
    norms, biases) is fp and handled by the standard HF mapping. GPTQ's [K, N]
    orientation (in-features first) already matches our ``x @ w`` convention.

    Checkpoints without act-order (trivial ``g_idx``) ingest LOSSLESSLY into the
    asymmetric ``woq_int4z`` format (codes + scales + zero-points preserved;
    reference zp-aware kernels WoqTppKrnl.cpp:886-1069). Act-order checkpoints
    fall back to dequantize + symmetric re-quantization.
    """
    from lia_tpu.ops.quant import QuantizedWeight, quantize_weight
    from lia_tpu.utils.checkpoint import params_from_hf_state_dict

    fp_sd = dict(sd)
    prefixes = sorted(
        {k[: -len(".qweight")] for k in sd if k.endswith(".qweight")}
    )
    native_recs: Dict[str, tuple] = {}
    for p in prefixes:
        g_idx = sd.get(p + ".g_idx")
        K = sd[p + ".qweight"].shape[0] * 8
        ng = sd[p + ".scales"].shape[0]
        g = K // ng
        trivial = g_idx is None or np.array_equal(
            np.asarray(g_idx), np.arange(K) // g
        )
        if trivial and not keep_fp and (g == K or (K // 2) % g == 0):
            codes, s, z = unpack_gptq_codes(
                sd[p + ".qweight"], sd[p + ".qzeros"], sd[p + ".scales"]
            )
            native_recs[p] = (_pack_half_split(codes), s, z)
        w = unpack_gptq(
            sd[p + ".qweight"],
            sd[p + ".qzeros"],
            sd[p + ".scales"],
            g_idx,
        )
        # hand the HF mapper a standard [out, in] weight tensor
        fp_sd[p + ".weight"] = w.T
        for suffix in (".qweight", ".qzeros", ".scales", ".g_idx"):
            fp_sd.pop(p + suffix, None)
    params = params_from_hf_state_dict(cfg, fp_sd)
    if keep_fp:
        return params

    # stack native asymmetric records over layers where ALL layers have them
    is_opt = not cfg.rope
    lp = ("model.decoder.layers.{}." if is_opt else "model.layers.{}.")
    name_map = {
        ("attn", "wq"): "self_attn.q_proj",
        ("attn", "wk"): "self_attn.k_proj",
        ("attn", "wv"): "self_attn.v_proj",
        ("attn", "wo"): "self_attn.out_proj" if is_opt else "self_attn.o_proj",
        ("mlp", "w1"): "fc1" if is_opt else "mlp.up_proj",
        ("mlp", "w2"): "fc2" if is_opt else "mlp.down_proj",
        ("mlp", "wg"): None if is_opt else "mlp.gate_proj",
    }
    qc = QuantConfig(weight_dtype="int4", group_size=group_size)
    layers = params["layers"]
    for (grp_key, wname), hf_name in name_map.items():
        if hf_name is None or wname not in layers.get(grp_key, {}):
            continue
        pref = [lp.format(i) + hf_name for i in range(cfg.num_layers)]
        if all(px in native_recs for px in pref):
            qs = np.stack([native_recs[px][0] for px in pref])
            ss = np.stack([native_recs[px][1] for px in pref])
            zs = np.stack([native_recs[px][2] for px in pref])
            layers[grp_key][wname] = QuantizedWeight(qs, ss, "woq_int4z", zs)
        else:  # lossy fallback (act-order / partial coverage)
            layers[grp_key][wname] = quantize_weight(
                np.asarray(layers[grp_key][wname]), qc
            )
    return params
