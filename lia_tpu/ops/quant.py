"""Weight-only quantization (INT8 / INT4) with dequant fused into the matmul.

Reference equivalents: the WOQ GEMM kernels csrc/cpu/aten/kernels/WoqTppKrnl.cpp
(dequant intrinsics :132-536, grouped dequant :886-1069) / WoqLinearKrnl.cpp and the
``WeightOnlyQuantizedLinear`` module
(intel_extension_for_pytorch/nn/modules/weight_only_quantization.py:17), with CLI
knobs weight-dtype/group-size/lowp-mode (examples run.py:109-166).

TPU design: weights live in HBM as int8 (or nibble-packed int4) plus per-group fp
scales; dequantization happens on the way into the MXU. Two paths:

- **XLA path** (this module): ``convert → scale → dot``. XLA fuses the elementwise
  dequant chain into the matmul operand read, so HBM traffic is the quantized bytes —
  already the main win.
- **Pallas path** (:mod:`lia_tpu.ops.pallas_matmul`): blocked kernel that DMAs int8
  tiles HBM→VMEM and dequantizes in-register before the MXU — used on the decode
  hot path where the XLA fusion boundary isn't tight enough.

A quantized weight is a :class:`QuantizedWeight` pytree node — ``q``/``s`` are array
leaves (so stacked-layer slicing, device_put, and jit tracing all work unchanged)
while ``fmt`` rides in static aux data. ``fmt`` is ``woq_int8`` or ``woq_int4``
(nibble-packed along the `in` axis).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import ModelConfig, QuantConfig

QUANT_FORMATS = (
    "woq_int8", "woq_int8_dyn", "woq_int4", "woq_int4_dyn", "woq_int4z",
    "woq_int4z_dyn", "woq_nf4", "static_int8"
)

# NF4 codebook (QLoRA "normal float": quantiles of N(0,1) scaled to [-1, 1]) —
# the same 16-entry table the reference dequantizes with a LUT in
# WoqTppKrnl.cpp:132-536 (``--weight-dtype nf4``, examples run.py:114-166).
NF4_CODEBOOK = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    np.float32,
)
_NF4_BOUNDARIES = (NF4_CODEBOOK[1:] + NF4_CODEBOOK[:-1]) / 2.0


@jax.tree_util.register_pytree_node_class
class QuantizedWeight:
    """Pytree node: quantized values + grouped scales; format tag is static.

    ``woq_int4z`` is the ASYMMETRIC int4 form (GPTQ-native): ``q`` holds raw
    nibble codes in [0, 15] (global half-split packed) and ``z`` per-group
    zero-points, ``w = (code - z) * s``. Symmetric formats leave ``z`` None.

    ``static_int8`` is the W8A8 form (static activation quantization): ``q`` int8
    per-OUT-CHANNEL symmetric weights (``s`` [..., 1, N]); ``z`` holds the STATIC
    per-tensor activation scale (calibrated, [...] one scalar per stacked layer).
    The matmul quantizes x with ``z``, runs an int8×int8→int32 ``dot_general``
    (MXU int8 mode — 2× bf16 peak on v5e), and rescales by ``z * s`` — the TPU
    analog of the reference's static-INT8 linear
    (intel_extension_for_pytorch/quantization/_smooth_quant.py observers +
    qlinear; its 2× AMX-int8 peak maps to the MXU's 2× int8 peak).
    """

    __slots__ = ("q", "s", "fmt", "z")

    def __init__(self, q, s, fmt: str, z=None):
        self.q = q
        self.s = s
        self.fmt = fmt
        self.z = z

    def tree_flatten(self):
        return (self.q, self.s, self.z), self.fmt

    @classmethod
    def tree_unflatten(cls, fmt, children):
        return cls(children[0], children[1], fmt, children[2])

    def __repr__(self):
        return f"QuantizedWeight({self.fmt}, q={getattr(self.q, 'shape', None)})"


def is_quantized(w: Any) -> bool:
    return isinstance(w, (QuantizedWeight, QuantizedWeightRef))


@jax.tree_util.register_pytree_node_class
class QuantizedWeightRef:
    """One layer's view into a STACKED QuantizedWeight, selected by a traced
    index — built by the fused decode scan so the W4A8 Pallas kernel can read
    weight blocks straight out of the stacked buffer (scalar-prefetch
    index_map) instead of consuming a per-layer dynamic-slice.

    Why: XLA fuses a leading-dim slice into a consuming dot, but a
    ``pallas_call`` operand must be a materialized buffer, so scanning sliced
    int4 weights pays a hidden copy ≈ 2.6× the packed bytes — measured 1.64×
    per call and the reason model-level W4A8 lost to int8-dyn in r4
    (RESULTS.md). Formats without a stacked kernel fall back to an eager
    slice in :func:`quantized_matmul` (identical to the old behavior).
    """

    __slots__ = ("q", "s", "fmt", "z", "idx")

    def __init__(self, q, s, fmt: str, z, idx):
        self.q = q  # [L, ...] stacked
        self.s = s
        self.fmt = fmt
        self.z = z
        self.idx = idx  # scalar int32 layer index (traced)

    def tree_flatten(self):
        return (self.q, self.s, self.z, self.idx), self.fmt

    @classmethod
    def tree_unflatten(cls, fmt, children):
        return cls(children[0], children[1], fmt, children[2], children[3])

    def sliced(self) -> "QuantizedWeight":
        """Eager per-layer slice (the XLA fallback path)."""
        take = lambda a: (
            None if a is None else jax.lax.dynamic_index_in_dim(a, self.idx, 0, False)
        )
        return QuantizedWeight(take(self.q), take(self.s), self.fmt, take(self.z))


_STACKED_KERNEL_FMTS = ("woq_int4_dyn", "woq_int4z_dyn")


def stackable_ref(rec) -> bool:
    """Should the fused decode scan pull this stacked weight out of the scan
    xs and address it via :class:`QuantizedWeightRef`? Only formats with a
    stacked Pallas kernel benefit; everything else scans as before (XLA fuses
    the slice into the dot for free)."""
    from lia_tpu.ops import dispatch

    return (
        isinstance(rec, QuantizedWeight)
        and rec.fmt in _STACKED_KERNEL_FMTS
        and rec.q.ndim == 3  # stacked [L, K/2, N]
        and dispatch.use_pallas()
        and dispatch.tp_mesh() is None  # stacked refs have no shard_map wrap
        and dispatch.stacked_w4a8_enabled()  # default OFF — measured slower
        # at model level than XLA's pipelined scan-xs copies (see dispatch)
    )


# ---------------------------------------------------------------------------
# Quantize (host-side, numpy — runs at load time like the reference's
# quantize-on-load WOQ flow)
# ---------------------------------------------------------------------------


def quantize_weight(w: np.ndarray, qc: QuantConfig) -> "QuantizedWeight":
    """Quantize ``[..., in, out]`` symmetric per-(group, out-channel).

    group_size == -1 → one group over the whole `in` axis (per-out-channel scales).
    """
    w = np.asarray(w, np.float32)
    *lead, K, N = w.shape
    g = K if qc.group_size <= 0 else qc.group_size
    assert K % g == 0, f"in-dim {K} not divisible by group size {g}"
    ng = K // g
    fmt8 = "woq_int8"
    fmt4 = "woq_int4"
    if qc.act_quant == "dynamic":
        if qc.weight_dtype == "int8":
            if ng != 1:
                raise ValueError(
                    "act_quant='dynamic' with int8 needs per-channel scales "
                    "(group_size=-1): the int32 dot sums the whole K axis, so "
                    "per-group rescale is not expressible post-hoc"
                )
            fmt8 = "woq_int8_dyn"
        elif qc.weight_dtype == "int4":
            # W4A8: per-group batched int8 dots handle grouped scales (the
            # half-split packing keeps each half's groups whole)
            fmt4 = "woq_int4_dyn"
        else:
            # nf4 codebook values are not integers — no int8 MXU form exists
            raise ValueError("act_quant='dynamic' needs int8 or int4 weights")

    if qc.weight_dtype == "nf4":
        # NF4 (QLoRA normal-float): per-group absmax normalization to [-1, 1],
        # nearest-codebook-entry codes, packed with the same GLOBAL half-split
        # as int4 (byte r = rows (r, K/2 + r)) so the Pallas kernel runs two
        # plain matmuls per tile. Reference: WoqTppKrnl.cpp NF4 LUT dequant.
        wg = w.reshape(*lead, ng, g, N)
        scale = np.maximum(np.abs(wg).max(axis=-2, keepdims=True), 1e-8)
        codes = np.searchsorted(_NF4_BOUNDARIES, wg / scale).astype(np.uint8)
        codes = codes.reshape(*lead, K, N)
        s = scale.squeeze(-2).astype(np.float32)  # [..., ng, N]
        packed = (codes[..., : K // 2, :] & 0xF) | (codes[..., K // 2 :, :] << 4)
        return QuantizedWeight(packed, s, "woq_nf4")

    # native OpenMP path (liahost.cpp quantize_int8/int4) — ~30x over numpy
    from lia_tpu import native

    if native.available() and qc.weight_dtype in ("int8", "int4"):
        w2 = np.ascontiguousarray(w.reshape(-1, K, N) if lead else w[None])
        qs, ss = [], []
        for i in range(w2.shape[0]):
            if qc.weight_dtype == "int8":
                q_i, s_i = native.quantize_int8(w2[i], g)
            else:
                q_i, s_i = native.quantize_int4(w2[i], g)
            qs.append(q_i)
            ss.append(s_i)
        q = np.stack(qs).reshape(*lead, -1, N) if lead else qs[0]
        s = np.stack(ss).reshape(*lead, ng, N) if lead else ss[0]
        fmt = fmt8 if qc.weight_dtype == "int8" else fmt4
        return QuantizedWeight(q, s, fmt)

    wg = w.reshape(*lead, ng, g, N)
    if qc.weight_dtype == "int8":
        qmax = 127.0
    elif qc.weight_dtype == "int4":
        qmax = 7.0
    else:
        raise ValueError(qc.weight_dtype)
    scale = np.abs(wg).max(axis=-2, keepdims=True) / qmax  # [..., ng, 1, N]
    scale = np.maximum(scale, 1e-8)
    q = np.rint(wg / scale).clip(-qmax - 1, qmax).astype(np.int8)
    q = q.reshape(*lead, K, N)
    s = scale.squeeze(-2).astype(np.float32)  # [..., ng, N]
    if qc.weight_dtype == "int4":
        # biased nibbles in [0, 15], packed two-per-byte with a GLOBAL
        # half-split: byte r holds (lo = row r, hi = row K/2 + r). The kernel
        # then runs TWO plain matmuls (x[:, :K/2] @ lo, x[:, K/2:] @ hi) with
        # no concat/interleave relayout at all — the reassembly shuffle is what
        # dominated the round-1 int4 kernel. Packing is row-based and valid for
        # any group layout; paths that need half-aligned groups (the W4A8 dyn
        # dots, the Pallas kernel) guard on that in quantized_matmul and fall
        # back to the dequantize path when groups straddle K/2.
        b = (q + 8).astype(np.uint8)
        bh = b.reshape(*lead, K, N)
        packed = (bh[..., : K // 2, :] & 0xF) | (bh[..., K // 2 :, :] << 4)
        return QuantizedWeight(packed, s, fmt4)
    return QuantizedWeight(q, s, fmt8)


def retag_dynamic_act(params):
    """Switch every int4 :class:`QuantizedWeight` in a param tree to its
    dynamic-activation form (``woq_int4 → woq_int4_dyn``, ``woq_int4z →
    woq_int4z_dyn``) — the payloads are identical; only the matmul dispatch
    changes (per-token int8 act quant + int8×int8 MXU dots, with the rowsum
    zero-point correction for the asymmetric form). Used to run GPTQ
    checkpoints on the W4A8 fast path (``--gptq --act-quant dynamic``)."""
    remap = {"woq_int4": "woq_int4_dyn", "woq_int4z": "woq_int4z_dyn"}

    def f(x):
        if is_quantized(x) and x.fmt in remap:
            if x.fmt == "woq_int4z" and x.z is None:
                return x  # malformed asym record: leave on the dequant path
            return QuantizedWeight(x.q, x.s, remap[x.fmt], x.z)
        return x

    return jax.tree.map(f, params, is_leaf=is_quantized)


def quantize_weight_static(w: np.ndarray, act_amax: np.ndarray) -> "QuantizedWeight":
    """W8A8 static quantization of ``[..., K, N]`` (stacked lead dims OK).

    Weights: symmetric per-out-channel int8 (one scale per N column).
    ``act_amax``: per-layer |activation| maximum over the calibration set —
    shape [...] matching the lead dims (scalar for 2-D weights). Stored as the
    static activation scale ``z = act_amax / 127``.
    """
    w = np.asarray(w, np.float32)
    *lead, K, N = w.shape
    s = np.maximum(np.abs(w).max(axis=-2, keepdims=True) / 127.0, 1e-8)  # [...,1,N]
    q = np.rint(w / s).clip(-128, 127).astype(np.int8)
    act_scale = np.maximum(np.asarray(act_amax, np.float32) / 127.0, 1e-8)
    act_scale = np.broadcast_to(act_scale, tuple(lead)).copy()  # [...] per layer
    return QuantizedWeight(q, s.astype(np.float32), "static_int8", act_scale)


def _quantize_layer_tree(layers: Dict[str, Any], qc: QuantConfig) -> Dict[str, Any]:
    new_layers: Dict[str, Any] = {}
    for grp_name, grp in layers.items():
        new_grp: Dict[str, Any] = {}
        for k, v in grp.items():
            # [L, K, N] dense linears and [L, E, K, N] stacked MoE experts;
            # the fp router ("router", [L, H, E]) stays high-precision
            if k.startswith("w") and np.ndim(v) in (3, 4):
                new_grp[k] = quantize_weight(np.asarray(v), qc)
            else:
                new_grp[k] = v
        new_layers[grp_name] = new_grp
    return new_layers


def quantize_params(cfg: ModelConfig, params: Dict[str, Any], qc: QuantConfig):
    """Quantize every decoder-layer matmul weight (stacked [L, in, out]) plus,
    when ``qc.quant_lm_head`` (default), the untied lm_head.

    Embeddings, norms, and biases stay high-precision — same scope as the
    reference WOQ flow (it converts Linear modules, lm_head included). Works
    over every family tree: decoder-only ``layers``, T5's ``enc``/``dec``
    stacks (incl. the cross-attention group), GIT's text decoder + ``output``
    head (the vision tower stays high-precision — its FLOPs are a one-time
    prefix cost, not per-token bandwidth).
    """
    out = dict(params)
    if "layers" in params:
        out["layers"] = _quantize_layer_tree(params["layers"], qc)
    for stack in ("enc", "dec"):  # t5 encoder/decoder stacks
        if stack in params and isinstance(params[stack], dict) and "layers" in params[stack]:
            out[stack] = {
                **params[stack],
                "layers": _quantize_layer_tree(params[stack]["layers"], qc),
            }

    def _quant_2d(w):
        K = np.shape(w)[0]
        g = qc.group_size if qc.group_size > 0 else K
        return quantize_weight(np.asarray(w), qc) if K % g == 0 else w

    if qc.quant_lm_head and "lm_head" in out and np.ndim(out["lm_head"]) == 2:
        if qc.weight_dtype == "int4" and not getattr(cfg, "encoder_decoder", False):
            # int4 heads go through the padding/fallback logic so the fused
            # W4A8 kernel stays eligible (transformer._lm_head slices the pad;
            # T5's head consumer does not slice, so it keeps _quant_2d)
            out["lm_head"] = quantize_head_2d(np.asarray(out["lm_head"], np.float32), qc)
        else:
            out["lm_head"] = _quant_2d(out["lm_head"])
    if qc.quant_lm_head and "output" in out and isinstance(out["output"], dict):
        out["output"] = {**out["output"], "w": _quant_2d(out["output"]["w"])}  # git head
    if (
        qc.quant_lm_head
        and "lm_head" not in out
        and "embed_tokens" in out
        and getattr(cfg, "tie_embeddings", False)
        and not getattr(cfg, "encoder_decoder", False)
    ):
        out["lm_head"] = quantize_tied_head(out["embed_tokens"], qc)
    return out


def quantize_tied_head(embed, qc: QuantConfig) -> "QuantizedWeight":
    """Quantized TRANSPOSED head copy for tied-embedding models.

    With tied embeddings the logits matmul otherwise streams the full fp embed
    table every step (OPT-6.7B: 412 MB bf16 — the largest fixed per-step HBM
    read). The fp table stays for the token gather; this int8/int4 copy serves
    the head matmul at ~2×/4× less bandwidth for +V·E/2 bytes of memory. The
    reference WOQ converts the lm_head Linear identically (tied storage is
    free there only because AMX consumes bf16 directly). int4 applies when
    the fused W4A8 kernel's tiling accepts the shape (E % 256, whole groups
    per half; non-128-multiple vocabs like OPT's 50272 are zero-padded by
    quantize_head_2d and sliced back in the lm_head consumer); otherwise the
    head takes per-channel int8 — always a QuantizedWeight, never None.
    """
    w = np.ascontiguousarray(np.asarray(embed, np.float32).T)
    return quantize_head_2d(w, qc)


def quantize_head_2d(w: np.ndarray, qc: QuantConfig) -> "QuantizedWeight":
    """Quantize an [E, V] logits head, padding V to the W4A8 kernel's tiling.

    int4 heads otherwise fall back to the materializing XLA path whenever the
    vocab is not a 128-multiple (OPT: 50272) — zero-padding to the next
    128-multiple keeps the fused kernel eligible; ``lm_head`` slices the
    logits back to the true vocab (padded columns quantize to exact zeros).
    int4 still needs E % 256 and whole groups per packed half; failing those,
    the head takes per-channel int8 (never slower than the fp table).
    """
    E, V = np.shape(w)
    g = qc.group_size
    use_int4 = (
        qc.weight_dtype == "int4"
        and E % 256 == 0
        and (g <= 0 or ((E // 2) % g == 0 and (8 * g) % 128 == 0))
    )
    if use_int4 and V % 128:
        w = np.pad(w, ((0, 0), (0, 128 - V % 128)))
    hqc = QuantConfig(
        weight_dtype="int4" if use_int4 else "int8",
        group_size=g if use_int4 else -1,
        sym=qc.sym,
        act_quant=qc.act_quant,
    )
    return quantize_weight(w, hqc)


def quantize_params_static(
    cfg: ModelConfig, params: Dict[str, Any], act_scales: Dict[str, np.ndarray]
):
    """Static-INT8 (W8A8) quantization of every decoder-layer linear.

    ``act_scales``: per-channel |activation| maxima from
    :func:`lia_tpu.ops.smoothquant.collect_act_scales` — reduced here to one
    static per-tensor scale per (layer, linear). The reference analog is the
    observer-calibrated static qconfig flow
    (intel_extension_for_pytorch/quantization/_smooth_quant.py).
    """
    key_to_obs = {
        ("attn", "wq"): "qkv", ("attn", "wk"): "qkv", ("attn", "wv"): "qkv",
        ("attn", "wo"): "wo_in",
        ("mlp", "w1"): "mlp_in", ("mlp", "wg"): "mlp_in",
        ("mlp", "w2"): "w2_in",
    }
    out = dict(params)
    layers = params["layers"]
    new_layers: Dict[str, Any] = {}
    for grp_name, grp in layers.items():
        new_grp: Dict[str, Any] = {}
        for k, v in grp.items():
            obs = key_to_obs.get((grp_name, k))
            if obs is not None and k.startswith("w") and np.ndim(v) == 3:
                amax = np.asarray(act_scales[obs], np.float32).max(axis=-1)  # [L]
                new_grp[k] = quantize_weight_static(np.asarray(v), amax)
            else:
                new_grp[k] = v
        new_layers[grp_name] = new_grp
    out["layers"] = new_layers
    return out


# ---------------------------------------------------------------------------
# Dequantizing matmul (XLA path)
# ---------------------------------------------------------------------------


def dequantize(rec: "QuantizedWeight", dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the fp weight [..., K, N] (golden path / XLA pre-fusion form)."""
    q, s = rec.q, rec.s
    if rec.fmt == "woq_nf4":
        # global half-split packed codebook indices → 16-entry LUT gather
        lo = (q & 0xF).astype(jnp.int32)
        hi = ((q >> 4) & 0xF).astype(jnp.int32)
        codes = jnp.concatenate([lo, hi], axis=-2)
        qi = jnp.asarray(NF4_CODEBOOK)[codes]
    elif rec.fmt.startswith("woq_int4"):
        # global half-split packing: byte r holds rows (r, K/2 + r)
        bias = 0 if rec.fmt.startswith("woq_int4z") else 8  # int4z keeps raw codes
        lo = (q & 0xF).astype(jnp.int32) - bias
        hi = ((q >> 4) & 0xF).astype(jnp.int32) - bias
        qi = jnp.concatenate([lo, hi], axis=-2)
    else:
        qi = q
    *lead, K, N = qi.shape
    ng = s.shape[-2]
    wg = qi.reshape(*lead, ng, K // ng, N).astype(jnp.float32)
    if rec.fmt.startswith("woq_int4z"):
        wg = wg - rec.z[..., :, None, :]
    w = wg * s[..., :, None, :]
    return w.reshape(*lead, K, N).astype(dtype)


def _w4a8_blocks(M: int, K: int, N: int, ng: int):
    """Block sizes for the fused W4A8 Pallas kernel, or None → XLA fallback.

    Constraints: packed half-rows must tile in 128-multiples (Mosaic lane dim),
    grouped scales need 8-group 128-multiple K tiles (sublane rule), N/M must
    tile evenly. The lm_head's 50272 vocab fails the N rule and falls back.
    """
    from lia_tpu.ops import dispatch

    if not dispatch.use_pallas():
        return None
    if dispatch.tp_mesh() is not None:
        # an unwrapped pallas_call under a mesh would force all-gathers of the
        # sharded operands — only the shard_map path (tp_inner) may run it
        return None
    if K % 256 != 0:
        return None
    g = K // ng
    if ng > 1 and (ng % 2 or (K // 2) % g or (8 * g) % 128):
        return None
    bn = dispatch.pick_block(N, 512, minimum=128)
    if bn is None:
        return None
    bm = M if M <= 256 else dispatch.pick_block(M, 256, minimum=8)
    if bm is None:
        return None
    return bm, bn


def _pallas_woq_viable(x2d, rec) -> bool:
    """Tiling constraints for the fused kernel (wrapper enforces the rest)."""
    from lia_tpu.ops import dispatch

    if not dispatch.use_pallas():
        return False
    if dispatch.tp_mesh() is not None:  # see _w4a8_blocks: shard_map path only
        return False
    M, K = x2d.shape
    N = rec.q.shape[-1]
    ng = rec.s.shape[-2]
    g = K // ng
    # nibble-packed formats share the int4 half-split tiling rules
    int4 = rec.fmt.startswith("woq_int4") or rec.fmt == "woq_nf4"
    if N % 128 != 0:
        return False
    if K % (128 if not int4 else 256) != 0:
        return False
    if int4:
        # global half-split: groups must tile K/2 and 8 groups must make a
        # 128-multiple half-tile (scale-block sublane rule)
        if g != K and ((K // 2) % g != 0 or (8 * g) % 128 != 0):
            return False
    elif g % 128 != 0 and g != K:
        return False
    if M % 8 != 0 and M < 8:
        return M >= 1  # tiny M handled by bm == M (full-dim block)
    return True


def _stacked_ref_matmul(x: jnp.ndarray, rec: "QuantizedWeightRef"):
    """W4A8 against one layer of a stacked weight via the scalar-prefetch
    kernel, or None → caller slices eagerly (old behavior). Mirrors the
    woq_int4_dyn / woq_int4z_dyn fused branches of :func:`quantized_matmul`.
    """
    if rec.fmt not in _STACKED_KERNEL_FMTS or rec.q.ndim != 3:
        return None
    if rec.fmt == "woq_int4z_dyn" and rec.z is None:
        return None
    ng = rec.s.shape[-2]
    if not (ng == 1 or ng % 2 == 0):
        return None
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = rec.q.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    blocks = _w4a8_blocks(M, K, N, ng)
    if blocks is None:
        return None
    from lia_tpu.ops.pallas_matmul import w4a8_matmul_stacked

    s_x = jnp.max(jnp.abs(x2).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    xq = jnp.round(x2.astype(jnp.float32) / s_x).astype(jnp.int8)
    bm, bn = blocks
    z = rec.z if rec.fmt == "woq_int4z_dyn" else None
    out = w4a8_matmul_stacked(
        xq, s_x, rec.q, rec.s, z, rec.idx,
        group_size=-1 if ng == 1 else K // ng, block_m=bm, block_n=bn,
    )
    return out.reshape(*lead, N)


def _tp_quantized_matmul(x, rec, split: str, mesh):
    """Shard-mapped WOQ matmul under a TP mesh, or None → GSPMD jnp fallback.

    The reference's TP runs its WOQ AMX kernels per rank on the weight shard
    (tensor_parallel.py:266-414 shards WeightOnlyQuantizedLinear op-contexts;
    decoder.py:60-77 allreduces after out-proj/fc2). TPU analog:

    - ``col`` (wq/wk/wv/w1/wg/lm_head — output dim on "model"): each shard
      runs the fused kernel on its N-slice; scales/zeros split the same axis;
      no collective. Dynamic act scales come from the FULL (replicated) x, so
      results match single-device bitwise.
    - ``row`` (wo/w2 — input dim on "model"): each shard's contiguous slice of
      the globally half-split packed bytes decodes rows
      ``[b0, b0+Kh/tp) ∪ [K/2+b0, K/2+b0+Kh/tp)`` — itself a valid LOCALLY
      half-split packed weight for the matching permuted x-slice. The shard
      gathers those x rows from the replicated input, slices its lo/hi scale
      groups, runs the same kernel, and a ``psum`` over "model" completes the
      dot. Dynamic act scales are per-shard-slice — exactly the semantics of
      the reference's per-rank dynamic quantization (each rank quantizes only
      its own activation shard).
    """
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from lia_tpu.ops import dispatch, tp_shard as tps

    tp, _ = tps.axis_sizes(mesh)
    if tp == 1 or rec.q.ndim != 2:
        return None
    K = x.shape[-1]
    N = rec.q.shape[-1]
    ng = rec.s.shape[-2]
    g = K // ng
    int4 = rec.fmt.startswith("woq_int4") or rec.fmt == "woq_nf4"
    fmt = rec.fmt
    d = tps.batch_axis(mesh, x.shape[0]) if x.ndim >= 2 else None
    lead = (d,) + (None,) * (x.ndim - 2)
    M_ = tps.MODEL
    has_z = rec.z is not None
    z_arr = rec.z

    def zspec(col: bool):
        if not has_z or getattr(z_arr, "ndim", 0) == 0:
            return P()  # static_int8 act scale — replicated scalar
        return P(None, M_) if col else P(None, None)

    if split == "col":
        if N % tp:
            return None

        def f_col(xf, q, s, z=None):
            return quantized_matmul(xf, QuantizedWeight(q, s, fmt, z))

        in_specs = [P(*lead, None), P(None, M_), P(None, M_)]
        args = [x, rec.q, rec.s]
        if has_z:
            in_specs.append(zspec(col=True))
            args.append(z_arr)
        return tps.shard_call(f_col, mesh, in_specs, P(*lead, M_), *args)

    if split != "row":
        return None
    if int4:
        Kh = K // 2
        if Kh % tp:
            return None
        blk = Kh // tp  # packed bytes (= rows per half) per shard
        if ng > 1 and (ng % 2 or blk % g):
            return None
    else:
        if K % tp:
            return None
        blk = K // tp
        if ng > 1 and blk % g:
            return None

    def f_row(xf, q, s, z=None):
        i = _jax.lax.axis_index(M_)
        if int4:
            b0 = i * blk
            x_loc = jnp.concatenate(
                [
                    _jax.lax.dynamic_slice_in_dim(xf, b0, blk, axis=-1),
                    _jax.lax.dynamic_slice_in_dim(xf, (K // 2) + b0, blk, axis=-1),
                ],
                axis=-1,
            )
            if ng == 1:
                s_loc, z_loc = s, z
            else:
                nl = blk // g
                gl0 = i * nl

                def halves(a):
                    return jnp.concatenate(
                        [
                            _jax.lax.dynamic_slice_in_dim(a, gl0, nl, axis=0),
                            _jax.lax.dynamic_slice_in_dim(a, ng // 2 + gl0, nl, axis=0),
                        ],
                        axis=0,
                    )

                s_loc = halves(s)
                z_loc = halves(z) if z is not None and getattr(z, "ndim", 0) else z
        else:
            b0 = i * blk
            x_loc = _jax.lax.dynamic_slice_in_dim(xf, b0, blk, axis=-1)
            if ng == 1:
                s_loc, z_loc = s, z
            else:
                nl = blk // g
                s_loc = _jax.lax.dynamic_slice_in_dim(s, i * nl, nl, axis=0)
                z_loc = z  # int8 formats carry no grouped zero points
        part = quantized_matmul(x_loc, QuantizedWeight(q, s_loc, fmt, z_loc))
        return _jax.lax.psum(part, M_)

    in_specs = [P(*lead, None), P(M_, None), P(None, None)]
    args = [x, rec.q, rec.s]
    if has_z:
        in_specs.append(zspec(col=False))
        args.append(z_arr)
    return tps.shard_call(f_row, mesh, in_specs, P(*lead, None), *args)


def quantized_matmul(
    x: jnp.ndarray, rec: "QuantizedWeight", tp_split: Optional[str] = None
) -> jnp.ndarray:
    """x @ dequant(rec) with fp32 accumulation; returns fp32.

    On TPU (shapes permitting) this routes to the Pallas fused dequant-matmul
    (:mod:`lia_tpu.ops.pallas_matmul`) — int8/int4 tiles DMA HBM→VMEM and are
    dequantized in-register before the MXU, so HBM traffic is the quantized
    bytes. Fallback is the XLA ``convert → scale → dot`` form.

    ``tp_split`` ("col" | "row" | None) names how the weight is sharded over
    the registered TP mesh (set by the model code at each call site); under a
    mesh the kernel then runs per shard via :func:`_tp_quantized_matmul`
    instead of falling back to the partitioned-jnp path.
    """
    from lia_tpu.ops import dispatch

    if (
        tp_split is not None
        and not isinstance(rec, QuantizedWeightRef)
        and getattr(rec, "q", None) is not None
        and rec.q.ndim == 2
        and dispatch.use_pallas()
    ):
        mesh = dispatch.tp_mesh()
        if mesh is not None:
            out = _tp_quantized_matmul(x, rec, tp_split, mesh)
            if out is not None:
                return out
    if isinstance(rec, QuantizedWeightRef):
        out = _stacked_ref_matmul(x, rec)
        if out is not None:
            return out
        rec = rec.sliced()  # no stacked kernel for this shape — old behavior
    if rec.fmt == "static_int8":
        # W8A8: static per-tensor act quant → int8×int8→int32 MXU dot → rescale.
        # XLA lowers the int8 dot to the MXU's double-rate int8 mode natively;
        # the quantize/rescale elementwise ops fuse around it.
        s_x = rec.z  # static activation scale (scalar after scan slicing)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_x), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, rec.q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * (s_x * rec.s[..., 0, :])

    if rec.fmt == "woq_int8_dyn":
        # Dynamic activation quantization: per-token symmetric int8 act quant →
        # int8×int8→int32 MXU dot → rescale by (act scale × per-channel weight
        # scale). The reference's WOQ "lowp-mode INT8" quantize-A path
        # (WoqTppKrnl.cpp); on v5e this skips the int8→bf16 weight convert that
        # bounds the dequant kernel (~480 GB/s → ~525 GB/s measured at decode
        # shapes, experiments/bench_int8_dot.py) and runs the MXU at 2× rate.
        s_x = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-8)
        xq = jnp.round(x.astype(jnp.float32) / s_x).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, rec.q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * (s_x * rec.s[..., 0, :])

    if (
        rec.fmt == "woq_int4_dyn"
        and rec.q.ndim == 2
        and (rec.s.shape[-2] == 1 or rec.s.shape[-2] % 2 == 0)
    ):
        # (odd group counts > 1 can't split across the packed halves — they
        # take the dequantize fallback below; quantize_weight's half-split
        # packing makes ng even for any g that tiles K/2, the practical configs)
        # W4A8: per-token int8 act quant → nibble codes unpacked IN INT8 (and/
        # shift/sub only — no int→float convert, which is what bounds the int4
        # dequant kernel at ~200 GB/s) → per-group batched int8×int8→int32 MXU
        # dots → rescale by (act scale × per-group weight scale). The global
        # half-split packing keeps each half's groups whole, so the lo/hi
        # halves run as two batched dots over [ng/2, g, N] with no relayout.
        lead = x.shape[:-1]
        K = x.shape[-1]
        Kh = K // 2
        N = rec.q.shape[-1]
        ng = rec.s.shape[-2]
        x2 = x.reshape(-1, K)
        M = x2.shape[0]
        s_x = jnp.max(jnp.abs(x2).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-8)
        xq = jnp.round(x2.astype(jnp.float32) / s_x).astype(jnp.int8)
        blocks = _w4a8_blocks(M, K, N, ng)
        if blocks is not None:
            # fused Pallas path: packed tile DMAs HBM→VMEM once, nibbles unpack
            # in-register, int8×int8 MXU dots — HBM traffic is the int4 bytes
            # (the jnp path below materializes the unpacked halves through HBM:
            # ~2.5× the bytes, which held W4A8 at int8 per-call parity)
            from lia_tpu.ops.pallas_matmul import w4a8_matmul

            bm, bn = blocks
            out = w4a8_matmul(
                xq, s_x, rec.q, rec.s, None,
                group_size=-1 if ng == 1 else K // ng, block_m=bm, block_n=bn,
            )
            return out.reshape(*lead, N)
        pu = rec.q.astype(jnp.uint8)
        lo = (pu & 0xF).astype(jnp.int8) - jnp.int8(8)  # rows [0, K/2)
        hi = (pu >> 4).astype(jnp.int8) - jnp.int8(8)  # rows [K/2, K)
        if ng == 1:
            y = jax.lax.dot_general(
                xq[:, :Kh], lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                xq[:, Kh:], hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = y.astype(jnp.float32) * (s_x * rec.s[0])
        else:
            g = K // ng
            ngh = ng // 2
            out = jnp.zeros((M, N), jnp.float32)
            for half, codes in ((0, lo), (1, hi)):
                xg = xq[:, half * Kh : (half + 1) * Kh].reshape(M, ngh, g)
                yg = jax.lax.dot_general(
                    xg.transpose(1, 0, 2), codes.reshape(ngh, g, N),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # [ngh, M, N]
                out = out + jnp.einsum(
                    "gmn,gn->mn", yg.astype(jnp.float32),
                    rec.s[half * ngh : (half + 1) * ngh],
                )
            out = out * s_x
        return out.reshape(*lead, N)

    if (
        rec.fmt == "woq_int4z_dyn"
        and rec.z is not None
        and rec.q.ndim == 2
        and (rec.s.shape[-2] == 1 or rec.s.shape[-2] % 2 == 0)
    ):
        # Asymmetric W4A8 (GPTQ-native zero points × dynamic int8 acts): the
        # zero-point expands out of the dot —
        #   y = s_x·s[g]·( Σ_k x8·code  −  z[g]·Σ_k x8 )
        # so one int8 rowsum per (token, group) turns the asym format into the
        # same batched int8×int8 MXU dots as woq_int4_dyn. This marries GPTQ's
        # Hessian-guided accuracy with the fastest int4 decode path (the
        # reference's zp-aware lowp-mode, WoqTppKrnl.cpp:886-1069).
        lead = x.shape[:-1]
        K = x.shape[-1]
        Kh = K // 2
        N = rec.q.shape[-1]
        ng = rec.s.shape[-2]
        x2 = x.reshape(-1, K)
        M = x2.shape[0]
        s_x = jnp.max(jnp.abs(x2).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-8)
        xq = jnp.round(x2.astype(jnp.float32) / s_x).astype(jnp.int8)
        blocks = _w4a8_blocks(M, K, N, ng)
        if blocks is not None:
            # fused Pallas path (see woq_int4_dyn above); the zp folds into an
            # in-kernel rowsum correction so asym runs the same int8 MXU dots
            from lia_tpu.ops.pallas_matmul import w4a8_matmul

            bm, bn = blocks
            out = w4a8_matmul(
                xq, s_x, rec.q, rec.s, rec.z,
                group_size=-1 if ng == 1 else K // ng, block_m=bm, block_n=bn,
            )
            return out.reshape(*lead, N)
        pu = rec.q.astype(jnp.uint8)
        lo = (pu & 0xF).astype(jnp.int8)  # raw codes 0..15 (no −8 bias)
        hi = ((pu >> 4) & 0xF).astype(jnp.int8)
        if ng == 1:
            out = jnp.zeros((M, N), jnp.float32)
            for half, codes in ((0, lo), (1, hi)):
                xh = xq[:, half * Kh : (half + 1) * Kh]
                y = jax.lax.dot_general(
                    xh, codes, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                rs = jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
                out = out + (y - rs * rec.z[0][None, :]) * rec.s[0][None, :]
            out = out * s_x
        else:
            g = K // ng
            ngh = ng // 2
            out = jnp.zeros((M, N), jnp.float32)
            for half, codes in ((0, lo), (1, hi)):
                xg = xq[:, half * Kh : (half + 1) * Kh].reshape(M, ngh, g)
                yg = jax.lax.dot_general(
                    xg.transpose(1, 0, 2), codes.reshape(ngh, g, N),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # [ngh, M, N]
                sh = rec.s[half * ngh : (half + 1) * ngh]
                zh = rec.z[half * ngh : (half + 1) * ngh]
                rs = jnp.sum(xg.astype(jnp.int32), axis=2).astype(jnp.float32)  # [M, ngh]
                out = out + jnp.einsum("gmn,gn->mn", yg.astype(jnp.float32), sh)
                out = out - jnp.einsum("mg,gn->mn", rs, sh * zh)
            out = out * s_x
        return out.reshape(*lead, N)

    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    if _pallas_woq_viable(x2d, rec) and rec.q.ndim == 2:
        from lia_tpu.ops import dispatch
        from lia_tpu.ops.pallas_matmul import woq_matmul

        M = x2d.shape[0]
        N = rec.q.shape[-1]
        ng = rec.s.shape[-2]
        g = K // ng
        # woq_int4_dyn reaching here (odd ng / non-2D / non-viable-dot shapes)
        # shares woq_int4's packing, so the dequant kernel is a valid fallback
        int4 = rec.fmt.startswith("woq_int4") or rec.fmt == "woq_nf4"
        bn = dispatch.pick_block(N, 512, minimum=128)
        if int4:
            # K grid walks packed rows [0, K/2): pick bkh with whole groups and
            # a 128-multiple row count (scale-block sublane = gpt ≥ 8 rule)
            Kh = K // 2
            if ng == 1:
                bk = dispatch.pick_block(Kh, 1024, minimum=128)
            else:
                bk = None
                for m in (8, 16, 32):
                    cand = g * m
                    if Kh % cand == 0 and cand % 128 == 0:
                        bk = cand
                        break
        elif ng == 1:
            bk = dispatch.pick_block(K, 1024, minimum=128)
            if bk is not None and (bk % 128 or K % bk):
                bk = None
        else:
            # scale block sublane (= groups per K tile) must be ≥8 or cover all
            # groups, so K tiles span either 8+ whole groups or the whole K axis
            bk = None
            for m in (8, 16, 32):
                cand = g * m
                if cand >= 128 and K % cand == 0 and cand % 128 == 0:
                    bk = cand
                    break
            if bk is None and K % 128 == 0:
                bk = K  # gpt == ng (full scale table per tile)
        # bound the x tile to VMEM (large bk → shrink bm)
        bm_cap = 256
        if bk is not None:
            x_tile = bk * (2 if int4 else 1)  # int4 reads two x tiles per cell
            bm_cap = max(8, min(256, (6 * 2**20) // (x_tile * 2)))
        bm = dispatch.pick_block(M, bm_cap, minimum=8) or (M if M <= bm_cap else None)
        if bn is not None and bk is not None and bm is not None:
            if rec.fmt.startswith("woq_int4z"):
                from lia_tpu.ops.pallas_matmul import woq4z_matmul

                y = woq4z_matmul(
                    x2d, rec.q, rec.s, rec.z, -1 if ng == 1 else g,
                    block_m=bm, block_n=bn, block_k=bk,
                    interpret=dispatch.interpret_mode(),
                )
            else:
                y = woq_matmul(
                    x2d, rec.q, rec.s, -1 if ng == 1 else g, int4=int4,
                    nf4=(rec.fmt == "woq_nf4"),
                    block_m=bm, block_n=bn, block_k=bk,
                    interpret=dispatch.interpret_mode(),
                )
            return y.reshape(*lead, N)
    w = dequantize(rec, jnp.bfloat16)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# INT8 KV cache (per-token scales)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class QuantizedKV:
    """INT8 KV plane(s) with per-token scales.

    ``q``: int8 [..., S, D] (head-major); ``s``: f32 [..., S] (scale per token per
    head). Registered as a pytree so it nests transparently inside
    :class:`lia_tpu.ops.kv_cache.KVCache` — ``lax.scan`` slicing, donation,
    device_put, and sharding all treat it as two array leaves.

    Reference analog: the INT8 KV option of the WOQ flow (run.py kv-cache knobs);
    north-star requirement "KV-cache held INT8" (BASELINE.json).
    """

    __slots__ = ("q", "s")

    def __init__(self, q, s):
        self.q = q
        self.s = s

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    @property
    def shape(self):  # logical (dequantized) shape
        return self.q.shape

    def __repr__(self):
        return f"QuantizedKV(q={getattr(self.q, 'shape', None)})"


def is_quantized_kv(x: Any) -> bool:
    return isinstance(x, QuantizedKV)


def quantize_kv(x: jnp.ndarray) -> QuantizedKV:
    """Quantize head-major K/V [..., S, D] with one symmetric scale per token."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [..., S]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -128, 127).astype(jnp.int8)
    return QuantizedKV(q, scale)


def dequantize_kv(kv: QuantizedKV, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (kv.q.astype(jnp.float32) * kv.s[..., None]).astype(dtype)
