"""Pallas fused dequant-matmul kernels (weight-only INT8/INT4).

Reference equivalent: csrc/cpu/aten/kernels/WoqTppKrnl.cpp (dequant intrinsics
:132-536, grouped dequant ``dequant_n_grouped`` :886-1069) and WoqLinearKrnl.cpp —
the AMX path that loads 4/8-bit weights, dequantizes in-register, and feeds BF16
tiles to the tile engine.

TPU design (round-2 rework): the kernel DMAs int8 (or nibble-packed int4) weight
tiles HBM→VMEM and feeds the MXU with the *unscaled* codes converted straight to
bf16 (int8 codes are exact in bf16). Scales are **deferred to the [bm, bn] output
tile per group**::

    y[m, n] = Σ_g  s[g, n] · Σ_{k∈g} x[m, k] · q[k, n]

so the per-element VPU work drops from convert+scale+round (the round-1 kernels
ran at ~270 GB/s, dequant-bound) to a single convert (~550 GB/s, measured 2.04×
on fc1 M=16 — experiments/bench_model_kernels.py). Zero-points fold into a
rank-1 output correction instead of a per-element subtract::

    x @ ((q - z_g) · s_g) = (x @ q_g - (Σ_{k∈g} x[m,k]) ⊗ z_g) · s_g

Accumulation is fp32 in VMEM scratch across the K grid dimension.

Mosaic legality: grouped scale blocks are [gpt, bn] and need gpt ≥ 8 (sublane
tile) unless gpt == ng (full dim). The wrappers therefore pick K tiles of
8 groups (bk = 8·g) and fall back to bk = K (gpt = ng) when 8 ∤ ng. The round-1
grouped int8 path shipped gpt=4 blocks — Mosaic-illegal on real TPUs; interpret
-mode tests can't catch this class (CLAUDE.md invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_bk(K: int, g: int, block_k: int) -> tuple[int, int]:
    """K-tile size honoring group alignment + Mosaic's 8-sublane scale blocks.

    Returns (bk, gpt). Per-channel (g == K): plain block_k cap. Grouped: tiles
    of whole groups with gpt % 8 == 0, else the whole K axis (gpt == ng, legal
    as a full-dim block).
    """
    if g >= K:
        bk = min(block_k, K)
        if K % bk:
            bk = K
        return bk, 1
    ng = K // g
    gpt = max(8, -(-min(block_k, K) // g) // 8 * 8)
    if ng % gpt or gpt > ng:
        return K, ng  # full-K tile: scale block covers all ng groups
    return gpt * g, gpt


def _woq_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int, gpt: int):
    """One (i, j, k) grid cell — INT8, deferred per-group scales."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    qt = q_ref[:]  # [bk, bn] int8
    s = s_ref[:]  # [gpt, bn] f32
    bk = qt.shape[0]
    g = bk // gpt
    for gi in range(gpt):
        w = qt[gi * g:(gi + 1) * g, :].astype(x.dtype)  # exact: |code| <= 127
        part = jax.lax.dot_general(
            x[:, gi * g:(gi + 1) * g], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part * s[gi:gi + 1, :]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _woq4_kernel(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref, *, n_k: int, gpt: int
):
    """INT4 (global half-split) grid cell: 2·gpt plain matmuls, zero relayouts.

    Byte r of the packed weight holds original rows (r, K/2 + r), so the low
    nibbles form a contiguous [bkh, bn] weight tile for x columns [k*bkh, ...)
    and the high nibbles one for columns [K/2 + k*bkh, ...). Per-element work is
    mask/shift/sub in int32 + one bf16 convert; scales ride on the output tile.
    Reference analog: WoqTppKrnl.cpp:132-536 amortizes dequant to near-free.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.int32)  # [bkh, bn]
    slo = slo_ref[:]  # [gpt, bn]
    shi = shi_ref[:]
    bkh = q32.shape[0]
    g = bkh // gpt
    x = xlo_ref[:]  # [bm, bkh]
    xh = xhi_ref[:]
    lo = ((q32 & 0xF) - 8).astype(x.dtype)
    hi = (((q32 >> 4) & 0xF) - 8).astype(x.dtype)
    for gi in range(gpt):
        sl = slice(gi * g, (gi + 1) * g)
        part = jax.lax.dot_general(
            x[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part * slo[gi:gi + 1, :]
        part = jax.lax.dot_general(
            xh[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part * shi[gi:gi + 1, :]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _nf4_decode(q32, dtype):
    """Gather-free 16-entry NF4 LUT: a binary select tree over the code bits.

    Mosaic has no efficient per-lane gather from a VMEM table, so the lookup
    is evaluated as 15 vectorized selects (8+4+2+1, one level per code bit) —
    pure VPU work on the [bkh, bn] tile, ~4× the ops of the int4 mask/shift
    unpack but still bandwidth-friendly: HBM traffic stays the packed bytes.
    Reference analog: WoqTppKrnl.cpp:132-536 dequantizes NF4 with an AVX512
    permute-as-LUT; the select tree is the Mosaic-legal equivalent.
    """
    from lia_tpu.ops.quant import NF4_CODEBOOK

    bits = [(q32 & (1 << b)) != 0 for b in range(4)]
    level = [jnp.float32(float(v)) for v in NF4_CODEBOOK]  # 16 → 8 → 4 → 2 → 1
    for b in range(4):
        level = [
            jnp.where(bits[b], level[2 * i + 1], level[2 * i])
            for i in range(len(level) // 2)
        ]
    return level[0].astype(dtype)


def _woq_nf4_kernel(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref, *, n_k: int, gpt: int
):
    """NF4 (global half-split) grid cell: select-tree LUT dequant → bf16 dots.

    Same structure as :func:`_woq4_kernel` — per-group scales deferred to the
    output tile, fp32 VMEM accumulation — with the nibble→value map swapped
    from (code − 8) to the NF4 codebook via :func:`_nf4_decode`.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.int32)  # [bkh, bn]
    slo = slo_ref[:]  # [gpt, bn]
    shi = shi_ref[:]
    bkh = q32.shape[0]
    g = bkh // gpt
    x = xlo_ref[:]  # [bm, bkh]
    xh = xhi_ref[:]
    lo = _nf4_decode(q32 & 0xF, x.dtype)
    hi = _nf4_decode((q32 >> 4) & 0xF, x.dtype)
    for gi in range(gpt):
        sl = slice(gi * g, (gi + 1) * g)
        part = jax.lax.dot_general(
            x[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part * slo[gi:gi + 1, :]
        part = jax.lax.dot_general(
            xh[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part * shi[gi:gi + 1, :]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _woq4z_kernel(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, zlo_ref, zhi_ref, o_ref, acc_ref,
    *, n_k: int, gpt: int
):
    """Asymmetric INT4 (zero-point) variant: w = (code - z) · s.

    GPTQ-native — ingested checkpoints keep their per-group zero-points instead
    of being lossily re-quantized to symmetric (reference zp-aware kernels:
    WoqTppKrnl.cpp:886-1069 dequant_n_grouped). The zero-point folds into a
    rank-1 output correction (Σ_k∈g x) ⊗ z_g — no per-element subtract at all.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.int32)  # [bkh, bn]
    slo, shi = slo_ref[:], shi_ref[:]  # [gpt, bn]
    zlo, zhi = zlo_ref[:], zhi_ref[:]
    bkh = q32.shape[0]
    g = bkh // gpt
    x = xlo_ref[:]
    xh = xhi_ref[:]
    lo = (q32 & 0xF).astype(x.dtype)
    hi = ((q32 >> 4) & 0xF).astype(x.dtype)
    for gi in range(gpt):
        sl = slice(gi * g, (gi + 1) * g)
        xg = x[:, sl]
        part = jax.lax.dot_general(
            xg, lo[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [bm, 1]
        acc_ref[:] += (part - rowsum * zlo[gi:gi + 1, :]) * slo[gi:gi + 1, :]
        xg = xh[:, sl]
        part = jax.lax.dot_general(
            xg, hi[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += (part - rowsum * zhi[gi:gi + 1, :]) * shi[gi:gi + 1, :]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4a8_accumulate(acc_ref, x, xh, packed, slo, shi, gpt: int):
    """Shared W4A8 tile body: unpack nibbles in-register, per-group int8 MXU
    dots, deferred per-group scales onto the fp32 accumulator.

    (Two rejected variants, measured r4: an int8-lane XOR/shift unpack —
    Mosaic does not legalize arith.shli on int8 vectors — and batched
    per-group dot_general, which lowered ~1.4× SLOWER than the serial
    per-group loop at decode shapes.)"""
    q32 = pltpu.bitcast(packed, jnp.int8).astype(jnp.int32)  # [bkh, bn]
    lo = ((q32 & 0xF) - 8).astype(jnp.int8)
    hi = (((q32 >> 4) & 0xF) - 8).astype(jnp.int8)
    bkh = q32.shape[0]
    g = bkh // gpt
    for gi in range(gpt):
        sl = slice(gi * g, (gi + 1) * g)
        part = jax.lax.dot_general(
            x[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[:] += part.astype(jnp.float32) * slo[gi:gi + 1, :]
        part = jax.lax.dot_general(
            xh[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[:] += part.astype(jnp.float32) * shi[gi:gi + 1, :]


def _w4a8_kernel(
    xlo_ref, xhi_ref, sx_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
    *, n_k: int, gpt: int
):
    """Fused W4A8 grid cell: in-VMEM nibble unpack → int8×int8 MXU dots.

    The XLA woq_int4_dyn path materializes the unpacked int8 halves through
    HBM (packed read + unpacked write + dot read ≈ 2.5× the int4 bytes — why
    it only reached int8 per-call parity). Here the packed tile DMAs HBM→VMEM
    once, the biased nibbles become signed int8 codes in-register (mask/shift/
    sub), and the MXU runs int8×int8→int32 at 2× rate. HBM traffic is exactly
    the int4 bytes. Per-token act scales ride on the output tile with the
    per-group weight scales. Reference analog: WoqTppKrnl.cpp lowp-mode INT8
    (quantize-A + int8 compute on 4-bit weights).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _w4a8_accumulate(
        acc_ref, xlo_ref[:], xhi_ref[:], q_ref[:], slo_ref[:], shi_ref[:], gpt
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:]).astype(o_ref.dtype)


def _w4a8_kernel_stacked(
    li_ref, xlo_ref, xhi_ref, sx_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
    *, n_k: int, gpt: int
):
    """Stacked-layer W4A8 grid cell: weight blocks carry a leading layer axis
    selected by the prefetched scalar index — the fused decode scan passes the
    FULL [L, K/2, N] packed array and the loop counter, so no per-layer
    dynamic-slice copy ever materializes (XLA fuses slices into dots, but a
    pallas_call operand must be a real buffer: the copy cost the int4 path
    1.64× at model level — RESULTS.md r4)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _w4a8_accumulate(
        acc_ref, xlo_ref[:], xhi_ref[:], q_ref[0], slo_ref[0], shi_ref[0], gpt
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:]).astype(o_ref.dtype)


def _w4a8z_kernel(
    xlo_ref, xhi_ref, sx_ref, q_ref, slo_ref, shi_ref, zlo_ref, zhi_ref,
    o_ref, acc_ref, *, n_k: int, gpt: int
):
    """Asymmetric W4A8 grid cell (GPTQ-native zero points × int8 MXU dots).

    Stored codes are raw 0..15 with per-group zp; rebasing by −8 keeps the dot
    operand in signed int8 while the zp shifts by the same −8 in the rank-1
    correction: y = s_x·s_g·( x8 @ (c−8) − Σx8 · (z_g−8) ). The wrapper passes
    ``z − 8`` so the kernel math matches :func:`_w4a8_kernel` plus one int8
    rowsum per (token-tile, group).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _w4a8z_accumulate(
        acc_ref, xlo_ref[:], xhi_ref[:], q_ref[:],
        slo_ref[:], shi_ref[:], zlo_ref[:], zhi_ref[:], gpt,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:]).astype(o_ref.dtype)


def _w4a8z_accumulate(acc_ref, x, xh, packed, slo, shi, zlo, zhi, gpt: int):
    """Shared asymmetric-W4A8 tile body (zp as rank-1 rowsum correction).

    Raw codes 0..15 rebase by −8; the wrapper passes z−8 so the math
    matches :func:`_w4a8_accumulate` plus one rowsum per (tile, group)."""
    q32 = pltpu.bitcast(packed, jnp.int8).astype(jnp.int32)  # [bkh, bn]
    lo = ((q32 & 0xF) - 8).astype(jnp.int8)
    hi = (((q32 >> 4) & 0xF) - 8).astype(jnp.int8)
    bkh = q32.shape[0]
    g = bkh // gpt
    for gi in range(gpt):
        sl = slice(gi * g, (gi + 1) * g)
        xg = x[:, sl]
        part = jax.lax.dot_general(
            xg, lo[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rowsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc_ref[:] += (part.astype(jnp.float32) - rowsum * zlo[gi:gi + 1, :]) * slo[gi:gi + 1, :]
        xg = xh[:, sl]
        part = jax.lax.dot_general(
            xg, hi[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rowsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc_ref[:] += (part.astype(jnp.float32) - rowsum * zhi[gi:gi + 1, :]) * shi[gi:gi + 1, :]


def _w4a8z_kernel_stacked(
    li_ref, xlo_ref, xhi_ref, sx_ref, q_ref, slo_ref, shi_ref, zlo_ref,
    zhi_ref, o_ref, acc_ref, *, n_k: int, gpt: int
):
    """Stacked-layer asymmetric W4A8 grid cell (see _w4a8_kernel_stacked)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _w4a8z_accumulate(
        acc_ref, xlo_ref[:], xhi_ref[:], q_ref[0],
        slo_ref[0], shi_ref[0], zlo_ref[0], zhi_ref[0], gpt,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def w4a8_matmul(
    xq: jnp.ndarray,  # [M, K] int8 (pre-quantized activations)
    sx: jnp.ndarray,  # [M, 1] f32 per-token act scales
    q: jnp.ndarray,  # [K//2, N] packed uint8 (global half-split, biased codes)
    s: jnp.ndarray,  # [ng, N] f32 weight scales
    z: jnp.ndarray | None = None,  # [ng, N] f32 zero-points (raw-code domain)
    group_size: int = -1,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused int4-weight × int8-act matmul: y = sx · (xq @ dequant4(q)).

    Symmetric (z is None): stored codes are biased (c = w + 8), dequant is
    (c − 8)·s. Asymmetric: raw codes with per-group zp, dequant (c − z)·s;
    the zp folds into a rowsum correction so both run the same int8 MXU dots.
    """
    M, K = xq.shape
    N = q.shape[1]
    ng = s.shape[0]
    g = K // ng
    assert group_size in (-1, g), f"scale table implies group {g}"
    interpret = _interpret_default() if interpret is None else interpret

    bm = min(block_m, M)
    bn = min(block_n, N)
    Kh = K // 2
    bkh, gpt = _int4_tiles(K, g, ng, block_k)
    assert M % bm == 0 and N % bn == 0 and Kh % bkh == 0, (M, N, K, bm, bn, bkh)
    n_k = Kh // bkh

    ngh = max(1, ng // 2)
    s_lo, s_hi = (s, s) if ng == 1 else (s[:ngh], s[ngh:])

    def s_idx(i, j, k):
        # one (gpt, bn) block per K tile — except when a single block covers
        # all of a half's groups (gpt == ngh, e.g. ng == 2 with multi-tile K):
        # then every K tile reads block 0. (k, j) with k >= 1 would index past
        # the scale array and only "work" via Pallas' OOB block clamping.
        return (0, j) if gpt >= ngh else (k, j)

    x_specs = [
        pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k)),
        pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k + n_k)),
        pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
    ]
    w_specs = [
        pl.BlockSpec((bkh, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((gpt, bn), s_idx),
        pl.BlockSpec((gpt, bn), s_idx),
    ]
    common = dict(
        grid=(M // bm, N // bn, n_k),
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )
    if z is None:
        return pl.pallas_call(
            functools.partial(_w4a8_kernel, n_k=n_k, gpt=gpt),
            in_specs=x_specs + w_specs,
            **common,
        )(xq, xq, sx, q, s_lo, s_hi)
    z8 = z - 8.0
    z_lo, z_hi = (z8, z8) if ng == 1 else (z8[:ngh], z8[ngh:])
    return pl.pallas_call(
        functools.partial(_w4a8z_kernel, n_k=n_k, gpt=gpt),
        in_specs=x_specs + w_specs + [
            pl.BlockSpec((gpt, bn), s_idx),
            pl.BlockSpec((gpt, bn), s_idx),
        ],
        **common,
    )(xq, xq, sx, q, s_lo, s_hi, z_lo, z_hi)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def w4a8_matmul_stacked(
    xq: jnp.ndarray,  # [M, K] int8 (pre-quantized activations)
    sx: jnp.ndarray,  # [M, 1] f32 per-token act scales
    q: jnp.ndarray,  # [L, K//2, N] packed uint8 — the FULL layer stack
    s: jnp.ndarray,  # [L, ng, N] f32 weight scales
    z: jnp.ndarray | None,  # [L, ng, N] f32 zero-points or None
    layer: jnp.ndarray,  # scalar int32 — which layer's weights to use
    group_size: int = -1,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """W4A8 matmul against ONE layer of a stacked weight array, selected by a
    prefetched scalar index — for the fused decode scan over layers.

    The plain :func:`w4a8_matmul` inside ``lax.scan`` receives a per-layer
    dynamic-slice, which XLA must MATERIALIZE as a copy for a pallas_call
    operand (unlike dots, where the slice fuses into the read). That copy is
    ~2.6× the int4 bytes of extra HBM traffic and made model-level W4A8 lose
    to int8-dyn (931.9 vs 1041.4 tok/s, r4) while winning every isolated
    shape. Here the kernel's weight index_maps read blocks straight out of
    the stacked buffer at ``layer`` (same scalar-prefetch pattern as the
    paged/stacked attention kernels).
    """
    M, K = xq.shape
    L, _, N = q.shape
    ng = s.shape[1]
    g = K // ng
    assert group_size in (-1, g), f"scale table implies group {g}"
    interpret = _interpret_default() if interpret is None else interpret

    bm = min(block_m, M)
    bn = min(block_n, N)
    Kh = K // 2
    bkh, gpt = _int4_tiles(K, g, ng, block_k)
    assert M % bm == 0 and N % bn == 0 and Kh % bkh == 0, (M, N, K, bm, bn, bkh)
    n_k = Kh // bkh

    ngh = max(1, ng // 2)
    s_lo, s_hi = (s, s) if ng == 1 else (s[:, :ngh], s[:, ngh:])

    def s_idx(i, j, k, li):
        # see w4a8_matmul.s_idx: one (gpt, bn) scale block per K tile unless a
        # single block covers the half's groups
        return (li[0], 0, j) if gpt >= ngh else (li[0], k, j)

    x_specs = [
        pl.BlockSpec((bm, bkh), lambda i, j, k, li: (i, k)),
        pl.BlockSpec((bm, bkh), lambda i, j, k, li: (i, k + n_k)),
        pl.BlockSpec((bm, 1), lambda i, j, k, li: (i, 0)),
    ]
    w_specs = [
        pl.BlockSpec((1, bkh, bn), lambda i, j, k, li: (li[0], k, j)),
        pl.BlockSpec((1, gpt, bn), s_idx),
        pl.BlockSpec((1, gpt, bn), s_idx),
    ]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )
    if z is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // bm, N // bn, n_k),
            in_specs=x_specs + w_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, li: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_w4a8_kernel_stacked, n_k=n_k, gpt=gpt),
            grid_spec=grid_spec,
            **common,
        )(layer, xq, xq, sx, q, s_lo, s_hi)
    z8 = z - 8.0
    z_lo, z_hi = (z8, z8) if ng == 1 else (z8[:, :ngh], z8[:, ngh:])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // bm, N // bn, n_k),
        in_specs=x_specs + w_specs + [
            pl.BlockSpec((1, gpt, bn), s_idx),
            pl.BlockSpec((1, gpt, bn), s_idx),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, li: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_w4a8z_kernel_stacked, n_k=n_k, gpt=gpt),
        grid_spec=grid_spec,
        **common,
    )(layer, xq, xq, sx, q, s_lo, s_hi, z_lo, z_hi)


def _int4_tiles(K: int, g: int, ng: int, block_k: int):
    """Half-split K tiling: packed rows [0, K/2) in whole-group tiles with a
    Mosaic-legal scale block ((gpt, bn) with gpt % 8 == 0 or gpt == ng//2)."""
    Kh = K // 2
    if g >= K:
        return Kh, 1  # single global scale row
    assert Kh % g == 0, f"group {g} must divide K/2={Kh}"
    bkh, gpt = _pick_bk(Kh, g, block_k)
    return bkh, gpt


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def woq4z_matmul(
    x: jnp.ndarray,  # [M, K]
    q: jnp.ndarray,  # [K//2, N] packed uint8 (global half-split, raw codes)
    s: jnp.ndarray,  # [ng, N] f32
    z: jnp.ndarray,  # [ng, N] f32 zero-points
    group_size: int,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """x @ ((codes - z) * s) — asymmetric int4 fused dequant matmul."""
    M, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    g = K // ng
    assert group_size in (-1, g), f"scale table implies group {g}"
    interpret = _interpret_default() if interpret is None else interpret

    bm = min(block_m, M)
    bn = min(block_n, N)
    Kh = K // 2
    bkh, gpt = _int4_tiles(K, g, ng, block_k)
    assert Kh % bkh == 0, (K, bkh)
    n_k = Kh // bkh

    # scales/zps split into low/high-nibble halves: blocks index each half's own
    # array, so the (gpt, bn) block is always whole-group-aligned and, in the
    # bkh == Kh fallback, exactly the full first dim (Mosaic-legal everywhere)
    ngh = max(1, ng // 2)
    s_lo, s_hi = (s, s) if ng == 1 else (s[:ngh], s[ngh:])
    z_lo, z_hi = (z, z) if ng == 1 else (z[:ngh], z[ngh:])

    def s_idx(i, j, k):
        # single block covering a half's groups (gpt == ngh) → always block 0
        return (0, j) if gpt >= ngh else (k, j)

    return pl.pallas_call(
        functools.partial(_woq4z_kernel, n_k=n_k, gpt=gpt),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k + n_k)),
            pl.BlockSpec((bkh, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((gpt, bn), s_idx),
            pl.BlockSpec((gpt, bn), s_idx),
            pl.BlockSpec((gpt, bn), s_idx),
            pl.BlockSpec((gpt, bn), s_idx),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, x, q, s_lo, s_hi, z_lo, z_hi)


def woq_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    q: jnp.ndarray,  # [K, N] int8  |  [K//2, N] packed uint8 (int4/nf4)
    s: jnp.ndarray,  # [n_groups, N] f32
    group_size: int,
    int4: bool = False,
    nf4: bool = False,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """x @ (dequantized weight), fp32 accumulation. Returns [M, N] ``out_dtype``.

    ``nf4=True`` (implies the int4 packed layout) decodes nibbles through the
    NF4 codebook select tree instead of the (code − 8) integer map.
    """
    M, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    g = K // ng
    assert group_size in (-1, g), f"scale table implies group {g}"
    interpret = _interpret_default() if interpret is None else interpret

    bm = min(block_m, M)
    bn = min(block_n, N)

    if int4 or nf4:
        # global half-split: the K grid walks PACKED rows [0, K/2); each tile
        # feeds two matmul groups (x cols [k·bkh, …) and [K/2 + k·bkh, …))
        Kh = K // 2
        bkh, gpt = _int4_tiles(K, g, ng, block_k)
        assert Kh % bkh == 0, (K, bkh)
        n_k = Kh // bkh

        ngh = max(1, ng // 2)
        s_lo, s_hi = (s, s) if ng == 1 else (s[:ngh], s[ngh:])

        def s_idx(i, j, k):
            # single block covering a half's groups (gpt == ngh) → always block 0
            return (0, j) if gpt >= ngh else (k, j)

        kern = _woq_nf4_kernel if nf4 else _woq4_kernel
        return pl.pallas_call(
            functools.partial(kern, n_k=n_k, gpt=gpt),
            grid=(M // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k)),
                pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k + n_k)),
                pl.BlockSpec((bkh, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((gpt, bn), s_idx),
                pl.BlockSpec((gpt, bn), s_idx),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            interpret=interpret,
        )(x, x, q, s_lo, s_hi)

    bk, gpt = _pick_bk(K, g, block_k)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K, bm, bn, bk)
    n_k = K // bk

    # scale block: the gpt groups covered by K tile k start at group row k*gpt;
    # gpt == ng (one block spans all groups) → every K tile reads block 0
    def s_index(i, j, k):
        return (0, j) if gpt >= ng else (k, j)

    return pl.pallas_call(
        functools.partial(_woq_kernel, n_k=n_k, gpt=gpt),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((gpt, bn), s_index),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, q, s)
