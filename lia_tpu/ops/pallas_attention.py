"""Pallas TPU attention kernels.

Reference equivalents:
- :func:`flash_attention_prefill` ↔ csrc/cpu/aten/kernels/FlashAttentionKrnl.cpp
  (tiled causal softmax-attention for the first token), op def FlashAttention.cpp:37.
- :func:`decode_attention` ↔ csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp
  (decode-phase attention over the preallocated indirect-access KV cache;
  ``reduce_head`` dot products :14-27, fused softmax, flash-style tiling).

TPU-native design notes:
- K/V are **head-major** [B, N_kv, S, D] (the cache layout): each grid cell gets one
  head's contiguous [S, D] plane as a full-array VMEM block, which satisfies
  Mosaic's (8, 128)-or-full tiling rule for the last two dims and gives clean DMA;
- online-softmax (flash) tiling over the key axis; causal tiles beyond the query
  block's frontier are skipped entirely;
- GQA groups the G query heads of one KV head into a single grid cell (no KV
  replication; the MXU sees a [bq*G, D] x [D, bk] matmul);
- padding/validity rides as one per-sequence scalar in SMEM (left-padded prompts
  make validity a contiguous [start, length) range — no mask vector to DMA);
- fp32 accumulation throughout; inputs may be bf16.

Both kernels run in interpreter mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_heads_int8(Nkv: int, cap: int) -> int:
    """Head-group size for the INT8-KV kernels: their per-token SCALE planes
    are rank-3 [LB, H, S], so the head group lands in the SUBLANE dim and
    Mosaic requires Hs % 8 == 0 or Hs == Nkv (found the hard way at OPT-30B's
    56 heads: divisor 28 fails lowering). Falls back to the full head count
    (always legal) when no 8-multiple divisor fits the VMEM cap."""
    best = None
    for d in range(1, Nkv + 1):
        if Nkv % d == 0 and d <= cap and (d == Nkv or d % 8 == 0):
            best = d
    return best if best is not None else Nkv


# ---------------------------------------------------------------------------
# Prefill flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    start_ref,  # [B, 1] int32 in SMEM — first valid (non-pad) slot per sequence
    q_ref,  # [1, 1, bq, G*D]
    k_ref,  # [1, 1, S, D]
    v_ref,  # [1, 1, S, D]
    o_ref,  # [1, 1, bq, G*D]
    *,
    scale: float,
    bq: int,
    bk: int,
    seq_len: int,
    G: int,
    window: int | None,
):
    i = pl.program_id(2)
    D = k_ref.shape[3]
    start = start_ref[pl.program_id(0), 0]
    # softmax in exp2 units: softmax(s) == 2^(s·log2e) / Σ 2^(s·log2e), so the
    # log2e fold rides the post-dot scale multiply for free and every
    # transcendental in the hot loop is the cheaper exp2 (the VPU chain — mask,
    # exp, reductions — is ~4× the MXU time at these shapes; RESULTS.md r4)
    #
    # r5: the DOTS run in the INPUT dtype (bf16 in production) with fp32
    # accumulation — casting q/k/v up to fp32 first ran both matmuls at the
    # MXU's fp32 rate (~1/8 of bf16 on v5e), which by itself caps causal MFU
    # near the 18.8% measured at s8192. bf16×bf16 products are exact in the
    # fp32 accumulator, and the scale now applies AFTER the dot (exact, and
    # it no longer perturbs q's bf16 mantissa).
    q = q_ref[0, 0].reshape(bq * G, D)  # input dtype [bq*G, D]
    sscale = scale * 1.4426950408889634

    m0 = jnp.full((bq * G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq * G, 1), jnp.float32)
    acc0 = jnp.zeros((bq * G, D), jnp.float32)

    # 1-D iotas only: the masks below are broadcast compares of a [bq*G, 1]
    # row iota against a [1, bk] column iota — building a 2-D [bq*G, bk] iota
    # per block measured ~2.4 µs/block on the v5e, 2.4× the block's entire
    # dot+softmax cost (RESULTS.md r5 decomposition)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, G, 1), 0).reshape(bq * G, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)  # [1, bk]

    def make_body(mask_mode: str):
        """mask_mode: "none" (interior), "causal" (diagonal blocks — start
        already cleared), "full" (start-boundary blocks)."""

        def body(j, carry):
            m, l, acc = carry
            k = k_ref[0, 0, pl.ds(j * bk, bk), :]  # [bk, D] input dtype
            v = v_ref[0, 0, pl.ds(j * bk, bk), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * sscale  # [bq*G, bk] fp32
            if mask_mode != "none":
                # relative column position vs this q block: col c is key slot
                # j*bk + c, row r is query slot i*bq + r (per G group)
                crel = cols + (j * bk - i * bq)  # [1, bk]
                masked = crel > rows  # causal: key beyond the query
                if mask_mode == "full":
                    masked |= cols < start - j * bk  # key before validity
                if window is not None:  # sliding window: slot == token offset
                    masked |= crel <= rows - window
                s = jnp.where(masked, NEG_INF, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            # p rides the PV dot in v's dtype (bf16 MXU rate); p ∈ [0,1] so
            # the bf16 round-off (~2^-9 relative) sits below the output's own
            # bf16 rounding once divided by l. fp32 inputs keep the fp32 dot.
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        return body

    # causal: kv tiles beyond this q tile's last row are fully masked — skip them
    num_kv = pl.cdiv(jnp.minimum((i + 1) * bq, seq_len), bk)
    carry = (m0, l0, acc0)
    if window is not None:
        # sliding window keeps the single masked loop (every visited block can
        # touch the moving lower frontier); dead tiles before it are skipped
        first_kv = jnp.maximum(0, (i * bq - window + 1) // bk)
        carry = jax.lax.fori_loop(first_kv, num_kv, make_body("full"), carry)
    else:
        # r4 gated interior blocks behind a per-block lax.cond; Mosaic lowers
        # vector-valued cond branches as select (BOTH branches execute), so
        # the 5-pass mask build ran on every block anyway — measured 8 ms of
        # the 22 ms s8192 cell time. r5: split the kv walk into three loops
        # with traced bounds and no conds —
        #   [jlo, e0)      start-boundary blocks   full mask (≤1 block)
        #   [e0, d0)       interior                NO mask work at all
        #   [d0, num_kv)   diagonal blocks         causal-only (3 passes)
        # dead blocks before `start` are now skipped entirely too (the old
        # loop masked them at full cost).
        jlo = start // bk
        js = (start + bk - 1) // bk  # first fully-start-clear block
        jd0 = (i * bq) // bk  # first diagonal-crossing block
        e0 = jnp.minimum(js, num_kv)
        d0 = jnp.minimum(jnp.maximum(jd0, js), num_kv)
        carry = jax.lax.fori_loop(jlo, e0, make_body("full"), carry)
        carry = jax.lax.fori_loop(e0, d0, make_body("none"), carry)
        carry = jax.lax.fori_loop(d0, num_kv, make_body("causal"), carry)
    m, l, acc = carry
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(bq, G * D).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "window", "interpret")
)
def flash_attention_prefill(
    q: jnp.ndarray,  # [B, S, N, D]
    k: jnp.ndarray,  # [B, N_kv, S, D] (head-major)
    v: jnp.ndarray,  # [B, N_kv, S, D]
    input_mask: jnp.ndarray,  # [B, S] bool — True at real tokens (LEFT-padded:
    # validity must be contiguous [pad_len, S); arbitrary masks use the jnp path)
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    window: int | None = None,  # sliding-window attention (mistral)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Causal flash attention over a (left-padded) prompt. Returns [B, S, N, D]."""
    B, S, N, D = q.shape
    Nkv = k.shape[1]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bq = min(block_q, S)
    bk = min(block_k, S)
    assert S % bq == 0 and S % bk == 0, f"S={S} must divide block sizes ({bq},{bk})"

    # head-major grouped queries: [B, Nkv, S, G*D]
    qg = q.reshape(B, S, Nkv, G * D).transpose(0, 2, 1, 3)
    starts = (S - jnp.sum(input_mask.astype(jnp.int32), axis=1))[:, None]  # [B, 1]
    grid = (B, Nkv, S // bq)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, bq=bq, bk=bk, seq_len=S, G=G, window=window
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bq, G * D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, G * D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, S, G * D), q.dtype),
        interpret=interpret,
    )(starts, qg, k, v)
    return out.transpose(0, 2, 1, 3).reshape(B, S, N, D)


# ---------------------------------------------------------------------------
# Chunked prefill: a prompt chunk attending over the cache (past + itself)
# ---------------------------------------------------------------------------


def _flash_cached_kernel(
    base_ref,  # [B, 1] int32 SMEM — cache length BEFORE this chunk (chunk row 0's pos)
    start_ref,  # [B, 1] int32 SMEM — first valid cache slot per sequence
    q_ref,  # [1, 1, C, G*D]
    k_ref,  # [1, 1, S_max, D] — cache plane (chunk already written)
    v_ref,
    o_ref,  # [1, 1, C, G*D]
    *,
    scale: float,
    bk: int,
    G: int,
    window: int | None,
):
    """Flash attention for a prompt CHUNK over the full cache plane: chunk row
    t attends cache positions [start_b, base_b + t]. Enables chunked prefill —
    long prompts and serving admission slices that interleave with decode
    (the reference prefills whole prompts only)."""
    b = pl.program_id(0)
    C, D = q_ref.shape[2], k_ref.shape[3]
    base = base_ref[b, 0]
    start = start_ref[b, 0]
    # dots in the input dtype (bf16 MXU rate), scale post-dot in exp2 units —
    # same r5 rework as _flash_kernel
    q = q_ref[0, 0].reshape(C * G, D)
    sscale = scale * 1.4426950408889634

    m0 = jnp.full((C * G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((C * G, 1), jnp.float32)
    acc0 = jnp.zeros((C * G, D), jnp.float32)

    # 1-D iotas + broadcast compares (see _flash_kernel's r5 note); the
    # chunk's query slot for row r is base + r
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, G, 1), 0).reshape(C * G, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)

    def make_body(mask_mode: str):
        def body(j, carry):
            m, l, acc = carry
            k = k_ref[0, 0, pl.ds(j * bk, bk), :]
            v = v_ref[0, 0, pl.ds(j * bk, bk), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * sscale
            if mask_mode != "none":
                crel = cols + (j * bk - base)  # key slot minus base
                masked = crel > rows
                if mask_mode == "full":
                    masked |= cols < start - j * bk
                if window is not None:
                    masked |= crel <= rows - window
                s = jnp.where(masked, NEG_INF, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        return body

    num_kv = pl.cdiv(base + C, bk)  # tiles beyond the chunk's frontier are dead
    carry = (m0, l0, acc0)
    if window is not None:
        first_kv = jnp.maximum(0, (base - window + 1) // bk)
        carry = jax.lax.fori_loop(first_kv, num_kv, make_body("full"), carry)
    else:
        # same three-loop split as _flash_kernel (r5): start-boundary blocks
        # with full mask, unmasked interior, causal-only chunk-frontier blocks
        # — no per-block cond (Mosaic executes both cond branches) and dead
        # blocks before `start` skipped outright.
        jlo = start // bk
        js = (start + bk - 1) // bk
        jd0 = base // bk  # first block that can cross the chunk's causal edge
        e0 = jnp.minimum(js, num_kv)
        d0 = jnp.minimum(jnp.maximum(jd0, js), num_kv)
        carry = jax.lax.fori_loop(jlo, e0, make_body("full"), carry)
        carry = jax.lax.fori_loop(e0, d0, make_body("none"), carry)
        carry = jax.lax.fori_loop(d0, num_kv, make_body("causal"), carry)
    m, l, acc = carry
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(C, G * D).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_k", "window", "interpret")
)
def flash_attention_cached(
    q: jnp.ndarray,  # [B, C, N, D] — the chunk's queries
    k_cache: jnp.ndarray,  # [B, N_kv, S_max, D] — cache plane incl. the chunk
    v_cache: jnp.ndarray,
    base: jnp.ndarray,  # scalar or [B] — cache length before the chunk
    slot_mask: jnp.ndarray,  # [B, S_max] — validity incl. the chunk's rows
    scale: float | None = None,
    block_k: int = 512,
    window: int | None = None,  # sliding-window attention (mistral)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Chunk-over-cache causal attention. Returns [B, C, N, D]."""
    B, C, N, D = q.shape
    Nkv, S_max = k_cache.shape[1], k_cache.shape[2]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0

    qg = q.reshape(B, C, Nkv, G * D).transpose(0, 2, 1, 3)  # [B, Nkv, C, G*D]
    bases = jnp.broadcast_to(base.astype(jnp.int32), (B,))
    ends = bases + C
    starts = ends - jnp.sum(slot_mask.astype(jnp.int32), axis=1)
    out = pl.pallas_call(
        functools.partial(_flash_cached_kernel, scale=scale, bk=bk, G=G, window=window),
        grid=(B, Nkv),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S_max, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S_max, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, C, G * D), q.dtype),
        interpret=interpret,
    )(bases[:, None], starts[:, None], qg, k_cache, v_cache)
    return out.transpose(0, 2, 1, 3).reshape(B, C, N, D)


# ---------------------------------------------------------------------------
# Decode attention over the KV cache
# ---------------------------------------------------------------------------


def _decode_kernel(
    len_ref,  # [B, 1] int32 in SMEM — valid cache length per sequence
    start_ref,  # [B, 1] int32 in SMEM — first valid slot per sequence
    q_ref,  # [1, Hs, 1, G*D]
    k_ref,  # [1, Hs, S_max, D]
    v_ref,  # [1, Hs, S_max, D]
    o_ref,  # [1, Hs, 1, G*D]
    *,
    scale: float,
    bk: int,
    G: int,
):
    # Hs KV heads per grid cell: one fat DMA per cell instead of per head, and
    # the score/update matmuls batch over heads (dot_general batch dims).
    Hs, D = k_ref.shape[1], k_ref.shape[3]
    length = len_ref[pl.program_id(0), 0]
    start = start_ref[pl.program_id(0), 0]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * (scale * 1.4426950408889634)  # exp2 units

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)  # [Hs, bk, D]
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [Hs, G, bk]
        pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        allow = (pos < length) & (pos >= start)
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [Hs, G, D]
        return m_new, l, acc

    num_kv = pl.cdiv(length, bk)  # only tiles that contain valid slots
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention(
    q: jnp.ndarray,  # [B, 1, N, D] — single decode token
    k_cache: jnp.ndarray,  # [B, N_kv, S_max, D] (head-major)
    v_cache: jnp.ndarray,  # [B, N_kv, S_max, D]
    slot_mask: jnp.ndarray,  # [B, S_max] bool — occupied slots (incl. current;
    # validity must be contiguous per row: [start_b, length_b))
    length: jnp.ndarray,  # int32 scalar or [B] — valid length (incl. current token)
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Decode attention over the ring cache. Returns [B, 1, N, D]."""
    B, _, N, D = q.shape
    Nkv, S_max = k_cache.shape[1], k_cache.shape[2]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0, f"S_max={S_max} must divide block_k={bk}"

    qg = q.reshape(B, Nkv, 1, G * D)
    lengths = jnp.broadcast_to(length.astype(jnp.int32), (B,))[:, None]
    # first valid slot per sequence: valid length minus count of real tokens
    starts = lengths - jnp.sum(slot_mask.astype(jnp.int32), axis=1)[:, None]
    # KV heads per grid cell: as many as fit a ~8MB VMEM budget for the K+V blocks
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    budget = 8 * 1024 * 1024
    Hs = max(1, min(Nkv, budget // max(2 * S_max * D * itemsize, 1)))
    while Nkv % Hs:
        Hs -= 1
    grid = (B, Nkv // Hs)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, bk=bk, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        interpret=interpret,
    )(lengths, starts.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)


# ---------------------------------------------------------------------------
# Decode attention reading the FULL stacked cache (scalar-prefetch layer index)
# ---------------------------------------------------------------------------


def _decode_stacked_kernel(
    idx_ref,  # [1] int32 scalar-prefetch — layer index
    len_ref,  # [B, 1] int32 SMEM — valid length per sequence
    start_ref,  # [B, 1] int32 SMEM — first valid slot per sequence
    q_ref,  # [1, Hs, 1, G*D]
    k_ref,  # [1, Hs, S_max, D] — (layer, batch) plane selected by the index map
    v_ref,
    o_ref,  # [1, Hs, 1, G*D]
    *,
    scale: float,
    bk: int,
    G: int,
):
    Hs, D = k_ref.shape[1], k_ref.shape[3]
    b = pl.program_id(0)
    length = len_ref[b, 0]
    start = start_ref[b, 0]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * (scale * 1.4426950408889634)  # exp2 units

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        allow = (pos < length) & (pos >= start)
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    num_kv = pl.cdiv(length, bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention_stacked(
    q: jnp.ndarray,  # [B, 1, N, D]
    k_cache: jnp.ndarray,  # [L, B, N_kv, S_max, D] — the FULL stacked cache
    v_cache: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    slot_mask: jnp.ndarray,  # [B, S_max] bool (contiguous validity per row)
    length: jnp.ndarray,  # scalar or [B]
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Decode attention reading layer ``layer_idx`` of the stacked cache in place.

    Avoids the dynamic-slice copy-out of a whole [B, N_kv, S_max, D] plane per
    layer per token that the per-plane API forces inside a scan: the layer index
    rides as a scalar-prefetch argument and the BlockSpec index map selects the
    plane, so the kernel DMAs straight from the cache's HBM buffer.
    """
    B, _, N, D = q.shape
    L, _, Nkv, S_max, _ = k_cache.shape
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0

    qg = q.reshape(B, Nkv, 1, G * D)
    lengths = jnp.broadcast_to(length.astype(jnp.int32), (B,))
    starts = lengths - jnp.sum(slot_mask.astype(jnp.int32), axis=1)
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    budget = 8 * 1024 * 1024
    Hs = max(1, min(Nkv, budget // max(2 * S_max * D * itemsize, 1)))
    while Nkv % Hs:
        Hs -= 1

    # flatten (L, B) so every block is rank-4 (rank-5 blocks crash Mosaic)
    k_flat = k_cache.reshape(L * B, Nkv, S_max, D)
    v_flat = v_cache.reshape(L * B, Nkv, S_max, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # just the layer index; lengths/starts ride in SMEM
        grid=(B, Nkv // Hs),
        in_specs=[
            # index-map signature: (*grid_indices, *scalar_prefetch_refs)
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h, i: (i[0] * B + b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h, i: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_decode_stacked_kernel, scale=scale, bk=bk, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        interpret=interpret,
    )(
        layer_idx.astype(jnp.int32)[None],
        lengths[:, None],
        starts[:, None],
        qg,
        k_flat,
        v_flat,
    )
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)


# ---------------------------------------------------------------------------
# Stacked-cache decode with the fresh token merged in-kernel
# ---------------------------------------------------------------------------


def _decode_fresh_kernel(
    idx_ref,  # [1] int32 scalar-prefetch — layer index
    len_ref,  # [B, 1] int32 SMEM — valid length per sequence (EXCLUDING fresh)
    start_ref,  # [B, 1] int32 SMEM — first valid slot per sequence
    q_ref,  # [1, Hs, 1, G*D]
    kf_ref,  # [1, Hs, 1, D] — this step's fresh key (not yet in the cache)
    vf_ref,  # [1, Hs, 1, D]
    k_ref,  # [1, Hs, S_max, D] — (layer, batch) plane selected by the index map
    v_ref,
    o_ref,  # [1, Hs, 1, G*D]
    *,
    scale: float,
    bk: int,
    G: int,
):
    """Decode attention over cache[start, length) ∪ {fresh token}.

    Folding the fresh token into the online softmax removes the per-layer cache
    write from the decode loop: the caller batches all layers' fresh K/V into
    ONE dynamic_update_slice per step after the layer scan. On this rig every
    XLA op costs ~15µs of launch overhead, so dropping 2 ops/layer is worth
    ~0.7 ms/step at 24 layers — the reference has no analog (its CPU kernel
    writes the cache in place, MaskedMultiHeadAttentionKrnl.cpp:14-120).
    """
    Hs, D = k_ref.shape[1], k_ref.shape[3]
    b = pl.program_id(0)
    length = len_ref[b, 0]
    start = start_ref[b, 0]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * (scale * 1.4426950408889634)  # exp2 units

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        allow = (pos < length) & (pos >= start)
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    num_kv = pl.cdiv(length, bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    # fresh-token tile (always valid, position == length)
    kf = kf_ref[0, :, 0:1, :].astype(jnp.float32)  # [Hs, 1, D]
    vf = vf_ref[0, :, 0:1, :].astype(jnp.float32)
    sf = jax.lax.dot_general(
        q, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [Hs, G, 1]
    m_new = jnp.maximum(m, sf)
    p = jnp.exp2(sf - m_new)
    alpha = jnp.exp2(m - m_new)
    l = l * alpha + p
    acc = acc * alpha + jax.lax.dot_general(
        p, vf, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention_fresh(
    q: jnp.ndarray,  # [B, 1, N, D]
    k_fresh: jnp.ndarray,  # [B, N_kv, 1, D] — this step's key (head-major)
    v_fresh: jnp.ndarray,
    k_cache: jnp.ndarray,  # [L, B, N_kv, S_max, D] — stacked cache (PAST tokens only)
    v_cache: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    slot_mask: jnp.ndarray,  # [B, S_max] bool — past-token validity (contiguous rows)
    length: jnp.ndarray,  # scalar or [B] — past length (excludes the fresh token)
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Decode attention over layer ``layer_idx``'s cache plane + the fresh token."""
    B, _, N, D = q.shape
    L, _, Nkv, S_max, _ = k_cache.shape
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0

    qg = q.reshape(B, Nkv, 1, G * D)
    lengths = jnp.broadcast_to(length.astype(jnp.int32), (B,))
    starts = lengths - jnp.sum(slot_mask.astype(jnp.int32), axis=1)
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    # budget covers K+V blocks ×2 (Mosaic double-buffers grid blocks)
    budget = 4 * 1024 * 1024
    Hs = max(1, min(Nkv, budget // max(2 * S_max * D * itemsize, 1)))
    while Nkv % Hs:
        Hs -= 1

    k_flat = k_cache.reshape(L * B, Nkv, S_max, D)
    v_flat = v_cache.reshape(L * B, Nkv, S_max, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h, i: (i[0] * B + b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h, i: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_decode_fresh_kernel, scale=scale, bk=bk, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        interpret=interpret,
    )(
        layer_idx.astype(jnp.int32)[None],
        lengths[:, None],
        starts[:, None],
        qg,
        k_fresh,
        v_fresh,
        k_flat,
        v_flat,
    )
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)


# ---------------------------------------------------------------------------
# Grouped-beam decode: shared prompt plane + per-beam tail + fresh token
# ---------------------------------------------------------------------------


def _decode_beam_kernel(
    idx_ref,  # [1] int32 scalar-prefetch — layer index
    pstart_ref,  # [B0, 1] int32 SMEM — prompt first valid slot per GROUP
    plen_ref,  # [1, 1] int32 SMEM — prompt valid length (uniform, bucketed)
    tlen_ref,  # [1, 1] int32 SMEM — generated-tail length (EXCLUDING fresh)
    q_ref,  # [1, Hs, 1, G*D]
    kf_ref,  # [1, Hs, 1, D] — this step's fresh key (not yet in any cache)
    vf_ref,
    kp_ref,  # [1, Hs, S_p, D] — PROMPT plane of this beam's input group
    vp_ref,
    kt_ref,  # [1, Hs, T_max, D] — this beam's generated-tail plane
    vt_ref,
    o_ref,  # [1, Hs, 1, G*D]
    *,
    scale: float,
    bkp: int,
    bkt: int,
    G: int,
    nb: int,
):
    """Three-phase online softmax: group prompt ∪ beam tail ∪ fresh token.

    Beam search never copies prompt KV: all ``nb`` beams of an input group read
    the SAME prompt plane (the BlockSpec index map divides the batch index by
    ``nb``, and the grid orders beams innermost so Mosaic's block-revisit
    detection skips the re-DMA for ``nb-1`` of every ``nb`` cells). The
    reference reaches the same goal with a per-position ``beam_idx`` table read
    inside its CPU kernel (MaskedMultiHeadAttentionKrnl.cpp); per-position row
    indirection would defeat TPU tile DMA, so the indirection is hoisted to the
    *source* granularity instead: prompt rows are group-indexed forever, and
    only the small generated tail is per-beam (reordered by a [B, T] gather at
    each step — hundreds of KB, not the full cache).
    """
    Hs, D = kp_ref.shape[1], kp_ref.shape[3]
    b = pl.program_id(1)
    pstart = pstart_ref[b // nb, 0]
    plen = plen_ref[0, 0]
    tlen = tlen_ref[0, 0]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * (scale * 1.4426950408889634)  # exp2 units

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def make_body(k_src, v_src, bk, lo, hi):
        def body(j, carry):
            m, l, acc = carry
            k = k_src[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
            v = v_src[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
            s = jnp.where((pos < hi) & (pos >= lo), s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            return m_new, l, acc

        return body

    # phase 1: the group's prompt, valid slots [pstart, plen)
    carry = jax.lax.fori_loop(
        0, pl.cdiv(plen, bkp), make_body(kp_ref, vp_ref, bkp, pstart, plen), (m0, l0, acc0)
    )
    # phase 2: this beam's generated tail, valid slots [0, tlen)
    m, l, acc = jax.lax.fori_loop(
        0, pl.cdiv(tlen, bkt), make_body(kt_ref, vt_ref, bkt, 0, tlen), carry
    )
    # phase 3: the fresh token (always valid)
    kf = kf_ref[0, :, 0:1, :].astype(jnp.float32)
    vf = vf_ref[0, :, 0:1, :].astype(jnp.float32)
    sf = jax.lax.dot_general(
        q, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m_new = jnp.maximum(m, sf)
    p = jnp.exp2(sf - m_new)
    alpha = jnp.exp2(m - m_new)
    l = l * alpha + p
    acc = acc * alpha + jax.lax.dot_general(
        p, vf, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nb", "scale", "block_k", "interpret")
)
def decode_beam_attention(
    q: jnp.ndarray,  # [B0*nb, 1, N, D]
    k_fresh: jnp.ndarray,  # [B0*nb, N_kv, 1, D] (head-major)
    v_fresh: jnp.ndarray,
    kp: jnp.ndarray,  # [L, B0, N_kv, S_p, D] — stacked GROUP prompt cache
    vp: jnp.ndarray,
    kt: jnp.ndarray,  # [L, B0*nb, N_kv, T_max, D] — stacked per-beam tail
    vt: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    prompt_start: jnp.ndarray,  # [B0] first valid prompt slot per group
    prompt_len: jnp.ndarray,  # scalar — valid prompt length
    tail_len: jnp.ndarray,  # scalar — generated tokens so far (excl. fresh)
    nb: int,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Beam decode attention: shared-prompt + per-beam-tail + fresh merge."""
    B, _, N, D = q.shape
    L, B0, Nkv, S_p, _ = kp.shape
    T_max = kt.shape[3]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bkp = min(block_k, S_p)
    bkt = min(block_k, T_max)
    assert S_p % bkp == 0 and T_max % bkt == 0

    qg = q.reshape(B, Nkv, 1, G * D)
    itemsize = jnp.dtype(kp.dtype).itemsize
    budget = 4 * 1024 * 1024
    per_head = 2 * (S_p + T_max) * D * itemsize
    Hs = max(1, min(Nkv, budget // max(per_head, 1)))
    while Nkv % Hs:
        Hs -= 1

    kp_flat = kp.reshape(L * B0, Nkv, S_p, D)
    vp_flat = vp.reshape(L * B0, Nkv, S_p, D)
    kt_flat = kt.reshape(L * B, Nkv, T_max, D)
    vt_flat = vt.reshape(L * B, Nkv, T_max, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # beams innermost: nb consecutive cells share one prompt block, so the
        # prompt's HBM traffic is 1/nb of the naive per-beam layout
        grid=(Nkv // Hs, B),
        in_specs=[
            pl.BlockSpec((B0, 1), lambda h, b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda h, b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda h, b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, Hs, S_p, D), lambda h, b, i: (i[0] * B0 + b // nb, h, 0, 0)
            ),
            pl.BlockSpec(
                (1, Hs, S_p, D), lambda h, b, i: (i[0] * B0 + b // nb, h, 0, 0)
            ),
            pl.BlockSpec((1, Hs, T_max, D), lambda h, b, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, T_max, D), lambda h, b, i: (i[0] * B + b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda h, b, i: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_beam_kernel, scale=scale, bkp=bkp, bkt=bkt, G=G, nb=nb
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        interpret=interpret,
    )(
        layer_idx.astype(jnp.int32)[None],
        prompt_start.astype(jnp.int32)[:, None],
        jnp.broadcast_to(prompt_len.astype(jnp.int32), (1, 1)),
        jnp.broadcast_to(tail_len.astype(jnp.int32), (1, 1)),
        qg,
        k_fresh,
        v_fresh,
        kp_flat,
        vp_flat,
        kt_flat,
        vt_flat,
    )
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)


def _decode_beam_int8_kernel(
    idx_ref,  # [1] int32 scalar-prefetch — layer index
    pstart_ref,  # [B0, 1] int32 SMEM
    plen_ref,  # [1, 1] int32 SMEM
    tlen_ref,  # [1, 1] int32 SMEM
    q_ref,  # [1, Hs, 1, G*D]
    kf_ref,  # [1, Hs, 1, D] bf16 fresh (pre-dequantized to match storage)
    vf_ref,
    kp_ref,  # [1, Hs, S_p, D] int8 — group prompt plane
    kps_ref,  # [1, Hs, S_p] f32 — per-token K scales
    vp_ref,
    vps_ref,
    kt_ref,  # [1, Hs, T_max, D] int8 — per-beam tail plane
    kts_ref,
    vt_ref,
    vts_ref,
    o_ref,
    *,
    scale: float,
    bkp: int,
    bkt: int,
    G: int,
    nb: int,
):
    """INT8-KV grouped-beam decode: the three-phase online softmax of
    :func:`_decode_beam_kernel` with the int8 dequant folded into the
    score/prob matrices (D× fewer multiplies, int8-sized HBM reads) exactly as
    :func:`_decode_fresh_int8_kernel` does for the flat cache."""
    Hs, D = kp_ref.shape[1], kp_ref.shape[3]
    b = pl.program_id(1)
    pstart = pstart_ref[b // nb, 0]
    plen = plen_ref[0, 0]
    tlen = tlen_ref[0, 0]
    # bf16 dots on the exact-in-bf16 int8 values; scale post-dot (see
    # _decode_fresh_int8_kernel for the convert-cost rationale)
    q = q_ref[0, :, 0].reshape(Hs, G, D)

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def make_body(k_src, ks_src, v_src, vs_src, bk, lo, hi):
        def body(j, carry):
            m, l, acc = carry
            k = k_src[0, :, pl.ds(j * bk, bk), :].astype(q.dtype)
            ks = ks_src[0, :, pl.ds(j * bk, bk)]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            s = s * (ks[:, None, :] * (scale * 1.4426950408889634))  # K dequant + softmax scale (exp2 units)
            pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
            s = jnp.where((pos < hi) & (pos >= lo), s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v = v_src[0, :, pl.ds(j * bk, bk), :].astype(q.dtype)
            vs = vs_src[0, :, pl.ds(j * bk, bk)]
            pv = (p * vs[:, None, :]).astype(q.dtype)
            acc = acc * alpha + jax.lax.dot_general(
                pv, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            return m_new, l, acc

        return body

    carry = jax.lax.fori_loop(
        0, pl.cdiv(plen, bkp),
        make_body(kp_ref, kps_ref, vp_ref, vps_ref, bkp, pstart, plen), (m0, l0, acc0)
    )
    m, l, acc = jax.lax.fori_loop(
        0, pl.cdiv(tlen, bkt),
        make_body(kt_ref, kts_ref, vt_ref, vts_ref, bkt, 0, tlen), carry
    )
    kf = kf_ref[0, :, 0:1, :].astype(jnp.float32)
    vf = vf_ref[0, :, 0:1, :].astype(jnp.float32)
    sf = jax.lax.dot_general(
        q.astype(jnp.float32) * (scale * 1.4426950408889634), kf,
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m_new = jnp.maximum(m, sf)
    p = jnp.exp2(sf - m_new)
    alpha = jnp.exp2(m - m_new)
    l = l * alpha + p
    acc = acc * alpha + jax.lax.dot_general(
        p, vf, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nb", "scale", "block_k", "interpret")
)
def decode_beam_attention_int8(
    q: jnp.ndarray,  # [B0*nb, 1, N, D]
    k_fresh: jnp.ndarray,  # [B0*nb, N_kv, 1, D] bf16 (pre-dequantized)
    v_fresh: jnp.ndarray,
    kpq: jnp.ndarray,  # [L, B0, N_kv, S_p, D] int8 — stacked group prompt
    kps: jnp.ndarray,  # [L, B0, N_kv, S_p] f32
    vpq: jnp.ndarray,
    vps: jnp.ndarray,
    ktq: jnp.ndarray,  # [L, B0*nb, N_kv, T_max, D] int8 — stacked tail
    kts: jnp.ndarray,
    vtq: jnp.ndarray,
    vts: jnp.ndarray,
    layer_idx: jnp.ndarray,
    prompt_start: jnp.ndarray,  # [B0]
    prompt_len: jnp.ndarray,  # scalar
    tail_len: jnp.ndarray,  # scalar
    nb: int,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """INT8-KV grouped-beam decode attention."""
    B, _, N, D = q.shape
    L, B0, Nkv, S_p, _ = kpq.shape
    T_max = ktq.shape[3]
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bkp = min(block_k, S_p)
    bkt = min(block_k, T_max)
    assert S_p % bkp == 0 and T_max % bkt == 0

    qg = q.reshape(B, Nkv, 1, G * D)
    budget = 4 * 1024 * 1024
    per_head = 2 * (S_p + T_max) * (D + 4)
    Hs = _pick_heads_int8(Nkv, max(1, budget // max(per_head, 1)))

    flat_p = lambda a: a.reshape((L * B0,) + a.shape[2:])
    flat_t = lambda a: a.reshape((L * B,) + a.shape[2:])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Nkv // Hs, B),
        in_specs=[
            pl.BlockSpec((B0, 1), lambda h, b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda h, b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda h, b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_p, D), lambda h, b, i: (i[0] * B0 + b // nb, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_p), lambda h, b, i: (i[0] * B0 + b // nb, h, 0)),
            pl.BlockSpec((1, Hs, S_p, D), lambda h, b, i: (i[0] * B0 + b // nb, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_p), lambda h, b, i: (i[0] * B0 + b // nb, h, 0)),
            pl.BlockSpec((1, Hs, T_max, D), lambda h, b, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, T_max), lambda h, b, i: (i[0] * B + b, h, 0)),
            pl.BlockSpec((1, Hs, T_max, D), lambda h, b, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, T_max), lambda h, b, i: (i[0] * B + b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda h, b, i: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_beam_int8_kernel, scale=scale, bkp=bkp, bkt=bkt, G=G, nb=nb
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        interpret=interpret,
    )(
        layer_idx.astype(jnp.int32)[None],
        prompt_start.astype(jnp.int32)[:, None],
        jnp.broadcast_to(prompt_len.astype(jnp.int32), (1, 1)),
        jnp.broadcast_to(tail_len.astype(jnp.int32), (1, 1)),
        qg,
        k_fresh,
        v_fresh,
        flat_p(kpq),
        flat_p(kps),
        flat_p(vpq),
        flat_p(vps),
        flat_t(ktq),
        flat_t(kts),
        flat_t(vtq),
        flat_t(vts),
    )
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)


# ---------------------------------------------------------------------------
# INT8-KV stacked decode (dequant in-kernel; HBM reads stay int8-sized)
# ---------------------------------------------------------------------------


def _decode_fresh_int8_kernel(
    idx_ref,  # [1] int32 scalar-prefetch — layer index
    len_ref,  # [B, 1] int32 SMEM
    start_ref,  # [B, 1] int32 SMEM
    q_ref,  # [1, Hs, 1, G*D]
    kf_ref,  # [1, Hs, 1, D] bf16 fresh key (pre-dequantized to match storage)
    vf_ref,  # [1, Hs, 1, D]
    k_ref,  # [1, Hs, S_max, D] int8 — cache plane
    ks_ref,  # [1, Hs, S_max] f32 — per-token K scales
    v_ref,  # [1, Hs, S_max, D] int8
    vs_ref,  # [1, Hs, S_max] f32
    o_ref,  # [1, Hs, 1, G*D]
    *,
    scale: float,
    bk: int,
    G: int,
):
    """INT8 cache decode attention: the kernel reads int8 K/V tiles straight
    from HBM and applies the per-token scales to the SCORE/PROB matrices
    instead of the D-wide values (D× fewer multiplies), so HBM traffic is half
    of bf16 KV. Replaces the round-1 whole-cache XLA dequant at
    ops/attention.py (which doubled traffic and made int8 KV a non-win).
    Reference analog: the int8 cache path of MaskedMultiHeadAttentionKrnl.cpp.
    """
    Hs, D = k_ref.shape[1], k_ref.shape[3]
    b = pl.program_id(0)
    length = len_ref[b, 0]
    start = start_ref[b, 0]
    # q stays bf16 and the softmax scale rides with the per-token K scales
    # post-dot: int8 values are EXACT in bf16 (8 mantissa bits cover ±127), so
    # the bf16 MXU dot with f32 accumulation equals the f32-convert form while
    # skipping the int8→f32 VPU expansion (4× sublane relayout — the measured
    # bottleneck of the f32-convert kernel, experiments/bench_decode_attn.py
    # --int8-variants: 358 → 378 GB/s at the OPT-6.7B b16 shape)
    q = q_ref[0, :, 0].reshape(Hs, G, D)

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(q.dtype)  # [Hs, bk, D]
        ks = ks_ref[0, :, pl.ds(j * bk, bk)]  # [Hs, bk]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [Hs, G, bk]
        s = s * (ks[:, None, :] * (scale * 1.4426950408889634))  # K dequant + softmax scale post-dot (exp2 units)
        pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        allow = (pos < length) & (pos >= start)
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(q.dtype)
        vs = vs_ref[0, :, pl.ds(j * bk, bk)]
        # fold V dequant into the prob matrix; bf16 probs are the one lossy
        # step (~0.4% rel) — standard bf16-attention precision
        pv = (p * vs[:, None, :]).astype(q.dtype)
        acc = acc * alpha + jax.lax.dot_general(
            pv, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    num_kv = pl.cdiv(length, bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    # fresh-token tile (bf16, already matches the cache's dequantized values)
    kf = kf_ref[0, :, 0:1, :].astype(jnp.float32)
    vf = vf_ref[0, :, 0:1, :].astype(jnp.float32)
    sf = jax.lax.dot_general(
        q.astype(jnp.float32) * (scale * 1.4426950408889634), kf,
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m_new = jnp.maximum(m, sf)
    p = jnp.exp2(sf - m_new)
    alpha = jnp.exp2(m - m_new)
    l = l * alpha + p
    acc = acc * alpha + jax.lax.dot_general(
        p, vf, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention_fresh_int8(
    q: jnp.ndarray,  # [B, 1, N, D]
    k_fresh: jnp.ndarray,  # [B, N_kv, 1, D] bf16 (pre-dequantized fresh key)
    v_fresh: jnp.ndarray,
    kq: jnp.ndarray,  # [L, B, N_kv, S_max, D] int8
    ks: jnp.ndarray,  # [L, B, N_kv, S_max] f32
    vq: jnp.ndarray,
    vs: jnp.ndarray,
    layer_idx: jnp.ndarray,
    slot_mask: jnp.ndarray,  # [B, S_max] — past-token validity
    length: jnp.ndarray,  # scalar or [B] — past length
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fresh-merge decode attention over an INT8 stacked cache."""
    B, _, N, D = q.shape
    L, _, Nkv, S_max, _ = kq.shape
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0

    qg = q.reshape(B, Nkv, 1, G * D)
    lengths = jnp.broadcast_to(length.astype(jnp.int32), (B,))
    starts = lengths - jnp.sum(slot_mask.astype(jnp.int32), axis=1)
    # int8 values + f32 scales: budget covers K+V blocks ×2 (double buffering)
    budget = 4 * 1024 * 1024
    per_head = 2 * S_max * (D + 4)
    Hs = _pick_heads_int8(Nkv, max(1, budget // max(per_head, 1)))

    k_flat = kq.reshape(L * B, Nkv, S_max, D)
    ks_flat = ks.reshape(L * B, Nkv, S_max)
    v_flat = vq.reshape(L * B, Nkv, S_max, D)
    vs_flat = vs.reshape(L * B, Nkv, S_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, 1, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max), lambda b, h, i: (i[0] * B + b, h, 0)),
            pl.BlockSpec((1, Hs, S_max, D), lambda b, h, i: (i[0] * B + b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S_max), lambda b, h, i: (i[0] * B + b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h, i: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_decode_fresh_int8_kernel, scale=scale, bk=bk, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        interpret=interpret,
    )(
        layer_idx.astype(jnp.int32)[None],
        lengths[:, None],
        starts[:, None],
        qg,
        k_fresh,
        v_fresh,
        k_flat,
        ks_flat,
        v_flat,
        vs_flat,
    )
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)


# ---------------------------------------------------------------------------
# Stacked-cache decode via manual in-kernel DMA (no scalar prefetch)
# ---------------------------------------------------------------------------


def _decode_dma_kernel(
    idx_ref,  # [1, 1] int32 SMEM — layer index
    len_ref,  # [B, 1] int32 SMEM
    start_ref,  # [B, 1] int32 SMEM
    q_ref,  # [1, Hs, 1, G*D] VMEM
    k_hbm,  # [(L*B), N_kv, S_max, D] — unblocked (stays in HBM)
    v_hbm,
    o_ref,  # [1, Hs, 1, G*D]
    k_s,  # VMEM scratch [Hs, S_max, D]
    v_s,
    sems,  # DMA semaphores (2,)
    *,
    scale: float,
    bk: int,
    G: int,
    Hs: int,
    B: int,
):
    D = k_s.shape[2]
    b = pl.program_id(0)
    h = pl.program_id(1)
    idx = idx_ref[0, 0]
    length = len_ref[b, 0]
    start = start_ref[b, 0]

    # DMA this cell's Hs head planes of layer `idx` straight from the stacked
    # HBM buffer ((L,B) flattened to keep refs rank-4) — the layer select is a
    # dynamic .at[] slice, no plane copy ever materializes in HBM
    row = idx * B + b
    kdma = pltpu.make_async_copy(
        k_hbm.at[row, pl.ds(h * Hs, Hs)], k_s, sems.at[0]
    )
    vdma = pltpu.make_async_copy(
        v_hbm.at[row, pl.ds(h * Hs, Hs)], v_s, sems.at[1]
    )
    kdma.start()
    vdma.start()
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * (scale * 1.4426950408889634)  # exp2 units
    kdma.wait()
    vdma.wait()

    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_s[:, pl.ds(j * bk, bk), :].astype(jnp.float32)
        v = v_s[:, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        allow = (pos < length) & (pos >= start)
        s = jnp.where(allow, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    num_kv = pl.cdiv(length, bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention_stacked_dma(
    q: jnp.ndarray,  # [B, 1, N, D]
    k_cache: jnp.ndarray,  # [L, B, N_kv, S_max, D]
    v_cache: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    slot_mask: jnp.ndarray,  # [B, S_max]
    length: jnp.ndarray,  # scalar or [B]
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Stacked-cache decode attention using manual in-kernel DMA for the layer
    select (works where the remote Mosaic helper rejects scalar-prefetch)."""
    B, _, N, D = q.shape
    L, _, Nkv, S_max, _ = k_cache.shape
    G = N // Nkv
    scale = scale if scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    bk = min(block_k, S_max)
    assert S_max % bk == 0

    qg = q.reshape(B, Nkv, 1, G * D)
    lengths = jnp.broadcast_to(length.astype(jnp.int32), (B,))[:, None]
    starts = lengths - jnp.sum(slot_mask.astype(jnp.int32), axis=1)[:, None]
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    budget = 6 * 1024 * 1024
    Hs = max(1, min(Nkv, budget // max(2 * S_max * D * itemsize, 1)))
    while Nkv % Hs:
        Hs -= 1

    k_flat = k_cache.reshape(L * B, Nkv, S_max, D)
    v_flat = v_cache.reshape(L * B, Nkv, S_max, D)
    out = pl.pallas_call(
        functools.partial(_decode_dma_kernel, scale=scale, bk=bk, G=G, Hs=Hs, B=B),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hs, S_max, D), k_cache.dtype),
            pltpu.VMEM((Hs, S_max, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(layer_idx.astype(jnp.int32), (1, 1)),
        lengths,
        starts,
        qg,
        k_flat,
        v_flat,
    )
    return out.reshape(B, Nkv, G, D).reshape(B, 1, N, D)
