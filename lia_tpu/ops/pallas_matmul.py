"""Pallas fused dequant-matmul kernels (weight-only INT8/INT4).

Reference equivalent: csrc/cpu/aten/kernels/WoqTppKrnl.cpp (dequant intrinsics
:132-536, grouped dequant ``dequant_n_grouped`` :886-1069) and WoqLinearKrnl.cpp —
the AMX path that loads 4/8-bit weights, dequantizes in-register, and feeds BF16
tiles to the tile engine.

TPU design: the kernel DMAs int8 (or nibble-packed int4) weight tiles HBM→VMEM,
dequantizes them in-register (VPU: convert + scale multiply), and feeds the MXU —
HBM traffic is the quantized bytes, which is the whole point of WOQ on a
bandwidth-bound decode. Accumulation is fp32 in VMEM scratch across the K grid
dimension (standard revisiting-output pattern).

Constraints: group boundaries must align with K tiles (``g % bk == 0`` or ``bk % g
== 0`` with whole groups inside a tile — enforced by the wrapper's tile choice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _woq_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    """One (i, j, k) grid cell: acc += x[i,k] @ dequant(q[k,j]) — INT8 path."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    qt = q_ref[:]  # [bk, bn] int8
    s = s_ref[:]  # [gpt, bn] scales for the groups covered by this K tile
    gpt = s.shape[0]
    qf = qt.astype(jnp.float32)
    bk, bn = qf.shape
    w = qf.reshape(gpt, bk // gpt, bn) * s[:, None, :]
    w = w.reshape(bk, bn).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _woq4_kernel(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref, *, n_k: int
):
    """INT4 (global half-split) grid cell: TWO plain matmuls, zero relayouts.

    Byte r of the packed weight holds original rows (r, K/2 + r), so the low
    nibbles form a contiguous [bkh, bn] weight tile for x columns [k*bkh, ...)
    and the high nibbles one for columns [K/2 + k*bkh, ...). The round-1
    per-group half-split needed a concat + 3D reshape per tile — Mosaic
    relayouts that made int4 2.2× SLOWER than int8 despite half the bytes.
    Reference analog: WoqTppKrnl.cpp:132-536 amortizes dequant to near-free.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.int32)  # [bkh, bn]
    slo = slo_ref[:]  # [gpt, bn]
    shi = shi_ref[:]
    gpt = slo.shape[0]
    bkh, bn = q32.shape
    x = xlo_ref[:]  # [bm, bkh]
    lo = ((q32 & 0xF) - 8).astype(jnp.float32)
    wlo = (lo.reshape(gpt, bkh // gpt, bn) * slo[:, None, :]).reshape(bkh, bn)
    acc_ref[:] += jax.lax.dot_general(
        x, wlo.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xh = xhi_ref[:]
    hi = (((q32 >> 4) & 0xF) - 8).astype(jnp.float32)
    whi = (hi.reshape(gpt, bkh // gpt, bn) * shi[:, None, :]).reshape(bkh, bn)
    acc_ref[:] += jax.lax.dot_general(
        xh, whi.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _woq4z_kernel(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, zlo_ref, zhi_ref, o_ref, acc_ref,
    *, n_k: int
):
    """Asymmetric INT4 (zero-point) variant: w = (code - z) * s.

    GPTQ-native — ingested checkpoints keep their per-group zero-points instead
    of being lossily re-quantized to symmetric (reference zp-aware kernels:
    WoqTppKrnl.cpp:886-1069 dequant_n_grouped). One extra VPU subtract per
    element over the symmetric path.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.int32)  # [bkh, bn]
    slo, shi = slo_ref[:], shi_ref[:]  # [gpt, bn]
    zlo, zhi = zlo_ref[:], zhi_ref[:]
    gpt = slo.shape[0]
    bkh, bn = q32.shape
    x = xlo_ref[:]
    lo = (q32 & 0xF).astype(jnp.float32).reshape(gpt, bkh // gpt, bn)
    wlo = ((lo - zlo[:, None, :]) * slo[:, None, :]).reshape(bkh, bn)
    acc_ref[:] += jax.lax.dot_general(
        x, wlo.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xh = xhi_ref[:]
    hi = ((q32 >> 4) & 0xF).astype(jnp.float32).reshape(gpt, bkh // gpt, bn)
    whi = ((hi - zhi[:, None, :]) * shi[:, None, :]).reshape(bkh, bn)
    acc_ref[:] += jax.lax.dot_general(
        xh, whi.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


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
    assert g == K or Kh % g == 0, f"group {g} must divide K/2={Kh}"
    bkh = min(block_k, Kh)
    if g != K:
        bkh = g * max(1, bkh // g)
    assert Kh % bkh == 0, (K, bkh)
    gpt = max(1, bkh // g)
    n_k = Kh // bkh

    def s_lo_index(i, j, k):
        return (0, j) if ng == 1 else (k, j)

    def s_hi_index(i, j, k):
        return (0, j) if ng == 1 else (k + n_k, j)

    return pl.pallas_call(
        functools.partial(_woq4z_kernel, n_k=n_k),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k + n_k)),
            pl.BlockSpec((bkh, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((gpt, bn), s_lo_index),
            pl.BlockSpec((gpt, bn), s_hi_index),
            pl.BlockSpec((gpt, bn), s_lo_index),
            pl.BlockSpec((gpt, bn), s_hi_index),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, x, q, s, s, z, z)
def woq_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    q: jnp.ndarray,  # [K, N] int8  |  [K//2, N] packed uint8 (int4)
    s: jnp.ndarray,  # [n_groups, N] f32
    group_size: int,
    int4: bool = False,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """x @ (dequantized weight), fp32 accumulation. Returns [M, N] ``out_dtype``."""
    M, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    g = K // ng
    assert group_size in (-1, g), f"scale table implies group {g}"
    interpret = _interpret_default() if interpret is None else interpret

    bm = min(block_m, M)
    bn = min(block_n, N)

    if int4:
        # global half-split: the K grid walks PACKED rows [0, K/2); each tile
        # feeds two matmuls (x cols [k·bkh, …) and [K/2 + k·bkh, …))
        Kh = K // 2
        assert g == K or Kh % g == 0, f"group {g} must divide K/2={Kh}"
        bkh = min(block_k, Kh)
        if g != K:
            bkh = g * max(1, bkh // g)  # whole groups per half tile
        assert Kh % bkh == 0, (K, bkh)
        gpt = max(1, bkh // g)
        n_k = Kh // bkh
        ng_half = max(1, ng // 2)

        def s_lo_index(i, j, k):
            return (0, j) if ng == 1 else (k, j)

        def s_hi_index(i, j, k):
            return (0, j) if ng == 1 else (k + n_k, j)

        return pl.pallas_call(
            functools.partial(_woq4_kernel, n_k=n_k),
            grid=(M // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k)),
                pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k + n_k)),
                pl.BlockSpec((bkh, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((gpt, bn), s_lo_index),
                pl.BlockSpec((gpt, bn), s_hi_index),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            interpret=interpret,
        )(x, x, q, s, s)

    bk = min(block_k, K)
    if g >= bk:
        bk = min(bk, g)
        assert g % bk == 0, f"group {g} must be a multiple of K tile {bk}"
    else:
        bk = (bk // g) * g  # whole groups per tile
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K, bm, bn, bk)
    gpt = max(1, bk // g)  # groups per K tile
    n_k = K // bk

    # scale block: the gpt groups covered by K tile k start at block (k*bk)//g
    def s_index(i, j, k):
        return ((k * bk) // g // gpt, j)

    return pl.pallas_call(
        functools.partial(_woq_kernel, n_k=n_k),
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
