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


def _woq_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int, int4: bool):
    """One (i, j, k) grid cell: acc += x[i,k] @ dequant(q[k,j])."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    qt = q_ref[:]  # [bk, bn] int8  |  [bk//2, bn] packed uint8 (half-split/group)
    s = s_ref[:]  # [gpt, bn] scales for the groups covered by this K tile
    gpt = s.shape[0]
    if int4:
        # Mosaic-legal unpack: bitcast u8→i8, widen to i32 immediately — i8
        # vector sub/shift and u8→f32 casts are all unsupported; i32 bit ops are.
        # Half-split packing makes reassembly a CONCAT per group (no interleave
        # shuffle): byte r of a group holds rows (r, r+g/2).
        q32 = pltpu.bitcast(qt, jnp.int8).astype(jnp.int32)
        gh = qt.shape[0] // gpt  # packed rows per group (= g/2)
        qg = q32.reshape(gpt, gh, qt.shape[1])
        lo = ((qg & 0xF) - 8).astype(jnp.float32)
        hi = (((qg >> 4) & 0xF) - 8).astype(jnp.float32)
        w = jnp.concatenate([lo, hi], axis=1) * s[:, None, :]  # [gpt, g, bn]
        bk, bn = 2 * qt.shape[0], qt.shape[1]
    else:
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


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "int4", "block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
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
    bk = min(block_k, K)
    if int4:
        # half-split packing reassembles within a group → tiles must contain
        # whole groups
        bk = g * max(1, bk // g)
    elif g >= bk:
        bk = min(bk, g)
        assert g % bk == 0, f"group {g} must be a multiple of K tile {bk}"
    else:
        bk = (bk // g) * g  # whole groups per tile
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K, bm, bn, bk)
    gpt = max(1, bk // g)  # groups per K tile
    n_k = K // bk

    if int4:
        q_spec = pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j))
    else:
        q_spec = pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))

    # scale block: the gpt groups covered by K tile k start at block (k*bk)//g
    def s_index(i, j, k):
        return ((k * bk) // g // gpt, j)

    return pl.pallas_call(
        functools.partial(_woq_kernel, n_k=n_k, int4=int4),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            q_spec,
            pl.BlockSpec((gpt, bn), s_index),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, q, s)
