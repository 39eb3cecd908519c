#!/usr/bin/env python
"""Int4 unpack-strategy sweep: can the dequant drop below the int8 wall time?

Finding so far (bench_w4a8.py): prod int4 dequant (A), XLA batched int8 dots
(B), and the int8-dyn control (C) ALL land at ~0.11 ms on the fc1 shape —
int4 reads half the bytes but pays it back in per-element VPU work
(int8->int32 widen + and/shift/sub + convert). The HBM floor for the int4
bytes is ~0.045 ms, so there is ~2x on the table if unpack gets cheap enough.

Candidates (all produce x @ dequant(w) with per-group scales deferred to the
output tile; packing is synthesized per-strategy so each kernel reads its
native layout):

  A  prod woq_matmul int4 (biased nibbles, int32 ops, bf16 dots)   [baseline]
  S  signed nibbles, int8-domain arithmetic shifts, bf16 dots
     lo = (q8 << 4) >> 4, hi = q8 >> 4  (3 int8 ops / 2 elements)
  D  signed nibbles, int8-domain shifts, INT8 MXU dots (w4a8):
     dots in int8 with per-token act scales folded outside
  C  prod woq_int8 control (2x the HBM bytes)

Harness rules (RESULTS round-2): one jitted scan, STEPS>=500, carry feedback,
np.asarray readback, arrays as args, one TPU process.
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from lia_tpu.ops.pallas_matmul import woq_matmul

STEPS = 500
M = 8
K, N, g = 4096, 14336, 128


def time_fn(name, fn, feedback, *args):
    @jax.jit
    def loop(x, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            return feedback(carry, out), ()

        final, _ = jax.lax.scan(body, x, None, length=STEPS)
        return final

    np.asarray(loop(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)
    return best


# ---------------------------------------------------------------- kernels


def _shift_kernel(x_ref, xh_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
                  *, n_k: int, gpt: int, int8_dots: bool):
    """Signed-nibble unpack via int8 arithmetic shifts.

    Packed byte r = (lo & 0xF) | (hi << 4) where lo/hi are SIGNED int4 codes
    (two's complement). Sign extension:
        hi = q8 >> 4          (arithmetic shift on int8)
        lo = (q8 << 4) >> 4
    3 int8 ops per 2 elements; no int32 widen, no mask, no bias subtract.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8-domain shifts DO NOT lower (Mosaic: failed to legalize arith.shli on
    # vector<8x128x4xi8>, measured 2026-08-19) — widen to int32 and use
    # sign-extending shifts on SIGNED-nibble packing: 3 ALU ops per byte vs the
    # biased layout's 5 (mask+sub twice).
    q32 = q_ref[:].astype(jnp.int32)  # [bkh, bn] sign-extended bytes
    slo = slo_ref[:]
    shi = shi_ref[:]
    bkh = q32.shape[0]
    gg = bkh // gpt
    x = x_ref[:]
    xh = xh_ref[:]
    if int8_dots:
        lo = ((q32 << 28) >> 28).astype(jnp.int8)  # sign-extend low nibble
        hi = (q32 >> 4).astype(jnp.int8)  # top bits already ch's sign
        for gi in range(gpt):
            sl = slice(gi * gg, (gi + 1) * gg)
            part = jax.lax.dot_general(
                x[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc_ref[:] += part * slo[gi:gi + 1, :]
            part = jax.lax.dot_general(
                xh[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc_ref[:] += part * shi[gi:gi + 1, :]
    else:
        lo = ((q32 << 28) >> 28).astype(x.dtype)
        hi = (q32 >> 4).astype(x.dtype)
        for gi in range(gpt):
            sl = slice(gi * gg, (gi + 1) * gg)
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


@functools.partial(jax.jit, static_argnames=("gsize", "int8_dots"))
def shift_matmul(x, q, s, gsize, int8_dots=False):
    Mm, Kk = x.shape
    Nn = q.shape[1]
    ng = s.shape[0]
    Kh = Kk // 2
    bkh = 8 * gsize  # 8 groups per K tile (Mosaic sublane-legal scale block)
    gpt = 8
    if (Kh // gsize) % gpt:
        bkh, gpt = Kh, Kh // gsize
    n_k = Kh // bkh
    bm, bn = Mm, 256
    ngh = ng // 2
    s_lo, s_hi = s[:ngh], s[ngh:]

    def s_idx(i, j, k):
        return (k, j)

    return pl.pallas_call(
        functools.partial(_shift_kernel, n_k=n_k, gpt=gpt, int8_dots=int8_dots),
        grid=(Mm // bm, Nn // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bkh), lambda i, j, k: (i, k + n_k)),
            pl.BlockSpec((bkh, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((gpt, bn), s_idx),
            pl.BlockSpec((gpt, bn), s_idx),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mm, Nn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x, x, q, s_lo, s_hi)


# ---------------------------------------------------------------- main


def main():
    print(f"backend={jax.default_backend()}  M={M} K={K} N={N} g={g}", flush=True)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N), np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((M, K), np.float32), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    # biased-nibble packing (prod layout, half-split)
    ng = K // g
    wq = w.reshape(ng, g, N)
    s = np.abs(wq).max(axis=1) / 7.0  # [ng, N]
    codes = np.clip(np.round(wq / s[:, None, :]), -8, 7).astype(np.int32)
    codes = codes.reshape(K, N)
    lo_rows, hi_rows = codes[: K // 2], codes[K // 2:]
    packed_biased = (((lo_rows + 8) & 0xF) | (((hi_rows + 8) & 0xF) << 4)).astype(np.uint8)
    # signed-nibble packing (same codes, two's complement nibbles)
    packed_signed = ((lo_rows & 0xF) | ((hi_rows & 0xF) << 4)).astype(np.uint8)

    s_j = jnp.asarray(s, jnp.float32)
    pb = jnp.asarray(packed_biased)
    ps = jnp.asarray(packed_signed.view(np.int8))

    # int8 control weights
    s8 = np.abs(w.reshape(ng, g, N)).max(axis=1) / 127.0
    q8 = np.clip(np.round(w.reshape(ng, g, N) / s8[:, None, :]), -127, 127)
    q8 = jnp.asarray(q8.reshape(K, N), jnp.int8)
    s8_j = jnp.asarray(s8, jnp.float32)

    fb = lambda c, out: (c + out[:1, :K].astype(c.dtype) * 1e-9)

    # correctness first (small-tolerance vs float matmul)
    ref = np.asarray(x, np.float32) @ (codes.astype(np.float32)
                                       * np.repeat(s, g, axis=0))
    outS = np.asarray(shift_matmul(x, ps, s_j, g))
    err = np.abs(outS - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"S vs ref max rel err: {err:.4f}", flush=True)

    tA = time_fn("A prod int4 dequant (biased, int32 ops)",
                 lambda c, q_, s_: woq_matmul(c, q_, s_, g, int4=True,
                                              out_dtype=jnp.float32),
                 fb, x, pb, s_j)
    tS = time_fn("S signed nibbles, i32 sext shifts, bf16 dots",
                 lambda c, q_, s_: shift_matmul(c, q_, s_, g),
                 fb, x, ps, s_j)
    tC = time_fn("C prod int8 dequant control",
                 lambda c, q_, s_: woq_matmul(c, q_, s_, g,
                                              out_dtype=jnp.float32),
                 fb, x, q8, s8_j)

    # int8-dot variants feed int8 activations (w4a8); the int8 carry must DEPEND
    # on the output or XLA dead-code-eliminates the whole matmul (an identity
    # feedback here first measured 0.06 ms "kernels" — empty loops)
    def fb8(c, out):
        return c ^ out[:, :K].astype(jnp.int32).astype(jnp.int8)

    tD = time_fn("D signed nibbles, i32 sext shifts, INT8 dots",
                 lambda c, q_, s_: shift_matmul(c, q_, s_, g, int8_dots=True),
                 fb8, x8, ps, s_j)

    from lia_tpu.ops.pallas_matmul import w4a8_matmul

    sx1 = jnp.ones((M, 1), jnp.float32)
    tB = time_fn("B prod w4a8 kernel (biased, mask/sub, INT8 dots)",
                 lambda c, q_, s_, sx_: w4a8_matmul(c, sx_, q_, s_, None,
                                                    group_size=g),
                 fb8, x8, pb, s_j, sx1)

    # int8-dyn control at the same dependence structure (XLA native int8 dot,
    # per-channel scales — 2x the HBM bytes, zero unpack work)
    def int8dyn(c, q_, s_):
        y = jax.lax.dot_general(c, q_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * s_[:1, :]

    tE = time_fn("E int8-dyn XLA dot control", int8dyn, fb8, x8, q8, s8_j)

    nbytes4 = K * N // 2
    nbytes8 = K * N
    for nm, t, nb in (("A", tA, nbytes4), ("S", tS, nbytes4),
                      ("D", tD, nbytes4), ("B", tB, nbytes4),
                      ("C", tC, nbytes8), ("E", tE, nbytes8)):
        print(f"   {nm}: {nb / t / 1e9:7.1f} GB/s on its bytes", flush=True)


if __name__ == "__main__":
    main()
