#!/usr/bin/env python
"""True costs of the PRODUCTION kernels at OPT-6.7B b16 decode shapes.

Harness rules (see bench_pallas_stream.py): STEPS=1000 single-dispatch scan,
carry feeds back into every iteration's inputs, np.asarray readback.

Measures:
  1. decode_attention_fresh (bf16 stacked cache)      — the fused-path kernel
  2. decode_attention_fresh_int8 (int8 KV, deferred scales)
  3. woq_matmul int8 fc1/fc2 shapes (current kernel)
  4. prototype deferred-scale int8 woq (scale on the output tile per group)
  5. XLA bf16 dot at fc1 shape (dequant-free control)
"""

import sys
import time
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from lia_tpu.ops.pallas_attention import (
    decode_attention_fresh,
    decode_attention_fresh_int8,
)
from lia_tpu.ops.pallas_matmul import woq_matmul

STEPS = 1000
B, Nkv, G, S, D, L = 16, 32, 1, 384, 128, 32
N = Nkv * G


def time_fn(name, fn, feedback, *args):
    """feedback(carry_shape_arr, out) -> next carry (keeps work live)."""

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
    mb = sum(a.nbytes for a in args[1:] if hasattr(a, "nbytes")) / 1e6
    print(f"{name:34s} {best*1e3:8.3f} ms  ({mb:6.1f} MB in => {mb/best/1e3:6.1f} GB/s)",
          flush=True)
    return best


# ---------------- deferred-scale int8 WOQ prototype ----------------


def _woq_v2_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int, gpt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk] bf16
    qt = q_ref[:]  # [bk, bn] int8
    s = s_ref[:]  # [gpt, bn] f32
    bk, bn = qt.shape
    g = bk // gpt
    for gi in range(gpt):
        w = qt[gi * g:(gi + 1) * g, :].astype(x.dtype)  # int8 -> bf16, no scale
        part = jax.lax.dot_general(
            x[:, gi * g:(gi + 1) * g], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bm, bn]
        acc_ref[:] += part * s[gi:gi + 1, :]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def woq_v2(x, q, s, group_size, block_n=256, block_k=512):
    M, K = x.shape
    N_ = q.shape[1]
    ng = s.shape[0]
    g = K // ng
    bm, bn, bk = M, min(block_n, N_), min(block_k, K)
    bk = (bk // g) * g if g < bk else g
    gpt = bk // g
    n_k = K // bk

    def s_index(i, j, k):
        return ((k * bk) // g // gpt, j)

    return pl.pallas_call(
        functools.partial(_woq_v2_kernel, n_k=n_k, gpt=gpt),
        grid=(M // bm, N_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((gpt, bn), s_index),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )(x, q, s)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # ---------------- attention kernels ----------------
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((L, B, Nkv, S, D)), jnp.bfloat16)
    li = jnp.int32(3)
    past = 288
    slot_mask = jnp.broadcast_to(
        (jnp.arange(S) < past)[None, :], (B, S)
    )
    length = jnp.int32(past)

    def fb_attn(carry, out):
        return out.astype(carry.dtype)

    time_fn(
        "decode_attention_fresh bf16",
        lambda qq, *rest: decode_attention_fresh(qq, *rest),
        fb_attn,
        q, kf, vf, kc, vc, li, slot_mask, length,
    )

    k8 = jnp.asarray(rng.integers(-127, 127, (L, B, Nkv, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (L, B, Nkv, S, D)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, Nkv, S)) * 0.01 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.random((L, B, Nkv, S)) * 0.01 + 1e-3, jnp.float32)
    time_fn(
        "decode_attention_fresh int8kv",
        lambda qq, *rest: decode_attention_fresh_int8(qq, *rest),
        fb_attn,
        q, kf, vf, k8, ks, v8, vs, li, slot_mask, length,
    )

    # ---------------- weight matmuls (fc1 shape 4096x16384) ----------
    # NOTE: the current grouped (g=128) int8 path is Mosaic-ILLEGAL on TPU
    # (scale block gpt=4 < 8 sublanes) — production bench used g=-1.
    M, K, NN = 16, 4096, 16384
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, NN)), jnp.int8)
    sc1 = jnp.asarray(rng.random((1, NN)) * 0.01 + 1e-3, jnp.float32)
    sc128 = jnp.asarray(rng.random((K // 128, NN)) * 0.01 + 1e-3, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((K, NN)) * 0.02, jnp.bfloat16)

    def fb_mm(carry, out):
        # out [M, NN] f32 -> feed first K cols back, renormalized
        sl = out[:, :K]
        r = jax.lax.rsqrt(jnp.mean(sl * sl) + 1e-6)
        return (sl * r).astype(carry.dtype)

    time_fn(
        "woq int8 fc1 g=-1 (current)",
        lambda xx, qq, ss: woq_matmul(xx, qq, ss, -1),
        fb_mm, x, w8, sc1,
    )
    time_fn(
        "woq_v2 int8 fc1 g=-1",
        lambda xx, qq, ss: woq_v2(xx, qq, ss, -1),
        fb_mm, x, w8, sc1,
    )
    time_fn(
        "woq_v2 int8 fc1 g=128 bk=1024",
        lambda xx, qq, ss: woq_v2(xx, qq, ss, 128, block_k=1024),
        fb_mm, x, w8, sc128,
    )
    time_fn(
        "xla dot bf16 fc1 (control)",
        lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.float32),
        fb_mm, x, wb,
    )

    # correctness of v2 vs current (per-channel)
    a = np.asarray(woq_matmul(x, w8, sc1, -1))
    b = np.asarray(woq_v2(x, w8, sc1, -1))
    print("v2 max rel err vs current:", np.abs(a - b).max() / np.abs(a).max(),
          flush=True)


if __name__ == "__main__":
    main()
