#!/usr/bin/env python
"""Can int8xint8->int32 MXU dots beat the dequant-matmul for WOQ decode?

The Pallas WOQ kernel reads int8 but converts to bf16 before the MXU — the
convert/relayout is why it streams ~450-550 GB/s instead of ~660. An int8 dot
needs no convert and runs at 2x MXU rate. Candidates at decode shapes (M=16):

  A  prod quantized_matmul (Pallas fused dequant, deferred scales)  [baseline]
  B  XLA dynamic-act int8: per-row amax quant of x -> int8 dot -> rescale
  C  XLA bf16 dequant fallback (convert w -> bf16 dot)
  D  Pallas int8-dot kernel probe (jnp.dot int8 inside kernel), if it lowers

Harness rules (memory round2): one jitted scan, STEPS=1000, feedback through
the carry, np.asarray readback, arrays passed as args.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.ops.quant import QuantizedWeight, quantized_matmul

STEPS = 1000
M = 16


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
    print(f"{name:44s} {best*1e3:8.3f} ms", flush=True)
    return best


def dyn_int8(x, w8, ws):
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / s_x).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return y.astype(jnp.float32) * (s_x * ws)


def xla_dequant(x, w8, ws):
    w = (w8.astype(jnp.float32) * ws).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def pallas_int8_dot(x, w8, ws):
    from jax.experimental import pallas as pl

    K, N = w8.shape
    bn = 512
    bk = 1024

    def kernel(xq_ref, w_ref, o_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / s_x).astype(jnp.int8)
    acc = pl.pallas_call(
        kernel,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
    )(xq, w8)
    return acc.astype(jnp.float32) * (s_x * ws)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for name, K, N in [("fc1 4096x16384", 4096, 16384), ("qkv 4096x12288", 4096, 12288)]:
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        ws = jnp.asarray(rng.random((1, N)) * 0.01 + 1e-3, jnp.float32)
        rec = QuantizedWeight(w8, ws.reshape(1, N), "woq_int8")

        def fb(carry, out):
            sl = out[:, :K]
            r = jax.lax.rsqrt(jnp.mean(sl * sl) + 1e-6)
            return (sl * r).astype(carry.dtype)

        gb = K * N / 1e9
        t = time_fn(f"A prod pallas dequant {name}", lambda xx, rr: quantized_matmul(xx, rr), fb, x, rec)
        print(f"   -> {gb/t:7.1f} GB/s", flush=True)
        t = time_fn(f"B xla dyn-int8 dot   {name}", dyn_int8, fb, x, w8, ws)
        print(f"   -> {gb/t:7.1f} GB/s", flush=True)
        t = time_fn(f"C xla bf16 dequant   {name}", xla_dequant, fb, x, w8, ws)
        print(f"   -> {gb/t:7.1f} GB/s", flush=True)
        try:
            t = time_fn(f"D pallas int8 dot    {name}", pallas_int8_dot, fb, x, w8, ws)
            print(f"   -> {gb/t:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"D pallas int8 dot failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # numeric sanity: dyn-int8 vs dequant reference on small values
    x = jnp.asarray(rng.standard_normal((M, 4096)) * 0.05, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (4096, 512)), jnp.int8)
    ws = jnp.asarray(rng.random((1, 512)) * 0.01 + 1e-3, jnp.float32)
    ref = np.asarray(xla_dequant(x, w8, ws))
    got = np.asarray(dyn_int8(x, w8, ws))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"dyn-int8 vs dequant max rel err: {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
