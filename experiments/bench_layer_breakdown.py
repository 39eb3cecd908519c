#!/usr/bin/env python
"""Where does the OPT-6.7B decode step actually go?

(a) production quantized_matmul at each decode shape (qkv/out/fc1/fc2/lm_head)
(b) a whole fused decode layer via decode_layers_scan at L=1 vs L=2 (slope =
    true per-layer cost including norms/cache/rope/overheads)
"""

import sys
import time
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import QuantConfig
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
    print(f"{name:34s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    shapes = [
        ("qkv-one 4096x4096", 4096, 4096),
        ("fc1 4096x16384", 4096, 16384),
        ("fc2 16384x4096", 16384, 4096),
        ("lm_head 4096x50272", 4096, 50272),
    ]
    for name, K, N in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        s1 = jnp.asarray(rng.random((1, N)) * 0.01 + 1e-3, jnp.float32)
        rec = QuantizedWeight(w8, s1, "woq_int8")

        def fb(carry, out):
            reps = -(-K // out.shape[1])
            sl = jnp.tile(out, (1, reps))[:, :K] if reps > 1 else out[:, :K]
            r = jax.lax.rsqrt(jnp.mean(sl * sl) + 1e-6)
            return (sl * r).astype(carry.dtype)

        gbs = (K * N) / 1e9
        t = time_fn(f"qmm {name}", lambda xx, rr: quantized_matmul(xx, rr), fb, x, rec)
        print(f"   -> {gbs/t:7.1f} GB/s (int8 bytes)", flush=True)

    # lm_head with vocab padded to a 128-multiple (Pallas-viable)
    K, N = 4096, 50432
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    s1 = jnp.asarray(rng.random((1, N)) * 0.01 + 1e-3, jnp.float32)
    rec = QuantizedWeight(w8, s1, "woq_int8")

    def fb2(carry, out):
        r = jax.lax.rsqrt(jnp.mean(out[:, :K] ** 2) + 1e-6)
        return (out[:, :K] * r).astype(carry.dtype)

    t = time_fn("qmm lm_head PADDED 4096x50432",
                lambda xx, rr: quantized_matmul(xx, rr), fb2, x, rec)
    print(f"   -> {K*N/1e9/t:7.1f} GB/s (int8 bytes)", flush=True)

    # fused-qkv shape: one [4096, 12288] vs three [4096, 4096]
    K, N = 4096, 12288
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    s1 = jnp.asarray(rng.random((1, N)) * 0.01 + 1e-3, jnp.float32)
    rec = QuantizedWeight(w8, s1, "woq_int8")
    t = time_fn("qmm fused-qkv 4096x12288",
                lambda xx, rr: quantized_matmul(xx, rr), fb2, x, rec)
    print(f"   -> {K*N/1e9/t:7.1f} GB/s (int8 bytes)", flush=True)


if __name__ == "__main__":
    main()
