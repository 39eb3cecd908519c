#!/usr/bin/env python
"""W4A8 probe: do per-group batched int8 MXU dots beat the int4 dequant kernel?

The int4 Pallas kernel converts nibbles -> bf16 before the MXU and measures
~200-260 GB/s on packed bytes; the int8-dyn path showed skipping the float
convert reaches the full streaming rate. W4A8 unpacks nibbles with int8
and/shift/sub only, then runs [ng/2, g, N]-batched int8 dots per half.

  A  prod int4 dequant (Pallas fused, half-split)         [baseline]
  B  woq_int4_dyn (XLA batched int8 dots, per-group)      [candidate]
  C  woq_int8_dyn control at same shape (2x the bytes)

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

from lia_tpu.config import QuantConfig
from lia_tpu.ops.quant import quantize_weight, quantized_matmul

STEPS = 1000
M = 8


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
    print(f"{name:40s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    K, N, g = 4096, 14336, 128
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)

    rec4 = quantize_weight(w, QuantConfig(weight_dtype="int4", group_size=g))
    rec4d = quantize_weight(
        w, QuantConfig(weight_dtype="int4", group_size=g, act_quant="dynamic")
    )
    rec8d = quantize_weight(
        w, QuantConfig(weight_dtype="int8", group_size=-1, act_quant="dynamic")
    )
    put = jax.device_put
    rec4, rec4d, rec8d = put(rec4), put(rec4d), put(rec8d)

    def fb(carry, out):
        sl = out[:, :K]
        r = jax.lax.rsqrt(jnp.mean(sl * sl) + 1e-6)
        return (sl * r).astype(carry.dtype)

    gb4 = K * N / 2 / 1e9  # packed int4 bytes
    gb8 = K * N / 1e9
    t = time_fn("A prod int4 dequant (pallas)", quantized_matmul, fb, x, rec4)
    print(f"   -> {gb4/t:7.1f} GB/s on int4 bytes", flush=True)
    t = time_fn("B w4a8 fused Pallas kernel (prod route)", quantized_matmul, fb, x, rec4d)
    print(f"   -> {gb4/t:7.1f} GB/s on int4 bytes", flush=True)

    from lia_tpu.ops import dispatch

    def mm_xla(xx, rr):
        with dispatch.pallas_disabled():
            return quantized_matmul(xx, rr)

    t = time_fn("B0 woq_int4_dyn XLA (materialized unpack)", mm_xla, fb, x, rec4d)
    print(f"   -> {gb4/t:7.1f} GB/s on int4 bytes", flush=True)
    t = time_fn("C woq_int8_dyn control", quantized_matmul, fb, x, rec8d)
    print(f"   -> {gb8/t:7.1f} GB/s on int8 bytes", flush=True)

    # numeric sanity
    ref = np.asarray(x, np.float32) @ w
    got = np.asarray(quantized_matmul(x, rec4d))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"w4a8 vs fp max rel err: {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
