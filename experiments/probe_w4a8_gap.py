#!/usr/bin/env python
"""Why does W4A8 lose to int8-dyn at the model level (933 vs 1041 tok/s)?

Isolates the per-call cost at decode shapes (M=16), scan-amortized:
  - int8-dyn: XLA int8x int8 dot over K x N int8 weights (the r4 headline)
  - w4a8:     fused Pallas kernel over K x N/2 packed nibbles

If the fused kernel reached the same effective GB/s as the XLA int8 dot, the
int4 path would win by ~2x on weight bytes. Measures achieved GB/s of each.

    timeout 900 python experiments/probe_w4a8_gap.py
"""

import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import QuantConfig
from lia_tpu.ops.quant import quantize_weight
from lia_tpu.ops.pallas_matmul import w4a8_matmul

STEPS = 100
M = int(os.environ.get("M", "16"))
rng = np.random.default_rng(0)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def bench(loop, *args):
    out = loop(*args)
    sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best


def main():
    for K, N in [(4096, 4096), (4096, 16384), (16384, 4096)]:
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.1

        # int8-dyn: XLA dot on int8 weights
        rec8 = jax.tree.map(
            jnp.asarray,
            quantize_weight(w, QuantConfig(weight_dtype="int8", act_quant="dynamic")),
        )

        def int8_call(xq, sx, q, s):
            y = jax.lax.dot_general(
                xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return y.astype(jnp.float32) * (sx * s[0, :])

        # w4a8: fused Pallas kernel on packed nibbles
        rec4 = jax.tree.map(
            jnp.asarray,
            quantize_weight(
                w, QuantConfig(weight_dtype="int4", group_size=128, act_quant="dynamic")
            ),
        )
        ng = rec4.s.shape[-2]

        def w4a8_call(xq, sx, q, s):
            return w4a8_matmul(
                xq, sx, q, s, None, group_size=K // ng, block_m=16, block_n=512
            )

        for name, call, q, s, wbytes in [
            ("int8dyn_xla", int8_call, rec8.q, rec8.s, K * N),
            ("w4a8_pallas", w4a8_call, rec4.q, rec4.s, K * N // 2),
        ]:
            @jax.jit
            def loop(x, q, s, call=call):
                def body(carry, _):
                    sx = jnp.max(jnp.abs(carry).astype(jnp.float32), 1, keepdims=True) / 127.0
                    xq = jnp.round(carry.astype(jnp.float32) / jnp.maximum(sx, 1e-8)).astype(jnp.int8)
                    y = call(xq, sx, q, s)
                    # keep the carry data-dependent on y at any (K, N)
                    nxt = carry * (1 + 1e-6 * jnp.tanh(y[:, :1]))
                    return nxt.astype(jnp.bfloat16), ()
                return jax.lax.scan(body, x, None, length=STEPS)[0]

            t = bench(loop, x0, q, s)
            print(json.dumps({
                "probe": name, "K": K, "N": N, "us": round(1e6 * t, 1),
                "eff_GBs": round(wbytes / t / 1e9, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
