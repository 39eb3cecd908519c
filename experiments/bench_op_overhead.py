#!/usr/bin/env python
"""Per-op overhead inside a compiled scan: XLA dot vs pallas dot chains.

Scan body chains N ops (each reading its own 8.4 MB weight, carry-dependent).
t(N) slope = per-op cost; with 8.4 MB at ~660 GB/s the bandwidth share is
~13 us, the rest is launch/setup overhead. Decides how much megakernel fusion
is worth on this rig.
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

STEPS = 1000
D = 2048  # [D, D] bf16 = 8.4 MB per weight
M = 16


def time_fn(name, fn, *args):
    @jax.jit
    def loop(x, *rest):
        def body(carry, _):
            return fn(carry, *rest), ()

        final, _ = jax.lax.scan(body, x, None, length=STEPS)
        return final

    np.asarray(loop(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:30s} {best*1e6:9.1f} us/iter", flush=True)
    return best


def xla_chain(x, ws):
    for w in ws:
        x = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = x * jax.lax.rsqrt(jnp.mean(x.astype(jnp.float32) ** 2) + 1e-6).astype(
            jnp.bfloat16
        )
    return x


def _dot_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_dot(x, w):
    return pl.pallas_call(
        _dot_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
    )(x, w)


def pallas_chain(x, ws):
    for w in ws:
        x = pallas_dot(x, w)
        x = x * jax.lax.rsqrt(jnp.mean(x.astype(jnp.float32) ** 2) + 1e-6).astype(
            jnp.bfloat16
        )
    return x


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)) * 0.02, jnp.bfloat16)

    for N in (1, 4, 8):
        ws = tuple(
            jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
            for _ in range(N)
        )
        time_fn(f"xla chain N={N}", xla_chain, x, ws)
    for N in (1, 4, 8):
        ws = tuple(
            jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
            for _ in range(N)
        )
        time_fn(f"pallas chain N={N}", pallas_chain, x, ws)


if __name__ == "__main__":
    main()
