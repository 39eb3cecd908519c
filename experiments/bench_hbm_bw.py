#!/usr/bin/env python
"""What read bandwidth can this rig actually sustain?

Measures: (a) XLA full-array reduction, (b) pallas read-all/write-tiny kernels
at several grid depths / block shapes, over arrays the size of one decode
layer's KV traffic (75 MB bf16).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 50
B, Nkv, S, D = 16, 32, 288, 128  # 37.7 MB bf16 per array, x2 arrays


def time_fn(name, fn, *args):
    @jax.jit
    def loop(c, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            return carry + out.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, c, None, length=STEPS)
        return final

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / STEPS
    mb = sum(a.nbytes for a in args[1:] if hasattr(a, "nbytes")) / 1e6
    print(f"{name:28s} {dt*1e3:8.3f} ms  {mb/dt/1e3:7.1f} GB/s", flush=True)


def _sum_kernel(k_ref, v_ref, o_ref):
    s = jnp.sum(k_ref[...].astype(jnp.float32)) + jnp.sum(
        v_ref[...].astype(jnp.float32)
    )
    o_ref[...] = jnp.full((1, 1), s, jnp.float32)


def run_sum(c, k, v, rows):
    # k flat [R, cols] split into `rows`-row blocks
    R, C = k.shape
    return pl.pallas_call(
        _sum_kernel,
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0)),
            pl.BlockSpec((rows, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(k, v)[0, 0]


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B * Nkv * S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B * Nkv * S, D)), jnp.bfloat16)
    c0 = jnp.zeros((), jnp.float32)

    time_fn("xla sum (2x37.7MB bf16)", lambda c, a, b: jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32)), c0, k, v)
    time_fn("xla sum bf16-acc", lambda c, a, b: (jnp.sum(a) + jnp.sum(b)).astype(jnp.float32), c0, k, v)
    for rows in (512, 2048, 9216):
        time_fn(f"pallas sum rows={rows}", functools.partial(run_sum, rows=rows), c0, k, v)

    # wider rows: reshape to [R/4, 4*D]
    k4 = k.reshape(-1, 4 * D)
    v4 = v.reshape(-1, 4 * D)
    for rows in (1024, 2048):
        time_fn(f"pallas sum 512-lane rows={rows}", functools.partial(run_sum, rows=rows), c0, k4, v4)


if __name__ == "__main__":
    main()
