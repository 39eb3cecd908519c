#!/usr/bin/env python
"""True HBM streaming rates for XLA vs Pallas on this rig.

Harness traps found on the way (now avoided):
  1. STEPS=50 scans: one ~25 ms relay dispatch round-trip dominated, every
     config measured ~0.52 ms/iter regardless of size. STEPS=1000 amortizes.
  2. Loop-invariant work is hoisted out of the scan by XLA (measured "5500
     GB/s"). Every iteration's read must depend on the carry: here the small
     multiplier row x is (x0 + carry), so the big-array read can't be hoisted.
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

STEPS = 1000


def time_fn(name, fn, *args):
    @jax.jit
    def loop(c, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            return out.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, c, None, length=STEPS)
        return final

    np.asarray(loop(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    mb = sum(a.nbytes for a in args[1:] if hasattr(a, "nbytes")) / 1e6
    print(f"{name:34s} {best*1e3:8.3f} ms  {mb/best/1e3:7.1f} GB/s", flush=True)
    return best


# carry is a scalar fed into the small row -> big read not hoistable
def xla_wsum(c, w, x0):
    return jnp.sum(w.astype(jnp.float32) * (x0 + c))  # x0: [1, C] row


def xla_dot(c, w, x0):
    # x0: [M, R]; dot result summed to scalar
    return jnp.sum(jnp.dot(x0 + c, w, preferred_element_type=jnp.float32))


def _psum_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    w = w_ref[...].astype(jnp.float32)
    o_ref[...] += jnp.sum(w * x_ref[...], axis=0, keepdims=True)


def run_psum(c, w, x0, rows):
    R, C = w.shape
    out = pl.pallas_call(
        _psum_kernel,
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((rows, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
    )(x0 + c, w)
    return jnp.sum(out)


def _pdot_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def run_pdot(c, w, x0, rows):
    # x0: [8, R] bf16; per-cell [8, rows] @ [rows, C]
    R, C = w.shape
    out = pl.pallas_call(
        _pdot_kernel,
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((8, rows), lambda i: (0, i)),
            pl.BlockSpec((rows, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
    )((x0 + c).astype(jnp.bfloat16), w)
    return jnp.sum(out)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    c0 = jnp.zeros((), jnp.float32)

    for R in (36864, 147456):
        mb = R * 512 * 2 >> 20
        w = jnp.asarray(rng.standard_normal((R, 512)), jnp.bfloat16)
        row = jnp.asarray(rng.standard_normal((1, 512)), jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((1, R)), jnp.bfloat16)
        x8 = jnp.asarray(rng.standard_normal((8, R)), jnp.float32)
        time_fn(f"xla w*row sum {mb}MB", xla_wsum, c0, w, row)
        time_fn(f"xla dot M=1 {mb}MB", xla_dot, c0, w, x1)
        time_fn(f"xla dot M=8 {mb}MB", xla_dot, c0, w, x8)
        time_fn(
            f"pallas sum r=2048 {mb}MB",
            functools.partial(run_psum, rows=2048), c0, w, row,
        )
        time_fn(
            f"pallas dot r=2048 {mb}MB",
            functools.partial(run_pdot, rows=2048), c0, w, x8,
        )


if __name__ == "__main__":
    main()
