#!/usr/bin/env python
"""Isolated decode-attention kernel shootout at OPT-6.7B b16 shapes.

Hypothesis (round 2, launch-overhead study follow-up): the current decode
kernels issue one batched M=1 dot_general per head — the MXU runs a full
128-cycle pass for a [1,128]x[128,288] product, so 32 heads x 2 dots x ~3
tiles ~= 26us/grid-cell of pure MXU latency, matching the measured
0.405 ms/layer (vs a ~46us HBM floor). The VPU variant replaces both dots
with elementwise multiply + reduction, which at M=1 is the right unit.

Timing harness per round-2 memory: N calls inside ONE jitted scan, arrays as
args (not closed over), np.asarray readback (block_until_ready lies through
the relay).
"""

import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# OPT-6.7B decode shapes, b16, 256-in + 32-out cache
B, Nkv, G, S, D = 16, 32, 1, 288, 128
L = 1  # single layer plane (stacked select is orthogonal to the math)
STEPS = 1000


def make_inputs(dtype=jnp.bfloat16, int8kv=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Nkv, 1, G * D)), dtype)
    if int8kv:
        k = jnp.asarray(rng.integers(-127, 127, (L * B, Nkv, S, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (L * B, Nkv, S, D)), jnp.int8)
        ks = jnp.asarray(rng.random((L * B, Nkv, S)) * 0.01 + 0.001, jnp.float32)
        vs = jnp.asarray(rng.random((L * B, Nkv, S)) * 0.01 + 0.001, jnp.float32)
        return q, k, v, ks, vs
    k = jnp.asarray(rng.standard_normal((L * B, Nkv, S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((L * B, Nkv, S, D)), dtype)
    return q, k, v, None, None


# --------------------------------------------------------------------------
# Variant A: current MXU kernel (mirror of _decode_kernel, no SMEM plumbing —
# full-length attention, which is what the bench measures anyway)
# --------------------------------------------------------------------------


def _mxu_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, bk):
    Hs = k_ref.shape[1]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * scale
    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, S // bk, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


def run_mxu(q, k, v, Hs=Nkv, bk=S):
    return pl.pallas_call(
        functools.partial(_mxu_kernel, scale=D**-0.5, bk=bk),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, k, v)


# --------------------------------------------------------------------------
# Variant B: VPU kernel, same [Hs, S, D] layout.
# scores: q[Hs,1,D] * k[Hs,S,D] -> lane-dim reduce over D
# pv:     p[Hs,S,1] * v[Hs,S,D] -> sublane reduce over S
# --------------------------------------------------------------------------


def _vpu_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    Hs = k_ref.shape[1]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, 1, D) * scale  # G=1
    k = k_ref[0].astype(jnp.float32)  # [Hs, S, D]
    s = jnp.sum(q * k, axis=-1)  # [Hs, S]  (lane reduce)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)  # [Hs, S, D]
    acc = jnp.sum(p[:, :, None] * v, axis=1)  # [Hs, D] (sublane reduce)
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def run_vpu(q, k, v, Hs=Nkv):
    return pl.pallas_call(
        functools.partial(_vpu_kernel, scale=D**-0.5),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, k, v)


# --------------------------------------------------------------------------
# Variant C: VPU with K stored transposed [Hs, D, S] (sublane reduces only)
# --------------------------------------------------------------------------


def _vpu_kt_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale):
    Hs = kt_ref.shape[1]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, D, 1) * scale
    kt = kt_ref[0].astype(jnp.float32)  # [Hs, D, S]
    s = jnp.sum(q * kt, axis=1)  # [Hs, S]  (sublane reduce over D)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)  # [Hs, S, D]
    acc = jnp.sum(p[:, :, None] * v, axis=1)  # [Hs, D] (sublane reduce over S)
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def run_vpu_kt(q, kt, v, Hs=Nkv):
    return pl.pallas_call(
        functools.partial(_vpu_kt_kernel, scale=D**-0.5),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, D, S), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, kt, v)


# --------------------------------------------------------------------------
# Variant D: int8-KV VPU (scales deferred to score/prob, same as prod kernel)
# --------------------------------------------------------------------------


def _vpu_int8_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, scale):
    Hs = k_ref.shape[1]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, 1, D) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jnp.sum(q * k, axis=-1) * ks_ref[0]  # [Hs, S]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = p * vs_ref[0]
    v = v_ref[0].astype(jnp.float32)
    acc = jnp.sum(pv[:, :, None] * v, axis=1)
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def run_vpu_int8(q, k, ks, v, vs, Hs=Nkv):
    return pl.pallas_call(
        functools.partial(_vpu_int8_kernel, scale=D**-0.5),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, k, ks, v, vs)


def time_fn(name, fn, *args):
    """N calls inside one jitted scan; args passed as scan carries' constants."""

    @jax.jit
    def loop(q, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            # feed output back in (prevents DCE; q/out same shape+dtype)
            return out.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, q, None, length=STEPS)
        return final

    out = np.asarray(loop(*args))  # compile + run
    t0 = time.perf_counter()
    out = np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / STEPS
    mb = sum(
        a.nbytes for a in args[1:] if hasattr(a, "nbytes")
    ) / 1e6
    print(
        f"{name:18s} {dt*1e3:8.3f} ms/call   {mb/dt/1e3:7.1f} GB/s effective",
        flush=True,
    )
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} Nkv={Nkv} S={S} D={D}", flush=True)
    q, k, v, _, _ = make_inputs()
    # correctness cross-check (bf16, full length)
    a = np.asarray(run_mxu(q, k, v))
    b = np.asarray(run_vpu(q, k, v))
    kt = jnp.swapaxes(k, 2, 3)
    c = np.asarray(run_vpu_kt(q, kt, v))
    print("vpu matches mxu:", np.abs(a.astype(np.float32) - b.astype(np.float32)).max())
    print("kt  matches mxu:", np.abs(a.astype(np.float32) - c.astype(np.float32)).max())

    time_fn("mxu bf16", run_mxu, q, k, v)
    time_fn("vpu bf16", run_vpu, q, k, v)
    time_fn("vpu-kt bf16", run_vpu_kt, q, kt, v)

    q, k8, v8, ks, vs = make_inputs(int8kv=True)
    time_fn("vpu int8kv", run_vpu_int8, q, k8, ks, v8, vs)


if __name__ == "__main__" and "--int8-variants" not in sys.argv:
    main()


# --------------------------------------------------------------------------
# Variant E: int8 KV, k converted to bf16 (not f32) before an MXU dot —
# the int8->f32 VPU convert is a 4x sublane expansion; ->bf16 is only 2x.
# --------------------------------------------------------------------------


def _mxu_int8_bf16_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, scale, bk):
    Hs = k_ref.shape[1]
    q = q_ref[0, :, 0].astype(jnp.bfloat16).reshape(Hs, G, D)
    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.bfloat16)
        ks = ks_ref[0, :, pl.ds(j * bk, bk)]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * (ks[:, None, :] * scale)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.bfloat16)
        vs = vs_ref[0, :, pl.ds(j * bk, bk)]
        pv = (p * vs[:, None, :]).astype(jnp.bfloat16)
        acc = acc + jnp.exp(m_new - m_new) * 0  # keep dtype
        acc = acc * alpha + jax.lax.dot_general(
            pv, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, S // bk, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


def run_mxu_int8_bf16(q, k, ks, v, vs, Hs=Nkv, bk=S):
    return pl.pallas_call(
        functools.partial(_mxu_int8_bf16_kernel, scale=D**-0.5, bk=bk),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, k, ks, v, vs)


# --------------------------------------------------------------------------
# Variant F: int8 KV, int8 x int8 MXU dots — q quantized per head in-kernel,
# per-token V scales folded into p which is itself quantized per row. No
# int8 convert of the D-wide K/V tiles at all; MXU runs the 2x int8 mode.
# --------------------------------------------------------------------------


def _mxu_int8_dot_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, scale, bk):
    Hs = k_ref.shape[1]
    qf = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D)
    sq = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0
    sq = jnp.maximum(sq, 1e-8)
    q8 = jnp.round(qf / sq).astype(jnp.int8)
    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :]  # int8, stays int8
        ks = ks_ref[0, :, pl.ds(j * bk, bk)]
        s32 = jax.lax.dot_general(
            q8, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )
        s = s32.astype(jnp.float32) * (sq * scale) * ks[:, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vs = vs_ref[0, :, pl.ds(j * bk, bk)]
        pv = p * vs[:, None, :]
        sp = jnp.max(pv, axis=-1, keepdims=True) / 127.0
        sp = jnp.maximum(sp, 1e-20)
        p8 = jnp.round(pv / sp).astype(jnp.int8)
        v = v_ref[0, :, pl.ds(j * bk, bk), :]  # int8
        y32 = jax.lax.dot_general(
            p8, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )
        acc = acc * alpha + y32.astype(jnp.float32) * sp
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, S // bk, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


def run_mxu_int8_dot(q, k, ks, v, vs, Hs=Nkv, bk=S):
    return pl.pallas_call(
        functools.partial(_mxu_int8_dot_kernel, scale=D**-0.5, bk=bk),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, k, ks, v, vs)


# --------------------------------------------------------------------------
# Variant G: production int8 kernel shape (f32 converts) for reference
# --------------------------------------------------------------------------


def _mxu_int8_f32_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, scale, bk):
    Hs = k_ref.shape[1]
    q = q_ref[0, :, 0].astype(jnp.float32).reshape(Hs, G, D) * scale
    m0 = jnp.full((Hs, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hs, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hs, G, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        ks = ks_ref[0, :, pl.ds(j * bk, bk)]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * ks[:, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, :, pl.ds(j * bk, bk), :].astype(jnp.float32)
        vs = vs_ref[0, :, pl.ds(j * bk, bk)]
        pv = p * vs[:, None, :]
        acc = acc * alpha + jax.lax.dot_general(
            pv, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, S // bk, body, (m0, l0, acc0))
    o_ref[0, :, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(Hs, G * D).astype(o_ref.dtype)


def run_mxu_int8_f32(q, k, ks, v, vs, Hs=Nkv, bk=S):
    return pl.pallas_call(
        functools.partial(_mxu_int8_f32_kernel, scale=D**-0.5, bk=bk),
        grid=(B, Nkv // Hs),
        in_specs=[
            pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
            pl.BlockSpec((1, Hs, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Hs, S), lambda b, h: (b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hs, 1, G * D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nkv, 1, G * D), q.dtype),
    )(q, k, ks, v, vs)


def main_int8_variants():
    q, k8, v8, ks, vs = make_inputs(int8kv=True)
    a = np.asarray(run_mxu_int8_f32(q, k8, ks, v8, vs))
    e = np.asarray(run_mxu_int8_bf16(q, k8, ks, v8, vs))
    f = np.asarray(run_mxu_int8_dot(q, k8, ks, v8, vs))
    print("E(bf16cv) vs G(f32cv):", np.abs(a.astype(np.float32) - e.astype(np.float32)).max())
    print("F(int8dot) vs G(f32cv):", np.abs(a.astype(np.float32) - f.astype(np.float32)).max())
    time_fn("G mxu-int8-f32cv", run_mxu_int8_f32, q, k8, ks, v8, vs)
    time_fn("E mxu-int8-bf16cv", run_mxu_int8_bf16, q, k8, ks, v8, vs)
    time_fn("F mxu-int8-dot", run_mxu_int8_dot, q, k8, ks, v8, vs)
    for bk in (96, 144):
        time_fn(f"F mxu-int8-dot bk{bk}",
                functools.partial(run_mxu_int8_dot, bk=bk), q, k8, ks, v8, vs)


if __name__ == "__main__" and "--int8-variants" in sys.argv:
    main_int8_variants()
