#!/usr/bin/env python
"""TPU compile+run check of all WOQ kernel variants after the deferred-scale
rework, vs the interpret-mode golden."""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lia_tpu.ops.pallas_matmul import woq_matmul, woq4z_matmul

rng = np.random.default_rng(0)
M, K, N = 16, 4096, 2048
x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)

def check(name, fn, *args, **kw):
    tpu = np.asarray(fn(*args, interpret=False, **kw))
    gold = np.asarray(fn(*args, interpret=True, **kw))
    err = np.abs(tpu - gold).max() / max(np.abs(gold).max(), 1e-9)
    print(f"{name:28s} rel err {err:.2e}", flush=True)
    assert err < 2e-2, name

w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
s1 = jnp.asarray(rng.random((1, N)) * 0.01 + 1e-3, jnp.float32)
s128 = jnp.asarray(rng.random((K // 128, N)) * 0.01 + 1e-3, jnp.float32)
check("int8 per-channel", woq_matmul, x, w8, s1, -1)
check("int8 g=128", woq_matmul, x, w8, s128, 128)

p4 = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
s4g = jnp.asarray(rng.random((K // 128, N)) * 0.01 + 1e-3, jnp.float32)
check("int4 g=128", woq_matmul, x, p4, s4g, 128, int4=True)
check("int4 per-channel", woq_matmul, x, p4, s1, -1, int4=True)

z = jnp.asarray(rng.random((K // 128, N)) * 15, jnp.float32)
check("int4z g=128", woq4z_matmul, x, p4, s4g, z, 128)

# odd half-group count: K=1536*2? use K2=2048, g=128 -> ng=16, ngh=8 (fine);
# fallback path: g=256, K=2048 -> ng=8, ngh=4 -> bkh=Kh, gpt=4 full-dim
K2 = 2048
x2 = jnp.asarray(rng.standard_normal((M, K2)) * 0.05, jnp.bfloat16)
p42 = jnp.asarray(rng.integers(0, 256, (K2 // 2, N)), jnp.uint8)
s42 = jnp.asarray(rng.random((K2 // 256, N)) * 0.01 + 1e-3, jnp.float32)
check("int4 g=256 (fallback tile)", woq_matmul, x2, p42, s42, 256, int4=True)
print("ALL OK", flush=True)
