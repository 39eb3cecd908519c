#!/usr/bin/env python
"""TPU compile + parity check for the C-query paged verify kernel."""
import json, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from lia_tpu.ops import attention as att
from lia_tpu.ops.paged import PagedKVCache, gather_sequence, paged_decode_attention

rng = np.random.default_rng(0)
L, NB, Nkv, bs, D = 2, 32, 16, 16, 128
B, C, P = 4, 5, 6
q = jnp.asarray(rng.standard_normal((B, C, Nkv, D)), jnp.bfloat16)
kf = jnp.asarray(rng.standard_normal((B, Nkv, C, D)), jnp.bfloat16)
vf = jnp.asarray(rng.standard_normal((B, Nkv, C, D)), jnp.bfloat16)
kp = jnp.asarray(rng.standard_normal((L, NB, Nkv, bs, D)), jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal((L, NB, Nkv, bs, D)), jnp.bfloat16)
tbl = jnp.asarray(rng.permutation(np.arange(1, 1 + B * P)).reshape(B, P), jnp.int32)
lens = jnp.asarray([37, 0, 16, 91], jnp.int32)
layer = jnp.asarray(1, jnp.int32)

out = paged_decode_attention(q, kp, vp, layer, tbl, lens, k_fresh=kf, v_fresh=vf,
                             interpret=False)

kl, vl = kp[1], vp[1]
cache = PagedKVCache(kl, vl)
ks, vs = jax.vmap(lambda row: gather_sequence(cache, row))(tbl)
S = ks.shape[2]
pos = np.arange(S)[None, :]
page_ok = np.broadcast_to((pos < np.asarray(lens)[:, None])[:, None, :], (B, C, S))
tri = np.tril(np.ones((C, C), bool))[None]
mask = jnp.asarray(np.concatenate([page_ok, np.broadcast_to(tri, (B, C, C))], axis=2))
k_all = jnp.concatenate([ks, kf], axis=2)
v_all = jnp.concatenate([vs, vf], axis=2)
ref = att.attend(q.astype(jnp.float32), k_all.astype(jnp.float32),
                 v_all.astype(jnp.float32), mask)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
print(json.dumps({"kernel": "paged_verify_C5", "compiled": True,
                  "max_abs_err": round(err, 5)}))
assert err < 0.05, err
print(json.dumps({"paged_verify_tpu": "PASS"}))
