#!/usr/bin/env python
"""TPU compile + parity check for the grouped-beam decode kernels.

Interpreter-mode tests don't catch Mosaic block-legality errors (CLAUDE.md),
so this compiles `decode_beam_attention` / `decode_beam_attention_int8` on
the real chip at a production-like shape (OPT-1.3B-ish: Nkv=32, D=64→128pad?
— use Nkv=16, D=128 MHA-legal) and compares against the jnp concat golden
computed on device.
"""

import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.ops import attention as att
from lia_tpu.ops.pallas_attention import (
    decode_beam_attention,
    decode_beam_attention_int8,
)
from lia_tpu.ops.quant import dequantize_kv, quantize_kv


def golden(q, kf, vf, kp_d, vp_d, kt_d, vt_d, pstart, plen, tlen, nb):
    B = q.shape[0]
    S_p, T_max = kp_d.shape[3], kt_d.shape[3]
    group = np.arange(B) // nb
    k_all = jnp.concatenate([jnp.take(kp_d[1], group, axis=0), kt_d[1], kf], axis=2)
    v_all = jnp.concatenate([jnp.take(vp_d[1], group, axis=0), vt_d[1], vf], axis=2)
    pos_p = np.arange(S_p)[None, :]
    pmask = (pos_p >= np.asarray(pstart)[group][:, None]) & (pos_p < plen)
    tmask = np.broadcast_to(np.arange(T_max)[None, :] < tlen, (B, T_max))
    mask = jnp.asarray(
        np.concatenate([pmask, tmask, np.ones((B, 1), bool)], axis=1)
    )[:, None, :]
    return att.attend(q, k_all, v_all, mask)


def main():
    rng = np.random.default_rng(0)
    L, B0, nb, Nkv, D = 4, 4, 4, 16, 128
    N = Nkv
    B = B0 * nb
    S_p, T_max = 384, 128
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((B, 1, N, D)), dt)
    kf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), dt)
    vf = jnp.asarray(rng.standard_normal((B, Nkv, 1, D)), dt)
    kp = jnp.asarray(rng.standard_normal((L, B0, Nkv, S_p, D)), dt)
    vp = jnp.asarray(rng.standard_normal((L, B0, Nkv, S_p, D)), dt)
    kt = jnp.asarray(rng.standard_normal((L, B, Nkv, T_max, D)), dt)
    vt = jnp.asarray(rng.standard_normal((L, B, Nkv, T_max, D)), dt)
    pstart = jnp.asarray([0, 32, 7, 100], jnp.int32)
    plen = jnp.asarray(288, jnp.int32)
    tlen = jnp.asarray(13, jnp.int32)
    layer = jnp.asarray(1, jnp.int32)

    out = decode_beam_attention(
        q, kf, vf, kp, vp, kt, vt, layer, pstart, plen, tlen, nb,
        interpret=False,
    )
    ref = golden(q.astype(jnp.float32), kf.astype(jnp.float32), vf.astype(jnp.float32),
                 kp.astype(jnp.float32), vp.astype(jnp.float32),
                 kt.astype(jnp.float32), vt.astype(jnp.float32),
                 pstart, 288, 13, nb)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(json.dumps({"kernel": "decode_beam_attention", "compiled": True,
                      "max_abs_err_vs_golden": round(err, 5)}), flush=True)
    assert err < 0.05, err

    kpq = quantize_kv(kp.astype(jnp.float32))
    vpq = quantize_kv(vp.astype(jnp.float32))
    ktq = quantize_kv(kt.astype(jnp.float32))
    vtq = quantize_kv(vt.astype(jnp.float32))
    out8 = decode_beam_attention_int8(
        q, kf, vf, kpq.q, kpq.s, vpq.q, vpq.s, ktq.q, ktq.s, vtq.q, vtq.s,
        layer, pstart, plen, tlen, nb, interpret=False,
    )
    ref8 = golden(q.astype(jnp.float32), kf.astype(jnp.float32), vf.astype(jnp.float32),
                  dequantize_kv(kpq, jnp.float32), dequantize_kv(vpq, jnp.float32),
                  dequantize_kv(ktq, jnp.float32), dequantize_kv(vtq, jnp.float32),
                  pstart, 288, 13, nb)
    err8 = float(jnp.max(jnp.abs(out8.astype(jnp.float32) - ref8)))
    print(json.dumps({"kernel": "decode_beam_attention_int8", "compiled": True,
                      "max_abs_err_vs_golden": round(err8, 5)}), flush=True)
    assert err8 < 0.05, err8
    print(json.dumps({"beam_kernels_tpu": "PASS"}))


if __name__ == "__main__":
    main()
