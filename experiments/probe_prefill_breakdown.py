#!/usr/bin/env python
"""Decompose the bf16 prefill MFU gap (47% at opt-2.7b b16/s512 — r4 MFU bench).

Times, on the real chip, at identical shapes:
  1. the 6 projection/MLP matmuls of one layer, alone in a jit
  2. the flash-attention kernel alone
  3. one full decoder layer (as prefill runs it)
  4. a bare [B*S, d] x [d, d] matmul at several layouts (MXU sanity)

Sync is a small D2H readback (block_until_ready does not wait on this relay).

    timeout 900 python experiments/probe_prefill_breakdown.py
"""

import json
import os
import sys
import time
from functools import partial

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lia_tpu.models.registry import get_config

B = int(os.environ.get("B", "16"))
S = int(os.environ.get("S", "512"))
MODEL = os.environ.get("MODEL", "opt-2.7b")
ITERS = 10
PEAK = 197e12


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x[..., :1])[:8]))


REPS = int(os.environ.get("REPS", "20"))


def timed(step, *args):
    """Time REPS applications of ``step`` inside ONE dispatch (lax.scan) —
    the relay adds ~5 ms of fixed cost per dispatch, which swamps single-call
    probes (first version of this script measured a bare matmul at 10% MFU
    and its 4×-FLOPs sibling at 38% purely from that floor)."""

    f = jax.jit(lambda x0, *rest: jax.lax.scan(
        lambda c, _: (step(c, *rest), None), x0, None, length=REPS)[0])
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / REPS


def main():
    cfg = get_config(MODEL)
    d, ffn, H, Dh = cfg.hidden_size, cfg.ffn_size, cfg.num_heads, cfg.head_dim
    M = B * S
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, d), jnp.bfloat16)

    # 4. bare matmul sanity at the projection shape
    w = jax.random.normal(key, (d, d), jnp.bfloat16)
    t = timed(lambda x, w: (x @ w).astype(jnp.bfloat16), x, w)
    fl = 2 * M * d * d
    print(json.dumps({"probe": "bare_matmul_dxd", "ms": round(1e3 * t, 3),
                      "mfu_pct": round(100 * fl / t / PEAK, 1)}), flush=True)

    w4 = jax.random.normal(key, (d, 4 * d), jnp.bfloat16)
    w4b = jax.random.normal(key, (4 * d, d), jnp.bfloat16)
    t = timed(lambda x, a, b: ((x @ a) @ b).astype(jnp.bfloat16), x, w4, w4b)
    fl = 2 * 2 * M * d * 4 * d
    print(json.dumps({"probe": "matmul_dx4d_4dxd", "ms": round(1e3 * t, 3),
                      "mfu_pct": round(100 * fl / t / PEAK, 1)}), flush=True)

    # 1. the layer's 6 matmuls chained (qkv fused would be 4)
    wq = jax.random.normal(key, (d, d), jnp.bfloat16)
    wk = jax.random.normal(key, (d, d), jnp.bfloat16)
    wv = jax.random.normal(key, (d, d), jnp.bfloat16)
    wo = jax.random.normal(key, (d, d), jnp.bfloat16)
    w1 = jax.random.normal(key, (d, ffn), jnp.bfloat16)
    w2 = jax.random.normal(key, (ffn, d), jnp.bfloat16)

    def projs(x, wq, wk, wv, wo, w1, w2):
        q, k, v = x @ wq, x @ wk, x @ wv
        o = (q + k + v) @ wo  # stand-in combine to keep all deps live
        h = jax.nn.gelu(o @ w1)
        return (h @ w2).astype(jnp.bfloat16)

    t = timed(projs, x, wq, wk, wv, wo, w1, w2)
    fl = 2 * M * (4 * d * d + 2 * d * ffn)
    print(json.dumps({"probe": "six_projections", "ms": round(1e3 * t, 3),
                      "mfu_pct": round(100 * fl / t / PEAK, 1)}), flush=True)

    # 2. flash attention kernel alone (the prefill path's kernel)
    from lia_tpu.ops.pallas_attention import flash_attention_prefill

    q = jax.random.normal(key, (B, S, H, Dh), jnp.bfloat16)
    kh = jax.random.normal(key, (B, H, S, Dh), jnp.bfloat16)  # head-major
    vh = jax.random.normal(key, (B, H, S, Dh), jnp.bfloat16)
    imask = jnp.ones((B, S), jnp.bool_)

    def flash_step(q, kh, vh, imask):
        return flash_attention_prefill(q, kh, vh, imask, block_q=256, block_k=512)

    try:
        t = timed(flash_step, q, kh, vh, imask)
        fl = 2 * 2 * B * H * (S * S // 2) * Dh
        print(json.dumps({"probe": "flash_attention_causal",
                          "ms": round(1e3 * t, 3),
                          "mfu_causal_pct": round(100 * fl / t / PEAK, 1)}),
              flush=True)
    except Exception as e:  # signature drift — report rather than die
        print(json.dumps({"probe": "flash_attention_causal",
                          "error": repr(e)[:200]}), flush=True)

    # 3. one full decoder layer via the model code
    from lia_tpu.models import transformer as T
    from lia_tpu.utils.checkpoint import device_dummy_params

    cfg1 = cfg.replace(num_layers=1)
    params = device_dummy_params(cfg1)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
    mask = jnp.ones((B, S), jnp.bool_)
    xb = jax.random.normal(key, (B, S, d), jnp.bfloat16)

    from lia_tpu.ops.attention import PrefillAttn, attend_prefill, causal_mask

    full_mask = causal_mask(mask)

    def one_layer(xb, lp):
        residual = xb
        q, k, v = T.attn_in(cfg1, lp, xb, positions)
        ctx = PrefillAttn(input_mask=mask, mask=full_mask)
        attn = attend_prefill(q, k, v, ctx)
        return T.attn_post_mlp(cfg1, lp, residual, attn).astype(jnp.bfloat16)

    try:
        t = timed(one_layer, xb, lp)
        fl = 2 * M * (4 * d * d + 2 * d * ffn) + 2 * 2 * B * H * (S * S // 2) * Dh
        print(json.dumps({"probe": "full_layer", "ms": round(1e3 * t, 3),
                          "mfu_causal_pct": round(100 * fl / t / PEAK, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": "full_layer", "error": repr(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
