#!/usr/bin/env python
"""Isolated beam-shuffle A/B: whole-cache gather vs grouped tail gather.

The end-to-end tiered beam step on this rig is RELAY-dominated (seconds of
weight transfer per step), which hides the reorder term entirely — so this
measures the reorder programs themselves at OPT-6.7B cache shapes, resident
on HBM: exactly the traffic the grouped layout removes
(scheduler.reorder_state O(cache) vs reorder_state_beam O(tail)).

    timeout 900 python experiments/bench_beam_reorder.py
"""

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

from lia_tpu.models.registry import get_config
from lia_tpu.ops import kv_cache as kvc

MODEL = os.environ.get("MODEL", "opt-6.7b")
B0 = int(os.environ.get("B0", "2"))      # prompt groups
NB = int(os.environ.get("NB", "4"))      # beams
# S=1024 keeps whole-gather peak (input+output live when XLA can't alias a
# donated gather) at ~8.6 GB < the 16 GB HBM; S=2048 stalled the rig (r4c).
S = int(os.environ.get("S", "1024"))     # cache slots (prompt-heavy workload)
T_MAX = int(os.environ.get("T_MAX", "32"))
ITERS = int(os.environ.get("ITERS", "8"))


def readback(cache):
    # block_until_ready does not actually wait on this rig's relay; a D2H
    # readback of one element is the only true sync. The donation chain makes
    # each iteration data-depend on the last, so one end-of-loop readback
    # bounds all ITERS executions.
    leaf = jax.tree.leaves(cache)[0]
    np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][:8]))


def timed(fn, cache, src):
    cache = fn(cache, src)  # compile; donation chains cache through the loop
    readback(cache)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        cache = fn(cache, src)
    readback(cache)
    return (time.perf_counter() - t0) / ITERS, cache


def main():
    cfg = get_config(MODEL)
    L, Nkv, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    Bnb = B0 * NB
    dt = jnp.bfloat16
    # expanded layout: full cache at B0*nb rows
    kv_shape = (L, Bnb, Nkv, S, D)
    k = jnp.zeros(kv_shape, dt)
    v = jnp.zeros(kv_shape, dt)
    mask = jnp.ones((Bnb, S), bool)
    cache = kvc.KVCache(k=k, v=v, mask=mask, length=jnp.asarray(S, jnp.int32))
    gb = 2 * np.prod(kv_shape) * 2 / 1e9
    # in-group shuffle (the shape beam_select produces)
    src = jnp.asarray(
        np.concatenate([np.random.default_rng(0).permutation(NB) + g * NB
                        for g in range(B0)]).astype(np.int32))

    whole = jax.jit(kvc.beam_reorder, donate_argnums=(0,))
    t_whole, cache = timed(whole, cache, src)

    # grouped layout: shared prompt at B0 rows + per-beam tail
    pk = jnp.zeros((L, B0, Nkv, S, D), dt)
    pv = jnp.zeros((L, B0, Nkv, S, D), dt)
    tk = jnp.zeros((L, Bnb, Nkv, T_MAX, D), dt)
    tv = jnp.zeros((L, Bnb, Nkv, T_MAX, D), dt)
    bcache = kvc.BeamKVCache(
        prompt_k=pk, prompt_v=pv, prompt_len=jnp.asarray(S, jnp.int32),
        prompt_mask=jnp.ones((B0, S), bool), tail_k=tk, tail_v=tv,
        tail_len=jnp.asarray(T_MAX // 2, jnp.int32), nb=NB,
    )
    tail_gb = 2 * np.prod(tk.shape) * 2 / 1e9
    grouped = jax.jit(kvc.beam_tail_reorder, donate_argnums=(0,))
    t_tail, bcache = timed(grouped, bcache, src)

    print(json.dumps({
        "bench": "beam_reorder", "model": MODEL, "B0": B0, "nb": NB, "S": S,
        "t_max": T_MAX,
        "cache_GB": round(gb, 2), "tail_GB": round(tail_gb, 3),
        "whole_gather_ms": round(1e3 * t_whole, 2),
        "tail_gather_ms": round(1e3 * t_tail, 3),
        "speedup": round(t_whole / t_tail, 1),
        "note": "per-step beam shuffle cost; scheduler beam pays whole on "
                "host-KV plans, tail on TPU-KV plans (round-4 change)",
    }), flush=True)


if __name__ == "__main__":
    main()
