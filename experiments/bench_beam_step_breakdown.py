#!/usr/bin/env python
"""Beam step cost decomposition on-chip: where do the extra ms vs greedy go?

Times (opt-1.3b bf16, B0=4 nb=4 = 16 rows, prompt 256, tail per current
bucketing): (a) greedy decode_step, (b) beam_decode_step (model fwd over the
grouped cache incl. tail commit), (c) tail gather, (d) beam_select, (e) full
beam_step. All inside one jitted scan each (relay-safe timing).
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import GenerationConfig
from lia_tpu.engine import beam as beam_mod
from lia_tpu.models import transformer as T
from lia_tpu.models.registry import get_config
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.utils.checkpoint import init_dummy_params

B0, NB, N_IN, N_OUT = 4, 4, 256, 32
STEPS = 30


def time_scan(name, step_fn, carry0):
    @jax.jit
    def loop(c):
        def body(carry, _):
            return step_fn(carry), ()

        final, _ = jax.lax.scan(body, c, None, length=STEPS)
        return final

    jax.block_until_ready(loop(carry0))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(json.dumps({"op": name, "ms": round(best * 1e3, 3)}), flush=True)
    return best


def main():
    cfg = get_config("opt-1.3b")
    from lia_tpu.ops.fuse import fuse_projections

    params = jax.device_put(fuse_projections(cfg, init_dummy_params(cfg)))
    B = B0 * NB
    gen = GenerationConfig(max_new_tokens=N_OUT)
    rng = np.random.default_rng(0)
    tok0 = jnp.asarray(rng.integers(10, 30000, B), jnp.int32)
    pos0 = jnp.full((B,), N_IN, jnp.int32)

    # greedy cache at 16 rows
    gcache = kvc.init_cache(cfg, B, 384, jnp.bfloat16)
    gcache = gcache._replace(
        length=jnp.asarray(N_IN, jnp.int32),
        mask=jnp.ones((B, 384), bool).at[:, N_IN:].set(False),
    )

    def greedy_step(carry):
        tok, pos, cache = carry
        logits, cache = T.decode_step(cfg, params, tok[:, None], pos[:, None], cache)
        return jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, cache

    time_scan("greedy decode_step+argmax", greedy_step, (tok0, pos0, gcache))

    # grouped beam cache: prompt at B0 rows, tail at B rows
    pcache = kvc.init_cache(cfg, B0, 256, jnp.bfloat16)
    pcache = pcache._replace(
        length=jnp.asarray(N_IN, jnp.int32),
        mask=jnp.ones((B0, 256), bool),
    )
    bcache = kvc.beam_cache_from_prefill(pcache, NB, N_OUT)
    T_max = bcache.tail_k.shape[3]
    print(json.dumps({"tail_slots": int(T_max)}), flush=True)
    scores0, fin0 = beam_mod.init_beam_state(B0, NB)

    def fwd_only(carry):
        tok, pos, cache = carry
        logits, cache = T.beam_decode_step(cfg, params, tok[:, None], pos[:, None], cache)
        # reset tail_len so the scan carry shape/cost stays step-invariant
        cache = cache._replace(tail_len=jnp.minimum(cache.tail_len, N_OUT - 1))
        return jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, cache

    time_scan("beam fwd (beam_decode_step)+argmax", fwd_only, (tok0, pos0, bcache))

    def gather_only(carry):
        cache, i = carry
        src = (jnp.arange(B, dtype=jnp.int32) + i) % B
        src = (src // NB == jnp.arange(B, dtype=jnp.int32) // NB) * src + (
            1 - (src // NB == jnp.arange(B, dtype=jnp.int32) // NB)
        ) * jnp.arange(B, dtype=jnp.int32)
        return kvc.beam_tail_reorder(cache, src), i + 1

    time_scan("tail gather (beam_tail_reorder)", gather_only, (bcache, jnp.int32(0)))

    def select_only(carry):
        logits, scores, fin = carry
        tok, sc, f, src = beam_mod.beam_select(gen, cfg.vocab_size, logits, scores, fin)
        return logits + sc.sum() * 1e-20, sc, f

    lg0 = jnp.asarray(rng.standard_normal((B, cfg.vocab_size)), jnp.float32)
    time_scan("beam_select", select_only, (lg0, scores0, fin0))

    def full_step(carry):
        tok, pos, cache, scores, fin = carry
        tok, cache, scores, fin, src, _ = beam_mod.beam_step(
            cfg, gen, params, tok, pos, cache, scores, fin
        )
        cache = cache._replace(tail_len=jnp.minimum(cache.tail_len, N_OUT - 1))
        return tok, pos + 1, cache, scores, fin

    time_scan("full beam_step", full_step, (tok0, pos0, bcache, scores0, fin0))


if __name__ == "__main__":
    main()
