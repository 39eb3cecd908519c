#!/usr/bin/env python
"""Where do the beam step's extra ~7.6 ms/step (vs fused greedy at equal rows)
go? Times each beam-specific op at the bench_beam shape (opt-1.3b, B0=4 nb=4,
V=50272, L=24 Nkv=32 T_max=128 D=64).
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

B0, NB, V = 4, 4, 50272
L, B, Nkv, T, D = 24, 16, 32, 128, 64
STEPS = 200


def time_fn(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            # fold a scalar of the output back into the carry: keeps the loop
            # serialized without requiring matching shapes
            bump = sum(jnp.sum(o).astype(jnp.float32) for o in jax.tree.leaves(out)) * 1e-20
            return carry + bump.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, a[0], None, length=STEPS)
        return final

    jax.block_until_ready(loop(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(json.dumps({"op": name, "ms": round(best * 1e3, 4)}), flush=True)
    return best


def topk_iterative(x, k):
    """Exact top-k via k masked argmax passes — O(k·V) reduces, no sort."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    vals, inds = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[:, None], axis=-1)[:, 0])
        inds.append(i.astype(jnp.int32))
        x = jnp.where(idx == i[:, None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(inds, -1)


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B0 * NB, V)), jnp.float32)
    flat = jnp.asarray(rng.standard_normal((B0, NB * V)), jnp.float32)

    # correctness: iterative == lax.top_k
    v1, i1 = jax.lax.top_k(flat, NB)
    v2, i2 = topk_iterative(flat, NB)
    assert np.allclose(np.asarray(v1), np.asarray(v2)), "topk values differ"

    time_fn("log_softmax [16,50272]",
            lambda x: jax.nn.log_softmax(x, axis=-1), logits)
    time_fn("lax.top_k [4,201088] k=4",
            lambda x: jax.lax.top_k(x, NB)[0], flat)
    time_fn("topk_iterative [4,201088] k=4",
            lambda x: topk_iterative(x, NB)[0], flat)
    time_fn("lax.top_k [16,50272] k=4",
            lambda x: jax.lax.top_k(x, NB)[0], logits)

    tail = jnp.asarray(rng.standard_normal((L, B, Nkv, T, D)), jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, B, B), jnp.int32)
    time_fn("tail gather KxV [24,16,32,128,64]x2 bf16",
            lambda t, s: jnp.take(t, s, axis=1), tail, src)

    # full beam_select at the bench shape
    from lia_tpu.config import GenerationConfig
    from lia_tpu.engine import beam as beam_mod

    gen = GenerationConfig(max_new_tokens=32)
    scores = jnp.zeros((B0, NB), jnp.float32)
    fin = jnp.zeros((B0, NB), bool)

    def sel(lg):
        return beam_mod.beam_select(gen, V, lg, scores, fin)

    time_fn("beam_select end-to-end", sel, logits)


if __name__ == "__main__":
    main()
