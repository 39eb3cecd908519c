#!/usr/bin/env python
"""Minimal repro for the `_sync_pools` workaround (engine/serving.py).

Symptom (round 2): paged serving on the 8-virtual-device XLA:CPU test backend
intermittently produced wrong tokens when the chain of jit calls
(`write_prompt_all_layers` → `decode_step_paged` → …) was dispatched without
blocking between links.

This script distills it to: a chain of donated scatter-updates over a pool,
interleaved with a *reader* computation of the previous pool value whose
result we check. Measured findings (round 3, this rig — 4 cores, 8 forced
virtual devices):

- baseline (reader + donated chain, no sync): ~10/100 iterations corrupt
- the POOL contents are NEVER corrupted — only the READER's output is
- without the reader dispatch: 0 corruptions
- without donation: still 2-4/100 → concurrent-dispatch execution race on the
  oversubscribed CPU backend, NOT use-after-donate
- block_until_ready on either the reader or the chain link: 0 corruptions
  (any serialization point suffices — what `_sync_pools` does)
- rate is host-load-dependent (drops to 0 when the machine is otherwise idle)

TPU dispatch is stream-ordered per device, so the two computations cannot
overlap there — the serving guard is CPU-only by design.

Run: python experiments/repro_sync_pools.py [iters]
Prints one JSON line; "corruptions" > 0 reproduces the bug.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import os

# match the test backend: 8 virtual devices on 4 real cores (oversubscribed)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np

L, NB, H, BS, D = 4, 64, 4, 16, 64  # ~4 MB pool, paged-serving-shaped


@jax.jit
def reader(pool, idx):
    """Something that READS the pool and takes a while (sum over a gather)."""
    return jnp.sum(pool[:, idx], axis=(1, 2, 3))


def chain_step(pool, block, val):
    return jax.lax.dynamic_update_slice(
        pool, val, (jnp.zeros((), jnp.int32), block) + (jnp.zeros((), jnp.int32),) * 3
    )


step = jax.jit(chain_step, donate_argnums=(0,))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.default_rng(0)
    corruptions = 0
    for it in range(iters):
        ref = np.zeros((L, NB, H, BS, D), np.float32)
        pool = jnp.asarray(ref)
        reads = []
        read_expect = []
        for i in range(24):
            blk = int(rng.integers(1, NB))
            val = rng.standard_normal((L, 1, H, BS, D)).astype(np.float32)
            # dispatch a reader of the CURRENT pool, then immediately donate
            # the pool to the next chain link without waiting
            idx = jnp.asarray(rng.integers(0, NB, size=8), jnp.int32)
            reads.append(reader(pool, idx))
            read_expect.append(ref[:, np.asarray(idx)].sum(axis=(1, 2, 3)))
            pool = step(pool, jnp.asarray(blk, jnp.int32), jnp.asarray(val))
            ref[:, blk] = val[:, 0]
        ok_pool = np.allclose(np.asarray(pool), ref)
        ok_reads = all(
            np.allclose(np.asarray(r), e, atol=1e-4)
            for r, e in zip(reads, read_expect)
        )
        if not (ok_pool and ok_reads):
            corruptions += 1
    print(json.dumps({
        "iters": iters, "corruptions": corruptions,
        "devices": len(jax.devices()), "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
