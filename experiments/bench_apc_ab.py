#!/usr/bin/env python
"""Clean same-session APC A/B (VERDICT r4 item 8).

r4's fused sweep showed paged+APC shared-prefix (18.52 tok/s) trailing plain
slab (21.96) with a bad-relay-window footnote — prefix caching's benefit was
asserted (hits, tokens reused) but never demonstrated as throughput. This is
the isolating pair: IDENTICAL paged engines, prefix_cache on vs off, plus the
slab reference, one session, prefix-heavy workload (long shared system prompt
+ short unique tails, short outputs — the workload APC exists for).

    timeout 3000 python experiments/bench_apc_ab.py
Env: MODEL (opt-1.3b), N_REQ (12), BATCH (4), PREFIX (448), TAIL (64), OUT (8)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.serving import ContinuousBatcher
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import device_dummy_params

MODEL = os.environ.get("MODEL", "opt-1.3b")
N_REQ = int(os.environ.get("N_REQ", "12"))
BATCH = int(os.environ.get("BATCH", "4"))
PREFIX = int(os.environ.get("PREFIX", "448"))
TAIL = int(os.environ.get("TAIL", "64"))
OUT = int(os.environ.get("OUT", "8"))


def run(cfg, params, prompts, gen, paged, prefix_cache=True):
    from lia_tpu.engine.engine import bucket_length

    # prompts bucket to the next power of two; size the slots to fit
    bucket = bucket_length(PREFIX + TAIL)
    cb = ContinuousBatcher(
        cfg, params, max_batch=BATCH, max_len=bucket + OUT + 64, gen=gen,
        paged=paged, prefix_cache=prefix_cache,
    )
    for p in prompts:
        cb.submit(p)
    t0 = time.perf_counter()
    done = cb.run()
    dt = time.perf_counter() - t0
    s = cb.stats()
    out = {
        "wall_s": round(dt, 2),
        "tok_per_s": round(s["tokens_per_s"], 2),
        "mean_ttft_s": round(s.get("mean_ttft_s", 0.0), 3),
        "p90_ttft_s": round(s.get("p90_ttft_s", 0.0), 3),
    }
    if paged:
        out["prefix_hits"] = int(s.get("prefix_hits", 0))
        out["prefix_tokens_reused"] = int(s.get("prefix_tokens_reused", 0))
    return out, [r.output for r in sorted(done, key=lambda r: r.req_id)]


def main():
    cfg = get_config(MODEL)
    params = device_dummy_params(cfg)
    jax.block_until_ready(params)
    gen = GenerationConfig(max_new_tokens=OUT)
    rng = np.random.default_rng(0)
    prefix = list(rng.integers(10, 30000, size=PREFIX))
    prompts = [
        prefix + list(rng.integers(10, 30000, size=TAIL)) for _ in range(N_REQ)
    ]

    rows = {}
    # order: off first so APC can't inherit a warm cache; each engine is fresh
    for name, kw in (
        ("paged-apc-off", dict(paged=True, prefix_cache=False)),
        ("paged-apc-on", dict(paged=True, prefix_cache=True)),
        ("slab", dict(paged=False)),
        # second pass inside the SAME session to separate compile effects
        ("paged-apc-off#2", dict(paged=True, prefix_cache=False)),
        ("paged-apc-on#2", dict(paged=True, prefix_cache=True)),
    ):
        res, toks = run(cfg, params, prompts, gen, **kw)
        rows[name] = (res, toks)
        print(json.dumps({"config": name, **res}), flush=True)

    on, off = rows["paged-apc-on#2"][0], rows["paged-apc-off#2"][0]
    print(json.dumps({
        "apc_speedup_tok_per_s": round(on["tok_per_s"] / off["tok_per_s"], 2),
        "apc_ttft_ratio": round(
            off["mean_ttft_s"] / max(on["mean_ttft_s"], 1e-9), 2),
        "tokens_match_on_off": rows["paged-apc-on#2"][1] == rows["paged-apc-off#2"][1],
    }), flush=True)


if __name__ == "__main__":
    main()
