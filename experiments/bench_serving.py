#!/usr/bin/env python
"""Serving throughput benchmark: continuous batching on the real chip.

Measures aggregate decode tokens/s and per-request latency for a Poisson-less
closed-loop workload (all requests submitted up front — the offline-serving
bound) on OPT-1.3B bf16, slot-based and paged KV. Run via
experiments/run_tpu_queue.sh or standalone:

    timeout 1800 python experiments/bench_serving.py
"""

import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.serving import ContinuousBatcher
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params

MODEL = os.environ.get("MODEL", "opt-1.3b")
N_REQ = int(os.environ.get("N_REQ", "32"))
MAX_BATCH = int(os.environ.get("MAX_BATCH", "8"))
IN_LEN = int(os.environ.get("IN_LEN", "128"))
OUT_LEN = int(os.environ.get("OUT_LEN", "64"))


def run_once(paged: bool) -> dict:
    cfg = get_config(MODEL)
    params = init_dummy_params(cfg)
    gen = GenerationConfig(max_new_tokens=OUT_LEN)
    eng = ContinuousBatcher(
        cfg, params, max_batch=MAX_BATCH, max_len=IN_LEN + OUT_LEN + 16,
        gen=gen, paged=paged,
    )
    rng = np.random.default_rng(0)
    lens = rng.integers(IN_LEN // 2, IN_LEN, size=N_REQ)
    t_submit = time.perf_counter()
    for n in lens:
        eng.submit(list(rng.integers(10, 30000, size=int(n))))
    done = eng.run()
    wall = time.perf_counter() - t_submit
    total_tokens = sum(len(r.output) for r in done)
    return {
        "paged": paged,
        "requests": len(done),
        "wall_s": round(wall, 3),
        "tokens": total_tokens,
        "tokens_per_s": round(total_tokens / wall, 2),
    }


def main():
    for paged in (False, True):
        t0 = time.perf_counter()
        res = run_once(paged)
        res["incl_compile_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"bench": "serving", "model": MODEL, **res}), flush=True)


if __name__ == "__main__":
    main()
