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


def run_once(paged: bool, shared_prefix: int = 0, speculate: int | None = None,
             chunk: int | None = None, repetitive: bool = False,
             fused: int = 1) -> dict:
    """``shared_prefix``: first N tokens identical across requests (system
    prompt) — exercises automatic prefix caching in paged mode.
    ``speculate``: prompt-lookup speculative serving with k proposals.
    ``chunk``: chunked admission. ``repetitive``: prompts with internal
    repetition so lookup proposals land (the speculation-friendly workload).
    ``fused``: decode up to this many tokens per dispatch once the admission
    queue drains (lifts serving off the ~25 ms/dispatch tunnel floor)."""
    cfg = get_config(MODEL)
    params = init_dummy_params(cfg)
    gen = GenerationConfig(max_new_tokens=OUT_LEN)
    eng = ContinuousBatcher(
        cfg, params, max_batch=MAX_BATCH, max_len=IN_LEN + OUT_LEN + 16,
        gen=gen, paged=paged, speculate_k=speculate, prefill_chunk=chunk,
        fused_steps=fused,
    )
    rng = np.random.default_rng(0)
    prefix = list(rng.integers(10, 30000, size=shared_prefix))
    lens = rng.integers(IN_LEN // 2, IN_LEN, size=N_REQ)
    t_submit = time.perf_counter()
    for n in lens:
        m = max(int(n) - shared_prefix, 4)
        if repetitive:
            unit = list(rng.integers(10, 30000, size=max(m // 4, 4)))
            tail = (unit * 5)[:m]
        else:
            tail = list(rng.integers(10, 30000, size=m))
        eng.submit(prefix + tail)
    done = eng.run()
    wall = time.perf_counter() - t_submit
    total_tokens = sum(len(r.output) for r in done)
    ttfts = [r.ttft_s for r in done if r.ttft_s is not None]
    out = {
        "paged": paged,
        "speculate": speculate,
        "chunk": chunk,
        "shared_prefix": shared_prefix,
        "fused": fused,
        "engine_steps": eng._steps,
        "dispatches": eng._dispatches,
        "requests": len(done),
        "wall_s": round(wall, 3),
        "tokens": total_tokens,
        "tokens_per_s": round(total_tokens / wall, 2),
        "mean_ttft_s": round(float(np.mean(ttfts)), 4) if ttfts else 0.0,
    }
    if paged:
        out["prefix_hits"] = eng.prefix_hits
        out["prefix_tokens_reused"] = eng.prefix_tokens_reused
    return out


def main():
    if "--only-fused" in sys.argv:
        # fused-block A/B in one session: per-step controls + fused variants
        scenarios = [
            {"paged": False},
            {"paged": False, "fused": 8},
            {"paged": False, "fused": 16},
            {"paged": True},
            {"paged": True, "fused": 8},
        ]
        for sc in scenarios:
            t0 = time.perf_counter()
            res = run_once(**sc)
            res["incl_compile_s"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({"bench": "serving", "model": MODEL, **res}), flush=True)
        return
    scenarios = [
        {"paged": False},
        {"paged": True},
        # fused multi-token blocks: k decode steps per dispatch whenever no
        # chunked admission is mid-flight — the dispatch-floor fix (VERDICT
        # r3 item 6)
        {"paged": False, "fused": 8},
        {"paged": True, "fused": 8},
        {"paged": False, "fused": 16},
        # shared system prompt: APC reuses its pages + skips its prefill
        {"paged": False, "shared_prefix": 3 * IN_LEN // 4},
        {"paged": True, "shared_prefix": 3 * IN_LEN // 4},
        # chunked admission: long-prompt TTFT isolation
        {"paged": False, "chunk": 32},
        # speculative serving on a lookup-friendly (repetitive) workload,
        # with its non-speculative control on the same workload
        {"paged": False, "repetitive": True},
        {"paged": False, "speculate": 4, "repetitive": True},
        {"paged": True, "speculate": 4, "repetitive": True},
    ]
    for sc in scenarios:
        t0 = time.perf_counter()
        res = run_once(**sc)
        res["incl_compile_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"bench": "serving", "model": MODEL, **res}), flush=True)


if __name__ == "__main__":
    main()
