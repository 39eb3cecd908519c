#!/usr/bin/env python
"""Speculation × tiering on hardware: verify passes amortize weight streaming.

Plain streamed decode transfers every streamed layer's weights once per TOKEN;
scheduler.verify_pass transfers them once per k+1 CANDIDATES. On a config
whose decode is transfer-dominated, ms per generated token should drop by
roughly the acceptance factor. Control and speculative runs share one session
(relay drift ±30% across sessions).

    timeout 1800 python experiments/bench_spec_tiered.py
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import GenerationConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params

MODEL = os.environ.get("MODEL", "opt-1.3b")
B = int(os.environ.get("B", "8"))
IN_LEN = int(os.environ.get("IN_LEN", "64"))
OUT_LEN = int(os.environ.get("OUT_LEN", "16"))
HBM = int(os.environ.get("HBM", "50"))
K = int(os.environ.get("K", "4"))


def main():
    cfg = get_config(MODEL)
    params = init_dummy_params(cfg)
    rng = np.random.default_rng(0)
    unit = list(rng.integers(10, 30000, size=max(IN_LEN // 4, 4)))
    prompts = [(unit * 8)[:IN_LEN] for _ in range(B)]
    gen = GenerationConfig(max_new_tokens=OUT_LEN)
    rt = RuntimeConfig(hbm_percentage=HBM, stream_weights=True)
    eng = InferenceEngine(cfg, params, rt)

    eng.generate(prompts, gen)  # compile + warm streams
    t0 = time.perf_counter()
    res = eng.generate(prompts, gen)
    plain_s = time.perf_counter() - t0
    step_ms = 1e3 * res.latency.summary(B)["avg_2nd_token_latency_s"]

    eng.generate_speculative(prompts, gen.replace(max_new_tokens=2), ngram=3, k=K)
    t0 = time.perf_counter()
    seqs, steps = eng.generate_speculative(prompts, gen, ngram=3, k=K)
    spec_s = time.perf_counter() - t0

    ref = res.sequences
    match = bool(np.array_equal(np.asarray(seqs), np.asarray(ref)))
    print(json.dumps({
        "bench": "spec_tiered", "model": MODEL, "b": B, "in": IN_LEN,
        "out": OUT_LEN, "hbm_pct": HBM, "k": K,
        "plain_wall_s": round(plain_s, 2),
        "plain_step_ms": round(step_ms, 1),
        "spec_wall_s": round(spec_s, 2),
        "verify_steps": steps,
        "tokens_per_verify": round(OUT_LEN / steps, 2),
        "speedup": round(plain_s / spec_s, 2),
        "tokens_match_plain_greedy": match,
    }), flush=True)


if __name__ == "__main__":
    main()
