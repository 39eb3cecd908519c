#!/usr/bin/env python
"""Beam-search decode cost vs greedy at equal total batch (VERDICT r2 item 3).

Target: nb=4 beam step <= 1.3x greedy step at equal B*nb, plus grouped-vs-
expanded A/B showing the tail-only reorder beating the whole-cache gather.

Measures OPT-1.3B bf16, B0=4 x nb=4 beams (=16 rows) vs greedy b16, 256/32.
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

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params

MODEL = os.environ.get("MODEL", "opt-1.3b")
B0 = int(os.environ.get("B0", "4"))
NB = int(os.environ.get("NB", "4"))
N_IN = int(os.environ.get("IN", "256"))
N_OUT = int(os.environ.get("OUT", "32"))


def main():
    cfg = get_config(MODEL)
    params = init_dummy_params(cfg)
    eng = InferenceEngine(cfg, params)
    rng = np.random.default_rng(0)
    gen = GenerationConfig(max_new_tokens=N_OUT)

    # greedy control at B0*NB sequences
    prompts_full = [list(rng.integers(10, 30000, size=N_IN)) for _ in range(B0 * NB)]
    eng.generate(prompts_full, gen, fused=True)  # compile + warm
    t0 = time.perf_counter()
    res = eng.generate(prompts_full, gen, fused=True)
    greedy_step = res.summary(B0 * NB)["avg_2nd_token_latency_s"]
    print(json.dumps({"mode": "greedy", "rows": B0 * NB,
                      "ms_per_step": round(greedy_step * 1e3, 3)}), flush=True)

    prompts = prompts_full[:B0]
    for grouped in (True, False):
        bg = gen.replace(num_beams=NB)
        eng.generate_beam(prompts, bg, grouped=grouped)  # compile + warm
        t0 = time.perf_counter()
        res = eng.generate_beam(prompts, bg, grouped=grouped)
        step = res.summary(B0)["avg_2nd_token_latency_s"]
        print(json.dumps({
            "mode": "beam-grouped" if grouped else "beam-expanded-gather",
            "B0": B0, "nb": NB, "ms_per_step": round(step * 1e3, 3),
            "vs_greedy": round(step / greedy_step, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
