#!/usr/bin/env python
"""Grouped vs whole-cache-gather beam search UNDER TIERING — step-time A/B.

VERDICT r3 item 8: the scheduler's beam path paid a whole-cache gather per
step (scheduler.reorder_state); the grouped BeamKVCache (shared prompt +
per-beam tail) now extends to both cache segments. This measures the per-step
win at 50% residency on the real chip.

Reference intent anchor: the beam_idx indirection that never copies the cache
(intel_extension_for_pytorch/transformers/generation/greedy_search.py:237-282,
csrc/cpu/aten/kernels/MaskedMultiHeadAttentionKrnl.cpp).

    timeout 1800 python experiments/bench_beam_tiered.py
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

from lia_tpu.config import GenerationConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params

MODEL = os.environ.get("MODEL", "opt-1.3b")
B = int(os.environ.get("B", "2"))            # prompt groups
NB = int(os.environ.get("NB", "4"))          # beams per group
IN_LEN = int(os.environ.get("IN_LEN", "128"))
OUT_LEN = int(os.environ.get("OUT_LEN", "16"))
HBM = int(os.environ.get("HBM", "50"))       # % resident


def run(grouped: bool, eng, prompts, gen) -> dict:
    # warmup/compile pass
    eng.generate_beam(prompts, gen, grouped=grouped)
    t0 = time.perf_counter()
    res = eng.generate_beam(prompts, gen, grouped=grouped)
    wall = time.perf_counter() - t0
    # wall-clock only: the scheduled beam loop's per-step lat entries rely on
    # block_until_ready, which does NOT wait on this rig's relay (CLAUDE.md);
    # generate_beam's final np.asarray(history) is a true sync, so wall is
    # trustworthy. Prefill is common to both modes — the A/B ratio stands.
    return {
        "grouped": grouped,
        "wall_s": round(wall, 3),
        "wall_per_step_ms": round(1e3 * wall / gen.max_new_tokens, 1),
        "best_tokens": [int(t) for t in res.sequences[0][:4]],
    }


def main():
    cfg = get_config(MODEL)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=IN_LEN)) for _ in range(B)]
    gen = GenerationConfig(max_new_tokens=OUT_LEN, num_beams=NB)
    rt = RuntimeConfig(hbm_percentage=HBM, stream_weights=True)
    # host-side synthesis (native OpenMP helper): the scheduler needs the
    # layer tree on HOST DRAM for tiering — device generation would only be
    # pulled straight back through the relay
    params = init_dummy_params(cfg)
    eng = InferenceEngine(cfg, params, rt)
    for grouped in (False, True):
        r = run(grouped, eng, prompts, gen)
        print(json.dumps({
            "bench": "beam_tiered", "model": MODEL, "hbm_pct": HBM,
            "B": B, "nb": NB, "in": IN_LEN, "out": OUT_LEN, **r,
        }), flush=True)


if __name__ == "__main__":
    main()
