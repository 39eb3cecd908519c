#!/usr/bin/env python
"""Same-session headline A/B: fused W4A8 Pallas kernel vs the XLA dyn path.

Cross-session absolutes on this rig drift ±30% (RESULTS r3 continuation), so
the kernel's model-level effect must be read pairwise in ONE process. Arms:

  A  production route (fused w4a8_matmul kernel, padded int4 lm_head)
  B  _w4a8_blocks forced None → XLA woq_int4_dyn path (materialized unpack)

Same weights, same prompts, same engine config (the bench.py headline:
OPT-6.7B int4 g128 + dynamic act + int8 KV, b16, 256/32, fused decode).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.ops import quant as Q
from lia_tpu.utils.checkpoint import init_dummy_params

MODEL = "opt-6.7b"
B, N_IN, N_OUT = 16, 256, 32


def measure(cfg, params, rt, gen, prompts, label):
    eng = InferenceEngine(cfg, params, rt)
    eng.generate(prompts, gen, fused=True)  # compile + warmup
    best = 0.0
    for _ in range(3):
        r = eng.generate(prompts, gen, fused=True)
        best = max(best, r.summary(B)["decode_tokens_per_s"])
    print(f"{label:44s} {best:8.1f} tok/s  ({B / best * 1e3:.2f} ms/step)", flush=True)
    del eng
    return best


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cfg = get_config(MODEL)
    qc = QuantConfig(
        weight_dtype="int4", group_size=128, kv_cache_dtype="int8", act_quant="dynamic"
    )
    rt = RuntimeConfig(quant=qc)
    gen = GenerationConfig(max_new_tokens=N_OUT)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=N_IN)) for _ in range(B)]
    t0 = time.perf_counter()
    params = init_dummy_params(cfg, quant=qc)
    print(f"weights synthesized in {time.perf_counter()-t0:.0f}s", flush=True)

    a = measure(cfg, params, rt, gen, prompts, "A fused w4a8 kernel (prod)")

    orig = Q._w4a8_blocks
    Q._w4a8_blocks = lambda *args: None
    try:
        b = measure(cfg, params, rt, gen, prompts, "B XLA woq_int4_dyn (materialized unpack)")
    finally:
        Q._w4a8_blocks = orig
    print(f"A/B speedup: {a / b:.3f}x", flush=True)


if __name__ == "__main__":
    main()
