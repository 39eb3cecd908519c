#!/usr/bin/env python
"""Llama-3-8B ladder re-measure after the round-2 decode work.

Configs: int8 + dynamic act quant (new), int8 dequant control, int4 g128.
b8, 256-in/32-out, resident, fused decode, int8 KV for the int8 variants.
"""

import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params


def main():
    model = "llama-3-8b"
    batch, n_in, n_out = 8, 256, 32
    cfg = get_config(model)
    gen = GenerationConfig(max_new_tokens=n_out)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=n_in)) for _ in range(batch)]

    import os

    variants = [
        ("int8-dyn", QuantConfig(weight_dtype="int8", group_size=-1,
                                 kv_cache_dtype="int8", act_quant="dynamic")),
        ("int8", QuantConfig(weight_dtype="int8", group_size=-1, kv_cache_dtype="int8")),
        ("int4-g128", QuantConfig(weight_dtype="int4", group_size=128)),
        ("int4-dyn-g128", QuantConfig(weight_dtype="int4", group_size=128,
                                      kv_cache_dtype="int8", act_quant="dynamic")),
    ]
    only = os.environ.get("VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, quant in variants:
        params = init_dummy_params(cfg, quant=quant)
        engine = InferenceEngine(cfg, params, RuntimeConfig(quant=quant))
        engine.generate(prompts, gen, fused=True)
        best = 0.0
        for _ in range(3):
            res = engine.generate(prompts, gen, fused=True)
            best = max(best, res.summary(batch)["decode_tokens_per_s"])
        print(json.dumps({"variant": name, "decode_tokens_per_s": round(best, 2)}),
              flush=True)
        del engine, params


if __name__ == "__main__":
    main()
