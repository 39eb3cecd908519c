#!/usr/bin/env python
"""Prefill MFU roofline — the first-token-latency side of the perf story.

VERDICT r3 item 5: decode is measured at 95-96% of its bandwidth floor, but
prefill had no MFU number. This times the resident prefill jit (the exact
program engine.generate dispatches) and reports achieved TFLOP/s vs the
v5e MXU peak (197 TFLOP/s bf16), with the FLOP count itemized.

FLOP accounting (per prompt token, matmuls only — elementwise is noise):
  - projections + MLP: 2 * (4*d^2 + 2*d*ffn) per layer
  - attention scores/values: 2 * 2 * S_kv * d per layer, where S_kv is the
    average attended length; the flash kernel skips fully-masked blocks, so
    causal S_kv ~= S/2 (we report BOTH the causal-effective MFU and the
    dense-equivalent number some papers quote)
  - lm_head runs on the LAST token only here (engine slices before the head)
    -> 2 * d * V for B tokens total, negligible, included.

Reference anchor: first-token latency is a first-class metric in every
reference sweep (examples/.../single_instance/run_generation.py:337-354).

    timeout 1800 python experiments/bench_prefill_mfu.py
"""

import json
import os
import sys
import time
from functools import partial

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lia_tpu.config import QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine, pack_prompts
from lia_tpu.models import transformer as T
from lia_tpu.models.registry import get_config
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.utils.checkpoint import device_dummy_params
from lia_tpu.utils.device_caps import detect

B = int(os.environ.get("B", "16"))
S = int(os.environ.get("S", "512"))
ITERS = int(os.environ.get("ITERS", "5"))

# (model, quant kwargs or None) — bf16 at 6.7B (13.4 GB weights) does not fit
# a 16 GB v5e next to b16/s512 KV + activations; the bf16 datapoint uses 2.7B.
CONFIGS = [
    # int8 KV on the 6.7B rows: bf16 KV at b16/s512 is 4.8 GB — with 7.1 GB
    # int8 weights the two live caches of the timing loop OOM a 16 GB v5e
    # (and int8+int8kv IS the headline bench config)
    ("opt-6.7b", dict(weight_dtype="int8", group_size=-1, act_quant="dynamic",
                      kv_cache_dtype="int8")),
    ("opt-6.7b", dict(weight_dtype="int8", group_size=-1, kv_cache_dtype="int8")),
    ("opt-2.7b", None),
]


def prefill_flops(cfg, b: int, s: int) -> dict:
    d, ffn, L, V = cfg.hidden_size, cfg.ffn_size, cfg.num_layers, cfg.vocab_size
    proj = 2 * (4 * d * d + 2 * d * ffn) * L * b * s
    attn_causal = 2 * 2 * d * (s / 2) * L * b * s  # flash skips masked blocks
    attn_dense = 2 * 2 * d * s * L * b * s
    head = 2 * d * V * b  # last token only
    return {
        "causal": proj + attn_causal + head,
        "dense": proj + attn_dense + head,
        "proj_share": proj / (proj + attn_causal + head),
    }


def run(model: str, qkw) -> dict:
    cfg = get_config(model)
    quant = QuantConfig(**qkw) if qkw else QuantConfig()
    params = device_dummy_params(cfg, quant=quant if qkw else None)
    jax.block_until_ready(params)
    eng = InferenceEngine(cfg, params, RuntimeConfig(quant=quant))
    prompts = [list(np.random.default_rng(i).integers(10, 30000, size=S))
               for i in range(B)]
    tokens, mask = pack_prompts(prompts, 1, bucket=S)
    max_len = S + 64

    def fresh_cache():
        return eng._shard_cache(kvc.init_cache(
            cfg, B, max_len, jnp.dtype(cfg.dtype),
            quantized=quant.kv_cache_dtype == "int8",
        ))

    fn = eng._get_prefill()
    tok_d, mask_d = jnp.asarray(tokens), jnp.asarray(mask)

    def sync(x):
        # this rig's relay acks dispatch before execution and its
        # block_until_ready does NOT wait — only a D2H readback truly
        # synchronizes (r4b run showed 0.13 "ms" b16/s512 prefills otherwise)
        return np.asarray(x[:1, :8])

    logits, cache = fn(eng.params, tok_d, mask_d, fresh_cache())  # compile
    sync(logits)
    del cache  # free the KV slab before the next fresh_cache allocates
    best = float("inf")
    for _ in range(ITERS):
        c = fresh_cache()
        sync(c.mask)
        t0 = time.perf_counter()
        logits, c2 = fn(eng.params, tok_d, mask_d, c)
        sync(logits)
        best = min(best, time.perf_counter() - t0)
        del c, c2
    fl = prefill_flops(cfg, B, S)
    caps = detect()
    peak = caps.bf16_flops if caps else 197e12
    del eng, params
    return {
        "model": model,
        "quant": (qkw["weight_dtype"] + ("+dynact" if qkw.get("act_quant") else "")
                  + ("+int8kv" if qkw.get("kv_cache_dtype") == "int8" else ""))
                 if qkw else "bf16",
        "b": B, "s": S,
        "prefill_ms": round(1e3 * best, 2),
        "tokens_per_s": round(B * S / best, 1),
        "tflops_causal": round(fl["causal"] / best / 1e12, 1),
        "mfu_causal_pct": round(100 * fl["causal"] / best / peak, 1),
        "mfu_dense_pct": round(100 * fl["dense"] / best / peak, 1),
        "proj_flop_share": round(fl["proj_share"], 3),
        "peak_tflops": round(peak / 1e12, 1),
        "int8_note": "int8 weights dequant to bf16 for the MXU; peak stays bf16",
    }


def main():
    for model, qkw in CONFIGS:
        print(json.dumps({"bench": "prefill_mfu", **run(model, qkw)}), flush=True)


if __name__ == "__main__":
    main()
