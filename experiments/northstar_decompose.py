#!/usr/bin/env python
"""North-star decomposition: measured terms for OPT-30B int8 b64 @30% resident.

The streamed end-to-end number depends on host->HBM bandwidth, which on this
rig is relay-bound (0.03-1 GB/s vs tens of GB/s on a real TPU-VM). VERDICT r2
asked for the decomposed terms instead, each directly measured:

  C_layer  — per-layer decode compute at b64 (resident, int8 weights, int8 KV),
             from the L=4 vs L=8 step-time slope of a truncated OPT-30B
  C_fixed  — non-layer step cost (embed + lm_head + sampling), the intercept
  T_layer  — per-layer packed-weight transfer time at measured relay bw, and
             the byte count to rescale at deployment PCIe bandwidth
  model    — step = C_fixed + n_res*C_layer + max(T_stream, C_stream) where
             T_stream = n_str*T_layer, C_stream = n_str*C_layer (overlap ON;
             validated by bench_overlap_ab.py's ON ~ max / OFF ~ sum A/B)

Prints one JSON line per term + the modeled tokens/s at the measured relay bw
and at several deployment bandwidths.
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

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params

B = int(os.environ.get("B", "64"))
N_IN = int(os.environ.get("IN", "32"))
N_OUT = int(os.environ.get("OUT", "8"))
HBM_PCT = int(os.environ.get("HBM", "30"))


def step_time(cfg, n_layers):
    """Mean decode ms/step of a truncated-to-n_layers config, resident."""
    c = cfg.replace(num_layers=n_layers)
    quant = QuantConfig(weight_dtype="int8", group_size=-1, kv_cache_dtype="int8")
    params = init_dummy_params(c, quant=quant)
    eng = InferenceEngine(c, params, RuntimeConfig(quant=quant))
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=N_IN)) for _ in range(B)]
    gen = GenerationConfig(max_new_tokens=N_OUT)
    # fused scan decode: per-step time is pure device time (the stepwise loop
    # adds ~25 ms/step of remote-tunnel dispatch, which would contaminate
    # C_fixed — a real TPU-VM has neither)
    eng.generate(prompts, gen, fused=True)  # compile + warm
    res = eng.generate(prompts, gen, fused=True)
    s = res.summary(B)
    del eng, params
    return s["avg_2nd_token_latency_s"] * 1e3


def transfer_time(cfg):
    """Per-layer packed int8 transfer: bytes + measured ms at current relay bw."""
    d = jax.devices()[0]
    h = cfg.hidden_size
    per_layer = h * (3 * h + h + 2 * cfg.ffn_size)  # qkv + out + fc1 + fc2, int8
    buf = np.ones(per_layer, np.int8)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_put(buf, d).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return per_layer, min(ts) * 1e3


def main():
    cfg = get_config("opt-30b")
    L = cfg.num_layers

    t4 = step_time(cfg, 4)
    print(json.dumps({"term": "step_ms_L4", "value": round(t4, 3)}), flush=True)
    t8 = step_time(cfg, 8)
    print(json.dumps({"term": "step_ms_L8", "value": round(t8, 3)}), flush=True)
    c_layer = (t8 - t4) / 4
    c_fixed = t4 - 4 * c_layer
    print(json.dumps({"term": "C_layer_ms", "value": round(c_layer, 4),
                      "term2": "C_fixed_ms", "value2": round(c_fixed, 3)}), flush=True)

    layer_bytes, t_layer_ms = transfer_time(cfg)
    bw = layer_bytes / (t_layer_ms / 1e3) / 1e9
    print(json.dumps({"term": "T_layer", "bytes": layer_bytes,
                      "ms_at_relay": round(t_layer_ms, 1),
                      "relay_GBps": round(bw, 3)}), flush=True)

    n_res = int(L * HBM_PCT / 100)
    n_str = L - n_res
    for name, gbps in [("relay_measured", bw), ("pcie_8GBps", 8.0),
                       ("pcie_16GBps", 16.0), ("pcie_32GBps", 32.0)]:
        t_stream = n_str * layer_bytes / (gbps * 1e9) * 1e3
        c_stream = n_str * c_layer
        step_ms = c_fixed + n_res * c_layer + max(t_stream, c_stream)
        print(json.dumps({
            "model": name, "bw_GBps": round(gbps, 3),
            "resident_ms": round(c_fixed + n_res * c_layer, 2),
            "stream_transfer_ms": round(t_stream, 2),
            "stream_compute_ms": round(c_stream, 2),
            "modeled_step_ms": round(step_ms, 2),
            "modeled_tokens_per_s": round(B / step_ms * 1e3, 1),
            "config": f"opt-30b int8 b{B} {HBM_PCT}% resident, int8 KV",
        }), flush=True)


if __name__ == "__main__":
    main()
