#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line with the round's metric.

Round-4 design (VERDICT r3 item 1): the relay tunnel's cross-session drift is
±30%, so the canonical number must not depend on one config catching a good
window. This bench measures BOTH headline candidates in the SAME session —

- **int8-dyn**: INT8 per-channel weights × dynamic INT8 activation quant
  (int8×int8 MXU dots at 2× bf16 rate) + INT8 KV — the BENCH_r02 record
  config (997.95 driver / 1028-1031 observed band).
- **w4a8**: INT4 g128 weights × dynamic INT8 activation quant (fused Pallas
  kernel: packed nibbles unpack in VMEM, int8 MXU dots) + INT8 KV — half the
  weight bytes; won its round-3 same-session A/B (1070.9 vs 1029.3) but lost
  the round-3 driver window (931.93).

— and reports the max, naming the winner in the metric. Per-config iterations
take the best of 5 (decode is a fused on-device loop; one step ≈ 0.5 s, so
iterations are nearly free next to compile). Weights are generated ON DEVICE
(utils/checkpoint.device_dummy_params): staging 4-7 GB through the ~0.1 GB/s
relay burned 40-80 s per config in r02/r03 and exposed the run to relay load;
device-side RNG makes setup seconds and relay-independent.

Common config: OPT-6.7B, greedy, 256-in/32-out, batch 16, HBM-resident,
fused on-device decode loop. Metric: decode tokens/s.

``vs_baseline`` derivation (reference publishes no absolute LIA numbers —
BASELINE.md): the closest reference-hardware datapoint is IPEX LLaMA2-7B INT8
at batch 8 = 170.21 tok/s on a 4th-gen Xeon (reference
docs/tutorials/performance.md:41-48). Scaling by per-token weight traffic
(7.0 GB vs OPT-6.7B int8 ≈ 6.7 GB — both decode loops are
weight-bandwidth-bound) gives an equivalent reference-class estimate of
170.21 × 7.0/6.7 ≈ 177.8 tok/s; that is the denominator (kept at the INT8
traffic ratio across rounds so the trajectory stays comparable).
"""

from __future__ import annotations

import contextlib
import sys

import os as _os

# CLI entry point: opt in to the on-demand native helper build (see lia_tpu/native)
_os.environ.setdefault("LIA_NATIVE_AUTOBUILD", "1")

# persistent XLA compilation cache: repeat benchmark invocations skip the
# (remote-)compile cost. jax is pre-imported by the environment, so the env var
# is too late — set the config directly.
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import json
import time

import numpy as np

BASELINE_TOKENS_PER_S = 177.8

MODEL = "opt-6.7b"
BATCH, N_IN, N_OUT = 16, 256, 32
ITERS = 5

CANDIDATES = {
    # name -> QuantConfig kwargs
    "int8dyn+int8kv": dict(
        weight_dtype="int8", group_size=-1, kv_cache_dtype="int8",
        act_quant="dynamic",
    ),
    "w4a8+int8kv": dict(
        weight_dtype="int4", group_size=128, kv_cache_dtype="int8",
        act_quant="dynamic",
    ),
}


def measure(name: str, qkw: dict, cfg, prompts, gen) -> float:
    from lia_tpu.config import QuantConfig, RuntimeConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.utils.checkpoint import device_dummy_params

    quant = QuantConfig(**qkw)
    t0 = time.perf_counter()
    params = device_dummy_params(cfg, quant=quant)
    import jax

    jax.block_until_ready(params)
    print(f"[bench:{name}] device weight gen {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    engine = InferenceEngine(cfg, params, RuntimeConfig(quant=quant))
    engine.generate(prompts, gen, fused=True)  # warmup/compile
    best = 0.0
    for _ in range(ITERS):
        res = engine.generate(prompts, gen, fused=True)
        best = max(best, res.summary(BATCH)["decode_tokens_per_s"])
    print(f"[bench:{name}] best decode {best:.2f} tok/s", file=sys.stderr)
    # free this config's HBM before the next candidate stages its weights
    del engine, params
    return best


def main() -> None:
    from lia_tpu.config import GenerationConfig
    from lia_tpu.models.registry import get_config

    cfg = get_config(MODEL)
    gen = GenerationConfig(max_new_tokens=N_OUT)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=N_IN)) for _ in range(BATCH)]

    results: dict[str, float] = {}
    # keep stdout to exactly one JSON line: engine progress prints go to stderr
    with contextlib.redirect_stdout(sys.stderr):
        for name, qkw in CANDIDATES.items():
            results[name] = measure(name, qkw, cfg, prompts, gen)

    winner = max(results, key=results.get)
    best = results[winner]
    print(
        json.dumps(
            {
                "metric": (
                    f"decode_tokens_per_s {MODEL} {winner} b{BATCH} "
                    f"in{N_IN} out{N_OUT} (in-session max; "
                    + ", ".join(f"{k}={v:.1f}" for k, v in results.items())
                    + ")"
                ),
                "value": round(best, 2),
                "unit": "tokens/s",
                "vs_baseline": round(best / BASELINE_TOKENS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
