#!/usr/bin/env python
"""Transfer/compute overlap evidence (VERDICT weak-7): streamed decode A/B.

OPT-6.7B int8, 50% HBM-resident, policy-0 decode (weights streamed per step).
Measures decode step time with the prefetch double-buffer ON vs the
``--no-overlap`` serialization kill-switch, plus the raw transfer floor
(sum of streamed-layer device_put times with no compute), so the step time
decomposes as:

  overlap ON  ~ max(transfer, compute) + eps
  overlap OFF ~ transfer + compute

Relay caveat: host->HBM on this rig is 0.03-0.8 GB/s and varies run to run;
the A/B within one process (interleaved) controls for drift.
"""

import json
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


def main():
    import os

    model = os.environ.get("MODEL", "opt-6.7b")
    batch = int(os.environ.get("B", 16))
    n_in = int(os.environ.get("IN", 64))
    n_out = int(os.environ.get("OUT", 6))
    hbm = int(os.environ.get("HBM", 50))
    cfg = get_config(model)
    quant = QuantConfig(weight_dtype="int8", group_size=-1, kv_cache_dtype="int8",
                        act_quant="dynamic")
    gen = GenerationConfig(max_new_tokens=n_out)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=n_in)) for _ in range(batch)]
    params = init_dummy_params(cfg, quant=quant)

    modes = {"on": (True,), "off": (False,), "both": (True, False)}[
        os.environ.get("MODES", "both")
    ]
    results = {}
    for overlap in modes:
        rt = RuntimeConfig(quant=quant, hbm_percentage=hbm, prefill_policy=0,
                           decode_policy=0, overlap=overlap, num_minibatch=2)
        engine = InferenceEngine(cfg, params, rt)
        engine.generate(prompts, gen)  # compile + warm
        t0 = time.perf_counter()
        res = engine.generate(prompts, gen)
        dt = time.perf_counter() - t0
        lat = res.summary(batch)
        results["overlap_on" if overlap else "overlap_off"] = {
            "total_s": round(dt, 2),
            "first_token_s": round(lat["first_token_latency_s"], 2),
            "decode_s_per_step": round(lat["avg_2nd_token_latency_s"], 2),
        }
        print(json.dumps({("overlap" if overlap else "serial"): results[
            "overlap_on" if overlap else "overlap_off"]}), flush=True)
        if engine.scheduler is not None:
            engine.scheduler.wm.close()
        del engine

    # raw transfer floor: time the streamed layers' device_puts alone
    from lia_tpu.runtime.weight_manager import TieredWeightManager

    wm = TieredWeightManager(params["layers"], cfg.num_layers, hbm_percentage=hbm,
                             overlap=False)
    n_res = wm.n_resident
    t0 = time.perf_counter()
    for i in range(n_res, cfg.num_layers):
        jax.block_until_ready(wm.get_layer(i))
    tr = time.perf_counter() - t0
    print(json.dumps({"raw_streamed_transfer_s_per_pass": round(tr, 2),
                      "streamed_layers": cfg.num_layers - n_res}), flush=True)


if __name__ == "__main__":
    main()
