#!/usr/bin/env python
"""Hybrid-placement decode on REAL hardware — the round-3 gap (VERDICT item 4):
host-placement policies had no TPU-rig datapoint, so the cost model's policy-2
crossover was calibrated against zero measured hybrid points.

Runs decode with streamed layers under policy 2 (TPU linears + host attention
over host-DRAM KV — the reference's flagship offline decode,
lia/modeling_opt.py:1493-1543 + modules/attentions.py:421-424, configs
scripts/lia_offline.sh:23-25 "(0,2)") and policy 0 (TPU attention, KV streamed
from host) at high residency on OPT-1.3B, then compares each measured step
time against the cost model's per-term composition under BOTH the default and
the rig-calibrated (Microbench) profiles, and prints the auto-policy pick.

    timeout 1800 python experiments/bench_policy2_hw.py
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
from lia_tpu.runtime.cost_model import CostModel, Microbench, SystemProfile
from lia_tpu.utils.checkpoint import init_dummy_params
from lia_tpu.utils.device_caps import system_profile_defaults

MODEL = os.environ.get("MODEL", "opt-1.3b")
B = int(os.environ.get("B", "16"))
IN_LEN = int(os.environ.get("IN_LEN", "128"))
OUT_LEN = int(os.environ.get("OUT_LEN", "8"))
HBM = int(os.environ.get("HBM", "75"))


def model_step_pred(cm: CostModel, cfg, n_res: int, dec_policy: int, s_ctx: int) -> dict:
    """Compose a whole-model decode step from per-term pieces: resident prefix
    + streamed layers under the given policy + fixed (head/embed/ops) terms."""
    L = cfg.num_layers
    t_res = cm.tpu_layer_time(B, 1, s_ctx, weights_resident=True)
    fixed = cm.predict_decode_step(B, s_ctx, resident=True) - L * t_res
    t_str = {
        0: cm.policy0_decode_layer_time(B, s_ctx),
        2: cm.hybrid_decode_layer_time(B, s_ctx, weights_resident=False),
    }[dec_policy]
    return {
        "t_res_layer_ms": round(1e3 * t_res, 3),
        "t_str_layer_ms": round(1e3 * t_str, 3),
        "fixed_ms": round(1e3 * fixed, 3),
        "step_ms": round(1e3 * (n_res * t_res + (L - n_res) * t_str + fixed), 2),
    }


def run(dec_policy: int, params, cfg, prompts, gen) -> dict:
    rt = RuntimeConfig(
        hbm_percentage=HBM, prefill_policy=0, decode_policy=dec_policy,
    )
    eng = InferenceEngine(cfg, params, rt)
    eng.generate(prompts, gen)  # compile
    res = eng.generate(prompts, gen)
    s = res.latency.summary(B)
    return {
        "decode_policy": dec_policy,
        "avg_step_ms": round(1e3 * s["avg_2nd_token_latency_s"], 2),
        "p50_step_ms": round(1e3 * s["p50_2nd_token_latency_s"], 2),
        "first_token_s": round(s["first_token_latency_s"], 3),
        "decode_tokens_per_s": round(s["decode_tokens_per_s"], 1),
    }


def main():
    cfg = get_config(MODEL)
    params = init_dummy_params(cfg)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(10, 30000, size=IN_LEN)) for _ in range(B)]
    gen = GenerationConfig(max_new_tokens=OUT_LEN)
    L = cfg.num_layers
    n_res = int(L * HBM / 100)
    s_ctx = IN_LEN + OUT_LEN // 2

    profiles = {
        "default": system_profile_defaults() or SystemProfile(),
        "calibrated": Microbench.calibrate(),
    }
    for pname, prof in profiles.items():
        print(json.dumps({
            "bench": "policy2_hw", "profile": pname,
            "h2d_GBs": round(prof.h2d_bw / 1e9, 3),
            "host_gflops": round(prof.host_flops / 1e9, 1),
            "tpu_tflops": round(prof.tpu_flops / 1e12, 1),
        }), flush=True)

    for dec_policy in (0, 2):
        meas = run(dec_policy, params, cfg, prompts, gen)
        preds = {
            pname: model_step_pred(CostModel(cfg, prof), cfg, n_res, dec_policy, s_ctx)
            for pname, prof in profiles.items()
        }
        print(json.dumps({
            "bench": "policy2_hw", "model": MODEL, "b": B, "in": IN_LEN,
            "hbm_pct": HBM, "n_res": n_res, "n_str": L - n_res, **meas,
            "pred_default_ms": preds["default"]["step_ms"],
            "pred_calibrated_ms": preds["calibrated"]["step_ms"],
            "pred_terms_calibrated": preds["calibrated"],
            "ratio_meas_over_calib": round(
                meas["avg_step_ms"] / preds["calibrated"]["step_ms"], 2
            ),
        }), flush=True)

    cm = CostModel(cfg, profiles["calibrated"])
    pf, dec, pct = cm.choose(B, IN_LEN, OUT_LEN)
    print(json.dumps({
        "bench": "policy2_hw", "auto_pick": {"prefill": pf, "decode": dec, "hbm_pct": pct},
        "report": {k: (round(v, 6) if isinstance(v, float) else v)
                   for k, v in cm.report(B, IN_LEN, OUT_LEN).items()},
    }), flush=True)


if __name__ == "__main__":
    main()
