#!/usr/bin/env python
"""Quantization-accuracy ladder: every weight format on the SAME probe set.

The BASELINE accuracy gate (reference run_accuracy.py:543-575, lambada parity)
needs a dataset + checkpoint this zero-egress rig doesn't have; this is the
recordable stand-in VERDICT r2 asked for: quantize ONE set of fp weights into
every supported format and score ONE probe set (fp greedy 8-token
continuations of fixed random prompts) under each, reporting per-token
loglikelihood / ppl / greedy-token agreement vs the fp reference. Any format
whose ppl or agreement falls visibly off its bit-width peers has a real
fidelity problem — the deltas, not the absolute ppl, are the signal (weights
are synthesized; absolute ppl of random-weight models is meaningless).

Runs on the CPU backend by default (opt-125m, ~5 min); MODEL/LIMIT env vars
scale it up for the TPU queue.
"""

import json
import os
import sys

import jax

if os.environ.get("LADDER_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params

MODEL = os.environ.get("MODEL", "opt-125m")
N_REC = int(os.environ.get("LIMIT", "48"))
BATCH = int(os.environ.get("BATCH", "8"))
CONT = int(os.environ.get("CONT", "8"))  # continuation tokens per record


def calib(cfg, n=4):
    rng = np.random.default_rng(1)
    return [list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=64))
            for _ in range(n)]


def build_params(cfg, fp_params, name):
    """Quantize the SAME fp weights into format ``name``."""
    from lia_tpu.ops.gptq import gptq_quantize_params
    from lia_tpu.ops.quant import quantize_params
    from lia_tpu.ops.smoothquant import static_int8_quantize

    if name == "fp32":
        return fp_params, QuantConfig()
    if name == "static-int8":
        return (
            static_int8_quantize(cfg, fp_params, calib(cfg), alpha=None)[0],
            QuantConfig(weight_dtype="static-int8"),
        )
    if name == "smoothquant-auto":
        return (
            static_int8_quantize(cfg, fp_params, calib(cfg), alpha="auto")[0],
            QuantConfig(weight_dtype="static-int8"),
        )
    if name == "gptq-int4":
        return (
            gptq_quantize_params(cfg, fp_params, calib(cfg), bits=4, group_size=128),
            QuantConfig(weight_dtype="int4", group_size=128),
        )
    if name == "gptq-w4a8":
        from lia_tpu.ops.quant import retag_dynamic_act

        return (
            retag_dynamic_act(
                gptq_quantize_params(cfg, fp_params, calib(cfg), bits=4, group_size=128)
            ),
            QuantConfig(weight_dtype="int4", group_size=128, act_quant="dynamic"),
        )
    qc = {
        "int8": QuantConfig(weight_dtype="int8", group_size=-1),
        "int8-dyn": QuantConfig(weight_dtype="int8", group_size=-1, act_quant="dynamic"),
        "int8-dyn-kv8": QuantConfig(
            weight_dtype="int8", group_size=-1, act_quant="dynamic", kv_cache_dtype="int8"
        ),
        "int4-g128": QuantConfig(weight_dtype="int4", group_size=128),
        "w4a8": QuantConfig(weight_dtype="int4", group_size=128, act_quant="dynamic"),
    }[name]
    return quantize_params(cfg, fp_params, qc), qc


def main():
    cfg = get_config(MODEL).replace(dtype="float32")
    fp_params = init_dummy_params(cfg, seed=3, scale=float(os.environ.get("SCALE", "0.08")))

    # probe set from the fp model: fixed prompts, greedy 8-token continuations
    fp_engine = InferenceEngine(cfg, fp_params)
    rng = np.random.default_rng(0)
    prompts = [
        list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=32))
        for _ in range(N_REC)
    ]
    gen = GenerationConfig(max_new_tokens=CONT)
    conts = [
        [int(t) for t in row]
        for i in range(0, N_REC, BATCH)
        for row in fp_engine.generate(prompts[i : i + BATCH], gen).sequences
    ]

    def score(engine):
        ll_total, agree, n_tok = 0.0, 0, 0
        for i in range(0, N_REC, BATCH):
            ctxs, cs = prompts[i : i + BATCH], conts[i : i + BATCH]
            ll = engine.loglikelihood(ctxs, cs)
            out = engine.generate(ctxs, gen).sequences
            for l, c, o in zip(ll, cs, out):
                ll_total += float(l)
                n_tok += len(c)
                agree += int(sum(int(a) == int(b) for a, b in zip(c, o)))
        return ll_total, float(np.exp(-ll_total / n_tok)), agree / n_tok

    ladder = [
        "fp32", "int8", "int8-dyn", "int8-dyn-kv8", "int4-g128", "w4a8",
        "static-int8", "smoothquant-auto", "gptq-int4", "gptq-w4a8",
    ]
    only = os.environ.get("ONLY")
    if only:  # e.g. ONLY=fp32,int8 — fp32 always runs first (the reference)
        keep = set(only.split(","))
        ladder = ["fp32"] + [f for f in ladder[1:] if f in keep]
    fp_ppl = None
    for name in ladder:
        params, qc = build_params(cfg, fp_params, name)
        eng = (
            fp_engine if name == "fp32"
            else InferenceEngine(cfg, params, RuntimeConfig(quant=qc))
        )
        ll, ppl, ag = score(eng)
        if fp_ppl is None:
            fp_ppl = ppl
        print(json.dumps({
            "format": name, "model": MODEL, "n": N_REC, "cont_tokens": CONT,
            "loglikelihood": round(ll, 3), "ppl": round(ppl, 4),
            "ppl_vs_fp": round(ppl / fp_ppl, 4), "greedy_agreement": round(ag, 4),
        }), flush=True)
        del eng, params


if __name__ == "__main__":
    main()
