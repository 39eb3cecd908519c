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
OUTLIERS = os.environ.get("OUTLIERS", "0") == "1"


def structure_params(cfg, params):
    """Impose published-LLM outlier structure on gaussian dummy weights
    (VERDICT r4 item 4: gaussian weights make the int4 rows uninformative —
    flat logits + outlier-free activations mean absmax quantization is
    already optimal and SmoothQuant has nothing to smooth).

    Three edits, each mapping to a documented phenomenon:

    1. **Activation outlier channels** (Dettmers LLM.int8: past ~2.7B, a
       fixed ~0.1-0.5% of hidden channels carry activations 20-100× the rest;
       SmoothQuant Fig.1 shows the same for OPT): amplify ~0.5% of the
       pre-attention/pre-MLP LayerNorm gains 8-30×, so every matmul input has
       heavy-tailed per-channel magnitudes. This is what breaks per-tensor
       static activation quant and what SmoothQuant's per-channel folding
       recovers.
    2. **Heavy-tailed per-input-channel weight ranges** (real weight rows
       vary ~lognormally): scale each K row by LogNormal(0, 0.5). Creates
       within-group variance along K, so group-absmax int4 pays a real
       rounding cost and GPTQ's activation-weighted Hessian ordering has
       signal to exploit.
    3. **Decisive logits**: scale the lm_head 3× so fp greedy gaps exceed
       quantization noise — real-model logit margins are O(nats); random
       tiny-scale models sit at ~5e-4 where any perturbation flips tokens
       and agreement measures noise, not fidelity.
    """
    rng = np.random.default_rng(7)
    H = cfg.hidden_size
    n_out = max(2, int(0.005 * H))
    gain_lo = float(os.environ.get("GAIN_LO", "8"))
    gain_hi = float(os.environ.get("GAIN_HI", "30"))
    wsig = float(os.environ.get("WSIG", "0.5"))
    head = float(os.environ.get("HEAD_SCALE", "3"))

    def tail_rows(w):
        # w [..., K, N]: lognormal per-input-channel range
        K = w.shape[-2]
        s = np.exp(rng.normal(0.0, wsig, size=K)).astype(np.float32)
        return (w * s[:, None]).astype(w.dtype)

    layers = params["layers"]
    # one FIXED outlier channel set (Dettmers: the outlier dims are shared
    # across layers), amplified in BOTH pre-norm gains; the CONSUMING weight
    # rows shrink by gain^-BAL — trained nets balance big activations with
    # small weights (this is precisely the difficulty SmoothQuant migrates),
    # so per-tensor act quant loses the small channels' resolution while the
    # downstream signal still needs them.
    idx = rng.choice(H, size=n_out, replace=False)
    gains = rng.uniform(gain_lo, gain_hi, size=n_out).astype(np.float32)
    bal = float(os.environ.get("BAL", "0.7"))
    for ln, consumers in (("ln1", ("attn", ("wq", "wk", "wv"))),
                          ("ln2", ("mlp", ("w1", "wg")))):
        if ln in layers and "scale" in layers[ln]:
            g = np.array(layers[ln]["scale"], np.float32)  # [L, H]
            g[:, idx] *= gains
            layers[ln]["scale"] = g.astype(np.asarray(layers[ln]["scale"]).dtype)
            grp, keys = consumers
            for k in keys:
                if k in layers.get(grp, {}):
                    w = np.array(layers[grp][k], np.float32)  # [L, H, N]
                    w[:, idx, :] *= (gains ** -bal)[None, :, None]
                    layers[grp][k] = w.astype(np.asarray(layers[grp][k]).dtype)
    if wsig > 0:
        for grp, keys in (("attn", ("wq", "wk", "wv", "wo")),
                          ("mlp", ("w1", "wg", "w2"))):
            for k in keys:
                if k in layers.get(grp, {}):
                    layers[grp][k] = np.stack(
                        [tail_rows(np.asarray(w)) for w in np.asarray(layers[grp][k])]
                    )
    # 4. **Near-identity residual branches** (GPT-2 init: residual output
    # projections scaled 1/sqrt(2L); trained nets sit in flat minima where
    # each branch perturbs the stream mildly). Unscaled random branches make
    # the net CHAOTIC — per-layer quant error amplifies exponentially with
    # depth and every format scores garbage regardless of fidelity. This is
    # the knob that turns the probe from a chaos detector into a
    # quantization-error meter.
    resid = float(os.environ.get("RESID_SCALE", "0")) or 1.0 / np.sqrt(
        2 * cfg.num_layers
    )
    for grp, k in (("attn", "wo"), ("mlp", "w2")):
        if k in layers.get(grp, {}):
            layers[grp][k] = (np.asarray(layers[grp][k]) * resid).astype(
                np.asarray(layers[grp][k]).dtype
            )
    if "lm_head" in params:
        params["lm_head"] = np.asarray(params["lm_head"]) * head
    else:  # tied embeddings: widen the head gaps via the final norm
        if "final_norm" in params and "scale" in params["final_norm"]:
            params["final_norm"]["scale"] = (
                np.asarray(params["final_norm"]["scale"]) * head
            )
    return params


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
    if OUTLIERS:
        fp_params = structure_params(cfg, fp_params)

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
            "format": name, "model": MODEL, "structured": OUTLIERS,
            "n": N_REC, "cont_tokens": CONT,
            "loglikelihood": round(ll, 3), "ppl": round(ppl, 4),
            "ppl_vs_fp": round(ppl / fp_ppl, 4), "greedy_agreement": round(ag, 4),
        }), flush=True)
        del eng, params


if __name__ == "__main__":
    main()
