#!/usr/bin/env python
"""Accuracy runner: last-token prediction accuracy + perplexity on a token dataset.

Parity surface: the reference's lm-eval-harness wrapper
(examples/.../single_instance/run_accuracy.py:78-80,543-575 — a BaseLM adapter whose
core is ``loglikelihood`` over (context, continuation) pairs, evaluated on lambada).
This runner consumes a local JSONL of token-id records::

    {"context": [1, 523, 88, ...], "continuation": [42]}

and reports continuation accuracy (greedy-argmax exact match — the lambada metric)
plus total log-likelihood / perplexity. Zero-egress environments generate a
self-consistency probe set with --self-test (model's own greedy continuations must
score as the argmax — a structural correctness gate, not a quality metric).
"""

from __future__ import annotations

import argparse
import json
import os as _os

# CLI entry point: opt in to the on-demand native helper build (see lia_tpu/native)
_os.environ.setdefault("LIA_NATIVE_AUTOBUILD", "1")

import numpy as np

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params, load_hf_checkpoint


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="LIA-TPU accuracy runner", allow_abbrev=False)
    p.add_argument("-m", "--model", default="opt-125m")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dummy-weights", action="store_true")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--dataset", default=None, help="JSONL of {context, continuation} token ids")
    p.add_argument("--self-test", action="store_true", help="synthesize a probe set from the model")
    p.add_argument("--limit", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--weight-dtype", default="none",
                   choices=["none", "int8", "int4", "static-int8"])
    p.add_argument("--group-size", type=int, default=-1)
    p.add_argument("--act-quant", default="none", choices=["none", "dynamic"])
    p.add_argument("--kv-cache-dtype", default="none", choices=["none", "int8"])
    p.add_argument("--gptq", action="store_true",
                   help="GPTQ-quantize at load (Hessian-guided; needs fp weights)")
    p.add_argument("--lm-eval", action="store_true",
                   help="run lm-eval-harness tasks (requires lm_eval + --tokenizer)")
    p.add_argument("--tasks", default="lambada_openai",
                   help="comma-separated lm-eval task names")
    p.add_argument("--tokenizer", default=None, help="local tokenizer directory")
    args = p.parse_args(argv)

    cfg = get_config(args.model).replace(dtype=args.dtype)
    quant = QuantConfig(
        weight_dtype=args.weight_dtype,
        group_size=args.group_size,
        kv_cache_dtype=args.kv_cache_dtype,
        act_quant=args.act_quant,
    )

    def _calib():
        rng = np.random.default_rng(0)
        return [list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=64))
                for _ in range(4)]

    def _quantize_fp(params):
        if args.weight_dtype == "static-int8":
            from lia_tpu.ops.smoothquant import static_int8_quantize

            return static_int8_quantize(cfg, params, _calib())[0]
        if args.gptq:
            from lia_tpu.ops.gptq import gptq_quantize_params
            from lia_tpu.ops.quant import retag_dynamic_act

            bits = 8 if args.weight_dtype == "int8" else 4
            g = args.group_size if args.group_size > 0 else 128
            p2 = gptq_quantize_params(cfg, params, _calib(), bits=bits, group_size=g)
            if args.act_quant == "dynamic" and bits == 4:
                p2 = retag_dynamic_act(p2)  # GPTQ quality on the W4A8 fast path
            return p2
        if quant.enabled:
            from lia_tpu.ops.quant import quantize_params

            return quantize_params(cfg, params, quant)
        return params

    needs_fp = args.gptq or args.weight_dtype == "static-int8"
    if cfg.encoder_decoder:
        # T5 path (reference run_accuracy.py covers t5 with the same
        # loglikelihood semantics — Seq2SeqEngine.score)
        if needs_fp:
            p.error("gptq/static-int8 are decoder-only flows; t5 supports WOQ int8/int4")
        from lia_tpu.engine.seq2seq import Seq2SeqEngine

        base = load_hf_checkpoint(cfg, args.checkpoint) if args.checkpoint else init_dummy_params(cfg)
        if quant.enabled:
            from lia_tpu.ops.quant import quantize_params

            base = quantize_params(cfg, base, quant)
        engine = Seq2SeqEngine(cfg, base)
        if args.lm_eval:
            p.error("--lm-eval drives the decoder-only adapter; use --dataset/--self-test for t5")
    else:
        if args.checkpoint:
            params = _quantize_fp(load_hf_checkpoint(cfg, args.checkpoint))
        elif needs_fp:
            params = _quantize_fp(init_dummy_params(cfg))
        else:
            params = init_dummy_params(cfg, quant=quant if quant.enabled else None)
        engine = InferenceEngine(cfg, params, RuntimeConfig(quant=quant))

    if args.lm_eval:
        # lambada-parity gate via the harness (reference run_accuracy.py:543-575)
        if not args.tokenizer:
            p.error("--lm-eval requires --tokenizer <local dir>")
        try:
            import lm_eval
        except ImportError:
            p.error("lm_eval is not installed in this environment")
        from transformers import AutoTokenizer

        from lia_tpu.utils.lm_eval_adapter import make_lm_eval_model

        tok = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)
        lm = make_lm_eval_model(engine, tok, batch_size=args.batch_size)
        results = lm_eval.simple_evaluate(
            model=lm, tasks=args.tasks.split(","), limit=args.limit or None
        )
        print(json.dumps(results.get("results", results), default=str))
        return 0

    records = []
    if args.dataset:
        with open(args.dataset) as f:
            for line in f:
                if line.strip():
                    records.append(json.loads(line))
                if len(records) >= args.limit:
                    break
    elif args.self_test:
        rng = np.random.default_rng(0)
        gen = GenerationConfig(max_new_tokens=1)
        for _ in range(args.limit // args.batch_size):
            prompts = [
                list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=32))
                for _ in range(args.batch_size)
            ]
            out = engine.generate(prompts, gen)
            for pr, tok in zip(prompts, out.sequences[:, 0]):
                records.append({"context": pr, "continuation": [int(tok)]})
    else:
        p.error("provide --dataset or --self-test")

    correct, total_ll, total_toks = 0, 0.0, 0
    for i in range(0, len(records), args.batch_size):
        chunk = records[i : i + args.batch_size]
        ctxs = [r["context"] for r in chunk]
        conts = [r["continuation"] for r in chunk]
        ll = engine.loglikelihood(ctxs, conts)
        greedy = engine.generate(ctxs, GenerationConfig(max_new_tokens=1)).sequences[:, 0]
        for r, l, g in zip(chunk, ll, greedy):
            total_ll += float(l)
            total_toks += len(r["continuation"])
            if len(r["continuation"]) == 1 and int(g) == r["continuation"][0]:
                correct += 1
    acc = correct / max(len(records), 1)
    ppl = float(np.exp(-total_ll / max(total_toks, 1)))
    print(json.dumps({"n": len(records), "accuracy": acc, "loglikelihood": total_ll, "ppl": ppl}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
