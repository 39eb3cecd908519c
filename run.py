#!/usr/bin/env python
"""Benchmark / generation CLI.

Parity surface: the reference's examples/cpu/inference/python/llm/run.py (LIA flags
:196-215) + single_instance/run_generation.py (benchmark loop, warmup, latency stats
:337-354), collapsed into one process (no subprocess dispatch — the policy knobs are
plain config, not kwargs smuggled through generate()).

Examples:
  python run.py --benchmark -m opt-1.3b --dummy-weights --batch-size 8 \
      --input-tokens 256 --max-new-tokens 32
  python run.py --benchmark -m opt-30b --dummy-weights --weight-dtype int8 \
      --hbm-percentage 10 --stream-weights --batch-size 64
"""

from __future__ import annotations

import os as _os

# CLI entry point: opt in to building the native synthesis/quantization helper
# on demand (library imports never spawn a compiler — lia_tpu/native gating)
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

import argparse
import json
import time

import numpy as np

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params, load_hf_checkpoint
from lia_tpu.utils.metrics import format_summary


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LIA-TPU inference benchmark", allow_abbrev=False)
    p.add_argument("-m", "--model", default="opt-1.3b", help="model name (see registry)")
    p.add_argument("--checkpoint", default=None, help="local HF safetensors dir")
    p.add_argument("--dummy-weights", action="store_true", help="random weights (175B analog)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--input-tokens", type=int, default=32)
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--num-iter", type=int, default=3)
    p.add_argument("--num-warmup", type=int, default=1)
    p.add_argument("--greedy", action="store_true", default=True)
    p.add_argument("--sample", dest="greedy", action="store_false")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--repetition-penalty", type=float, default=1.0)
    p.add_argument("--min-new-tokens", type=int, default=0,
                   help="suppress EOS until this many tokens are generated")
    p.add_argument("--no-repeat-ngram-size", type=int, default=0)
    p.add_argument("--num-beams", type=int, default=1,
                   help="beam search width (reference run_generation.py "
                   "defaults to 4 beams in non-greedy mode)")
    p.add_argument("--length-penalty", type=float, default=0.0,
                   help="beam final-score normalization exponent (HF=1.0)")
    p.add_argument("--fused-decode", action="store_true", help="on-device lax.scan decode loop")
    p.add_argument("--token-latency", action="store_true", default=True)
    # --- LIA policy knobs (reference run.py:196-215); 'auto' = cost-model pick ---
    policy = lambda v: -1 if v == "auto" else int(v)
    p.add_argument("--prefill-policy", type=policy, default=3,
                   help="0|1|2|3|auto (LIA policy semantics)")
    p.add_argument("--decoding-policy", type=policy, default=3,
                   help="0|1|2|3|4|auto")
    p.add_argument("--hbm-percentage", type=policy, default=100,
                   help="%% of layers resident in HBM (gpu-percentage analog) or 'auto'")
    p.add_argument("--calibrate", action="store_true",
                   help="run live microbenchmarks for the auto cost model")
    p.add_argument("--num-minibatch", type=int, default=1)
    p.add_argument("--stream-weights", action="store_true",
                   help="host-resident weights streamed per layer (pin-weight/CXL analog)")
    p.add_argument("--no-overlap", action="store_true", help="serialize transfers")
    p.add_argument("--max-inflight-layers", type=int, default=2,
                   help="streamed layers whose dispatch may run ahead of "
                        "execution (bounds pinned intermediate HBM)")
    p.add_argument("--no-pallas", action="store_true", help="disable Pallas kernels")
    p.add_argument("--no-tp-pallas", action="store_true",
                   help="under --tp, fall back to jnp/GSPMD paths instead of "
                        "shard_map-wrapped Pallas kernels")
    # --- quantization (reference run.py:109-166) ---
    p.add_argument("--weight-dtype", default="none",
                   choices=["none", "int8", "int4", "nf4", "static-int8"])
    p.add_argument("--group-size", type=int, default=-1)
    p.add_argument("--kv-cache-dtype", default="none", choices=["none", "int8"])
    p.add_argument("--act-quant", default="none", choices=["none", "dynamic"],
                   help="dynamic: per-token int8 act quant -> int8 MXU dots (lowp-mode analog)")
    p.add_argument("--gptq", action="store_true",
                   help="GPTQ-quantize at load: Hessian-guided error-compensated "
                        "rounding on calibration prompts (reference "
                        "ipex.quantization.gptq + utils/run_gptq.py); bit-width "
                        "follows --weight-dtype (int4/int8)")
    p.add_argument("--gptq-actorder", action="store_true",
                   help="GPTQ act-order (desc Hessian diagonal) with static groups")
    p.add_argument("--smoothquant", default=None, metavar="ALPHA",
                   help="SmoothQuant outlier migration before WOQ: 'auto' runs "
                        "the alpha autotune (reference _autotune.py), or pass "
                        "a float alpha")
    p.add_argument("--alpha-min", type=float, default=0.3,
                   help="smoothquant autotune sweep start (reference --alpha-min)")
    p.add_argument("--alpha-max", type=float, default=0.8,
                   help="smoothquant autotune sweep end (reference --alpha-max)")
    p.add_argument("--alpha-step", type=float, default=0.1,
                   help="smoothquant autotune sweep step (reference --alpha-step)")
    p.add_argument("--calib-iters", type=int, default=4,
                   help="calibration prompts for quantization flows "
                        "(reference --calib-iters)")
    p.add_argument("--save-quantized", default=None, metavar="PATH",
                   help="persist the (quantized) param tree after load "
                        "(reference: run.py best_model.pt, :59-61,463-470)")
    p.add_argument("--quantized-checkpoint", default=None, metavar="PATH",
                   help="load a previously saved quantized checkpoint "
                        "(skips re-quantization)")
    p.add_argument("--profile", action="store_true", help="emit a jax trace to /tmp/lia_trace")
    p.add_argument("--tp", type=int, default=1, metavar="N",
                   help="tensor-parallel degree: run the engine over a (1, N) "
                        "(data, model) mesh (AutoTP analog — reference "
                        "distributed/run_generation_with_deepspeed.py); "
                        "composes with quantized weights and, for "
                        "TPU-resident-KV plans, with tiering/streaming. "
                        "N>1 routes compute through the GSPMD-partitioned jnp "
                        "paths (Pallas kernels are per-chip and not yet "
                        "shard_map-wrapped/multi-chip-validated)")
    p.add_argument("--prompt", default=None, help="text prompt (requires --tokenizer)")
    p.add_argument("--tokenizer", default=None, help="local tokenizer directory")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="prompt-lookup speculative decoding with K-token "
                        "proposals (greedy-exact; additive over the reference)")
    p.add_argument("--ngram", type=int, default=3,
                   help="n-gram width for --speculative history matching")
    p.add_argument("--draft-model", type=str, default=None,
                   help="registry name of a draft model for two-model "
                   "speculation (replaces prompt lookup; dummy weights)")
    p.add_argument("--streaming", action="store_true",
                   help="print sequence 0's tokens as they decode (stepwise "
                        "loop; TextStreamer analog)")
    p.add_argument("--output-dir", default=None, metavar="DIR",
                   help="also write the summary JSON to DIR/summary.json")
    return p


def _calib_prompts(cfg, n=4):
    import numpy as _np

    rng = _np.random.default_rng(0)
    return [list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=64))
            for _ in range(n)]


def _alpha_sweep(args):
    import numpy as _np

    return [round(float(a), 4) for a in
            _np.arange(args.alpha_min, args.alpha_max + 1e-9, args.alpha_step)]


def _smoothquant_flow(cfg, params, runtime, alpha_arg, args):
    """Calibrate on synthetic prompts, (auto)tune alpha, fold, quantize."""
    from lia_tpu.ops.smoothquant import smoothquant_quantize

    alpha = "auto" if alpha_arg == "auto" else float(alpha_arg)
    params, used = smoothquant_quantize(
        cfg, params, _calib_prompts(cfg, args.calib_iters), runtime.quant,
        alpha=alpha, alphas=_alpha_sweep(args),
    )
    print(f"[lia-tpu] smoothquant folded with alpha={used}")
    return params


def _gptq_flow(cfg, params, runtime, actorder, args):
    """Native GPTQ on fp weights (ipex.quantization.gptq analog)."""
    from lia_tpu.ops.gptq import gptq_quantize_params

    bits = 8 if runtime.quant.weight_dtype == "int8" else 4
    g = runtime.quant.group_size if runtime.quant.group_size > 0 else 128
    params = gptq_quantize_params(
        cfg, params, _calib_prompts(cfg, args.calib_iters),
        bits=bits, group_size=g, actorder=actorder,
    )
    if runtime.quant.act_quant == "dynamic" and bits == 4:
        # run GPTQ-quality int4 on the W4A8 fast path (int8×int8 MXU dots
        # with the rowsum zero-point correction)
        from lia_tpu.ops.quant import retag_dynamic_act

        params = retag_dynamic_act(params)
    print(f"[lia-tpu] gptq quantized (bits={bits}, group={g}, actorder={actorder}, "
          f"act_quant={runtime.quant.act_quant})")
    return params


def _static_int8_flow(cfg, params, alpha_arg, args):
    """W8A8: smoothquant fold + static activation calibration + int8 weights."""
    from lia_tpu.ops.smoothquant import static_int8_quantize

    alpha = 0.5 if alpha_arg is None else ("auto" if alpha_arg == "auto" else float(alpha_arg))
    params, used = static_int8_quantize(
        cfg, params, _calib_prompts(cfg, args.calib_iters), alpha=alpha
    )
    print(f"[lia-tpu] static-int8 (W8A8) calibrated; smoothquant alpha={used}")
    return params


def _bench_loop(run, args, model_name) -> int:
    """Shared warmup/iter timing + one-line JSON summary (seq2seq/VLM paths)."""
    summary = {}
    for it in range(args.num_warmup + args.num_iter):
        t0 = time.perf_counter()
        res = run()
        dt = time.perf_counter() - t0
        tag = "warmup" if it < args.num_warmup else "iter"
        print(f"[{tag} {it}] {dt:.3f}s  ({res.sequences.size / dt:.1f} tok/s)")
        if it >= args.num_warmup:
            summary = {
                "model": model_name,
                "total_latency_s": round(dt, 6),
                "total_tokens_per_s": round(res.sequences.size / dt, 2),
            }
    print(json.dumps(summary))
    return 0


def _maybe_woq(cfg, params, args):
    """Weight-only quantization for the seq2seq/VLM paths (reference
    run_quantization.py covers t5/git/llava with the same WOQ flow; language
    stacks + output head quantize, vision towers stay high-precision)."""
    if args.weight_dtype in ("int8", "int4", "nf4"):
        from lia_tpu.ops.quant import quantize_params

        qc = QuantConfig(
            weight_dtype=args.weight_dtype, group_size=args.group_size,
            act_quant=args.act_quant,
        )
        return quantize_params(cfg, params, qc)
    return params


def _run_seq2seq(cfg, args, gen) -> int:
    """T5-family path: encoder-decoder generation via Seq2SeqEngine (the
    reference routes t5 through the same run.py CLI — MODEL_CLASSES["t5"]).
    Quantization/tiering knobs are decoder-only features and are ignored."""
    from lia_tpu.engine.seq2seq import Seq2SeqEngine

    print(f"[lia-tpu] model={cfg.name} params≈{cfg.num_params/1e9:.2f}B dtype={cfg.dtype} (seq2seq)")
    t0 = time.perf_counter()
    if args.checkpoint:
        params = load_hf_checkpoint(cfg, args.checkpoint)
    else:
        params = init_dummy_params(cfg)
    params = _maybe_woq(cfg, params, args)
    print(f"[lia-tpu] weights ready in {time.perf_counter()-t0:.1f}s")
    engine = Seq2SeqEngine(cfg, params)
    rng = np.random.default_rng(0)
    prompts = [
        list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=args.input_tokens))
        for _ in range(args.batch_size)
    ]
    gen = gen.replace(eos_token_id=1, pad_token_id=cfg.pad_token_id)
    if gen.num_beams > 1:
        return _bench_loop(lambda: engine.generate_beam(prompts, gen), args, cfg.name)
    return _bench_loop(lambda: engine.generate(prompts, gen), args, cfg.name)


def _run_vlm(cfg, args, gen) -> int:
    """GIT/LLaVA path: image-conditioned generation over random pixels
    (benchmark mode; real images require a local processor — reference
    run_generation.py:47/run_quantization.py:245-271 analog)."""
    from lia_tpu.engine.vlm import GitEngine, LlavaEngine

    print(f"[lia-tpu] model={cfg.name} dtype={cfg.dtype} (vision-language)")
    t0 = time.perf_counter()
    params = load_hf_checkpoint(cfg, args.checkpoint) if args.checkpoint else init_dummy_params(cfg)
    params = _maybe_woq(cfg, params, args)
    print(f"[lia-tpu] weights ready in {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(0)
    s = cfg.vision_image_size
    pixels = rng.standard_normal((args.batch_size, 3, s, s), np.float32)
    if cfg.family == "git":
        engine = GitEngine(cfg, params)
        gen = gen.replace(eos_token_id=102, pad_token_id=0)
        run = lambda: engine.generate(pixels, gen)
    else:
        engine = LlavaEngine(cfg, params)
        gen = gen.replace(eos_token_id=2, pad_token_id=0)
        prompts = [
            [1] + [cfg.image_token_id]
            + list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=args.input_tokens))
            for _ in range(args.batch_size)
        ]
        run = lambda: engine.generate(pixels, prompts, gen)
    return _bench_loop(run, args, cfg.name)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    cfg = get_config(args.model).replace(dtype=args.dtype)
    if not args.benchmark:
        print(f"[lia-tpu] {cfg.name}: params≈{cfg.num_params/1e9:.2f}B; pass --benchmark to run")
        return 0
    runtime = RuntimeConfig(
        prefill_policy=args.prefill_policy,
        decode_policy=args.decoding_policy,
        hbm_percentage=args.hbm_percentage,
        num_minibatch=args.num_minibatch,
        stream_weights=args.stream_weights,
        overlap=not args.no_overlap,
        max_inflight_layers=args.max_inflight_layers,
        use_pallas=not args.no_pallas,
        tp_pallas=not args.no_tp_pallas,
        quant=QuantConfig(
            weight_dtype=args.weight_dtype,
            group_size=args.group_size,
            kv_cache_dtype=args.kv_cache_dtype,
            act_quant=args.act_quant,
        ),
    )
    if -1 in (args.prefill_policy, args.decoding_policy, args.hbm_percentage):
        from lia_tpu.runtime.cost_model import resolve_auto_policies

        runtime = resolve_auto_policies(
            cfg, runtime, args.batch_size, args.input_tokens, args.max_new_tokens,
            calibrate=args.calibrate,
        )
        print(
            f"[lia-tpu] auto placement: prefill={runtime.prefill_policy} "
            f"decode={runtime.decode_policy} hbm%={runtime.hbm_percentage}"
        )
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        do_sample=not args.greedy,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
        min_new_tokens=args.min_new_tokens,
        no_repeat_ngram_size=args.no_repeat_ngram_size,
        num_beams=args.num_beams,
        length_penalty=args.length_penalty,
    )

    if cfg.encoder_decoder:
        return _run_seq2seq(cfg, args, gen)
    if cfg.family in ("git", "llava"):
        return _run_vlm(cfg, args, gen)

    print(f"[lia-tpu] model={cfg.name} params≈{cfg.num_params/1e9:.2f}B dtype={cfg.dtype}")
    t0 = time.perf_counter()
    sq = args.smoothquant if runtime.quant.enabled else None
    static8 = args.weight_dtype == "static-int8"
    if args.quantized_checkpoint:
        from lia_tpu.utils.checkpoint import load_params

        params = load_params(args.quantized_checkpoint)
    elif args.checkpoint:
        params = load_hf_checkpoint(cfg, args.checkpoint)
        if static8:
            params = _static_int8_flow(cfg, params, sq, args)
        elif args.gptq:
            params = _gptq_flow(cfg, params, runtime, args.gptq_actorder, args)
        elif sq is not None:
            params = _smoothquant_flow(cfg, params, runtime, sq, args)
        elif runtime.quant.enabled:
            from lia_tpu.ops.quant import quantize_params

            params = quantize_params(cfg, params, runtime.quant)
    elif static8:
        # static-int8 calibrates activations on fp weights first
        params = _static_int8_flow(cfg, init_dummy_params(cfg), sq, args)
    elif args.gptq:
        params = _gptq_flow(cfg, init_dummy_params(cfg), runtime, args.gptq_actorder, args)
    elif sq is not None:
        # SmoothQuant needs fp weights to calibrate/fold before quantizing
        params = _smoothquant_flow(cfg, init_dummy_params(cfg), runtime, sq, args)
    else:
        # dummy weights synthesize directly in quantized form when requested
        params = init_dummy_params(cfg, quant=runtime.quant if runtime.quant.enabled else None)
    if args.save_quantized:
        from lia_tpu.utils.checkpoint import save_params

        save_params(params, args.save_quantized)
        print(f"[lia-tpu] saved quantized checkpoint → {args.save_quantized}")
    print(f"[lia-tpu] weights ready in {time.perf_counter()-t0:.1f}s")

    mesh = None
    if args.tp > 1:
        import jax as _jax

        if len(_jax.devices()) < args.tp:
            raise SystemExit(
                f"--tp {args.tp} needs {args.tp} devices, have {len(_jax.devices())}"
            )
        from lia_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((1, args.tp))
        print(f"[lia-tpu] TP mesh: 1x{args.tp} (data, model)")
    engine = InferenceEngine(cfg, params, runtime, mesh=mesh)

    tokenizer = None
    if args.prompt:
        if not args.tokenizer:
            raise SystemExit("--prompt requires --tokenizer <local dir>")
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)
        ids = tokenizer(args.prompt)["input_ids"]
        prompts = [list(ids)] * args.batch_size
    else:
        rng = np.random.default_rng(0)
        prompts = [
            list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=args.input_tokens))
            for _ in range(args.batch_size)
        ]

    on_token = None
    if args.streaming:
        if args.fused_decode or gen.num_beams > 1:
            raise SystemExit(
                "--streaming needs the stepwise loop (drop --fused-decode/--num-beams)"
            )
        if engine.scheduler is not None:
            raise SystemExit(
                "--streaming needs the resident stepwise loop (drop the "
                "tiered/streaming policy knobs)"
            )

        def on_token(toks, _tok=tokenizer):
            t = int(toks[0])
            print(_tok.decode([t]) if _tok is not None else f" {t}",
                  end="", flush=True)

    if args.profile:
        import jax

        jax.profiler.start_trace("/tmp/lia_trace")
    draft_engine = None
    if args.draft_model and args.speculative > 0:
        dcfg = get_config(args.draft_model).replace(dtype=args.dtype)
        draft_engine = InferenceEngine(dcfg, init_dummy_params(dcfg), RuntimeConfig())
        print(f"[lia-tpu] draft model: {dcfg.name} (two-model speculation)")
    results = []
    for it in range(args.num_warmup + args.num_iter):
        t0 = time.perf_counter()
        if args.speculative > 0:
            if draft_engine is not None:
                seqs, steps = engine.generate_speculative_draft(
                    draft_engine, prompts, gen, k=args.speculative
                )
            else:
                seqs, steps = engine.generate_speculative(
                    prompts, gen, ngram=args.ngram, k=args.speculative
                )
            dt = time.perf_counter() - t0
            print(
                f"[{'warmup' if it < args.num_warmup else 'iter'} {it}] {dt:.3f}s  "
                f"({seqs.size / dt:.1f} tok/s; {steps} verify passes for "
                f"{gen.max_new_tokens} tokens)"
            )
            continue
        if gen.num_beams > 1:
            res = engine.generate_beam(prompts, gen)
        else:
            res = engine.generate(prompts, gen, fused=args.fused_decode, on_token=on_token)
        if on_token is not None:
            print(flush=True)
        dt = time.perf_counter() - t0
        tag = "warmup" if it < args.num_warmup else "iter"
        print(f"[{tag} {it}] {dt:.3f}s  ({res.sequences.size / dt:.1f} tok/s)")
        if it >= args.num_warmup:
            results.append(res)
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        print("[lia-tpu] trace written to /tmp/lia_trace")

    if results:
        if tokenizer is not None:
            print("[output]", tokenizer.decode(list(results[-1].sequences[0])))
        best = max(results, key=lambda r: r.summary()["total_tokens_per_s"])
        s = best.summary()
        print(format_summary(s))
        line = {"model": cfg.name, **{k: round(v, 6) for k, v in s.items()}}
        print(json.dumps(line))
        if args.output_dir:
            _os.makedirs(args.output_dir, exist_ok=True)
            out = _os.path.join(args.output_dir, "summary.json")
            with open(out, "w") as f:
                json.dump(line, f, indent=1)
            print(f"[lia-tpu] summary written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
