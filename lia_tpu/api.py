"""One-stop engine construction — the ``ipex.llm.optimize`` analog.

The reference's public entry point (llm/frontend.py → transformers/optimize.py:1234)
takes a loaded HF model plus dtype/quant knobs and mutates it for inference. The
functional equivalent here assembles config + weights + runtime in one call:

    import lia_tpu
    engine = lia_tpu.load_engine("opt-6.7b", weight_dtype="int8", batch_friendly...)
    out = engine.generate([[1, 2, 3]], lia_tpu.GenerationConfig(max_new_tokens=32))
"""

from __future__ import annotations

from typing import Optional

from lia_tpu.config import GenerationConfig, QuantConfig, RuntimeConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.models.registry import get_config


def load_engine(
    model: str,
    dtype: str = "bfloat16",
    checkpoint: Optional[str] = None,
    gptq_checkpoint: Optional[str] = None,
    dummy: bool = False,
    weight_dtype: str = "none",
    group_size: int = -1,
    kv_cache_dtype: str = "none",
    act_quant: str = "none",
    gptq: bool = False,
    gptq_actorder: bool = False,
    smoothquant: Optional[float | str] = None,  # alpha, or "auto" to autotune
    prefill_policy: int = 3,
    decode_policy: int = 3,
    hbm_percentage: int = 100,
    num_minibatch: int = 1,
    stream_weights: bool = False,
    auto_placement: bool = False,
    batch: int = 1,
    in_len: int = 256,
    out_len: int = 32,
    seed: int = 0,
) -> InferenceEngine:
    """Build a ready-to-generate engine for a registry model.

    Weight sources (first match wins): ``checkpoint`` (HF safetensors dir),
    ``gptq_checkpoint`` (AutoGPTQ safetensors dir), ``dummy=True`` (random,
    synthesized directly in quantized form when quantization is requested).
    """
    cfg = get_config(model).replace(dtype=dtype)
    if cfg.encoder_decoder or cfg.family in ("git", "llava"):
        # non-decoder-only architectures route to their dedicated engines
        # (reference: same optimize() frontend dispatches per architecture,
        # optimize.py:310-326 T5 / :188,673 llava)
        return _load_special(
            cfg, checkpoint, dummy, seed,
            QuantConfig(weight_dtype=weight_dtype, group_size=group_size,
                        act_quant=act_quant),
            unsupported={
                "gptq": gptq, "gptq_checkpoint": gptq_checkpoint,
                "smoothquant": smoothquant is not None, "kv_cache_dtype != none":
                kv_cache_dtype != "none", "static-int8": weight_dtype == "static-int8",
                "stream_weights": stream_weights, "hbm_percentage < 100":
                hbm_percentage < 100, "auto_placement": auto_placement,
            },
        )
    quant = QuantConfig(
        weight_dtype=weight_dtype,
        group_size=group_size,
        kv_cache_dtype=kv_cache_dtype,
        act_quant=act_quant,
    )
    runtime = RuntimeConfig(
        prefill_policy=prefill_policy,
        decode_policy=decode_policy,
        hbm_percentage=hbm_percentage,
        num_minibatch=num_minibatch,
        stream_weights=stream_weights,
        quant=quant,
    )
    if auto_placement:
        from lia_tpu.runtime.cost_model import resolve_auto_policies

        runtime = runtime.replace(prefill_policy=-1, decode_policy=-1, hbm_percentage=-1)
        runtime = resolve_auto_policies(cfg, runtime, batch, in_len, out_len)

    static8 = weight_dtype == "static-int8"
    if smoothquant is not None and not quant.enabled:
        raise ValueError(
            "smoothquant= migrates outliers BEFORE weight quantization — pass a "
            "WOQ weight_dtype ('int8'/'int4') alongside it"
        )

    def _gptq(fp_params):
        # native GPTQ (ipex.quantization.gptq analog): Hessian-guided
        # quantization against synthetic calibration prompts
        from lia_tpu.ops.gptq import gptq_quantize_params

        bits = 8 if weight_dtype == "int8" else 4
        return gptq_quantize_params(
            cfg, fp_params, _default_calib(cfg), bits=bits,
            group_size=group_size if group_size > 0 else 128,
            actorder=gptq_actorder,
        )

    if checkpoint:
        from lia_tpu.ops.quant import quantize_params
        from lia_tpu.utils.checkpoint import load_hf_checkpoint

        params = load_hf_checkpoint(cfg, checkpoint)
        if static8:
            from lia_tpu.ops.smoothquant import static_int8_quantize

            params, _ = static_int8_quantize(cfg, params, _default_calib(cfg))
        elif gptq:
            params = _gptq(params)
        elif smoothquant is not None and quant.enabled:
            from lia_tpu.ops.smoothquant import smoothquant_quantize

            params, _ = smoothquant_quantize(
                cfg, params, _default_calib(cfg), quant, alpha=smoothquant
            )
        elif quant.enabled:
            params = quantize_params(cfg, params, quant)
    elif gptq_checkpoint:
        import os

        from safetensors.numpy import load_file

        from lia_tpu.utils.gptq import params_from_gptq_state_dict

        sd = {}
        for f in sorted(os.listdir(gptq_checkpoint)):
            if f.endswith(".safetensors"):
                sd.update(load_file(os.path.join(gptq_checkpoint, f)))
        params = params_from_gptq_state_dict(cfg, sd, group_size=max(group_size, 128))
    elif dummy:
        from lia_tpu.utils.checkpoint import init_dummy_params

        if static8:
            from lia_tpu.ops.smoothquant import static_int8_quantize

            params, _ = static_int8_quantize(
                cfg, init_dummy_params(cfg, seed=seed), _default_calib(cfg)
            )
        elif gptq:
            params = _gptq(init_dummy_params(cfg, seed=seed))
        elif smoothquant is not None and quant.enabled:
            from lia_tpu.ops.smoothquant import smoothquant_quantize

            params, _ = smoothquant_quantize(
                cfg, init_dummy_params(cfg, seed=seed), _default_calib(cfg),
                quant, alpha=smoothquant,
            )
        else:
            params = init_dummy_params(
                cfg, seed=seed, quant=quant if quant.enabled else None
            )
    else:
        raise ValueError("provide checkpoint=, gptq_checkpoint=, or dummy=True")
    return InferenceEngine(cfg, params, runtime)


def _load_special(cfg, checkpoint, dummy, seed, quant, unsupported):
    """Engines for T5 (seq2seq), GIT and LLaVA (vision-language).

    Supports WOQ int8/int4 (language stacks + heads quantize; vision towers
    stay fp — same scope as run.py's _maybe_woq). Decoder-only-only knobs
    (gptq, smoothquant, static-int8, kv-cache quant, tiering/streaming,
    auto placement) raise instead of being silently dropped."""
    requested = [name for name, on in unsupported.items() if on]
    if requested:
        raise ValueError(
            f"{cfg.name} ({cfg.family}) does not support: {', '.join(requested)} "
            "(decoder-only features)"
        )
    from lia_tpu.utils.checkpoint import init_dummy_params, load_hf_checkpoint

    if checkpoint:
        params = load_hf_checkpoint(cfg, checkpoint)
    elif dummy:
        params = init_dummy_params(cfg, seed=seed)
    else:
        raise ValueError("provide checkpoint= or dummy=True")
    if quant.enabled:
        from lia_tpu.ops.quant import quantize_params

        params = quantize_params(cfg, params, quant)
    if cfg.encoder_decoder:
        from lia_tpu.engine.seq2seq import Seq2SeqEngine

        return Seq2SeqEngine(cfg, params)
    from lia_tpu.engine.vlm import GitEngine, LlavaEngine

    return GitEngine(cfg, params) if cfg.family == "git" else LlavaEngine(cfg, params)


def _default_calib(cfg):
    """Synthetic calibration prompts for quantization flows without a dataset."""
    import numpy as np

    rng = np.random.default_rng(0)
    return [list(rng.integers(10, min(cfg.vocab_size - 10, 30000), size=64))
            for _ in range(4)]
