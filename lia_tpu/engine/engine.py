"""Inference engine: bucketed prefill + decode loops over a compiled-fn cache.

This is the TPU-native replacement for the reference's patched HF generation stack
(`_greedy_search`, intel_extension_for_pytorch/transformers/generation/
greedy_search.py:37-458): instead of smuggling policy kwargs through ``model_kwargs``
and mutating module trees, the engine owns

- a **compiled-function cache** keyed by static shapes (batch, prompt bucket, cache
  length) — the analog of the reference's preallocated ``tgt_len+max_new_tokens``
  caches (lia/modeling_opt.py:1277-1279) that avoid per-step reallocation;
- two decode drivers: a **stepwise** Python loop that records per-token wall-clock
  latency (token_latency parity, greedy_search.py:424) and supports EOS early-exit,
  and a **fused** ``lax.scan`` loop that keeps the whole generation on-device for
  maximum throughput (no host round-trip per token — something the reference cannot
  do on its CPU-orchestrated pipeline);
- the placement/streaming runtime (resident today; the tiered weight manager and
  policy scheduler plug in behind the same ``prefill_fn``/``decode_fn`` seam).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig, RuntimeConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.ops import sampling
from lia_tpu.utils.metrics import LatencyStats


def _needs_processors(gen: GenerationConfig) -> bool:
    """True when per-step logits processors (repetition penalty / min-new-tokens
    / no-repeat-ngram) must run — gates the [B, V] seen-mask and [B, L] history
    bookkeeping off the default path."""
    return (
        gen.repetition_penalty != 1.0
        or (gen.min_new_tokens > 0 and gen.eos_token_id is not None)
        or gen.no_repeat_ngram_size > 0
    )


def bucket_length(n: int, minimum: int = 16) -> int:
    """Next power-of-two bucket (static shapes => bounded recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def pack_prompts(
    prompts: Sequence[Sequence[int]], pad_id: int, bucket: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad prompts to a common bucket. Returns (tokens [B,S], mask [B,S]).

    Left-padding makes every sequence end at the same slot, so decode writes to a
    uniform cache position — the same trick that lets the reference preallocate its
    iakv cache with one ``seq_info`` offset for the whole batch.
    """
    maxlen = max(len(p) for p in prompts)
    S = bucket or bucket_length(maxlen)
    B = len(prompts)
    tokens = np.full((B, S), pad_id, np.int32)
    mask = np.zeros((B, S), bool)
    for i, p in enumerate(prompts):
        tokens[i, S - len(p):] = np.asarray(p, np.int32)
        mask[i, S - len(p):] = True
    return tokens, mask


@dataclass
class GenerationResult:
    sequences: np.ndarray  # [B, num_generated] generated token ids
    latency: LatencyStats = field(default_factory=LatencyStats)

    def summary(self, batch: Optional[int] = None) -> Dict[str, float]:
        return self.latency.summary(batch or self.sequences.shape[0])


class InferenceEngine:
    """Owns device parameters, compiled functions, and the generation loops."""

    def __init__(
        self,
        cfg: ModelConfig,
        params_host: Any,
        runtime: RuntimeConfig = RuntimeConfig(),
        mesh=None,
    ):
        """``mesh``: optional (data, model) jax Mesh — weights/KV tensor-shard
        over "model" and the batch over "data" (the AutoTP analog; reference
        runs every generation mode incl. beam under DeepSpeed AutoTP). Skips
        projection fusion (fused qkv is not column-shardable). Composes with
        the streaming scheduler for TPU-resident-KV plans: the resident
        prefix, every streamed layer put, and the segment KV shard over
        "model" (host-placement policies stay per-host — docs/tiering.md)."""
        self.cfg = cfg
        self.runtime = runtime
        self.mesh = mesh
        self._compiled: Dict[Any, Any] = {}
        self.scheduler = None
        from lia_tpu.ops import dispatch

        if not runtime.use_pallas:
            dispatch.set_use_pallas(False)  # --no-pallas kill-switch
        if mesh is not None and dict(mesh.shape).get("model", 1) > 1:
            # Pallas kernels are per-chip programs; GSPMD won't partition a
            # pallas_call. With tp_pallas (default), register the mesh so the
            # dispatched entry points wrap each kernel in shard_map with
            # per-shard shapes (heads/features on "model" — the analog of the
            # reference running AMX kernels on every TP rank,
            # reference decoder.py:60-77). The kill-switch falls back to the
            # jnp paths, which GSPMD partitions. See dispatch.set_tp_mesh.
            dispatch.set_tp_active(True)
            if runtime.tp_pallas and runtime.use_pallas:
                dispatch.set_tp_mesh(mesh)
        if runtime.fuse_projections and mesh is None:
            from lia_tpu.ops.fuse import fuse_projections

            params_host = fuse_projections(cfg, params_host)
        needs_scheduler = (
            runtime.hbm_percentage < 100
            or runtime.stream_weights
            or runtime.prefill_policy != 3
            or runtime.decode_policy != 3
        )
        if needs_scheduler:
            from lia_tpu.runtime.scheduler import StreamingScheduler

            # mesh composes with TPU-resident-KV streaming plans (policy 3 +
            # hbm_percentage/stream_weights): resident prefix, streamed layers,
            # and segment KV all shard over "model"; the scheduler validates
            # and raises for host-placement policies (per-host by design)
            self.scheduler = StreamingScheduler(cfg, runtime, params_host, mesh=mesh)
            self.params = self.scheduler.resident_params
        elif mesh is not None:
            from lia_tpu.parallel import sharding as shd

            self.params = shd.shard_params(cfg, params_host, mesh)
        else:
            t0 = time.perf_counter()
            self.params = jax.device_put(params_host)
            jax.block_until_ready(self.params)
            # .nbytes, NOT np.asarray(x).nbytes — the tree may already be
            # device-resident (utils.checkpoint.device_dummy_params), where
            # np.asarray would drag every leaf back through the slow relay
            nbytes = sum(x.nbytes for x in jax.tree.leaves(params_host))
            dt = time.perf_counter() - t0
            print(
                f"[lia-tpu] {nbytes/1e9:.2f} GB weights → device in {dt:.1f}s "
                f"({nbytes/1e9/max(dt,1e-9):.2f} GB/s)"
            )

    def _slot_bucket(self) -> int:
        """KV-cache slot rounding: 64 (bf16 KV) / 128 (int8 KV — lane-sliced
        scale planes need 128-aligned dynamic offsets in Mosaic)."""
        return 128 if self.runtime.quant.kv_cache_dtype == "int8" else 64

    def _shard_cache(self, cache):
        """Place a (possibly beam/quantized) cache pytree onto the TP mesh:
        stacked KV leaves shard batch on "data" and KV heads on "model"
        (rank-ranked — covers raw planes, QuantizedKV scale planes, masks)."""
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        def spec(leaf):
            nd = getattr(leaf, "ndim", 0)
            if nd == 5:  # [L, B, N_kv, S, D]
                p = P(None, "data", "model", None, None)
            elif nd == 4:  # quantized scales [L, B, N_kv, S]
                p = P(None, "data", "model", None)
            elif nd == 2:  # [B, S] masks
                p = P("data", None)
            else:
                p = P()
            return NamedSharding(self.mesh, p)

        return jax.tree.map(lambda a: jax.device_put(a, spec(a)), cache)

    # -- compiled-fn cache ---------------------------------------------------

    def _get_prefill(self):
        key = ("prefill",)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                partial(T.prefill, self.cfg), donate_argnums=(3,)
            )
        return self._compiled[key]

    def _get_decode(self):
        key = ("decode",)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                partial(T.decode_step, self.cfg), donate_argnums=(3,)
            )
        return self._compiled[key]

    def _get_fused_decode(self, gen: GenerationConfig, num_steps: int):
        key = ("fused", gen, num_steps)
        if key not in self._compiled:
            cfg = self.cfg
            eos = gen.eos_token_id
            proc = _needs_processors(gen)

            def fused(params, tok0, pos0, cache, rng, finished0, seen0, hist0):
                # hist0 [B, S + num_steps + 1] with the prompt + first token
                # written; S recovered statically from the buffer shape
                S_prompt = hist0.shape[1] - num_steps - 1

                def step(carry, i):
                    tok, pos, cache, rng, finished, seen, hist = carry
                    logits, cache = T.decode_step(
                        cfg, params, tok[:, None], pos[:, None], cache
                    )
                    if proc:
                        # the scan emits tokens 2..N: at step i, i+1 are out
                        logits = sampling.process_logits(
                            logits, gen, seen, i + 1,
                            history=hist, cur_len=S_prompt + i + 1,
                        )
                    rng, sub = jax.random.split(rng)
                    nxt = sampling.sample(logits, sub, gen)
                    if eos is not None:
                        nxt = jnp.where(finished, gen.pad_token_id, nxt)
                        finished = finished | (nxt == eos)
                    if proc:
                        seen = sampling.update_seen(seen, nxt)
                        hist = jax.lax.dynamic_update_slice(
                            hist, nxt[:, None], (0, S_prompt + i + 1)
                        )
                    return (nxt, pos + 1, cache, rng, finished, seen, hist), nxt

                carry, toks = jax.lax.scan(
                    step, (tok0, pos0, cache, rng, finished0, seen0, hist0),
                    jnp.arange(num_steps, dtype=jnp.int32),
                )
                return toks.T, carry[2]  # [B, num_steps], cache

            self._compiled[key] = jax.jit(fused, donate_argnums=(3,))
        return self._compiled[key]

    # -- prefill + stepwise decode (latency-instrumented) ---------------------

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig = GenerationConfig(),
        fused: bool = False,
        seed: int = 0,
        on_token=None,
    ) -> GenerationResult:
        """``on_token``, if given, is called with the ``[B]`` int token array as
        each step completes (the reference's TextStreamer / --streaming analog).
        Streaming is a stepwise-loop feature: the fused on-device scan and the
        tiered scheduler produce tokens in bulk, so those combinations raise
        rather than silently dropping the callback."""
        if on_token is not None and (fused or self.scheduler is not None):
            raise ValueError(
                "on_token streaming needs the stepwise resident loop "
                "(fused=False, no tiered scheduler)"
            )
        cfg = self.cfg
        if gen.num_beams > 1:
            raise ValueError("use generate_beam() for num_beams > 1")
        tokens, mask = pack_prompts(prompts, gen.pad_token_id)
        B, S = tokens.shape
        # cache slot bucket: 64 for bf16 KV (sublane-sliced only — cuts
        # dead-slot attention reads 17% at 256-in/32-out: 320 vs 384 slots);
        # 128 for int8 KV, whose per-token SCALE arrays are lane-dim sliced
        # and Mosaic requires dynamic lane offsets provably 128-aligned
        max_len = -(-(S + gen.max_new_tokens) // self._slot_bucket()) * self._slot_bucket()
        kv_dtype = jnp.dtype(cfg.dtype)
        lat = LatencyStats()
        rng = jax.random.PRNGKey(seed)

        if self.scheduler is not None:
            return self.scheduler.generate(tokens, mask, gen, max_len, lat, rng)

        cache = self._shard_cache(kvc.init_cache(
            cfg, B, max_len, kv_dtype,
            quantized=self.runtime.quant.kv_cache_dtype == "int8",
        ))
        proc = _needs_processors(gen)
        t0 = time.perf_counter()
        logits, cache = self._get_prefill()(
            self.params, jnp.asarray(tokens), jnp.asarray(mask), cache
        )
        seen = (
            sampling.seen_from_prompt(jnp.asarray(tokens), jnp.asarray(mask), cfg.vocab_size)
            if proc else jnp.zeros((B, 1), jnp.bool_)  # placeholder (static jit sig)
        )
        # token-id history (no-repeat-ngram state): prompt slots + one per new token
        hist = (
            jnp.concatenate(
                [jnp.asarray(tokens),
                 jnp.full((B, gen.max_new_tokens), gen.pad_token_id, jnp.int32)], axis=1
            ) if proc else jnp.zeros((B, 1), jnp.int32)
        )
        if proc:
            logits = sampling.process_logits(logits, gen, seen, 0, history=hist, cur_len=S)
        rng, sub = jax.random.split(rng)
        first = sampling.sample(logits, sub, gen)
        if proc:
            seen = sampling.update_seen(seen, first)
            hist = hist.at[:, S].set(first)
        first.block_until_ready()
        lat.record(time.perf_counter() - t0)
        if on_token is not None:
            on_token(np.asarray(first))

        positions = jnp.asarray(mask.sum(1), jnp.int32)  # logical pos of next token
        finished = (
            (first == gen.eos_token_id)
            if gen.eos_token_id is not None
            else jnp.zeros((B,), bool)
        )

        if fused:
            fd = self._get_fused_decode(gen, gen.max_new_tokens - 1)
            t0 = time.perf_counter()
            rest, cache = fd(self.params, first, positions, cache, rng, finished, seen, hist)
            rest = np.asarray(rest)
            dt = time.perf_counter() - t0
            for _ in range(gen.max_new_tokens - 1):
                lat.record(dt / max(gen.max_new_tokens - 1, 1))
            seqs = np.concatenate([np.asarray(first)[:, None], rest], axis=1)
            return GenerationResult(seqs, lat)

        decode = self._get_decode()
        out: List[np.ndarray] = [np.asarray(first)]
        tok = first
        for i in range(gen.max_new_tokens - 1):
            t0 = time.perf_counter()
            logits, cache = decode(self.params, tok[:, None], positions[:, None], cache)
            if proc:
                logits = sampling.process_logits(
                    logits, gen, seen, i + 1, history=hist, cur_len=S + i + 1
                )
            rng, sub = jax.random.split(rng)
            tok = sampling.sample(logits, sub, gen)
            if proc:
                seen = sampling.update_seen(seen, tok)
                hist = hist.at[:, S + i + 1].set(tok)
            if gen.eos_token_id is not None:
                tok = jnp.where(finished, gen.pad_token_id, tok)
                finished = finished | (tok == gen.eos_token_id)
            tok.block_until_ready()
            lat.record(time.perf_counter() - t0)
            positions = positions + 1
            out.append(np.asarray(tok))
            if on_token is not None:
                on_token(out[-1])
            if gen.eos_token_id is not None and bool(finished.all()):
                break
        return GenerationResult(np.stack(out, axis=1), lat)

    # -- speculative decoding ---------------------------------------------------

    def generate_speculative(
        self,
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig = GenerationConfig(),
        ngram: int = 3,
        k: int = 4,
    ):
        """Greedy generation with prompt-lookup speculation (see
        :mod:`lia_tpu.engine.lookahead`). Returns ``(sequences, n_verify_steps)``
        — sequences match :meth:`generate`'s greedy output; steps <
        max_new_tokens whenever the n-gram proposals land (repetitive /
        retrieval-heavy text), and never exceeds it."""
        from lia_tpu.engine.lookahead import generate_prompt_lookup

        return generate_prompt_lookup(self, prompts, gen, ngram=ngram, k=k)

    def generate_speculative_draft(
        self,
        draft_engine: "InferenceEngine",
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig = GenerationConfig(),
        k: int = 4,
        seed: int = 0,
    ):
        """Generation with a DRAFT MODEL proposing k tokens per verify pass
        (two-model speculation; e.g. opt-125m drafting for opt-30b). Greedy
        requests share prompt lookup's greedy-exact verify/accept machinery;
        ``do_sample`` requests run Leviathan-style acceptance sampling whose
        output distribution equals plain target sampling
        (:mod:`lia_tpu.engine.lookahead`)."""
        from lia_tpu.engine import lookahead as la

        if gen.do_sample:
            return la.generate_draft_speculative_sampled(
                self, draft_engine, prompts, gen, k=k, seed=seed
            )
        return la.generate_draft_speculative(self, draft_engine, prompts, gen, k=k)

    # -- beam search -----------------------------------------------------------

    def generate_beam(
        self,
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig,
        seed: int = 0,
        grouped: bool | None = None,
    ) -> GenerationResult:
        """Beam-search generation (reference parity: _beam_search with iakv
        beam_idx reorder). Returns the best beam per prompt.

        ``grouped=True`` (default, resident path) uses the
        :class:`~lia_tpu.ops.kv_cache.BeamKVCache` layout: the prompt is
        prefilled and stored ONCE per input (1/nb of the prefill compute and
        prompt-KV memory of the expanded layout) and the per-step beam shuffle
        gathers only the generated tail. ``grouped=False`` is the expanded
        whole-cache-gather golden path (bit-identical results).

        Composes with the tiered/streamed scheduler: the reference's generation
        modes all work under any policy
        (intel_extension_for_pytorch/transformers/generation/beam_search.py);
        here the scheduler's step passes replace the resident prefill/decode and
        the beam shuffle gathers BOTH cache segments (reorder_state)."""
        from lia_tpu.engine import beam as beam_mod

        cfg = self.cfg
        nb = gen.num_beams
        lat = LatencyStats()
        quantized_kv = self.runtime.quant.kv_cache_dtype == "int8"
        if grouped is None:
            grouped = True  # BeamKVCache has bf16 AND int8-KV kernels

        if self.scheduler is not None:
            # grouped beam under tiering (TPU-KV streaming plans): prompts
            # prefill ONCE per input and the per-step shuffle gathers only the
            # tails. Host-placement plans and TP meshes keep the expanded
            # whole-cache-gather path (no grouped host kernel; mesh shardings
            # of eagerly-built tails are not plumbed).
            if grouped and self.scheduler.grouped_beam_ok and self.mesh is None:
                return self._generate_beam_scheduled_grouped(prompts, gen, lat, seed)
            expanded = [p for p in prompts for _ in range(nb)]
            tokens, mask = pack_prompts(expanded, gen.pad_token_id)
            S = tokens.shape[1]
            max_len = -(-(S + gen.max_new_tokens) // self._slot_bucket()) * self._slot_bucket()
            return self._generate_beam_scheduled(
                tokens, mask, gen, max_len, lat, seed
            )

        if grouped:
            tokens, mask = pack_prompts(prompts, gen.pad_token_id)  # [B, S]
            B, S = tokens.shape
            Bnb = B * nb
            prompt_slots = -(-S // 128) * 128
            cache = self._shard_cache(kvc.init_cache(
                cfg, B, prompt_slots, jnp.dtype(cfg.dtype), quantized=quantized_kv
            ))
            # per-beam logits-processor state still lives at Bnb rows
            etokens = np.repeat(np.asarray(tokens), nb, axis=0)
            emask = np.repeat(np.asarray(mask), nb, axis=0)
        else:
            expanded = [p for p in prompts for _ in range(nb)]
            tokens, mask = pack_prompts(expanded, gen.pad_token_id)
            Bnb, S = tokens.shape
            B = Bnb // nb
            max_len = -(-(S + gen.max_new_tokens) // self._slot_bucket()) * self._slot_bucket()
            cache = self._shard_cache(kvc.init_cache(
                cfg, Bnb, max_len, jnp.dtype(cfg.dtype), quantized=quantized_kv
            ))
            etokens, emask = np.asarray(tokens), np.asarray(mask)

        proc = _needs_processors(gen)
        t0 = time.perf_counter()
        logits, cache = self._get_prefill()(
            self.params, jnp.asarray(tokens), jnp.asarray(mask), cache
        )
        if grouped:
            cache = kvc.beam_cache_from_prefill(cache, nb, gen.max_new_tokens)
            if self.mesh is not None:
                cache = self._shard_cache(cache)
            logits = jnp.repeat(logits, nb, axis=0)  # [Bnb, V] beam rows
        # per-beam processor state (HF beam_search runs LogitsProcessorList on
        # the log-softmax scores; state rows reorder with the winning beams)
        seen = (
            sampling.seen_from_prompt(jnp.asarray(etokens), jnp.asarray(emask), cfg.vocab_size)
            if proc else jnp.zeros((Bnb, 1), jnp.bool_)
        )
        phist = (
            jnp.concatenate(
                [jnp.asarray(etokens),
                 jnp.full((Bnb, gen.max_new_tokens), gen.pad_token_id, jnp.int32)], axis=1
            ) if proc else jnp.zeros((Bnb, 1), jnp.int32)
        )
        # first expansion from the prompt's last token
        scores0, finished0 = beam_mod.init_beam_state(B, nb)
        lp_flat = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        if proc:
            lp_flat = sampling.process_logits(
                lp_flat, gen, seen, 0, history=phist, cur_len=S
            )
        logprobs = lp_flat.reshape(B, nb, cfg.vocab_size)
        flat = (scores0[:, :, None] + logprobs).reshape(B, nb * cfg.vocab_size)
        select = flat
        if gen.do_sample:
            # stochastic beams (_beam_sample parity): the FIRST expansion must be
            # Gumbel-perturbed too, same trick as beam_step
            g0 = -jnp.log(
                -jnp.log(
                    jax.random.uniform(
                        jax.random.PRNGKey(seed), flat.shape, minval=1e-20, maxval=1.0
                    )
                )
            )
            select = flat + g0
        _, idx = jax.lax.top_k(select, nb)
        scores = jnp.take_along_axis(flat, idx, axis=1)
        beam_src = (idx // cfg.vocab_size).astype(jnp.int32)
        first = (idx % cfg.vocab_size).astype(jnp.int32)
        base = (jnp.arange(B, dtype=jnp.int32) * nb)[:, None]
        flat_src0 = (base + beam_src).reshape(-1)
        if not grouped:
            # grouped: the tail is still empty and the prompt is shared per
            # group, so the first expansion needs no cache shuffle at all
            cache = kvc.beam_reorder(cache, flat_src0)
        if proc:
            seen, phist, _, _ = beam_mod.reorder_proc(
                (seen, phist, jnp.asarray(S, jnp.int32), 0), flat_src0,
                first.reshape(-1),
            )
        finished = (
            (first == gen.eos_token_id)
            if gen.eos_token_id is not None
            else jnp.zeros((B, nb), bool)
        )
        first.block_until_ready()
        lat.record(time.perf_counter() - t0)

        key = ("beam", gen, gen.max_new_tokens - 1)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                beam_mod.make_beam_decoder(cfg, gen, gen.max_new_tokens - 1),
                donate_argnums=(3,),
            )
        positions = jnp.asarray(emask.sum(1), jnp.int32)  # [Bnb]
        t0 = time.perf_counter()
        rng, sub = jax.random.split(jax.random.PRNGKey(seed + 1))
        history, final_scores = self._compiled[key](
            self.params, first.reshape(-1), positions, cache, scores, finished, sub,
            seen, phist, jnp.asarray(S + 1, jnp.int32),
        )
        history = np.asarray(history).reshape(B, nb, -1)
        final_scores = np.asarray(final_scores)
        dt = time.perf_counter() - t0
        for _ in range(gen.max_new_tokens - 1):
            lat.record(dt / max(gen.max_new_tokens - 1, 1))
        seqs = beam_mod.select_best(history, final_scores, gen)
        return GenerationResult(seqs, lat)

    def _generate_beam_scheduled_grouped(self, prompts, gen, lat, seed):
        """Grouped beam search over tiered weights: prefill at group batch B0,
        both segment caches become :class:`~lia_tpu.ops.kv_cache.BeamKVCache`,
        and every step's hypothesis shuffle gathers only the generated tails
        (scheduler.reorder_state_beam) — O(tail) instead of O(cache) traffic.
        Reference intent: the beam_idx indirection that never copies the cache
        (…/transformers/generation/greedy_search.py:237-282)."""
        from lia_tpu.engine import beam as beam_mod

        cfg = self.cfg
        nb = gen.num_beams
        sched = self.scheduler
        tokens, mask = pack_prompts(prompts, gen.pad_token_id)
        B, S = tokens.shape
        Bnb = B * nb
        prompt_slots = -(-S // 128) * 128
        rng = jax.random.PRNGKey(seed)
        use_proc = _needs_processors(gen)

        select = jax.jit(partial(beam_mod.beam_select, gen, cfg.vocab_size))
        proc = None
        if use_proc:
            etokens = np.repeat(np.asarray(tokens), nb, axis=0)
            emask = np.repeat(np.asarray(mask), nb, axis=0)
            proc = (
                sampling.seen_from_prompt(
                    jnp.asarray(etokens), jnp.asarray(emask), cfg.vocab_size
                ),
                jnp.concatenate(
                    [jnp.asarray(etokens),
                     jnp.full((Bnb, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
                    axis=1,
                ),
                jnp.asarray(S, jnp.int32),
                0,
            )

        t0 = time.perf_counter()
        logits, state = sched.prefill_pass(tokens, mask, prompt_slots)
        state = sched.beam_state_from_prefill(state, nb, gen.max_new_tokens)
        logits = jnp.repeat(logits, nb, axis=0)  # [Bnb, V] identical beam rows
        scores0, finished = beam_mod.init_beam_state(B, nb)
        rng, sub = jax.random.split(rng)
        tok, scores, finished, src = select(
            logits, scores0, finished, sub if gen.do_sample else None, proc=proc
        )
        # first expansion: tails are empty and prompts are group-shared — the
        # cache needs no shuffle at all (same argument as the resident path)
        proc = beam_mod.reorder_proc(proc, src, tok)
        append = jax.jit(
            lambda h, s, t, i: jax.lax.dynamic_update_slice(
                jnp.take(h, s, axis=0), t[:, None], (0, i)
            )
        )
        history = append(
            jnp.full((Bnb, gen.max_new_tokens), gen.pad_token_id, jnp.int32),
            jnp.arange(Bnb, dtype=jnp.int32), tok, jnp.zeros((), jnp.int32),
        )
        tok.block_until_ready()
        lat.record(time.perf_counter() - t0)

        pos = jnp.asarray(np.repeat(np.asarray(mask).sum(1), nb), jnp.int32)
        for i in range(gen.max_new_tokens - 1):
            t0 = time.perf_counter()
            logits, state = sched.decode_pass_beam(tok, pos, state)
            rng, sub = jax.random.split(rng)
            tok, scores, finished, src = select(
                logits, scores, finished, sub if gen.do_sample else None, proc=proc
            )
            state = sched.reorder_state_beam(state, src)
            proc = beam_mod.reorder_proc(proc, src, tok)
            history = append(history, src, tok, jnp.asarray(i + 1, jnp.int32))
            tok.block_until_ready()
            lat.record(time.perf_counter() - t0)
            pos = pos + 1

        final_scores = np.asarray(scores)
        history = np.asarray(history).reshape(B, nb, -1)
        seqs = beam_mod.select_best(history, final_scores, gen)
        return GenerationResult(seqs, lat)

    def _generate_beam_scheduled(self, tokens, mask, gen, max_len, lat, seed):
        """Stepwise beam search over the scheduler's decode passes."""
        from lia_tpu.engine import beam as beam_mod

        cfg = self.cfg
        nb = gen.num_beams
        Bnb, S = tokens.shape
        B = Bnb // nb
        sched = self.scheduler
        rng = jax.random.PRNGKey(seed)
        use_proc = _needs_processors(gen)

        select = jax.jit(
            partial(beam_mod.beam_select, gen, cfg.vocab_size), static_argnums=()
        )
        proc = None
        if use_proc:
            proc = (
                sampling.seen_from_prompt(
                    jnp.asarray(tokens), jnp.asarray(mask), cfg.vocab_size
                ),
                jnp.concatenate(
                    [jnp.asarray(tokens),
                     jnp.full((Bnb, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
                    axis=1,
                ),
                jnp.asarray(S, jnp.int32),
                0,
            )

        t0 = time.perf_counter()
        logits, state = sched.prefill_pass(tokens, mask, max_len)
        scores0, finished = beam_mod.init_beam_state(B, nb)
        rng, sub = jax.random.split(rng)
        tok, scores, finished, src = select(
            logits, scores0, finished, sub if gen.do_sample else None, proc=proc
        )
        state = sched.reorder_state(state, src)
        proc = beam_mod.reorder_proc(proc, src, tok)
        # history stays on device: [Bnb, max_new], reordered by gather and
        # appended with one dynamic_update_slice per step (no host round-trip
        # in the bookkeeping; only the scheduler passes themselves are stepwise)
        append = jax.jit(
            lambda h, s, t, i: jax.lax.dynamic_update_slice(
                jnp.take(h, s, axis=0), t[:, None], (0, i)
            )
        )
        history = append(
            jnp.full((Bnb, gen.max_new_tokens), gen.pad_token_id, jnp.int32),
            jnp.arange(Bnb, dtype=jnp.int32), tok, jnp.zeros((), jnp.int32),
        )
        tok.block_until_ready()
        lat.record(time.perf_counter() - t0)

        pos = jnp.asarray(np.asarray(mask).sum(1), jnp.int32)
        for i in range(gen.max_new_tokens - 1):
            t0 = time.perf_counter()
            logits, state = sched.decode_pass(tok, pos, state)
            rng, sub = jax.random.split(rng)
            tok, scores, finished, src = select(
                logits, scores, finished, sub if gen.do_sample else None, proc=proc
            )
            state = sched.reorder_state(state, src)
            proc = beam_mod.reorder_proc(proc, src, tok)
            history = append(history, src, tok, jnp.asarray(i + 1, jnp.int32))
            tok.block_until_ready()
            lat.record(time.perf_counter() - t0)
            pos = pos + 1

        final_scores = np.asarray(scores)
        history = np.asarray(history).reshape(B, nb, -1)
        seqs = beam_mod.select_best(history, final_scores, gen)
        return GenerationResult(seqs, lat)

    # -- scoring (accuracy harness) -------------------------------------------

    def _logprob_matrix(self, tokens: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Per-position next-token log-probs [B, S, V] — resident jit or the
        scheduler's streamed scoring pass."""
        cfg = self.cfg
        B, S = tokens.shape
        if self.scheduler is not None:
            return np.asarray(self.scheduler.score_logprobs(tokens, mask, S))
        key = ("score",)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(partial(T.score_logprobs, cfg))
        cache = self._shard_cache(kvc.init_cache(cfg, B, S, jnp.dtype(cfg.dtype)))
        return np.asarray(
            self._compiled[key](self.params, jnp.asarray(tokens), jnp.asarray(mask), cache)
        )

    def loglikelihood(
        self,
        contexts: Sequence[Sequence[int]],
        continuations: Sequence[Sequence[int]],
        pad_id: Optional[int] = None,
    ) -> np.ndarray:
        """Sum log-prob of each continuation given its context (lm-eval
        `loglikelihood`; reference: run_accuracy.py:543-575 BaseLM adapter).
        Returns [B] float64. Works under any placement policy (the scheduler
        provides the scoring pass for tiered/streamed weights)."""
        for b, (c, t) in enumerate(zip(contexts, continuations)):
            if len(t) == 0:
                raise ValueError(f"record {b}: empty continuation")
            if len(c) == 0 and len(t) == 1:
                # one unconditioned token has no previous position to score from
                raise ValueError(
                    f"record {b}: empty context with single-token continuation "
                    "cannot be scored (no conditioning position)"
                )
        return self.score(contexts, continuations, pad_id=pad_id)[0]

    def score(
        self,
        contexts: Sequence[Sequence[int]],
        continuations: Sequence[Sequence[int]],
        pad_id: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """lm-eval `loglikelihood` semantics: (sum log-prob, is_greedy) per record.

        ``is_greedy`` is True when every continuation token is the argmax
        next-token prediction — the flag the harness uses for accuracy metrics
        (reference BaseLM adapter, run_accuracy.py:543-575).
        """
        cfg = self.cfg
        pad_id = cfg.pad_token_id if pad_id is None else pad_id
        full = [list(c) + list(t) for c, t in zip(contexts, continuations)]
        tokens, mask = pack_prompts(full, pad_id=pad_id)
        B, S = tokens.shape
        lp = self._logprob_matrix(tokens, mask)
        ll = np.zeros(B, np.float64)
        greedy = np.ones(B, bool)
        for b, (c, t) in enumerate(zip(contexts, continuations)):
            # tokens are right-aligned: continuation occupies the last len(t) slots
            for j, tok in enumerate(t):
                pos = S - len(t) + j  # slot of this continuation token
                if pos - 1 < 0:
                    continue  # first token of an empty-context record: unscorable
                ll[b] += lp[b, pos - 1, tok]
                if int(np.argmax(lp[b, pos - 1])) != int(tok):
                    greedy[b] = False
        return ll, greedy
