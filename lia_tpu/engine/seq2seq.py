"""Seq2seq (T5) generation engine.

The reference drives ``T5ForConditionalGeneration`` through the same patched HF
``generate`` stack as the decoder-only families
(examples/.../single_instance/run_generation.py MODEL_CLASSES["t5"];
optimize.py:310-326 patches the T5 modules in place). Here the seq2seq loop is
its own small engine: encoder-decoder state is structurally different (fixed
cross-attention K/V + a growing self-attention cache), so bolting it onto
:class:`InferenceEngine`'s decoder-only buckets/policy seams would buy nothing.

TPU shape discipline matches the main engine: encoder inputs bucket to powers
of two (bounded recompiles), the decoder self-cache is preallocated at
``max_new_tokens``, and the whole generation can run as one fused on-device
``lax.scan`` (greedy/sampling) — one dispatch per request, no per-token host
round-trip. Weight tiering/streaming policies are decoder-only features
(the LIA scheduler targets OPT — lia/modeling_opt.py); T5 runs HBM-resident.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig
from lia_tpu.engine.engine import GenerationResult, bucket_length
from lia_tpu.models import t5 as M
from lia_tpu.ops import sampling
from lia_tpu.utils.metrics import LatencyStats


def pack_encoder_inputs(
    prompts: Sequence[Sequence[int]], pad_id: int, bucket: Optional[int] = None
):
    """RIGHT-pad encoder prompts to a bucket (encoder is bidirectional; no
    uniform-write-slot constraint, and HF T5 right-pads)."""
    maxlen = max(len(p) for p in prompts)
    S = bucket or bucket_length(maxlen)
    B = len(prompts)
    tokens = np.full((B, S), pad_id, np.int32)
    mask = np.zeros((B, S), bool)
    for i, p in enumerate(prompts):
        tokens[i, : len(p)] = p
        mask[i, : len(p)] = True
    return tokens, mask


class Seq2SeqEngine:
    """Owns device parameters and the compiled encode/decode functions."""

    def __init__(self, cfg: ModelConfig, params_host: Any, mesh=None):
        """``mesh``: optional jax Mesh — weights TP-shard over the "model" axis
        (the reference's deepspeed AutoTP runner covers t5,
        distributed/run_generation_with_deepspeed.py:50); GSPMD derives the
        post-wo/post-w2 psums from the row-sharded weights."""
        assert cfg.encoder_decoder, "Seq2SeqEngine requires an encoder-decoder config"
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from lia_tpu.parallel.sharding import shard_params

            self.params = shard_params(cfg, params_host, mesh)
        else:
            self.params = jax.device_put(params_host)
        self._encode = jax.jit(partial(M.encode, cfg))
        self._cross_kv = jax.jit(partial(M.cross_kv, cfg))
        self._step = jax.jit(partial(M.decode_step, cfg))
        self._fused = {}

    def _self_cache(self, B: int, T: int):
        """Zero-init decoder self-cache [L, B, N, T, D], mesh-sharded if TP."""
        cfg = self.cfg
        sk = jnp.zeros(
            (cfg.num_layers, B, cfg.num_heads, T, cfg.head_dim), jnp.dtype(cfg.dtype)
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ns = NamedSharding(self.mesh, P(None, None, "model", None, None))
            sk = jax.device_put(sk, ns)
        return sk, sk

    # -- fused on-device generation loop --------------------------------
    def _fused_loop(self, T_new: int, gen: GenerationConfig):
        cfg = self.cfg
        from lia_tpu.engine.engine import _needs_processors

        proc_on = _needs_processors(gen)

        def run(params, enc_mask, cross_k, cross_v, start_tokens, self_k, self_v, seed):
            B = start_tokens.shape[0]
            # processor state over DECODER ids (HF T5: input_ids start at the
            # decoder_start token, so it participates in penalties/ngrams)
            seen0 = jnp.zeros((B, cfg.vocab_size if proc_on else 1), jnp.bool_)
            hist0 = jnp.full((B, T_new + 1 if proc_on else 1), gen.pad_token_id, jnp.int32)
            if proc_on:
                seen0 = sampling.update_seen(seen0, start_tokens[:, 0])
                hist0 = hist0.at[:, 0].set(start_tokens[:, 0])

            def body(carry, step):
                tokens, sk, sv, key, seen, hist = carry
                logits, sk, sv = M.decode_step(
                    cfg, params, tokens, step, sk, sv, cross_k, cross_v, enc_mask
                )
                if proc_on:
                    logits = sampling.process_logits(
                        logits, gen, seen, step, history=hist, cur_len=step + 1
                    )
                key, sub = jax.random.split(key)
                nxt = sampling.sample(logits, sub, gen)[:, None].astype(jnp.int32)
                if proc_on:
                    seen = sampling.update_seen(seen, nxt[:, 0])
                    hist = jax.lax.dynamic_update_slice(hist, nxt, (0, step + 1))
                return (nxt, sk, sv, key, seen, hist), nxt[:, 0]

            key = jax.random.PRNGKey(seed)
            (_, _, _, _, _, _), toks = jax.lax.scan(
                body, (start_tokens, self_k, self_v, key, seen0, hist0),
                jnp.arange(T_new, dtype=jnp.int32),
            )
            return toks.T  # [B, T_new]

        return jax.jit(run)

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig = GenerationConfig(),
        seed: int = 0,
    ) -> GenerationResult:
        """Greedy/sampled seq2seq generation (decoder starts from
        ``decoder_start_token_id`` = pad, HF T5 convention). EOS (</s> = 1 in
        T5 vocab) truncates per-row in post-processing; the fused scan always
        runs ``max_new_tokens`` steps (static shapes)."""
        cfg = self.cfg
        if gen.num_beams > 1:
            raise ValueError("use generate_beam() for num_beams > 1")
        tokens, mask = pack_encoder_inputs(prompts, cfg.pad_token_id)
        B = tokens.shape[0]
        T_new = gen.max_new_tokens
        lat = LatencyStats()

        t0 = time.perf_counter()
        enc_out = self._encode(self.params, jnp.asarray(tokens), jnp.asarray(mask))
        ck, cv = self._cross_kv(self.params, enc_out)

        sk, sv = self._self_cache(B, T_new)
        start = jnp.full((B, 1), cfg.pad_token_id, jnp.int32)  # decoder_start_token

        key = (B, gen, T_new)  # gen is a frozen dataclass: hashable compile key
        if key not in self._fused:
            self._fused[key] = self._fused_loop(T_new, gen)
        toks = self._fused[key](
            self.params, jnp.asarray(mask), ck, cv, start, sk, sv, seed
        )
        out = np.asarray(toks)
        lat.record(time.perf_counter() - t0)

        if gen.eos_token_id is not None:  # truncate after first EOS per row
            for b in range(B):
                hits = np.flatnonzero(out[b] == gen.eos_token_id)
                if hits.size:
                    out[b, hits[0] + 1:] = gen.pad_token_id
        return GenerationResult(sequences=out, latency=lat)

    # -- beam search ------------------------------------------------------
    def _beam_loop(self, T_new: int, gen: GenerationConfig, nb: int):
        cfg = self.cfg
        from lia_tpu.engine import beam as beam_mod

        from lia_tpu.engine.engine import _needs_processors

        proc_on = _needs_processors(gen)

        def run(params, enc_mask, ck, cv, sk, sv, seed):
            Bnb = enc_mask.shape[0]
            B = Bnb // nb
            key = jax.random.PRNGKey(seed)
            start = jnp.full((Bnb, 1), cfg.pad_token_id, jnp.int32)
            logits, sk, sv = M.decode_step(
                cfg, params, start, jnp.int32(0), sk, sv, ck, cv, enc_mask
            )
            scores, finished = beam_mod.init_beam_state(B, nb)
            proc = None
            if proc_on:
                seen0 = sampling.update_seen(
                    jnp.zeros((Bnb, cfg.vocab_size), jnp.bool_), start[:, 0]
                )
                phist0 = jnp.full((Bnb, T_new + 1), gen.pad_token_id, jnp.int32)
                phist0 = phist0.at[:, 0].set(start[:, 0])
                proc = (seen0, phist0, jnp.int32(1), 0)
            key, sub = jax.random.split(key)
            tok, scores, finished, src = beam_mod.beam_select(
                gen, cfg.vocab_size, logits, scores, finished,
                sub if gen.do_sample else None, proc=proc,
            )
            proc = beam_mod.reorder_proc(proc, src, tok)
            sk = jnp.take(sk, src, axis=1)
            sv = jnp.take(sv, src, axis=1)
            history = jnp.full((Bnb, T_new), gen.pad_token_id, jnp.int32)
            history = history.at[:, 0].set(tok)
            if not proc_on:  # constant-structure scan carry
                proc = (jnp.zeros((Bnb, 1), jnp.bool_), jnp.zeros((Bnb, 1), jnp.int32),
                        jnp.int32(0), 0)

            def step(carry, i):
                tok, sk, sv, scores, finished, history, key, proc = carry
                logits, sk, sv = M.decode_step(
                    cfg, params, tok[:, None], i, sk, sv, ck, cv, enc_mask
                )
                key, sub = jax.random.split(key)
                ntok, scores, finished, src = beam_mod.beam_select(
                    gen, cfg.vocab_size, logits, scores, finished,
                    sub if gen.do_sample else None,
                    proc=proc if proc_on else None,
                )
                if proc_on:
                    proc = beam_mod.reorder_proc(proc, src, ntok)
                sk = jnp.take(sk, src, axis=1)
                sv = jnp.take(sv, src, axis=1)
                history = jnp.take(history, src, axis=0)
                history = jax.lax.dynamic_update_slice(history, ntok[:, None], (0, i))
                return (ntok, sk, sv, scores, finished, history, key, proc), None

            (tok, sk, sv, scores, finished, history, key, proc), _ = jax.lax.scan(
                step, (tok, sk, sv, scores, finished, history, key, proc),
                jnp.arange(1, T_new, dtype=jnp.int32),
            )
            return history.reshape(B, nb, T_new), scores

        return jax.jit(run)

    def generate_beam(
        self,
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig,
        seed: int = 0,
    ) -> GenerationResult:
        """Seq2seq beam search (+ Gumbel-top-k stochastic beams when
        ``do_sample`` — the reference patches `_beam_search`/`_beam_sample`
        for T5 like the decoder-only families). Encoder state is computed at
        batch B and repeated across beams; the self-cache reorders with the
        winning beams each step (same zero-copy gather as the decoder-only
        engine)."""
        cfg = self.cfg
        nb = gen.num_beams
        tokens, mask = pack_encoder_inputs(prompts, cfg.pad_token_id)
        B = tokens.shape[0]
        T_new = gen.max_new_tokens
        lat = LatencyStats()

        t0 = time.perf_counter()
        enc_out = self._encode(self.params, jnp.asarray(tokens), jnp.asarray(mask))
        ck, cv = self._cross_kv(self.params, enc_out)
        ck = jnp.repeat(ck, nb, axis=1)  # [L, B*nb, N, S, D]
        cv = jnp.repeat(cv, nb, axis=1)
        enc_mask = jnp.repeat(jnp.asarray(mask), nb, axis=0)

        sk, sv = self._self_cache(B * nb, T_new)

        key = ("beam", B, gen, T_new)
        if key not in self._fused:
            self._fused[key] = self._beam_loop(T_new, gen, nb)
        from lia_tpu.engine.beam import select_best

        history, scores = self._fused[key](self.params, enc_mask, ck, cv, sk, sv, seed)
        out = select_best(np.asarray(history), np.asarray(scores), gen)
        lat.record(time.perf_counter() - t0)
        if gen.eos_token_id is not None:
            for b in range(B):
                hits = np.flatnonzero(out[b] == gen.eos_token_id)
                if hits.size:
                    out[b, hits[0] + 1:] = gen.pad_token_id
        return GenerationResult(sequences=out, latency=lat)

    def score(self, contexts, continuations):
        """lm-eval ``loglikelihood`` for seq2seq (reference run_accuracy.py
        covers t5 with the same semantics): encode the context, teacher-force
        the decoder over the continuation, return (sum log-prob, is_greedy)
        per record."""
        cfg = self.cfg
        B = len(contexts)
        assert len(continuations) == B
        tokens, mask = pack_encoder_inputs(contexts, pad_id=cfg.pad_token_id)
        enc_out = self._encode(self.params, jnp.asarray(tokens), jnp.asarray(mask))
        ck, cv = self._cross_kv(self.params, enc_out)

        T = max(len(c) for c in continuations)
        dec_in = np.full((B, T), cfg.pad_token_id, np.int32)  # start token = pad
        tgt = np.full((B, T), -1, np.int64)
        for b, c in enumerate(continuations):
            if len(c) == 0:
                raise ValueError(f"record {b}: empty continuation")
            dec_in[b, 1 : len(c)] = c[:-1]
            tgt[b, : len(c)] = c

        sk, sv = self._self_cache(B, T)
        logl = np.zeros((B,), np.float64)
        greedy_ok = np.ones((B,), bool)
        for t in range(T):
            logits, sk, sv = self._step(
                self.params, jnp.asarray(dec_in[:, t : t + 1]), jnp.int32(t),
                sk, sv, ck, cv, jnp.asarray(mask),
            )
            lp = np.asarray(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            )
            am = np.argmax(lp, axis=-1)
            for b in range(B):
                if tgt[b, t] >= 0:
                    logl[b] += lp[b, tgt[b, t]]
                    greedy_ok[b] &= am[b] == tgt[b, t]
        return logl, greedy_ok

    def loglikelihood(self, contexts, continuations) -> np.ndarray:
        return self.score(contexts, continuations)[0]
