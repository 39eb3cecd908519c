"""Beam search over the preallocated KV cache.

Parity surface: the reference's ``_beam_search`` (intel_extension_for_pytorch/
transformers/generation/beam_search.py, 494 LoC) whose distinguishing feature is the
beam-idx-aware KV reorder without copying past tokens (the iakv ``beam_idx`` table).
Here the reorder is :func:`lia_tpu.ops.kv_cache.beam_reorder` — a batched gather XLA
executes as an HBM-local shuffle inside the jitted step, so the decode kernel stays
indirection-free.

Classic beam search: beams expand over top-k(nb·V); finished beams are frozen (they
can only emit pad at score 0 delta). Scores are summed token log-probs.
``_beam_sample`` parity (stochastic beams) uses the Gumbel-top-k trick: candidate
scores are perturbed with Gumbel noise before the top-k, which draws beams without
replacement from the softmax distribution while exact scores keep accumulating.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from lia_tpu.config import GenerationConfig, ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import kv_cache as kvc

NEG_INF = -1e30


def select_best(history: "np.ndarray", scores: "np.ndarray", gen: GenerationConfig):
    """Final beam selection [B, nb, L] × [B, nb] → [B, L] sequences.

    ``gen.length_penalty`` != 0 applies HF BeamSearchScorer's normalization
    (score / len**lp, len = tokens through the first EOS) — rank-neutral when
    every beam runs the full length."""
    import numpy as np

    B = scores.shape[0]
    if gen.length_penalty != 0.0:
        L = history.shape[-1]
        if gen.eos_token_id is not None:
            hits = history == gen.eos_token_id
            lens = np.where(hits.any(-1), hits.argmax(-1) + 1, L)
        else:
            lens = np.full(scores.shape, L)
        scores = scores / np.maximum(lens, 1) ** gen.length_penalty
    best = scores.argmax(axis=1)
    return history[np.arange(B), best]


def init_beam_state(B: int, nb: int):
    scores = jnp.full((B, nb), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    finished = jnp.zeros((B, nb), bool)
    return scores, finished


def beam_select(
    gen: GenerationConfig,
    vocab_size: int,
    logits: jnp.ndarray,  # [B*nb, V] this step's logits
    scores: jnp.ndarray,  # [B, nb]
    finished: jnp.ndarray,  # [B, nb]
    rng: jnp.ndarray | None = None,  # PRNG key => stochastic beams (_beam_sample)
    proc: tuple | None = None,  # (seen [B*nb,V], hist [B*nb,L], cur_len, n_gen)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beam expansion math shared by the fused resident scan and the
    scheduler's stepwise loop. Returns (next_tok [B*nb], scores, finished,
    flat_src [B*nb] — source batch row per winner).

    ``proc`` carries per-beam logits-processor state; HF beam_search applies
    its LogitsProcessorList to the LOG-SOFTMAX scores (not raw logits), so the
    repetition penalty always multiplies (scores <= 0) — matched here by
    processing after the softmax."""
    from lia_tpu.ops import sampling

    B, nb = scores.shape
    V = vocab_size
    if gen.do_sample and gen.temperature != 1.0:
        logits = logits / jnp.maximum(gen.temperature, 1e-6)
    lp_flat = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if proc is not None:
        seen, hist, cur_len, n_gen = proc
        lp_flat = sampling.process_logits(
            lp_flat, gen, seen, n_gen, history=hist, cur_len=cur_len
        )
    logprobs = lp_flat.reshape(B, nb, V)

    if gen.eos_token_id is not None:
        # frozen beams may only emit pad with no score change
        pad_only = jnp.full((V,), NEG_INF).at[gen.pad_token_id].set(0.0)
        logprobs = jnp.where(finished[:, :, None], pad_only[None, None, :], logprobs)

    total = scores[:, :, None] + logprobs  # [B, nb, V]
    flat = total.reshape(B, nb * V)
    select = flat
    if rng is not None and gen.do_sample:
        # Gumbel-top-k: sample nb candidates without replacement
        g = -jnp.log(-jnp.log(jax.random.uniform(rng, flat.shape, minval=1e-20, maxval=1.0)))
        select = flat + g
    _, idx = jax.lax.top_k(select, nb)  # [B, nb]
    new_scores = jnp.take_along_axis(flat, idx, axis=1)
    beam_src = (idx // V).astype(jnp.int32)  # which beam each winner came from
    next_tok = (idx % V).astype(jnp.int32)
    base = (jnp.arange(B, dtype=jnp.int32) * nb)[:, None]
    flat_src = (base + beam_src).reshape(-1)

    if gen.eos_token_id is not None:
        finished = jnp.take_along_axis(finished, beam_src, axis=1) | (
            next_tok == gen.eos_token_id
        )
    return next_tok.reshape(-1), new_scores, finished, flat_src


def beam_step(
    cfg: ModelConfig,
    gen: GenerationConfig,
    params,
    tokens: jnp.ndarray,  # [B*nb] current tokens to feed
    positions: jnp.ndarray,  # [B*nb]
    cache: kvc.KVCache,  # batch axis = B*nb
    scores: jnp.ndarray,  # [B, nb]
    finished: jnp.ndarray,  # [B, nb]
    rng: jnp.ndarray | None = None,  # PRNG key => stochastic beams (_beam_sample)
    proc: tuple | None = None,
) -> Tuple[jnp.ndarray, kvc.KVCache, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One expansion step. Returns (next_tokens, cache, scores, finished,
    beam_src, proc) — processor state reordered with the winning beams and
    updated with the fresh tokens.

    ``cache`` may be a plain :class:`~lia_tpu.ops.kv_cache.KVCache` (expanded
    batch, whole-cache gather on reorder — the golden path) or a
    :class:`~lia_tpu.ops.kv_cache.BeamKVCache` (shared prompt + per-beam tail;
    reorder gathers only the tail — the production path)."""
    from lia_tpu.ops import sampling

    grouped = isinstance(cache, kvc.BeamKVCache)
    if grouped:
        logits, cache = T.beam_decode_step(
            cfg, params, tokens[:, None], positions[:, None], cache
        )
    else:
        logits, cache = T.decode_step(
            cfg, params, tokens[:, None], positions[:, None], cache
        )
    next_tok, new_scores, finished, flat_src = beam_select(
        gen, cfg.vocab_size, logits, scores, finished, rng, proc=proc
    )
    cache = (
        kvc.beam_tail_reorder(cache, flat_src)
        if grouped
        else kvc.beam_reorder(cache, flat_src)
    )
    proc = reorder_proc(proc, flat_src, next_tok)
    return next_tok, cache, new_scores, finished, flat_src, proc


def reorder_proc(proc: tuple | None, flat_src: jnp.ndarray, next_tok: jnp.ndarray):
    """Gather processor state rows by the winning beams and record the fresh
    tokens (seen-set, ngram history at ``cur_len``)."""
    from lia_tpu.ops import sampling

    if proc is None:
        return None
    seen, hist, cur_len, n_gen = proc
    seen = sampling.update_seen(jnp.take(seen, flat_src, axis=0), next_tok)
    hist = jnp.take(hist, flat_src, axis=0)
    hist = jax.lax.dynamic_update_slice(hist, next_tok[:, None], (0, cur_len))
    return (seen, hist, cur_len + 1, n_gen + 1)


def make_beam_decoder(cfg: ModelConfig, gen: GenerationConfig, num_steps: int):
    """Jittable fused beam decode: scans `beam_step`, tracking token history.

    With ``gen.do_sample`` the scan is the ``_beam_sample`` variant (per-step
    Gumbel perturbation from a split PRNG key)."""

    from lia_tpu.engine.engine import _needs_processors

    proc_on = _needs_processors(gen)

    def fused(params, tok0, pos0, cache, scores0, finished0, rng0,
              seen0, phist0, cur_len0):
        B_nb = tok0.shape[0]
        # history[i] = i-th generated token; reordered with the beams every step
        history0 = jnp.full((B_nb, num_steps + 1), gen.pad_token_id, jnp.int32)
        history0 = history0.at[:, 0].set(tok0)

        def step(carry, i):
            tok, pos, cache, scores, finished, history, rng, seen, phist = carry
            rng, sub = jax.random.split(rng)
            proc = (seen, phist, cur_len0 + i, i + 1) if proc_on else None
            ntok, cache, scores, finished, src, proc = beam_step(
                cfg, gen, params, tok, pos, cache, scores, finished,
                rng=sub if gen.do_sample else None, proc=proc,
            )
            if proc_on:
                seen, phist = proc[0], proc[1]
            history = jnp.take(history, src, axis=0)  # reorder past tokens too
            history = jax.lax.dynamic_update_slice(history, ntok[:, None], (0, i + 1))
            return (ntok, pos + 1, cache, scores, finished, history, rng, seen, phist), None

        (tok, pos, cache, scores, finished, history, rng, seen, phist), _ = jax.lax.scan(
            step,
            (tok0, pos0, cache, scores0, finished0, history0, rng0, seen0, phist0),
            jnp.arange(num_steps),
        )
        return history, scores

    return fused
