"""Prompt-lookup speculative decoding (draft-model-free self-speculation).

Additive over the reference (LIA/IPEX ship no speculative decoding): each step
proposes ``k`` tokens by matching the sequence's trailing ``ngram`` against its
OWN history (prompt + generated — "prompt lookup decoding", the scheme
vLLM/TGI ship for code/RAG workloads where output repeats input), then verifies
all ``k+1`` positions in ONE chunked forward over the KV cache and accepts the
longest exactly-matching prefix plus the bonus token.

Greedy-exactness: a proposal is accepted only when it equals the model's own
argmax at that position, so the emitted sequence is exactly what stepwise
greedy decoding produces (same attention code path as chunked prefill) — the
speculation only changes how many forward passes it takes. Worst case (no
n-gram hits) every step still yields 1 token, i.e. plain decode.

TPU-shaped: the verify step is a single jitted program with static chunk width
``k+1`` — per-sequence raggedness lives in the cache ([B] lengths, the
continuous-batching machinery), and acceptance is a tiny host-side compare.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import attention as att
from lia_tpu.ops import kv_cache as kvc


def propose_ngram(history: List[int], ngram: int, k: int, pad_id: int) -> List[int]:
    """Propose k continuation tokens by matching the trailing n-gram against
    the sequence's own history; pad-fill when there's no match (a padded
    proposal simply fails verification — never changes output)."""
    h = history
    for n in range(min(ngram, len(h) - 1), 0, -1):
        tail = h[-n:]
        # most recent earlier occurrence wins (vLLM's prompt-lookup heuristic)
        for i in range(len(h) - n - 1, -1, -1):
            if h[i : i + n] == tail:
                cand = h[i + n : i + n + k]
                if cand:
                    return (cand + [pad_id] * k)[:k]
        # fall through to a shorter n-gram only if nothing matched
    return [pad_id] * k


def _reject_processors(gen: GenerationConfig) -> None:
    """Speculation verifies against raw model argmax/distributions; stateful
    logits processors would break the exactness guarantee silently."""
    from lia_tpu.engine.engine import _needs_processors

    if _needs_processors(gen):
        raise NotImplementedError(
            "repetition_penalty/min_new_tokens/no_repeat_ngram_size are not "
            "wired into speculative decoding — use engine.generate for "
            "processor-bearing requests"
        )


def _verify_fn(cfg: ModelConfig):
    """Jitted verify pass: run C = k+1 chunk tokens per sequence over the
    ragged cache (write-then-attend at per-sequence bases), return per-position
    logits. Cache K/V planes come back with the chunk written; mask/length are
    advanced later by the accepted amount only."""

    def f(params, tokens, positions, cache):
        B, C = tokens.shape
        x = T.embed(cfg, params, tokens, positions)
        base = cache.length  # [B]
        ones = jnp.ones((C,), jnp.bool_)
        slot_mask = jax.vmap(
            lambda row, p: jax.lax.dynamic_update_slice(row, ones, (p,))
        )(cache.mask, base)
        bias = att.alibi_slot_bias(cfg.num_heads, slot_mask) if cfg.alibi else None

        def body(h, per_layer):
            lp, kl, vl = per_layer
            residual = h
            q, k, v = T.attn_in(cfg, lp, h, positions)
            kl, vl = kvc.update_layer(kl, vl, k, v, base)  # ragged write
            attn_out = att.attend_prefill_cached(
                q, kl, vl, base, slot_mask, cfg.sliding_window, bias=bias
            )
            h = T.attn_post_mlp(cfg, lp, residual, attn_out)
            return h, (kl, vl)

        x, (k_new, v_new) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v)
        )
        cache = cache._replace(k=k_new, v=v_new)
        logits = T.lm_head(cfg, params, x)  # [B, C, V]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    return jax.jit(f, donate_argnums=(3,))


def _accept_fn():
    """Jitted acceptance/advance: mark the accepted chunk prefix valid."""

    def f(cache, accept):  # accept: [B] — tokens accepted INCLUDING the pending one
        B, S_max = cache.mask.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_max), 1)
        lo = cache.length[:, None]
        hi = (cache.length + accept)[:, None]
        mask = cache.mask | ((pos >= lo) & (pos < hi))
        return cache._replace(mask=mask, length=cache.length + accept)

    return jax.jit(f, donate_argnums=(0,))


def _make_verify(engine, tokens, mask, max_len: int, C: int):
    """Prefill + (verify_step, advance_accept) closures over either the
    resident slab cache or the streaming scheduler's segment caches.

    Under TIERING the verify pass is speculation's biggest win: each streamed
    layer's weights transfer once per C = k+1 candidate tokens instead of once
    per token, so streamed decode's dominant cost drops by the acceptance
    factor (scheduler.verify_pass). TPU-KV plans only — host-placement
    policies raise there."""
    cfg = engine.cfg
    B = tokens.shape[0]
    sched = engine.scheduler
    if sched is not None:
        if not sched.tpu_kv_plans:
            # reject BEFORE the (possibly expensive streamed) prefill runs —
            # verify_pass would raise the same afterwards (ADVICE r4)
            raise NotImplementedError(
                "the chunked verify pass needs TPU-KV streaming plans; "
                "host-placement policies have no chunk attention kernel"
            )
        logits, state_0 = sched.prefill_pass(tokens, mask, max_len)
        pending = np.array(jnp.argmax(logits, -1).astype(jnp.int32))
        holder = {"state": sched.ragged_state(state_0)}

        def verify_step(chunk, positions):
            greedy, holder["state"] = sched.verify_pass(
                jnp.asarray(chunk), jnp.asarray(positions), holder["state"]
            )
            return np.asarray(greedy)

        def advance_accept(accept):
            holder["state"] = sched.accept_state(holder["state"], jnp.asarray(accept))

        return verify_step, advance_accept, pending

    cache = kvc.init_cache(
        cfg, B, max_len, jnp.dtype(cfg.dtype),
        quantized=engine.runtime.quant.kv_cache_dtype == "int8",
    )
    logits, cache = engine._get_prefill()(
        engine.params, jnp.asarray(tokens), jnp.asarray(mask), cache
    )
    pending = np.array(jnp.argmax(logits, -1).astype(jnp.int32))
    # ragged mode: per-sequence slot lengths and logical positions
    cache = cache._replace(length=jnp.full((B,), int(cache.length), jnp.int32))
    holder = {"cache": cache}
    verify = engine._compiled.setdefault(("spec_verify", C), _verify_fn(cfg))
    advance = engine._compiled.setdefault("spec_advance", _accept_fn())

    def verify_step(chunk, positions):
        greedy, holder["cache"] = verify(
            engine.params, jnp.asarray(chunk), jnp.asarray(positions), holder["cache"]
        )
        return np.asarray(greedy)

    def advance_accept(accept):
        holder["cache"] = advance(holder["cache"], jnp.asarray(accept))

    return verify_step, advance_accept, pending


def generate_prompt_lookup(
    engine,
    prompts: Sequence[Sequence[int]],
    gen: GenerationConfig,
    ngram: int = 3,
    k: int = 4,
):
    """Greedy generation with prompt-lookup speculation.

    Returns ``(sequences [B, max_new_tokens] np.ndarray, n_verify_steps)`` —
    the sequences equal :meth:`InferenceEngine.generate`'s greedy output; the
    step count is the speedup evidence (steps < max_new_tokens whenever
    proposals land).
    """
    from lia_tpu.engine.engine import pack_prompts

    if gen.do_sample or gen.num_beams > 1:
        raise NotImplementedError("prompt-lookup speculation is greedy-only")
    _reject_processors(gen)

    cfg = engine.cfg
    tokens, mask = pack_prompts(prompts, gen.pad_token_id)
    B, S = tokens.shape
    C = k + 1
    max_len = -(-(S + gen.max_new_tokens + C) // 128) * 128
    verify_step, advance_accept, pending = _make_verify(
        engine, tokens, mask, max_len, C
    )
    n_real = mask.sum(1).astype(np.int32)  # logical position of the pending token

    history = [list(p) + [int(pending[b])] for b, p in enumerate(prompts)]
    out: List[List[int]] = [[int(pending[b])] for b in range(B)]
    done = [gen.eos_token_id is not None and out[b][0] == gen.eos_token_id
            for b in range(B)]

    steps = 0
    while any(not done[b] and len(out[b]) < gen.max_new_tokens for b in range(B)):
        props = np.stack([
            propose_ngram(history[b], ngram, k, gen.pad_token_id) for b in range(B)
        ]).astype(np.int32)  # [B, k]
        chunk = np.concatenate([pending[:, None], props], axis=1)  # [B, C]
        positions = n_real[:, None] + np.arange(C, dtype=np.int32)[None, :]
        greedy = verify_step(chunk, positions)  # [B, C]: [b, i] follows chunk[b, i]
        steps += 1

        accept = np.zeros((B,), np.int32)
        for b in range(B):
            if done[b] or len(out[b]) >= gen.max_new_tokens:
                continue  # done: freeze this sequence (cache scratch-only)
            a = 0
            while a < k and props[b, a] == greedy[b, a]:
                a += 1
            accept[b] = a + 1  # pending token + a verified proposals
            # = a accepted proposals + the bonus token (the model's argmax)
            new_toks = [int(t) for t in chunk[b, 1 : a + 1]] + [int(greedy[b, a])]
            if gen.eos_token_id is not None and gen.eos_token_id in new_toks:
                # truncate after the first EOS; row freezes (its later cache
                # slots become scratch, never read again)
                new_toks = new_toks[: new_toks.index(gen.eos_token_id) + 1]
                done[b] = True
            out[b].extend(new_toks)
            history[b].extend(new_toks)
            pending[b] = new_toks[-1]
        n_real = n_real + accept
        advance_accept(accept)

    pad = gen.pad_token_id
    seqs = np.stack([
        np.asarray((o + [pad] * gen.max_new_tokens)[: gen.max_new_tokens], np.int32)
        for o in out
    ])
    return seqs, steps


# ---------------------------------------------------------------------------
# Draft-model speculation (two-model): a small registry model proposes k
# tokens autoregressively; the target verifies all k+1 positions in the same
# single chunked forward used by prompt lookup. Greedy-exact like prompt
# lookup (additive over the reference — LIA/IPEX ship no speculation).
# ---------------------------------------------------------------------------


def _draft_loop_fn(cfg: ModelConfig, k: int):
    """Jitted draft pass: k+1 ragged decode steps in one lax.scan.

    Feeds [pending, p1, …, pk] (the final feed writes p_k's KV so the draft
    cache covers every possibly-accepted token; its logits are discarded) and
    emits proposals [B, k]. The cache advances k+1 slots — the caller rewinds
    it to the verified prefix afterwards."""

    def f(params, pending, n_real, cache, active=None):  # pending/n_real: [B]
        B = pending.shape[0]
        if active is None:  # batch mode: every row drafts (serving passes the
            active = jnp.ones((B,), jnp.bool_)  # live slot mask instead)

        def body(carry, i):
            tok, c = carry
            logits, c = T.decode_step_ragged(cfg, params, tok[:, None], n_real + i, c, active)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, c), nxt

        (_, cache), props = jax.lax.scan(
            body, (pending, cache), jnp.arange(k + 1, dtype=jnp.int32)
        )
        return props[:k].T, cache  # [B, k]

    return jax.jit(f, donate_argnums=(3,))


def _rewind_fn():
    """Jitted draft-cache rewind: drop speculative slots past the verified
    prefix (validity is contiguous, so masking pos < new_length suffices)."""

    def f(cache, new_length):  # [B]
        B, S_max = cache.mask.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_max), 1)
        mask = cache.mask & (pos < new_length[:, None])
        return cache._replace(mask=mask, length=new_length)

    return jax.jit(f, donate_argnums=(0,))


def generate_draft_speculative(
    engine,
    draft_engine,
    prompts: Sequence[Sequence[int]],
    gen: GenerationConfig,
    k: int = 4,
):
    """Greedy generation with a draft model proposing k tokens per verify pass.

    ``draft_engine`` must share the target's tokenizer/vocab (e.g. opt-125m
    drafting for opt-6.7b). Returns ``(sequences, n_verify_steps)`` with
    sequences exactly equal to the target's stepwise greedy output.
    """
    from lia_tpu.engine.engine import pack_prompts

    if gen.do_sample or gen.num_beams > 1:
        raise NotImplementedError("draft speculation is greedy-only")
    _reject_processors(gen)
    if draft_engine.scheduler is not None:
        # the draft is the SMALL model — keep it resident; only the target
        # streams (tiered target verify composes via scheduler.verify_pass)
        raise NotImplementedError("the draft model must be resident")
    if draft_engine.cfg.vocab_size != engine.cfg.vocab_size:
        # the on-device acceptance math subtracts q from p elementwise, so the
        # warped distributions must live over the SAME vocab (the greedy path
        # only needs draft ⊇ target)
        raise ValueError("sampled speculation requires draft vocab == target vocab")

    cfg = engine.cfg
    dcfg = draft_engine.cfg
    tokens, mask = pack_prompts(prompts, gen.pad_token_id)
    B, S = tokens.shape
    C = k + 1
    max_len = -(-(S + gen.max_new_tokens + C) // 128) * 128

    verify_step, advance_accept, pending = _make_verify(
        engine, tokens, mask, max_len, C
    )

    dcache = kvc.init_cache(
        dcfg, B, max_len, jnp.dtype(dcfg.dtype),
        quantized=draft_engine.runtime.quant.kv_cache_dtype == "int8",
    )
    _, dcache = draft_engine._get_prefill()(
        draft_engine.params, jnp.asarray(tokens), jnp.asarray(mask), dcache
    )
    dcache = dcache._replace(length=jnp.full((B,), int(dcache.length), jnp.int32))

    n_real = mask.sum(1).astype(np.int32)
    abs_len = np.full((B,), S, np.int32)  # absolute draft-cache write slot
    out: List[List[int]] = [[int(pending[b])] for b in range(B)]
    done = [gen.eos_token_id is not None and out[b][0] == gen.eos_token_id
            for b in range(B)]

    draft_loop = draft_engine._compiled.setdefault(
        ("spec_draft", k), _draft_loop_fn(dcfg, k)
    )
    rewind = draft_engine._compiled.setdefault("spec_rewind", _rewind_fn())

    steps = 0
    while any(not done[b] and len(out[b]) < gen.max_new_tokens for b in range(B)):
        props, dcache = draft_loop(
            draft_engine.params, jnp.asarray(pending), jnp.asarray(n_real), dcache
        )
        props = np.asarray(props)  # [B, k]
        chunk = np.concatenate([pending[:, None], props], axis=1)  # [B, C]
        positions = n_real[:, None] + np.arange(C, dtype=np.int32)[None, :]
        greedy = verify_step(chunk, positions)
        steps += 1

        accept = np.zeros((B,), np.int32)
        for b in range(B):
            if done[b] or len(out[b]) >= gen.max_new_tokens:
                continue
            a = 0
            while a < k and props[b, a] == greedy[b, a]:
                a += 1
            accept[b] = a + 1
            new_toks = [int(t) for t in chunk[b, 1 : a + 1]] + [int(greedy[b, a])]
            if gen.eos_token_id is not None and gen.eos_token_id in new_toks:
                new_toks = new_toks[: new_toks.index(gen.eos_token_id) + 1]
                done[b] = True
            out[b].extend(new_toks)
            pending[b] = new_toks[-1]
        n_real = n_real + accept
        abs_len = abs_len + accept
        advance_accept(accept)
        dcache = rewind(dcache, jnp.asarray(abs_len))

    pad = gen.pad_token_id
    seqs = np.stack([
        np.asarray((o + [pad] * gen.max_new_tokens)[: gen.max_new_tokens], np.int32)
        for o in out
    ])
    return seqs, steps


# ---------------------------------------------------------------------------
# Sampled draft speculation (Leviathan et al. acceptance sampling): proposals
# are SAMPLED from the draft's warped distribution; each is accepted with
# probability min(1, p(x)/q(x)) against the target's warped distribution, and
# the first rejection resamples from the residual max(p − q, 0). The output
# distribution provably equals plain target sampling (same temperature /
# top-k / top-p warp on both models).
# ---------------------------------------------------------------------------


def _draft_loop_sampled_fn(cfg: ModelConfig, k: int, gen: GenerationConfig):
    """Like :func:`_draft_loop_fn` but samples proposals and also returns the
    draft's warped distributions q [B, k, V] (needed for acceptance ratios and
    residual resampling)."""
    from lia_tpu.ops import sampling

    def f(params, pending, n_real, cache, key, active=None):
        B = pending.shape[0]
        if active is None:  # batch mode: every row drafts (serving passes the
            active = jnp.ones((B,), jnp.bool_)  # live slot mask instead)

        def body(carry, i):
            tok, c, key = carry
            logits, c = T.decode_step_ragged(cfg, params, tok[:, None], n_real + i, c, active)
            q = sampling.warped_probs(logits, gen)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(
                sub, sampling.warp_logits(logits, gen), axis=-1
            ).astype(jnp.int32)
            return (nxt, c, key), (nxt, q)

        (_, cache, _), (props, qs) = jax.lax.scan(
            body, (pending, cache, key), jnp.arange(k + 1, dtype=jnp.int32)
        )
        return props[:k].T, qs[:k].transpose(1, 0, 2), cache  # [B,k], [B,k,V]

    return jax.jit(f, donate_argnums=(3,))


def _verify_sampled_fn(cfg: ModelConfig, gen: GenerationConfig):
    """Like :func:`_verify_fn` but returns the target's warped distributions
    p [B, C, V] instead of argmaxes."""
    from lia_tpu.ops import sampling

    def g(params, tokens, positions, cache):
        B, C = tokens.shape
        x = T.embed(cfg, params, tokens, positions)
        base = cache.length
        ones = jnp.ones((C,), jnp.bool_)
        slot_mask = jax.vmap(
            lambda row, p: jax.lax.dynamic_update_slice(row, ones, (p,))
        )(cache.mask, base)
        bias = att.alibi_slot_bias(cfg.num_heads, slot_mask) if cfg.alibi else None

        def body(h, per_layer):
            lp, kl, vl = per_layer
            residual = h
            q, kk, vv = T.attn_in(cfg, lp, h, positions)
            kl, vl = kvc.update_layer(kl, vl, kk, vv, base)
            attn_out = att.attend_prefill_cached(
                q, kl, vl, base, slot_mask, cfg.sliding_window, bias=bias
            )
            h = T.attn_post_mlp(cfg, lp, residual, attn_out)
            return h, (kl, vl)

        x, (k_new, v_new) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v)
        )
        cache = cache._replace(k=k_new, v=v_new)
        logits = T.lm_head(cfg, params, x)  # [B, C, V]
        return sampling.warped_probs(logits, gen), cache

    return jax.jit(g, donate_argnums=(3,))


def _sampled_accept_fn(k: int):
    """Jitted vectorized acceptance: leading-accept counts + the one extra
    token (residual resample on first rejection, bonus sample on full accept).

    Keeps the [B, k, V] draft / [B, k+1, V] target distributions ON DEVICE —
    only [B]-sized accept counts and tokens cross to the host (the full-dist
    ship would cost ~15 MB per verify pass at a 50k vocab through the relay).
    """

    def f(props, qs, ps, key):  # [B, k] int32, [B, k, V], [B, k+1, V]
        B, _, V = qs.shape
        key_u, key_r = jax.random.split(key)
        u = jax.random.uniform(key_u, (B, k))
        bidx = jnp.arange(B)[:, None]
        kidx = jnp.arange(k)[None, :]
        px = ps[bidx, kidx, props]
        qx = qs[bidx, kidx, props]
        acc = u < px / jnp.maximum(qx, 1e-20)  # [B, k]
        a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)  # [B]
        # extra token: residual max(p_a − q_a, 0) when a < k, else bonus ~ p_k
        pa = jnp.take_along_axis(ps, a[:, None, None], axis=1)[:, 0]  # [B, V]
        qa = jnp.take_along_axis(qs, jnp.minimum(a, k - 1)[:, None, None], axis=1)[:, 0]
        qa = jnp.where((a < k)[:, None], qa, 0.0)
        residual = jnp.maximum(pa - qa, 0.0)
        ssum = jnp.sum(residual, axis=1, keepdims=True)
        dist = jnp.where(
            ssum > 0, residual / jnp.maximum(ssum, 1e-20),
            pa / jnp.maximum(jnp.sum(pa, 1, keepdims=True), 1e-20),
        )
        extra = jax.random.categorical(
            key_r, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1
        )
        return a.astype(jnp.int32), extra.astype(jnp.int32)

    return jax.jit(f)


def _lookup_accept_fn(k: int):
    """Jitted acceptance for DETERMINISTIC proposals (prompt lookup): the
    draft distribution is a point mass at the proposed token, so the Leviathan
    rule reduces to accept-with-probability ``p(x)`` and the residual on first
    rejection is ``p`` with the rejected token zeroed out (still provably
    target-distributed). Distributions stay on device; only [B] counts/tokens
    return to the host."""

    def f(props, ps, key):  # [B, k] int32, [B, k+1, V] target warped probs
        B, _, V = ps.shape
        key_u, key_r = jax.random.split(key)
        u = jax.random.uniform(key_u, (B, k))
        bidx = jnp.arange(B)[:, None]
        kidx = jnp.arange(k)[None, :]
        px = ps[bidx, kidx, props]
        acc = u < px  # q(x) == 1 for the proposed token
        a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)  # [B]
        pa = jnp.take_along_axis(ps, a[:, None, None], axis=1)[:, 0]  # [B, V]
        rej = jnp.take_along_axis(props, jnp.minimum(a, k - 1)[:, None], axis=1)[:, 0]
        drop = (a < k)[:, None] & (
            jax.lax.broadcasted_iota(jnp.int32, (B, V), 1) == rej[:, None]
        )
        residual = jnp.where(drop, 0.0, pa)
        ssum = jnp.sum(residual, axis=1, keepdims=True)
        dist = jnp.where(
            ssum > 0, residual / jnp.maximum(ssum, 1e-20),
            pa / jnp.maximum(jnp.sum(pa, 1, keepdims=True), 1e-20),
        )
        extra = jax.random.categorical(
            key_r, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1
        )
        return a.astype(jnp.int32), extra.astype(jnp.int32)

    return jax.jit(f)


def generate_draft_speculative_sampled(
    engine,
    draft_engine,
    prompts: Sequence[Sequence[int]],
    gen: GenerationConfig,
    k: int = 4,
    seed: int = 0,
):
    """Sampled two-model speculation. Output distribution == plain target
    sampling under the same warp; with ``top_k=1`` it degenerates to the
    greedy-exact path bit-for-bit. Returns ``(sequences, n_verify_steps)``."""
    from lia_tpu.engine.engine import pack_prompts
    from lia_tpu.ops import sampling

    if gen.num_beams > 1:
        raise NotImplementedError("speculation composes with greedy/sampling only")
    _reject_processors(gen)
    if draft_engine.scheduler is not None:
        # the draft is the SMALL model — keep it resident; only the target
        # streams (tiered target verify composes via scheduler.verify_pass)
        raise NotImplementedError("the draft model must be resident")
    if draft_engine.cfg.vocab_size != engine.cfg.vocab_size:
        # the on-device acceptance math subtracts q from p elementwise, so the
        # warped distributions must live over the SAME vocab (the greedy path
        # only needs draft ⊇ target)
        raise ValueError("sampled speculation requires draft vocab == target vocab")

    cfg = engine.cfg
    dcfg = draft_engine.cfg
    tokens, mask = pack_prompts(prompts, gen.pad_token_id)
    B, S = tokens.shape
    C = k + 1
    max_len = -(-(S + gen.max_new_tokens + C) // 128) * 128
    rng = np.random.default_rng(seed)

    sched = engine.scheduler
    if sched is not None:
        if not sched.tpu_kv_plans:
            # reject BEFORE the streamed prefill runs (ADVICE r4)
            raise NotImplementedError(
                "the chunked verify pass needs TPU-KV streaming plans; "
                "host-placement policies have no chunk attention kernel"
            )
        # tiered TARGET: prefill + chunk verifies run through the scheduler
        # (each streamed layer's weights transfer once per C candidates)
        logits, _state0 = sched.prefill_pass(
            jnp.asarray(tokens), jnp.asarray(mask), max_len
        )
        _holder = {"state": sched.ragged_state(_state0)}

        def verify_probs(chunk, positions):
            ps, _holder["state"] = sched.verify_pass(
                jnp.asarray(chunk), jnp.asarray(positions), _holder["state"],
                probs_gen=gen,
            )
            return ps

        def advance_target(accept):
            _holder["state"] = sched.accept_state(
                _holder["state"], jnp.asarray(accept)
            )
    else:
        cache = kvc.init_cache(
            cfg, B, max_len, jnp.dtype(cfg.dtype),
            quantized=engine.runtime.quant.kv_cache_dtype == "int8",
        )
        logits, cache = engine._get_prefill()(
            engine.params, jnp.asarray(tokens), jnp.asarray(mask), cache
        )
        cache = cache._replace(length=jnp.full((B,), int(cache.length), jnp.int32))
        _verify = engine._compiled.setdefault(
            ("spec_verify_sampled", C, gen.temperature, gen.top_k, gen.top_p),
            _verify_sampled_fn(cfg, gen),
        )
        _advance = engine._compiled.setdefault("spec_advance", _accept_fn())
        _holder = {"cache": cache}

        def verify_probs(chunk, positions):
            ps, _holder["cache"] = _verify(
                engine.params, jnp.asarray(chunk), jnp.asarray(positions),
                _holder["cache"],
            )
            return ps

        def advance_target(accept):
            _holder["cache"] = _advance(_holder["cache"], jnp.asarray(accept))

    p0 = np.asarray(sampling.warped_probs(logits, gen))  # [B, V]
    pending = np.array(
        [rng.choice(p0.shape[1], p=p0[b] / p0[b].sum()) for b in range(B)], np.int32
    )

    dcache = kvc.init_cache(
        dcfg, B, max_len, jnp.dtype(dcfg.dtype),
        quantized=draft_engine.runtime.quant.kv_cache_dtype == "int8",
    )
    _, dcache = draft_engine._get_prefill()(
        draft_engine.params, jnp.asarray(tokens), jnp.asarray(mask), dcache
    )
    dcache = dcache._replace(length=jnp.full((B,), int(dcache.length), jnp.int32))

    n_real = mask.sum(1).astype(np.int32)
    abs_len = np.full((B,), S, np.int32)
    out: List[List[int]] = [[int(pending[b])] for b in range(B)]
    done = [gen.eos_token_id is not None and out[b][0] == gen.eos_token_id
            for b in range(B)]

    draft_loop = draft_engine._compiled.setdefault(
        ("spec_draft_sampled", k, gen.temperature, gen.top_k, gen.top_p),
        _draft_loop_sampled_fn(dcfg, k, gen),
    )
    rewind = draft_engine._compiled.setdefault("spec_rewind", _rewind_fn())
    accept_fn = engine._compiled.setdefault(("spec_accept_sampled", k), _sampled_accept_fn(k))

    key = jax.random.PRNGKey(seed)
    steps = 0
    while any(not done[b] and len(out[b]) < gen.max_new_tokens for b in range(B)):
        key, sub, sub2 = jax.random.split(key, 3)
        props, qs, dcache = draft_loop(
            draft_engine.params, jnp.asarray(pending), jnp.asarray(n_real), dcache, sub
        )
        props_np = np.asarray(props)  # [B, k] — small
        chunk = np.concatenate([pending[:, None], props_np], axis=1)
        positions = n_real[:, None] + np.arange(C, dtype=np.int32)[None, :]
        ps = verify_probs(chunk, positions)
        # acceptance runs on-device over the full distributions; only [B]
        # counts/tokens come back (no [B, k, V] host ship through the relay)
        a_dev, extra_dev = accept_fn(props, qs, ps, sub2)
        a_np, extra_np = np.asarray(a_dev), np.asarray(extra_dev)
        steps += 1

        accept = np.zeros((B,), np.int32)
        for b in range(B):
            if done[b] or len(out[b]) >= gen.max_new_tokens:
                continue
            a = int(a_np[b])
            accept[b] = a + 1
            new_toks = [int(t) for t in props_np[b, :a]] + [int(extra_np[b])]
            if gen.eos_token_id is not None and gen.eos_token_id in new_toks:
                new_toks = new_toks[: new_toks.index(gen.eos_token_id) + 1]
                done[b] = True
            out[b].extend(new_toks)
            pending[b] = new_toks[-1]
        n_real = n_real + accept
        abs_len = abs_len + accept
        advance_target(accept)
        dcache = rewind(dcache, jnp.asarray(abs_len))

    pad = gen.pad_token_id
    seqs = np.stack([
        np.asarray((o + [pad] * gen.max_new_tokens)[: gen.max_new_tokens], np.int32)
        for o in out
    ])
    return seqs, steps
