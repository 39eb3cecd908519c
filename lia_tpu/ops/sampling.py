"""Token selection: greedy, temperature, top-k, top-p.

Parity surface: the reference ships four patched HF generation modes
(_greedy_search / _sample / _beam_search / _beam_sample,
intel_extension_for_pytorch/transformers/generation/). Greedy and sampling are pure
per-step functions here; beam search lives in the engine (it needs the KV reorder,
see :func:`lia_tpu.ops.kv_cache.beam_reorder`).

All ops are jit-friendly (static k, no data-dependent shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lia_tpu.config import GenerationConfig

NEG_INF = -1e30


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """[B, V] → [B] int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p) -> jnp.ndarray:
    """``p``: scalar, or a [B] array for per-row thresholds (serving)."""
    if getattr(p, "ndim", 0) == 1:
        p = p[:, None]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top token)
    keep = jnp.roll(cum < p, 1, axis=-1).at[..., 0].set(True)
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_top_k_rows(logits: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-row top-k ([B] int array; 0 = off) via a sorted-threshold gather."""
    V = logits.shape[-1]
    desc = jnp.sort(logits, axis=-1)[:, ::-1]
    kidx = jnp.clip(k - 1, 0, V - 1)
    kth = jnp.take_along_axis(desc, kidx[:, None], axis=1)
    return jnp.where((k > 0)[:, None] & (logits < kth), NEG_INF, logits)


def seen_from_prompt(
    tokens: jnp.ndarray, mask: jnp.ndarray, vocab: int
) -> jnp.ndarray:
    """[B, S] prompt (+ [B, S] validity) → [B, V] bool token-presence mask
    (the state RepetitionPenaltyLogitsProcessor derives from input_ids)."""
    B, S = tokens.shape
    # scatter into a V+1-wide buffer: pad slots land in the trash column
    # (avoids a [B, S, V] one-hot blow-up at 128k vocabs)
    safe = jnp.where(mask, tokens, vocab)
    seen = jnp.zeros((B, vocab + 1), jnp.bool_)
    seen = seen.at[jnp.arange(B)[:, None], safe].set(True)
    return seen[:, :vocab]


def update_seen(seen: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    """Mark [B] freshly generated tokens as seen."""
    return seen.at[jnp.arange(seen.shape[0]), tok].set(True)


def ban_repeated_ngrams(
    logits: jnp.ndarray,  # [B, V]
    history: jnp.ndarray,  # [B, L] token ids so far (prompt + generated)
    cur_len,  # scalar int32 — number of VALID columns in history
    n: int,  # ngram size (static)
) -> jnp.ndarray:
    """HF NoRepeatNGramLogitsProcessor in jnp: ban any token that would
    complete an n-gram already present in ``history[:, :cur_len]``.

    Static shapes / traced ``cur_len``, so it runs inside the fused decode
    scan. Matches HF exactly when ``history`` equals HF's input_ids (pads
    included — HF scans the raw ids)."""
    B, L = history.shape
    if L < n:
        return logits
    if n == 1:  # HF edge case: ban every previously seen token
        match = jnp.arange(L, dtype=jnp.int32)[None, :] < cur_len
        banned = history
    else:
        W = L - n + 1
        # sliding (n-1)-token windows: [B, W, n-1]
        windows = jnp.stack([history[:, i : W + i] for i in range(n - 1)], axis=-1)
        tail = jax.lax.dynamic_slice(
            history, (0, cur_len - (n - 1)), (B, n - 1)
        )  # last n-1 tokens
        starts = jnp.arange(W, dtype=jnp.int32)
        valid = starts + n - 1 < cur_len  # the window's completing token must exist
        match = jnp.all(windows == tail[:, None, :], axis=-1) & valid[None, :]
        banned = history[:, starts + n - 1]  # [B, W]
    fill = jnp.where(match, NEG_INF, jnp.inf).astype(jnp.float32)
    mask = jnp.full(logits.shape, jnp.inf, jnp.float32)
    mask = mask.at[jnp.arange(B)[:, None], banned].min(fill)
    return jnp.where(mask <= NEG_INF, NEG_INF, logits)


def process_logits(
    logits: jnp.ndarray,  # [B, V]
    gen: GenerationConfig,
    seen: jnp.ndarray | None = None,  # [B, V] bool token-presence
    n_generated=None,  # scalar — tokens already emitted this generation
    history: jnp.ndarray | None = None,  # [B, L] ids (no_repeat_ngram state)
    cur_len=None,  # scalar — valid columns in history
) -> jnp.ndarray:
    """Pre-warp logits processors (HF generate parity: the reference's patched
    modes run the standard LogitsProcessorList — repetition penalty,
    min-new-tokens EOS suppression, and no-repeat-ngram)."""
    if gen.repetition_penalty != 1.0 and seen is not None:
        x = logits.astype(jnp.float32)
        pen = jnp.where(x > 0, x / gen.repetition_penalty, x * gen.repetition_penalty)
        logits = jnp.where(seen, pen, x).astype(logits.dtype)
    if gen.min_new_tokens > 0 and gen.eos_token_id is not None and n_generated is not None:
        eos_col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) == gen.eos_token_id
        logits = jnp.where(
            eos_col & (n_generated < gen.min_new_tokens), NEG_INF, logits
        )
    if gen.no_repeat_ngram_size > 0 and history is not None and cur_len is not None:
        logits = ban_repeated_ngrams(logits, history, cur_len, gen.no_repeat_ngram_size)
    return logits


def process_logits_rows(
    logits: jnp.ndarray,  # [B, V]
    seen: jnp.ndarray,  # [B, V] bool — prompt+generated token presence per slot
    rep_penalty: jnp.ndarray,  # [B] f32 (1.0 = off)
    suppress_eos: jnp.ndarray,  # [B] bool — min_new_tokens not yet reached
    eos_token_id: int | None,
) -> jnp.ndarray:
    """PER-ROW logits processors for continuous-batching serving: each slot
    carries its own repetition penalty and EOS-suppression flag (the per-request
    analog of :func:`process_logits`; reference runs HF's LogitsProcessorList
    per generation — serving batches requests with different params)."""
    x = logits.astype(jnp.float32)
    pen = jnp.where(x > 0, x / rep_penalty[:, None], x * rep_penalty[:, None])
    x = jnp.where(seen & (rep_penalty[:, None] != 1.0), pen, x)
    if eos_token_id is not None:
        eos_col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == eos_token_id
        x = jnp.where(eos_col & suppress_eos[:, None], NEG_INF, x)
    return x.astype(logits.dtype)


def mark_seen(
    seen: jnp.ndarray,  # [B, V] bool
    toks: jnp.ndarray,  # [B] i32 freshly emitted tokens
    active: jnp.ndarray,  # [B] bool
) -> jnp.ndarray:
    """Record emitted tokens in the presence bitmap (inactive rows unchanged)."""
    B = seen.shape[0]
    return seen.at[jnp.arange(B), toks].max(active)


def ban_tokens_rows(
    logits: jnp.ndarray,  # [B, V]
    banned: jnp.ndarray,  # [B, K] i32 token ids to ban per row (-1 = none)
) -> jnp.ndarray:
    """Set explicit per-row token bans to NEG_INF (serving's no-repeat-ngram:
    the ban LIST is computed host-side from each slot's un-padded
    prompt+output history, so the device op is one scatter)."""
    B = logits.shape[0]
    safe = jnp.where(banned >= 0, banned, 0)
    fill = jnp.where(banned >= 0, NEG_INF, jnp.inf).astype(jnp.float32)
    mask = jnp.full(logits.shape, jnp.inf, jnp.float32)
    mask = mask.at[jnp.arange(B)[:, None], safe].min(fill)
    return jnp.where(mask <= NEG_INF, NEG_INF, logits)


def warp_logits(logits: jnp.ndarray, gen: GenerationConfig) -> jnp.ndarray:
    """Temperature/top-k/top-p warp ([..., V] → [..., V] warped logits).

    Shared by :func:`sample` and speculative acceptance sampling, which needs
    the warped DISTRIBUTIONS of both draft and target (Leviathan et al.'s
    modified-distribution requirement)."""
    x = logits / jnp.maximum(gen.temperature, 1e-6)
    if gen.top_k > 0:
        x = apply_top_k(x, gen.top_k)
    if gen.top_p < 1.0:
        x = apply_top_p(x, gen.top_p)
    return x


def warped_probs(logits: jnp.ndarray, gen: GenerationConfig) -> jnp.ndarray:
    """Normalized post-warp probabilities ([..., V], fp32)."""
    return jax.nn.softmax(warp_logits(logits, gen).astype(jnp.float32), axis=-1)


def sample(
    logits: jnp.ndarray, key: jax.Array, gen: GenerationConfig
) -> jnp.ndarray:
    """One sampling step honoring temperature/top-k/top-p. [B, V] → [B]."""
    if not gen.do_sample:
        return greedy(logits)
    return jax.random.categorical(key, warp_logits(logits, gen), axis=-1).astype(jnp.int32)


def sample_per_row(
    logits: jnp.ndarray,  # [B, V]
    key: jax.Array,
    temperature: jnp.ndarray,  # [B] f32
    top_k: jnp.ndarray,  # [B] i32 (0 = off)
    top_p: jnp.ndarray,  # [B] f32 (1.0 = off)
    greedy_row: jnp.ndarray,  # [B] bool — argmax instead of sampling
) -> jnp.ndarray:
    """Vectorized PER-ROW sampling — serving's per-request SamplingParams
    (each slot carries its own temperature/top-k/top-p/greedy). Same warp
    math as :func:`sample`, with thresholds gathered per row."""
    x = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)[:, None]
    x = apply_top_k_rows(x, top_k)
    x = apply_top_p(x, top_p)  # per-row thresholds ([B] array form)
    sampled = jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
    return jnp.where(greedy_row, greedy(logits), sampled)
