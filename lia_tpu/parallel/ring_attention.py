"""Ring attention: sequence-parallel causal prefill over a mesh axis.

The reference framework has **no** sequence/context parallelism (SURVEY.md §5
"Long-context: absent" — its FlashAttentionKrnl.cpp is single-node tiling and
prompts are bounded by ``text_max_length``). This module is the additive
TPU-native capability: prompts longer than one chip's HBM/VMEM budget are
sharded along the sequence axis of a ``jax.sharding.Mesh``, and attention is
computed with the classic ring schedule:

- every device holds its Q shard permanently and a *rotating* K/V shard;
- at step ``i`` it contracts its queries against the K/V block originally
  owned by device ``(idx - i) mod n`` and merges the partial result with the
  running online-softmax state (same merge as the Pallas flash kernel,
  ops/pallas_attention.py);
- the K/V block then moves to the next device via ``jax.lax.ppermute`` —
  a neighbor-to-neighbor transfer that rides the ICI torus links, never DCN,
  and overlaps with the next block's compute under XLA's async collectives.

After ``n`` steps every device has seen every key exactly once, so the result
is bit-comparable (up to fp reduction order) to single-device attention.
Causality is enforced with *global* positions (query block offset vs key block
offset), so fully-masked future blocks contribute nothing; padding rides the
``input_mask`` shard that rotates with K/V.

Composes with tensor parallelism: heads stay shardable on the "model" axis
(the contraction here touches only the S and D dims), so a ("model", "seq")
mesh runs TP×SP with zero extra code — see tests/test_ring_attention.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_body(axis: str, scale: float, causal: bool, q, k, v, kmask,
               kpos=None, slopes=None):
    """Per-shard ring attention (runs under shard_map).

    q: [B, Sq, N, D] — this device's query shard (head-major K/V convention
    as everywhere in the framework: k/v [B, Nkv, Skv, D]); kmask: [B, Skv]
    True at real-token key slots. ALiBi (bloom/mpt/baichuan-13b): ``kpos``
    [B, Skv] carries the keys' GLOBAL logical positions around the ring with
    the K/V shard, and ``slopes`` [N] adds the key-positional bias
    slope[h]·kpos[b, k] to the logits — the same key-only form as
    ops/attention.alibi_bias (the relative m·(k−q) term differs per query row
    by a constant, which softmax cancels). Returns [B, Sq, N, D].
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    B, Sq, N, D = q.shape
    Nkv = k.shape[1]
    G = N // Nkv
    Skv = k.shape[2]
    alibi = slopes is not None

    qg = q.reshape(B, Sq, Nkv, G, D).astype(jnp.float32) * scale
    q_pos = idx * Sq + jax.lax.broadcasted_iota(jnp.int32, (Sq, Skv), 0)
    if alibi:
        sl = slopes.astype(jnp.float32).reshape(Nkv, G)

    # online-softmax accumulators (fp32, the flash-attention merge)
    m0 = jnp.full((B, Sq, Nkv, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Sq, Nkv, G, 1), jnp.float32)
    acc0 = jnp.zeros((B, Sq, Nkv, G, D), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]
    kp0 = kpos if alibi else jnp.zeros((B, Skv), jnp.int32)

    def step(i, carry):
        k_blk, v_blk, km_blk, kp_blk, m, l, acc = carry
        src = (idx - i) % n  # global block index of the K/V currently held
        s = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qg, k_blk.astype(jnp.float32)
        )  # [B, Nkv, G, Sq, Skv]
        if alibi:
            # additive key-positional bias, [B, Nkv, G, 1, Skv] broadcast
            s = s + sl[None, :, :, None, None] * kp_blk.astype(jnp.float32)[
                :, None, None, None, :
            ]
        k_pos = src * Skv + jax.lax.broadcasted_iota(jnp.int32, (Sq, Skv), 1)
        ok = km_blk[:, None, :]  # [B, 1, Skv] padding validity
        allowed = ((k_pos <= q_pos)[None] & ok) if causal else jnp.broadcast_to(
            ok, (B, Sq, Skv)
        )  # [B, Sq, Skv]
        s = jnp.where(allowed[:, None, None, :, :], s, NEG_INF)
        # reorder to [B, Sq, Nkv, G, Skv] to match the accumulator layout
        s_q = s.transpose(0, 3, 1, 2, 4)
        m_new = jnp.maximum(m, jnp.max(s_q, axis=-1, keepdims=True))
        p = jnp.exp(s_q - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bqhgk,bhkd->bqhgd", p, v_blk.astype(jnp.float32)
        )
        acc = acc * alpha + pv
        # rotate K/V (and its padding mask + key positions) around the ring
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        km_blk = jax.lax.ppermute(km_blk, axis, perm)
        if alibi:
            kp_blk = jax.lax.ppermute(kp_blk, axis, perm)
        return k_blk, v_blk, km_blk, kp_blk, m_new, l, acc

    _, _, _, _, _, l, acc = jax.lax.fori_loop(
        0, n, step, (k, v, kmask, kp0, m0, l0, acc0)
    )
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, Sq, N, D).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # [B, S, N, D] — S sharded on ``axis``
    k: jnp.ndarray,  # [B, N_kv, S, D] (head-major) — S sharded on ``axis``
    v: jnp.ndarray,
    input_mask: jnp.ndarray,  # [B, S] bool — True at real-token slots
    mesh: Mesh,
    axis: str = "seq",
    scale: float | None = None,
    causal: bool = True,
    alibi_slopes: jnp.ndarray | None = None,  # [N] per-head slopes
    key_pos: jnp.ndarray | None = None,  # [B, S] global logical key positions
) -> jnp.ndarray:
    """Sequence-parallel causal attention over ``mesh[axis]``; see module doc.

    The head axes may additionally be sharded on other mesh axes (TP); those
    shardings pass through untouched — only S moves around the ring.

    ALiBi families pass ``alibi_slopes`` (ops/attention.alibi_slopes) and
    ``key_pos`` (pad-aware logical positions, [B, S], sharded on ``axis`` like
    the keys); the positions ride the ring with their K/V shard. Slopes are
    replicated, so ALiBi composes with SP but not with head-sharded TP in one
    call (nothing in the ALiBi model set is GQA/TP-critical at SP scale).
    """
    D = q.shape[-1]
    scale = scale if scale is not None else D**-0.5
    n = mesh.shape[axis]
    if q.shape[1] % n or k.shape[2] % n:
        raise ValueError(
            f"sequence length {q.shape[1]} must divide the '{axis}' axis size {n}"
        )
    if (alibi_slopes is None) != (key_pos is None):
        raise ValueError("alibi_slopes and key_pos must be passed together")
    body = partial(_ring_body, axis, scale, causal)
    in_specs = [
        P(None, axis, None, None),
        P(None, None, axis, None),
        P(None, None, axis, None),
        P(None, axis),
    ]
    args = [q, k, v, input_mask]
    if alibi_slopes is not None:
        in_specs += [P(None, axis), P(None)]
        args += [key_pos, alibi_slopes]
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(*args)


def sp_shardings(mesh: Mesh, axis: str = "seq"):
    """NamedShardings for placing (q, k, v, input_mask) before ring_attention."""
    return (
        NamedSharding(mesh, P(None, axis, None, None)),
        NamedSharding(mesh, P(None, None, axis, None)),
        NamedSharding(mesh, P(None, None, axis, None)),
        NamedSharding(mesh, P(None, axis)),
    )


# ---------------------------------------------------------------------------
# Model-level sequence-parallel prefill
# ---------------------------------------------------------------------------


def sp_prefill(cfg, params, tokens, input_mask, mesh: Mesh, axis: str = "seq"):
    """Full-model prefill with the prompt sharded along ``mesh[axis]``.

    Long-context entry point (additive over the reference, which bounds prompts
    by ``text_max_length``): every per-token op (embed, norms, projections,
    RoPE, MLP) is position-local and simply runs on S-shards under GSPMD; the
    one cross-position op — attention — goes through :func:`ring_attention`.

    Returns ``(last_token_logits [B, V], KVCache)`` where the cache holds the
    prompt's K/V stacked per layer ([L, B, N_kv, S, D], S still sharded on
    ``axis``); ``jax.device_put`` it to the decode sharding of your choice
    (replicated, TP heads, …) before stepping.
    """
    import jax.numpy as jnp

    from lia_tpu.models import transformer as T
    from lia_tpu.ops import kv_cache as kvc

    positions = jnp.cumsum(input_mask.astype(jnp.int32), axis=1) - 1
    x = T.embed(cfg, params, tokens, positions)
    if cfg.alibi:
        # bloom/mpt/baichuan-13b: the additive bias is the ONLY positional
        # signal (rope=False, learned_pos=False). Global pad-aware key
        # positions shard on the seq axis and ride the ring with their K/V
        # block (ring_attention alibi args) — same key-only bias form as the
        # standard prefill path (ops/attention.alibi_prefill_bias).
        from lia_tpu.ops import attention as att

        slopes = att.alibi_slopes(cfg.num_heads)
        key_pos = jnp.maximum(positions, 0) * input_mask
    else:
        slopes = key_pos = None

    def body(h, lp):
        residual = h
        q, k, v = T.attn_in(cfg, lp, h, positions)
        attn_out = ring_attention(
            q, k, v, input_mask, mesh, axis=axis,
            alibi_slopes=slopes, key_pos=key_pos,
        )
        h = T.attn_post_mlp(cfg, lp, residual, attn_out)
        return h, (k, v)

    x, (k_new, v_new) = jax.lax.scan(body, x, params["layers"])
    S = tokens.shape[1]
    cache = kvc.KVCache(
        k=k_new, v=v_new, length=jnp.asarray(S, jnp.int32), mask=input_mask
    )
    logits = T.lm_head(cfg, params, x[:, -1:, :])[:, 0, :]
    return logits, cache
