"""Continuous batching tests: ragged decode correctness + slot lifecycle."""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.engine import InferenceEngine
from lia_tpu.engine.serving import ContinuousBatcher
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def model():
    # scale=0.12 keeps greedy top-2 logit gaps ≥0.03 across these suites' prompts:
    # paged and slab attention are *different programs* (bitwise-different by
    # design), so token-equality asserts need decisive argmax margins — at
    # scale 0.02 gaps shrank to ~5e-4 and load-dependent rounding flipped tokens
    # intermittently (greedy sequences amplify one flip into a different tail).
    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=21, scale=0.12)
    return cfg, params


def test_serving_matches_static_engine(model):
    """Each request's tokens must equal what the static engine generates alone."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = {}
    eng = InferenceEngine(cfg, params)
    for i, p in enumerate(prompts):
        ref[i] = list(eng.generate([p], gen).sequences[0])

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert len(done) == len(prompts)
    by_id = {r.req_id: r for r in done}
    for i in ids:
        assert by_id[i].output == ref[i], f"request {i}"


def test_serving_slot_reuse_and_stats(model):
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen)
    for _ in range(5):
        cb.submit([3, 4, 5])
    done = cb.run()
    assert len(done) == 5
    s = cb.stats()
    assert s["requests"] == 5
    assert s["total_tokens"] == 5 * 4
    assert s["tokens_per_s"] > 0
    # 2 slots for 5 requests => slots were recycled
    assert not cb.active.any() and not cb.queue


def test_serving_rejects_oversized(model):
    cfg, params = model
    cb = ContinuousBatcher(cfg, params, max_batch=1, max_len=32,
                           gen=GenerationConfig(max_new_tokens=30))
    cb.submit(list(range(3, 30)))  # bucket 32 + 30 new > 32
    with pytest.raises(ValueError, match="max_len"):
        cb.run()


def test_serving_eos(model):
    cfg, params = model
    gen_probe = GenerationConfig(max_new_tokens=2)
    eng = InferenceEngine(cfg, params)
    eos = int(eng.generate([[7, 8, 9]], gen_probe).sequences[0, 0])
    gen = GenerationConfig(max_new_tokens=50, eos_token_id=eos, pad_token_id=1)
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=256, gen=gen)
    cb.submit([7, 8, 9])
    done = cb.run()
    assert len(done) == 1
    assert done[0].output[-1] == eos
    assert len(done[0].output) < 50


def test_serving_on_tp_mesh():
    """Continuous batching with weights/KV tensor-sharded over a 4-way model axis
    must match the unsharded engine (north-star: continuous batching over ICI)."""
    from lia_tpu.parallel.mesh import make_mesh

    cfg = get_config("opt-tiny").replace(vocab_size=512, dtype="float32")
    params = init_dummy_params(cfg, seed=22, scale=0.12)  # decisive argmax margins (see model())
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [12, 13]]
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen)
    for p in prompts:
        ref.submit(p)
    ref_out = {r.req_id: r.output for r in ref.run()}

    mesh = make_mesh((1, 4))
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen, mesh=mesh)
    for p in prompts:
        cb.submit(p)
    out = {r.req_id: r.output for r in cb.run()}
    assert out == ref_out


@pytest.mark.parametrize("policy,hbm", [(3, 50), (0, 0), (1, 0)])
def test_serving_under_scheduler_matches_resident(model, policy, hbm):
    """ContinuousBatcher over the StreamingScheduler's ragged passes (round-1
    gap: serving was resident-only) — per-request tokens must match the
    resident batcher."""
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    rt = RuntimeConfig(
        prefill_policy=policy, decode_policy=policy,
        hbm_percentage=hbm, stream_weights=True,
    )
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen, runtime=rt)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} under policy {policy}"


def test_paged_serving_matches_resident(model):
    """Paged continuous batching (block-table Pallas kernel + page allocator)
    generates the same per-request tokens as the slab batcher; pages recycle
    across requests."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    n_free0 = len(cb.free_blocks)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (paged)"
    assert len(cb.free_blocks) == n_free0  # all pages returned


def test_paged_serving_memory_backpressure(model):
    """When the pool is too small for all requests at once, admission waits for
    page frees instead of failing."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    cb = ContinuousBatcher(
        cfg, params, max_batch=4, max_len=64, gen=gen,
        paged=True, block_size=8, num_blocks=5,  # ~2 requests' worth of pages
    )
    prompts = [[5, 9, 23], [100, 7], [8, 8, 8], [50, 60, 61, 62]]
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert len(done) == 4
    assert {r.req_id for r in done} == set(ids)


def test_chunked_admission_matches_and_interleaves(model):
    """prefill_chunk admission: outputs match the synchronous batcher, and
    decode steps for running requests interleave with the chunks (TTFT fix)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], list(range(3, 43)), [8, 8, 8], [50, 60, 7, 9, 11]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, prefill_chunk=16
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (chunked admission)"


def test_serving_moe_matches_static_engine():
    """Continuous batching over a block-sparse MoE model (mixtral-tiny)."""
    cfg = get_config("mixtral-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=23, scale=0.12)
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [50, 60]]

    eng = InferenceEngine(cfg, params)
    ref = [list(eng.generate([p], gen).sequences[0]) for p in prompts]

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r for r in cb.run()}
    for i, r in zip(ids, ref):
        assert by_id[i].output == r


def test_alibi_serving_paged_and_slab_match_static():
    """ALiBi (bloom) composes with continuous batching in both slab and paged
    modes: paged storage is contiguous per sequence, so the key-positional
    bias is slopes * gathered index (fresh token at `lengths`)."""
    cfg = get_config("bloom-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=13, scale=0.12)
    gen = GenerationConfig(max_new_tokens=5, pad_token_id=3)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13]]

    eng = InferenceEngine(cfg, params)
    ref = {i: list(eng.generate([p], gen).sequences[0]) for i, p in enumerate(prompts)}

    for paged in (False, True):
        cb = ContinuousBatcher(
            cfg, params, max_batch=2, max_len=128, gen=gen,
            paged=paged, block_size=8,
        )
        ids = [cb.submit(p) for p in prompts]
        by_id = {r.req_id: r.output for r in cb.run()}
        for i in ids:
            assert by_id[i] == ref[i], f"request {i} (paged={paged})"


def test_per_request_sampling_params():
    """Per-request SamplingParams: a greedy request and a high-temperature
    sampled request decode in the SAME batch; the greedy one must bit-match a
    solo greedy run, and the sampled one is deterministic given the engine
    seed but (generically) different from greedy."""
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=5, scale=0.12)
    gen = GenerationConfig(max_new_tokens=8)  # engine default: greedy

    solo = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
    solo.submit([5, 9, 23, 41])
    greedy_ref = solo.run()[0].output

    eng = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
    eng.submit([5, 9, 23, 41])  # greedy (engine default)
    eng.submit([5, 9, 23, 41], do_sample=True, temperature=1.5, top_k=50)
    done = sorted(eng.run(), key=lambda r: r.req_id)
    assert done[0].output == greedy_ref
    # same prompt, same engine RNG stream → sampled row differs from greedy
    # (vocab 503, temp 1.5: collision over 8 tokens is ~impossible for a
    # random tiny model)
    assert done[1].output != greedy_ref


def test_per_request_stop_tokens():
    """A request-specific stop token ends that request early without touching
    batchmates."""
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=5, scale=0.12)
    gen = GenerationConfig(max_new_tokens=8)
    solo = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
    solo.submit([5, 9, 23, 41])
    ref = solo.run()[0].output
    stop = ref[3]  # a token the greedy trajectory actually emits

    eng = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
    eng.submit([5, 9, 23, 41], stop_token_ids=[stop])
    eng.submit([5, 9, 23, 41])
    done = sorted(eng.run(), key=lambda r: r.req_id)
    assert done[0].output == ref[:4]  # truncated at (and including) the stop
    assert done[1].output == ref


# -- automatic prefix caching (paged mode) ----------------------------------


def _paged_pool_accounting_clean(cb):
    """After all requests finish: every page is either free or prefix-cached,
    refcounts are zero, and nothing leaked (null page 0 excluded)."""
    assert not cb.active.any() and not cb.queue
    assert (cb.page_rc == 0).all()
    assert len(cb.free_blocks) + len(cb.cached_pages) == cb.num_blocks - 1


def test_prefix_cache_repeat_prompt(model):
    """Resubmitting a long prompt hits the prefix cache (seed + suffix chunk)
    and generates the identical greedy continuation."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5)
    prompt = [((7 * i) % 300) + 2 for i in range(40)]  # 5 full blocks @ bs=8

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    first = cb.submit(prompt)
    cb.run()
    assert cb.prefix_hits == 0
    second = cb.submit(prompt)
    done = {r.req_id: r.output for r in cb.run()}
    assert cb.prefix_hits == 1
    # n=40, reused=min(40,39)=39 -> Cb=16, base=24: 3 shared blocks
    assert cb.prefix_tokens_reused == 24
    assert done[second] == done[first]
    _paged_pool_accounting_clean(cb)


def test_prefix_cache_shared_system_prompt(model):
    """Different requests sharing a long system prefix reuse its pages while
    the first request is still active; outputs match uncached serving."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5)
    sys_prefix = [((11 * i) % 300) + 2 for i in range(40)]
    prompts = [sys_prefix + [401, 402, 403], sys_prefix + [404, 405, 406, 407]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (prefix-shared)"
    assert cb.prefix_hits == 1  # second admission reused the first's blocks
    assert cb.prefix_tokens_reused > 0
    _paged_pool_accounting_clean(cb)


def test_prefix_cache_unaligned_boundary(model):
    """base not block-aligned: the boundary block is rewritten privately from
    the seeded values (chain page pinned only during the seed)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    prompt = [((13 * i) % 300) + 2 for i in range(44)]  # n=44: base=28, 28%8=4

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    r0 = ref.submit(prompt)
    ref_out = {r.req_id: r.output for r in ref.run()}[r0]

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    a = cb.submit(prompt)
    cb.run()
    b = cb.submit(prompt)
    out = {r.req_id: r.output for r in cb.run()}
    assert out[a] == ref_out and out[b] == ref_out
    assert cb.prefix_hits == 1 and cb.prefix_tokens_reused == 28
    _paged_pool_accounting_clean(cb)


def test_prefix_cache_eviction_under_pressure(model):
    """Cached (refcount-0) prefix pages are reclaimed FIFO when the pool runs
    dry; correctness is unaffected, the hit just disappears."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    p1 = [((7 * i) % 300) + 2 for i in range(40)]
    p2 = [((17 * i) % 300) + 9 for i in range(40)]

    ref = ContinuousBatcher(cfg, params, max_batch=1, max_len=128, gen=gen)
    ref_ids = [ref.submit(p) for p in (p1, p2, p1)]
    ref_out = {r.req_id: r.output for r in ref.run()}

    # pool: 10 usable pages; each request needs ceil(44/8)=6, p1 caches 5 ->
    # admitting p2 must evict part of p1's cached chain
    cb = ContinuousBatcher(
        cfg, params, max_batch=1, max_len=128, gen=gen,
        paged=True, block_size=8, num_blocks=11,
    )
    ids = [cb.submit(p) for p in (p1, p2, p1)]
    out = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ref_ids):
        assert out[i] == ref_out[j], f"request {i} (eviction)"
    _paged_pool_accounting_clean(cb)


def test_chunked_paged_admission_with_prefix_cache(model):
    """prefill_chunk composes with paged mode: pages reserved up front, chunks
    interleave with decode, and a prefix-cache hit seeds the seg and chunks
    only the uncached suffix. Outputs match slab serving."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5)
    sys_prefix = [((11 * i) % 300) + 2 for i in range(40)]
    prompts = [
        [5, 9, 23, 41],
        sys_prefix + [401, 402, 403],
        [8, 8, 8],
        sys_prefix + [404, 405, 406, 407],
    ]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        paged=True, block_size=8, prefill_chunk=16,
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (chunked+paged)"
    # 4th prompt shares the 2nd's 40-token prefix: n=44, suffix=4 -> one
    # 16-token chunk, base=28 -> 3 shared blocks
    assert cb.prefix_hits == 1 and cb.prefix_tokens_reused == 28
    _paged_pool_accounting_clean(cb)


def test_chunked_paged_pool_too_small_raises(model):
    """A request that can never fit the pool raises instead of spinning."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        paged=True, block_size=8, num_blocks=3,  # 2 usable pages
    )
    cb.submit(list(range(2, 40)))  # needs ceil(42/8)=6 pages
    with pytest.raises(ValueError, match="pool"):
        cb.run()


# -- logits processors in serving -------------------------------------------


def test_serving_repetition_penalty_matches_engine(model):
    """Serving with repetition_penalty generates exactly what the static
    engine's (HF-golden-tested) processor path generates."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6, repetition_penalty=1.4)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13]]

    eng = InferenceEngine(cfg, params)
    ref = [list(eng.generate([p], gen).sequences[0]) for p in prompts]

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, r in zip(ids, ref):
        assert by_id[i] == r, f"request {i} (serving rep-penalty)"


def test_serving_min_new_tokens_and_per_request_override(model):
    """min_new_tokens suppresses EOS per slot; per-request overrides compose
    with engine defaults in one batch."""
    cfg, params = model
    base = GenerationConfig(max_new_tokens=6)
    # find the greedy trajectory, then make one of its tokens the EOS so the
    # default request stops early and the min_new_tokens request pushes past it
    eng = InferenceEngine(cfg, params)
    traj = list(eng.generate([[5, 9, 23, 41]], base).sequences[0])
    eos = traj[2]
    gen = GenerationConfig(max_new_tokens=6, eos_token_id=eos)

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=96, gen=gen, enable_processors=True
    )
    a = cb.submit([5, 9, 23, 41])  # stops at the eos (3 tokens)
    b = cb.submit([5, 9, 23, 41], min_new_tokens=5)  # EOS banned until 5
    done = {r.req_id: r.output for r in cb.run()}
    assert done[a] == traj[:3]
    assert len(done[b]) >= 5
    assert eos not in done[b][:4]  # suppressed while < min_new_tokens


def test_serving_per_request_processor_needs_optin(model):
    cfg, params = model
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64)
    with pytest.raises(ValueError, match="enable_processors"):
        cb.submit([1, 2, 3], repetition_penalty=1.3)


def test_serving_paged_with_processors(model):
    """Processors compose with the paged path (and prefix caching)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5, repetition_penalty=1.3)
    prompt = [((7 * i) % 300) + 2 for i in range(40)]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    r0 = ref.submit(prompt)
    ref_out = {r.req_id: r.output for r in ref.run()}[r0]

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    a = cb.submit(prompt)
    cb.run()
    b = cb.submit(prompt)  # prefix-cache hit; processors still apply
    out = {r.req_id: r.output for r in cb.run()}
    assert out[a] == ref_out and out[b] == ref_out
    assert cb.prefix_hits == 1


def test_serving_no_repeat_ngram_matches_engine(model):
    """Serving's host-computed ngram bans match the engine's in-graph
    (HF-golden-tested) ban_repeated_ngrams on un-padded single prompts."""
    cfg, params = model
    eng = InferenceEngine(cfg, params)
    # prompts avoid pad id 1 so padded-engine vs un-padded-serving histories
    # agree on every scanned window
    prompts = [[5, 9, 5, 9, 23], [8, 8, 8, 8, 8, 12, 13], [100, 7, 3]]
    for n in (1, 2, 3):
        gen = GenerationConfig(max_new_tokens=6, no_repeat_ngram_size=n)
        ref = [list(eng.generate([p], gen).sequences[0]) for p in prompts]
        cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
        ids = [cb.submit(p) for p in prompts]
        by_id = {r.req_id: r.output for r in cb.run()}
        for i, r in zip(ids, ref):
            assert by_id[i] == r, f"request {i} (serving ngram={n})"


def test_serving_per_request_ngram(model):
    """Per-request no_repeat_ngram_size: banned request diverges from the
    default request in the same batch; default matches plain serving."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    prompt = [5, 9, 5, 9, 23]

    plain = ContinuousBatcher(cfg, params, max_batch=2, max_len=96, gen=gen)
    p0 = plain.submit(prompt)
    plain_out = {r.req_id: r.output for r in plain.run()}[p0]

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=96, gen=gen, enable_processors=True
    )
    a = cb.submit(prompt)
    b = cb.submit(prompt, no_repeat_ngram_size=1)  # every token unique
    done = {r.req_id: r.output for r in cb.run()}
    assert done[a] == plain_out
    assert len(set(done[b])) == len(done[b])  # n=1: no token repeats
    assert not set(done[b]) & set(prompt)  # prompt tokens banned too


# -- speculative decoding in serving ----------------------------------------


def test_speculative_serving_matches_plain(model):
    """Prompt-lookup speculation in continuous batching is greedy-exact: same
    per-request tokens as plain serving, in fewer verify steps on repetitive
    prompts."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [
        [5, 9, 23, 41, 5, 9, 23, 41, 5, 9],  # repetitive: proposals land
        [100, 7, 3],
        [8, 8, 8, 8, 8, 12, 13],
        [50, 60, 7, 9, 11, 50, 60, 7, 9],
    ]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, speculate_k=4
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (speculative serving)"
    total = sum(len(o) for o in by_id.values())
    # each verify step emits >=1 token/slot; repetition must beat 1:1
    assert cb._steps < total / 1.0
    assert cb.stats()["decode_steps"] == cb._steps


def test_speculative_serving_stop_tokens(model):
    """A stop token inside an accepted run truncates that request exactly
    there (no tokens past the stop leak out)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompt = [5, 9, 23, 41, 5, 9, 23, 41, 5, 9]
    solo = ContinuousBatcher(cfg, params, max_batch=1, max_len=128, gen=gen)
    solo.submit(prompt)
    ref = solo.run()[0].output
    stop = ref[4]

    cb = ContinuousBatcher(
        cfg, params, max_batch=1, max_len=128, gen=gen, speculate_k=4
    )
    cb.submit(prompt, stop_token_ids=[stop])
    out = cb.run()[0].output
    assert out == ref[: ref.index(stop) + 1]


def test_speculative_serving_guards(model):
    cfg, params = model
    with pytest.raises(ValueError, match="draft serving requires speculate_k"):
        ContinuousBatcher(cfg, params, draft=(cfg, params))
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, speculate_k=4)
    with pytest.raises(ValueError, match="per-request sampling"):
        cb.submit([1, 2, 3], do_sample=True)
    with pytest.raises(ValueError, match="per-request sampling"):
        cb.submit([1, 2, 3], temperature=0.7)


def test_speculative_serving_sampled_topk1_matches_greedy(model):
    """speculation × sampling: with top_k=1 the warped target distribution is
    a point mass, so Leviathan acceptance must reproduce greedy serving
    bit-for-bit (prompt-lookup proposals)."""
    cfg, params = model
    prompts = [[5, 9, 23, 41, 5, 9, 23, 41, 5, 9], [100, 7, 3], [50, 60, 7, 9, 11]]
    greedy_gen = GenerationConfig(max_new_tokens=8)
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=greedy_gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    gen = GenerationConfig(max_new_tokens=8, do_sample=True, top_k=1)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, speculate_k=4
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (sampled-spec top_k=1)"


def test_draft_speculative_serving_sampled_topk1_matches_greedy(model):
    """speculation × sampling with a DRAFT model at top_k=1: the sampled
    acceptance rule degenerates to exact-match greedy."""
    cfg, params = model
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    greedy_gen = GenerationConfig(max_new_tokens=6)
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=greedy_gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    gen = GenerationConfig(max_new_tokens=6, do_sample=True, top_k=1)
    dparams = init_dummy_params(cfg, seed=99, scale=0.12)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        speculate_k=3, draft=(cfg, dparams),
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (sampled draft top_k=1)"


def test_speculative_serving_sampled_runs_and_respects_stops(model):
    """speculation × sampling at real temperature: valid tokens, correct
    lengths, stop-token truncation still exact."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8, do_sample=True, temperature=1.3)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, speculate_k=4
    )
    prompts = [[5, 9, 23, 41, 5, 9, 23, 41], [100, 7, 3]]
    for p in prompts:
        cb.submit(p)
    done = cb.run()
    assert len(done) == 2
    for r in done:
        assert 1 <= len(r.output) <= 8
        assert all(0 <= t < cfg.vocab_size for t in r.output)


def test_lookup_accept_first_token_distribution():
    """The point-mass Leviathan rule must leave the FIRST position distributed
    exactly as the target: empirically compare accept/resample output against
    p over many keys."""
    import jax
    import jax.numpy as jnp

    from lia_tpu.engine.lookahead import _lookup_accept_fn

    k, V, N = 2, 5, 4000
    rng = np.random.default_rng(0)
    p = rng.random((1, k + 1, V)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    props = jnp.asarray([[1, 3]], jnp.int32)
    ps = jnp.asarray(p)
    fn = _lookup_accept_fn(k)

    def first_token(key):
        a, extra = fn(props, ps, key)
        # token emitted at position 0: props[0] if a >= 1 else the resample
        return jnp.where(a[0] >= 1, props[0, 0], extra[0])

    toks = np.asarray(jax.vmap(first_token)(jax.random.split(jax.random.PRNGKey(0), N)))
    freq = np.bincount(toks, minlength=V) / N
    np.testing.assert_allclose(freq, p[0, 0], atol=0.03)


def test_draft_speculative_serving_matches_plain(model):
    """Two-model speculation in serving: the draft keeps a per-slot ragged
    cache (rewound each step); output is greedy-exact vs plain serving. A
    same-weights draft predicts perfectly, so steps collapse."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    # perfect draft (same weights): every proposal accepted
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        speculate_k=4, draft=(cfg, params),
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (draft serving)"
    # 8 tokens at 5/step -> 2 verify passes per request; 3 requests over 2
    # slots with admission churn: must be well under 1 step/token
    assert cb._steps <= 8

    # imperfect draft (different weights): proposals mostly miss, output still exact
    dparams = init_dummy_params(cfg, seed=99, scale=0.12)
    cb2 = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        speculate_k=4, draft=(cfg, dparams),
    )
    ids2 = [cb2.submit(p) for p in prompts]
    by_id2 = {r.req_id: r.output for r in cb2.run()}
    for i, j in zip(ids2, ids_ref):
        assert by_id2[i] == ref_by_id[j], f"request {i} (imperfect draft)"


def test_paged_serving_on_tp_mesh():
    """paged × TP mesh: pools sharded on the KV-head axis over "model", block
    tables replicated host state — outputs must match unsharded paged serving,
    and prefix caching must still hit."""
    from lia_tpu.parallel.mesh import make_mesh

    cfg = get_config("opt-tiny").replace(vocab_size=512, dtype="float32")
    params = init_dummy_params(cfg, seed=22, scale=0.12)
    gen = GenerationConfig(max_new_tokens=5)
    prefix = [((11 * i) % 300) + 2 for i in range(40)]  # 5 full blocks @ bs=8
    prompts = [prefix + [5, 9, 23, 41], [100, 7, 3], prefix + [12, 13]]

    ref = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    for p in prompts:
        ref.submit(p)
    ref_out = {r.req_id: r.output for r in ref.run()}

    mesh = make_mesh((1, 4))
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True,
        block_size=8, mesh=mesh
    )
    for p in prompts:
        cb.submit(p)
    out = {r.req_id: r.output for r in cb.run()}
    assert out == ref_out
    assert cb.prefix_hits == ref.prefix_hits and cb.prefix_hits >= 1


def test_speculative_serving_with_chunked_admission(model):
    """speculation × chunked prefill: long prompts admit chunk-by-chunk while
    running requests keep taking speculative steps; outputs stay greedy-exact
    vs plain serving."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [
        [5, 9, 23, 41, 5, 9, 23, 41, 5, 9],
        list(range(3, 43)),  # long prompt: 3 chunks at C=16
        [50, 60, 7, 9, 11, 50, 60, 7, 9],
    ]
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        speculate_k=4, prefill_chunk=16,
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (spec+chunked)"


def test_speculative_paged_serving_matches_plain(model):
    """speculation × paged: chunk verify over the block-table pool is
    greedy-exact vs plain serving; pages recycle cleanly afterwards."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [
        [5, 9, 23, 41, 5, 9, 23, 41, 5, 9],
        [100, 7, 3],
        [8, 8, 8, 8, 8, 12, 13],
        [50, 60, 7, 9, 11, 50, 60, 7, 9],
    ]
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        paged=True, block_size=8, speculate_k=4,
    )
    n_free0 = cb._allocatable()
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (spec+paged)"
    assert cb._allocatable() == n_free0  # all pages returned or cached
    # repetition should land proposals: fewer verify steps than tokens
    total = sum(len(o) for o in by_id.values())
    assert cb._steps < total


def test_speculative_paged_with_prefix_cache(model):
    """speculation × paged × APC: a shared prompt prefix still hits the
    cache under speculative decoding and outputs stay exact."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    sys_prefix = [((11 * i) % 300) + 2 for i in range(40)]
    prompts = [sys_prefix + [401, 402, 403], sys_prefix + [404, 405, 406, 407]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        paged=True, block_size=8, speculate_k=4,
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (spec+paged+APC)"
    assert cb.prefix_hits == 1


def test_speculative_paged_sampled_topk1_matches_greedy(model):
    """speculation × paged × sampling at top_k=1 degenerates to greedy-exact."""
    cfg, params = model
    prompts = [[5, 9, 23, 41, 5, 9, 23, 41], [100, 7, 3]]
    greedy_gen = GenerationConfig(max_new_tokens=6)
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=greedy_gen,
                            paged=True, block_size=8)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    gen = GenerationConfig(max_new_tokens=6, do_sample=True, top_k=1)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        paged=True, block_size=8, speculate_k=3,
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (spec+paged sampled)"


def test_draft_speculative_paged_and_chunked_match_plain(model):
    """draft speculation × paged target and × chunked admission: the draft's
    slab cache is admission-prefilled independent of target storage; outputs
    stay greedy-exact."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3], list(range(3, 43))]
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    dparams = init_dummy_params(cfg, seed=99, scale=0.12)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        paged=True, block_size=8, speculate_k=3, draft=(cfg, dparams),
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (draft+paged)"

    cb2 = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen,
        prefill_chunk=16, speculate_k=3, draft=(cfg, dparams),
    )
    ids2 = [cb2.submit(p) for p in prompts]
    by_id2 = {r.req_id: r.output for r in cb2.run()}
    for i, j in zip(ids2, ids_ref):
        assert by_id2[i] == ref_by_id[j], f"request {i} (draft+chunked)"


def test_serving_scheduler_tp_mesh_matches(model):
    """scheduler×mesh in serving: tiered (streamed-weights) continuous
    batching over a TP mesh — sharded resident prefix + per-layer sharded
    streamed puts + head-sharded segment KV — matches the resident batcher
    per request (docs/serving.md matrix: scheduler × TP mesh)."""
    from lia_tpu.config import RuntimeConfig
    from lia_tpu.parallel.mesh import make_mesh

    cfg, _ = model
    cfg = cfg.replace(vocab_size=512)  # 503 doesn't tile the model axis
    params = init_dummy_params(cfg, seed=21, scale=0.12)
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, runtime=rt,
        mesh=make_mesh((1, 4)),
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i}"


# -- fused multi-token decode blocks ------------------------------------------


def test_fused_steps_match_per_step_slab(model):
    """fused_steps>1 (k decode+sample steps per dispatch, lax.scan) must emit
    exactly the per-step path's tokens, request by request — greedy decode is
    rng-free so the block is bitwise the same program unrolled."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=7)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen,
                           fused_steps=4)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i}"
    s = cb.stats()
    assert s["steps_per_dispatch"] >= 1.5  # blocks actually fused
    assert s["decode_dispatches"] < s["decode_steps"]


def test_fused_steps_match_per_step_paged(model):
    """Fused blocks over the paged pool: kv_lengths advance in-carry, block
    tables stay static (pages are reserved for the full budget at admission)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [12, 13]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                            paged=True)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                           paged=True, fused_steps=3)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (paged fused)"
    assert cb.stats()["steps_per_dispatch"] > 1.0


def test_fused_steps_eos_truncates_mid_block(model):
    """A slot hitting EOS inside a fused block must truncate at the stop token;
    the slot frees and is reused for the next request."""
    cfg, params = model
    gen_probe = GenerationConfig(max_new_tokens=2)
    eng = InferenceEngine(cfg, params)
    eos = int(eng.generate([[7, 8, 9]], gen_probe).sequences[0, 0])
    gen = GenerationConfig(max_new_tokens=50, eos_token_id=eos, pad_token_id=1)

    ref = ContinuousBatcher(cfg, params, max_batch=1, max_len=256, gen=gen)
    ref.submit([7, 8, 9])
    ref_out = ref.run()[0].output

    cb = ContinuousBatcher(cfg, params, max_batch=1, max_len=256, gen=gen,
                           fused_steps=8)
    cb.submit([7, 8, 9])
    cb.submit([7, 8, 9])  # admitted after slot 0 frees mid-block
    done = cb.run()
    assert len(done) == 2
    for r in done:
        assert r.output == ref_out
        assert r.output[-1] == eos and len(r.output) < 50


def test_fused_steps_mixed_sampling_runs(model):
    """Per-row sampling inside the fused scan: greedy rows must match the
    greedy reference exactly (argmax is rng-free); sampled rows must respect
    their budget. (Sampled tokens differ from the per-step path only in rng
    stream order, so token equality is asserted for greedy rows only.)"""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen)
    rid = ref.submit([5, 9, 23, 41])
    ref_greedy = {r.req_id: r.output for r in ref.run()}[rid]

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                           fused_steps=3)
    g = cb.submit([5, 9, 23, 41])  # greedy (engine default)
    s = cb.submit([100, 7, 3], do_sample=True, temperature=1.3, top_k=20)
    by_id = {r.req_id: r.output for r in cb.run()}
    assert by_id[g] == ref_greedy
    assert len(by_id[s]) == 6


def test_fused_steps_with_waiting_queue(model):
    """Queued requests don't disable fusing: after admission, queued == no
    free slot, so a fused block only overshoots the slot-free event by the
    remaining-budget cap. Every request must still be admitted and complete
    with per-step-identical greedy tokens."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    ref = ContinuousBatcher(cfg, params, max_batch=1, max_len=64, gen=gen)
    for _ in range(3):
        ref.submit([3, 4, 5])
    ref_out = [r.output for r in ref.run()]

    cb = ContinuousBatcher(cfg, params, max_batch=1, max_len=64, gen=gen,
                           fused_steps=4)
    for _ in range(3):
        cb.submit([3, 4, 5])
    done = cb.run()
    assert len(done) == 3
    assert [r.output for r in done] == ref_out
    # each request decodes its 3 post-admission tokens in one fused block
    # even though the queue is non-empty while earlier requests run
    assert cb.stats()["steps_per_dispatch"] >= 2.0


def test_speculative_serving_over_scheduler_matches_resident(model):
    """r5 (verdict item 3): speculation × streaming scheduler — each verify
    chunk streams every layer's weights ONCE for all k+1 candidates
    (sched.verify_pass), so streamed serving emits exactly the resident
    batcher's tokens in fewer dispatches."""
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    gen = GenerationConfig(max_new_tokens=8)
    prompts = [
        [5, 9, 23, 41, 5, 9, 23, 41, 5, 9],
        [100, 7, 3],
        [8, 8, 8, 8, 8, 12, 13],
        [50, 60, 7, 9, 11, 50, 60, 7, 9],
    ]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, runtime=rt,
        speculate_k=4,
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (spec × scheduler)"
    total = sum(len(o) for o in by_id.values())
    assert cb._steps < total  # acceptance beat 1 token/verify


def test_draft_speculative_serving_over_scheduler_matches_resident(model):
    """Draft-model speculation composes with the tiered scheduler too: the
    draft runs resident (it is small by construction), the target verifies
    through the streamed chunk pass."""
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41, 5, 9, 23, 41], [100, 7, 3, 100, 7, 3]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    cb = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, runtime=rt,
        speculate_k=3, draft=(cfg, params),  # self-draft: proposals == target
    )
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (draft × scheduler)"


def test_speculative_scheduler_host_policy_guard(model):
    """Host-placement scheduler plans have no chunk verify kernel — the
    combination must refuse up front (before any prefill runs)."""
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    rt = RuntimeConfig(decode_policy=1, stream_weights=True)
    with pytest.raises(NotImplementedError, match="TPU-KV streaming plans"):
        ContinuousBatcher(
            cfg, params, max_batch=2, max_len=64, runtime=rt, speculate_k=4
        )


def test_fused_steps_with_processors_match_per_step(model):
    """r5 (verdict item 6): repetition_penalty + min_new_tokens ride the fused
    scan in-graph (seen bitmap updated inside the scan) — token-exact vs the
    per-step path, with blocks actually fused."""
    cfg, params = model
    gen = GenerationConfig(
        max_new_tokens=7, repetition_penalty=1.4, min_new_tokens=3,
        eos_token_id=2,
    )
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}
    assert ref.stats()["steps_per_dispatch"] == 1.0  # per-step baseline

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen,
                           fused_steps=4)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (fused × processors)"
    assert cb.stats()["steps_per_dispatch"] > 1.5


def test_fused_steps_ngram_keeps_per_step(model):
    """no-repeat-ngram ban lists are host-computed — any slot with ngram
    active must fall back to per-step (and still match)."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=6, no_repeat_ngram_size=2)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen,
                           fused_steps=4)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j]
    assert cb.stats()["steps_per_dispatch"] == 1.0  # ngram forced per-step


def test_fused_steps_on_tp_mesh_match_per_step():
    """fused_steps × TP mesh (ADVICE r4): the fused scan's donated ragged
    cache must keep its shardings through the block — token parity vs the
    per-step mesh path, with blocks actually fused."""
    from lia_tpu.parallel.mesh import make_mesh

    cfg = get_config("opt-tiny").replace(vocab_size=512, dtype="float32")
    params = init_dummy_params(cfg, seed=22, scale=0.12)
    gen = GenerationConfig(max_new_tokens=6)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [12, 13]]

    mesh = make_mesh((1, 4))
    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                            mesh=mesh)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                           mesh=mesh, fused_steps=3)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (fused × mesh)"
    assert cb.stats()["steps_per_dispatch"] > 1.5


def test_chunked_admission_on_tp_mesh_matches(model):
    """chunked admission × TP mesh (r5, matrix cell): chunk prefills run
    GSPMD-sharded into a head-sharded seg; outputs match unmeshed chunked
    serving token-for-token."""
    from lia_tpu.parallel.mesh import make_mesh

    cfg = get_config("opt-tiny").replace(vocab_size=512, dtype="float32")
    params = init_dummy_params(cfg, seed=22, scale=0.12)
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41, 7, 8, 9, 10, 11, 12], [100, 7, 3], [12, 13]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                            prefill_chunk=8)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    mesh = make_mesh((1, 4))
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                           mesh=mesh, prefill_chunk=8)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (chunked × mesh)"


def test_paged_serving_over_scheduler_matches_resident(model):
    """r5 (matrix cell: paged × scheduler): one [L, nb, H, bs, D] pool serves
    resident AND streamed layers (sched.decode_pass_paged); per-request tokens
    match the resident paged batcher."""
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    gen = GenerationConfig(max_new_tokens=5)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [8, 8, 8, 8, 8, 12, 13], [50, 60]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen,
                            paged=True)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    rt = RuntimeConfig(hbm_percentage=50, stream_weights=True)
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen,
                           paged=True, runtime=rt)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j], f"request {i} (paged × scheduler)"
    _paged_pool_accounting_clean(cb)  # asserts internally


def test_paged_scheduler_fully_streamed(model):
    """hbm=0 (every layer streamed): the paged pool still serves all layers."""
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    gen = GenerationConfig(max_new_tokens=4)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]

    ref = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                            paged=True)
    ids_ref = [ref.submit(p) for p in prompts]
    ref_by_id = {r.req_id: r.output for r in ref.run()}

    rt = RuntimeConfig(hbm_percentage=0, stream_weights=True)
    cb = ContinuousBatcher(cfg, params, max_batch=2, max_len=64, gen=gen,
                           paged=True, runtime=rt)
    ids = [cb.submit(p) for p in prompts]
    by_id = {r.req_id: r.output for r in cb.run()}
    for i, j in zip(ids, ids_ref):
        assert by_id[i] == ref_by_id[j]


def test_paged_scheduler_host_policy_guard(model):
    from lia_tpu.config import RuntimeConfig

    cfg, params = model
    rt = RuntimeConfig(decode_policy=1, stream_weights=True)
    with pytest.raises(NotImplementedError, match="TPU-KV streaming plans"):
        ContinuousBatcher(cfg, params, max_batch=2, max_len=64, paged=True,
                          runtime=rt)
