"""Continuous batching: slot-based serving over a ragged KV cache.

North-star requirement ("continuous batching", BASELINE.json) — the reference has
only multi-instance batch serving (launcher --ninstances, SURVEY §2.5); this is the
TPU-native upgrade: a fixed-shape decode step over ``max_batch`` slots where each
slot carries its own cache length (`decode_step_ragged`), finished sequences free
their slot immediately, and waiting requests are admitted by prefilling into the
free slot and splicing the resulting KV segment into the batch cache
(:func:`lia_tpu.ops.kv_cache.insert_slot`). Shapes stay static → zero recompiles in
steady state.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig, RuntimeConfig
from lia_tpu.engine.engine import bucket_length, pack_prompts
from lia_tpu.models import transformer as T
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.ops import sampling


@dataclass
class Request:
    req_id: int
    prompt: List[int]
    max_new_tokens: int
    output: List[int] = field(default_factory=list)
    # per-request sampling params (vLLM SamplingParams analog); None → the
    # engine's GenerationConfig defaults
    do_sample: Optional[bool] = None
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    stop_token_ids: Optional[List[int]] = None  # extra per-request stops
    repetition_penalty: Optional[float] = None  # needs engine processors on
    min_new_tokens: Optional[int] = None  # needs engine processors on
    no_repeat_ngram_size: Optional[int] = None  # needs engine processors on
    submitted_at: float = field(default_factory=time.perf_counter)
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    @property
    def ttft_s(self) -> Optional[float]:
        return None if self.first_token_at is None else self.first_token_at - self.submitted_at


class ContinuousBatcher:
    """Slot-based continuous batching engine (single device, resident weights)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params_host: Any,
        max_batch: int = 8,
        max_len: int = 512,
        gen: GenerationConfig = GenerationConfig(),
        kv_quantized: bool = False,
        mesh=None,
        runtime: Optional[RuntimeConfig] = None,
        paged: bool = False,
        block_size: int = 16,
        num_blocks: Optional[int] = None,
        prefill_chunk: Optional[int] = None,
        fused_steps: int = 1,
        enable_processors: Optional[bool] = None,
        speculate_k: Optional[int] = None,
        speculate_ngram: int = 3,
        draft: Optional[tuple] = None,  # (draft ModelConfig, draft host params)
        prefix_cache: bool = True,  # paged mode: automatic prefix caching
        # (off => every admission allocates fresh pages; the APC A/B knob)
    ):
        """``mesh``: optional (1, tp) jax Mesh — weights and KV shard over the
        "model" axis (ICI tensor parallelism); the data axis must be 1 because
        admission prefills single requests.

        ``runtime``: a RuntimeConfig with tiering/streaming/policies routes all
        serving compute through the StreamingScheduler's ragged passes — the
        round-1 gap where ContinuousBatcher was resident-only (reference: every
        generation mode runs under any policy).

        ``paged``: allocate KV in fixed-size pages from a shared pool instead
        of slot-per-sequence slabs (vLLM-style; reference PagedAttention op).
        Decode walks the block table inside the Pallas kernel; pages free as
        requests finish, so max_len no longer reserves worst-case memory per
        slot. Block 0 is the reserved null page. Paged mode includes automatic
        prefix caching (vLLM APC analog): full prompt blocks register under a
        rolling prefix hash, finished requests' pages linger (refcount 0) until
        the pool reclaims them FIFO, and an admission whose prompt prefix hits
        the cache seeds its KV from the shared pages and computes only a
        chunk-bucketed suffix (compute + memory reuse).

        ``prefill_chunk``: admission processes at most ONE chunk of this many
        prompt tokens per engine step, so running requests keep decoding while
        a long prompt prefills (bounds the TTFT inflation a synchronous
        admission prefill causes — the round-1 weak spot). Composes with paged
        mode (pages reserved up front; a prefix-cache hit seeds the seg and
        only the uncached suffix is chunked).

        ``fused_steps``: when the admission queue is empty, decode up to this
        many tokens per DISPATCH (a ``lax.scan`` of decode+sample inside one
        jit) instead of one. Amortizes the host→device dispatch overhead that
        otherwise floors serving tok/s (~25 ms/dispatch through this rig's
        remote tunnel; still ~10 µs+sync on a local chip). The block length is
        capped at the smallest remaining token budget across active slots, so
        page/slab reservations can never overflow; slots that hit EOS
        mid-block are truncated host-side (their extra in-block writes land in
        already-reserved space and are reset on slot reuse by
        :func:`~lia_tpu.ops.kv_cache.insert_slot`). A queued request waits at
        most the smallest remaining budget across active slots beyond the
        slot-free event it was already waiting for (after admission, queued ==
        no free slot), so blocks keep shortening as a slot nears its finish.
        Composes with slab and paged storage, TP meshes, per-row sampling, and
        (r5) the in-graph logits processors — repetition penalty and
        min-new-tokens ride the fused scan with the ``seen`` bitmap updated
        in-graph; only no-repeat-ngram (host-computed ban lists) forces the
        per-step path, as do speculation and the streaming scheduler (host
        work between steps)."""
        self.cfg = cfg
        self.gen = gen
        self.B = max_batch
        self.max_len = max_len
        self.mesh = mesh
        self.sched = None
        if mesh is None and (runtime is None or runtime.fuse_projections):
            # fused projections are not column-shardable; single-device only
            from lia_tpu.ops.fuse import fuse_projections

            params_host = fuse_projections(cfg, params_host)
        needs_scheduler = runtime is not None and (
            runtime.hbm_percentage < 100
            or runtime.stream_weights
            or runtime.prefill_policy != 3
            or runtime.decode_policy != 3
        )
        if needs_scheduler:
            from lia_tpu.runtime.scheduler import StreamingScheduler

            # composes with a TP mesh for TPU-resident-KV streaming plans
            # (the scheduler validates; host-placement policies stay per-host)
            self.sched = StreamingScheduler(cfg, runtime, params_host, mesh=mesh)
            self.params = self.sched.resident_params
            # paged mode replaces the slab serving state with the shared pool
            self.state = (
                None if paged else self.sched.init_serving_state(max_batch, max_len)
            )
            self._cache_shardings = None
            self.cache = None
        elif mesh is not None:
            from lia_tpu.parallel import sharding as shd

            if mesh.shape.get("data", 1) != 1:
                raise ValueError("serving mesh must have data axis 1 (TP only)")
            self.params = shd.shard_params(cfg, params_host, mesh)
            self._cache_shardings = shd.cache_shardings(mesh)
        else:
            self.params = jax.device_put(params_host)
            self._cache_shardings = None
        self.paged = paged
        if paged:
            if self.sched is not None:
                # r5: paged × scheduler — one [L, nb, H, bs, D] pool covers
                # resident and streamed layers (sched.decode_pass_paged);
                # TPU-KV streaming plans only, and prefix reuse stays off
                # (the APC suffix recompute needs the resident chunk path)
                if not self.sched.tpu_kv_plans:
                    raise NotImplementedError(
                        "paged serving over the scheduler needs TPU-KV "
                        "streaming plans; host-placement policies have no "
                        "paged host kernel"
                    )
                if mesh is not None:
                    raise NotImplementedError(
                        "paged × scheduler × TP mesh is untested — drop one"
                    )
                if speculate_k is not None:
                    raise NotImplementedError(
                        "speculative × paged × scheduler: the chunk verify "
                        "over streamed weights reads slab segment caches "
                        "(sched.verify_pass); a paged chunk variant is the "
                        "remaining seam"
                    )
                if runtime is not None and runtime.quant.kv_cache_dtype == "int8":
                    raise NotImplementedError(
                        "paged pools store cfg.dtype; int8-KV paged is a "
                        "separate pool format"
                    )
            from lia_tpu.ops import paged as pg

            self.block_size = block_size
            # default pool: enough pages for every slot at max_len, + null page
            nb = num_blocks or (max_batch * -(-max_len // block_size) + 1)
            self.num_blocks = nb
            shape = (cfg.num_layers, nb, cfg.num_kv_heads, block_size, cfg.head_dim)
            self.k_pool = jnp.zeros(shape, jnp.dtype(cfg.dtype))
            self.v_pool = jnp.zeros(shape, jnp.dtype(cfg.dtype))
            if mesh is not None:
                # TP paged pools: shard the KV-head axis over "model" (same
                # axis the attention weights split on, so each shard's heads
                # read only local pages); the block table / refcounts / prefix
                # map are tiny replicated HOST state — the paged analog of the
                # reference keeping its beam_idx/page tables on CPU
                from jax.sharding import NamedSharding, PartitionSpec as P

                pool_sh = NamedSharding(mesh, P(None, None, "model", None, None))
                self.k_pool = jax.device_put(self.k_pool, pool_sh)
                self.v_pool = jax.device_put(self.v_pool, pool_sh)
            self.free_blocks = list(range(nb - 1, 0, -1))  # block 0 = null page
            # --- automatic prefix caching (vLLM APC analog; additive) ---
            # full prompt blocks register under a prefix-chain hash; pages stay
            # cached after their request finishes (refcount 0) until the pool
            # needs them back (FIFO eviction)
            self.page_rc = np.zeros(nb, np.int64)
            self.prefix_map: Dict[Any, int] = {}  # chain-key -> page id
            self.page_key: Dict[int, Any] = {}  # page id -> chain-key
            self.cached_pages: Dict[int, None] = {}  # insertion-ordered (FIFO)
            self.prefix_cache = prefix_cache and self.sched is None
            self.prefix_hits = 0
            self.prefix_tokens_reused = 0
            self.max_pages = -(-max_len // block_size)
            self.block_table = np.zeros((max_batch, self.max_pages), np.int32)
            self.kv_lengths = np.zeros(max_batch, np.int32)
            self.cache = None
            # XLA:CPU concurrent-dispatch race (minimal repro + variant matrix:
            # experiments/repro_sync_pools.py — ~10% of chained iterations):
            # when a computation READING the pool (decode logits, APC seed) is
            # dispatched and the next pool update is dispatched before it
            # finishes, the reader's OUTPUT is intermittently wrong on the
            # forced-8-virtual-device oversubscribed host. The pool itself is
            # never corrupted, and donation is not required to trigger it
            # (rate merely drops), so this is a backend execution race, not
            # use-after-donate. Any serialization point fixes it; TPU's
            # stream-ordered execution is structurally immune. Serialize the
            # pool chain on CPU.
            self._sync_pools = jax.default_backend() == "cpu"
        elif self.sched is None:
            self.cache = kvc.init_cache(cfg, max_batch, max_len, jnp.dtype(cfg.dtype), quantized=kv_quantized)
            # ragged state: per-slot lengths
            self.cache = self.cache._replace(length=jnp.zeros((max_batch,), jnp.int32))
            if self._cache_shardings is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shardings = self._cache_shardings._replace(
                    length=NamedSharding(self.mesh, P("data"))
                )
                self.cache = jax.device_put(self.cache, shardings)
        self.logical_pos = np.zeros(max_batch, np.int64)
        self.active = np.zeros(max_batch, bool)
        # per-slot sampling params (engine defaults until a request lands)
        self.s_temp = np.full(max_batch, gen.temperature, np.float32)
        self.s_topk = np.full(max_batch, gen.top_k, np.int32)
        self.s_topp = np.full(max_batch, gen.top_p, np.float32)
        self.s_greedy = np.full(max_batch, not gen.do_sample, bool)
        self._s_dev = None  # cached device copies of the slot params
        # logits processors (repetition_penalty / min_new_tokens /
        # no_repeat_ngram_size): a per-slot token-presence bitmap on device +
        # per-slot penalty/EOS-suppression vectors + host-computed ngram ban
        # lists, applied before every sampling warp (HF LogitsProcessorList
        # parity, per-request params)
        if enable_processors is None:
            enable_processors = (
                gen.repetition_penalty != 1.0
                or (gen.min_new_tokens > 0 and gen.eos_token_id is not None)
                or gen.no_repeat_ngram_size > 0
            )
        self.use_processors = enable_processors
        if enable_processors:
            self.seen = jnp.zeros((max_batch, cfg.vocab_size), bool)
            self.s_rep = np.full(max_batch, gen.repetition_penalty, np.float32)
            self.s_minnew = np.full(max_batch, gen.min_new_tokens, np.int32)
            self.s_ngram = np.full(max_batch, gen.no_repeat_ngram_size, np.int32)
        # prompt-lookup speculative decoding (greedy-exact): each engine step
        # verifies k proposals + 1 bonus token per active slot in ONE chunked
        # pass over the ragged slab cache (lookahead._verify_fn already takes
        # [B] bases), so accepted runs advance slots unevenly — exactly what
        # continuous batching's per-slot lengths express
        self.speculate_k = speculate_k
        self.speculate_ngram = speculate_ngram
        if speculate_k is not None:
            if mesh is not None:
                raise NotImplementedError(
                    "speculative serving ×TP mesh: the draft would replicate "
                    "per shard and each verify adds two psums × k+1 "
                    "positions; at draft sizes where speculation pays, ICI "
                    "latency eats the step savings."
                )
            if self.sched is not None and not self.sched.tpu_kv_plans:
                raise NotImplementedError(
                    "speculative serving over the streaming scheduler needs "
                    "TPU-KV streaming plans (policy-3 tiering); "
                    "host-placement policies have no chunk attention kernel"
                )
            # ×scheduler (r5): each verify chunk streams every layer's weights
            # ONCE for all k+1 candidates via sched.verify_pass, cutting
            # streamed decode's dominant cost (weight transfer) by the
            # acceptance factor — the serving-level form of the engine
            # composition measured 2.49×/1.81× in r4 (RESULTS.md).
            # draft speculation composes with paged targets and chunked
            # admission: the draft's slab cache is prefilled per admission
            # (_draft_admit) independent of the target's storage
            if self.use_processors:
                raise NotImplementedError(
                    "speculation does not compose with logits processors"
                )
            # gen.do_sample composes: proposals are accepted by the Leviathan
            # rule against the target's warped distribution (prompt-lookup
            # proposals use the point-mass special case), so outputs are
            # distributed exactly as plain sampling under the engine-level warp
        # two-model speculation: a draft model proposes the k tokens instead of
        # prompt lookup; the draft keeps its own ragged slab cache per slot
        # (holding each slot's history[:-1]) and rewinds to the verified prefix
        # after every acceptance
        self.draft = draft
        if draft is not None:
            if speculate_k is None:
                raise ValueError("draft serving requires speculate_k")
            self.dcfg, dparams = draft
            if runtime is None or runtime.fuse_projections:
                from lia_tpu.ops.fuse import fuse_projections

                dparams = fuse_projections(self.dcfg, dparams)
            self.dparams = jax.device_put(dparams)
            self.dcache = kvc.init_cache(
                self.dcfg, max_batch, max_len, jnp.dtype(self.dcfg.dtype)
            )
            self.dcache = self.dcache._replace(
                length=jnp.zeros((max_batch,), jnp.int32)
            )
            self.dlen = np.zeros(max_batch, np.int64)  # host mirror of lengths
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.tokens = np.full(max_batch, gen.pad_token_id, np.int32)
        if prefill_chunk is not None and self.sched is not None:
            raise ValueError(
                "prefill_chunk composes with resident (slab or paged) serving "
                "only — the scheduler's streamed prefill already minibatches "
                "per layer; chunking it would re-stream every layer's weights "
                "per chunk (docs/serving.md matrix)"
            )
        self.prefill_chunk = prefill_chunk
        self._pending = None  # in-flight chunked admission state
        self.queue: Deque[Request] = deque()
        self.done: List[Request] = []
        self._next_id = 0
        self._compiled: Dict[Any, Any] = {}
        self._rng = jax.random.PRNGKey(0)
        self._steps = 0
        self._dispatches = 0  # decode dispatches (fused blocks count once)
        if fused_steps < 1:
            raise ValueError("fused_steps must be >= 1")
        self.fused_steps = fused_steps

    # -- paged-pool allocation / prefix cache ----------------------------------

    def _alloc_page(self) -> Optional[int]:
        """One free page, evicting the oldest rc==0 cached page if needed."""
        if self.free_blocks:
            return self.free_blocks.pop()
        if self.cached_pages:
            page = next(iter(self.cached_pages))  # oldest insertion (FIFO)
            del self.cached_pages[page]
            key = self.page_key.pop(page, None)
            if key is not None:
                self.prefix_map.pop(key, None)
            return page
        return None

    def _allocatable(self) -> int:
        return len(self.free_blocks) + len(self.cached_pages)

    def _prefix_chain_keys(self, prompt: List[int]) -> List[Any]:
        bs = self.block_size
        return [tuple(prompt[: (i + 1) * bs]) for i in range(len(prompt) // bs)]

    def _prefix_lookup(self, prompt: List[int]):
        """Longest cached full-block chain for this prompt → (pages, n_tokens)."""
        pages: List[int] = []
        for key in self._prefix_chain_keys(prompt):
            page = self.prefix_map.get(key)
            if page is None:
                break
            pages.append(page)
        return pages, len(pages) * self.block_size

    def _claim_page(self, page: int) -> None:
        self.page_rc[page] += 1
        self.cached_pages.pop(page, None)  # active again — not evictable

    def _release_pages(self, pages) -> None:
        for b in pages:
            b = int(b)
            if b == 0:
                continue
            self.page_rc[b] -= 1
            if self.page_rc[b] > 0:
                continue
            if b in self.page_key:  # registered prefix block: keep cached
                self.cached_pages[b] = None
            else:
                self.free_blocks.append(b)

    def _register_prefix(self, prompt: List[int], row: np.ndarray) -> None:
        for i, key in enumerate(self._prefix_chain_keys(prompt)):
            page = int(row[i])
            if key not in self.prefix_map:
                self.prefix_map[key] = page
                self.page_key[page] = key

    def _paged_admission_plan(self, req: Request, span_of):
        """Reserve pages for one admission, reusing the cached prefix chain.

        ``span_of(suffix_len)`` maps the uncached suffix length to the static
        recompute span Cs (the chunk covers [n-Cs, n) with all-real tokens —
        extending DOWN keeps cache validity contiguous, so the Pallas chunk
        kernel stays legal). Returns ``(row, chain, base, n_shared, n_seed)``
        or None on page backpressure (caller requeues).
        """
        n = len(req.prompt)
        bs_pg = self.block_size
        # speculative verify writes k+1 chunk tokens past the committed length
        slack = self.speculate_k + 1 if self.speculate_k is not None else 0
        n_pages = -(-(n + req.max_new_tokens + slack) // bs_pg)
        if self.sched is not None or not self.prefix_cache:
            # prefix reuse needs the resident chunk-prefill path (scheduler
            # admissions are the streamed pass), and prefix_cache=False is the
            # APC A/B knob — allocate fresh pages only
            chain, reused = [], 0
        else:
            chain, reused = self._prefix_lookup(req.prompt)
        reused = min(reused, n - 1)  # >=1 token must produce logits
        base = 0
        if reused > 0:
            span = span_of(n - reused)
            if n - span >= bs_pg:  # at least one full shared block
                base = n - span
        n_shared = base // bs_pg  # full blocks this request shares
        n_seed = -(-base // bs_pg)  # chain pages the seed reads
        n_fresh = n_pages - n_shared
        cached_chain = sum(1 for p in chain[:n_seed] if p in self.cached_pages)
        if self._allocatable() - cached_chain < n_fresh:
            return None
        for p in chain[:n_seed]:  # pin before eviction can touch them
            self._claim_page(p)
        fresh = [self._alloc_page() for _ in range(n_fresh)]
        row = np.zeros(self.max_pages, np.int32)
        row[:n_pages] = chain[:n_shared] + fresh
        for p in fresh:
            self.page_rc[p] += 1
        return row, chain, base, n_shared, n_seed

    def _paged_seed(self, row_chain: List[int], base: int, n_seed: int, bucket: int):
        """Build the APC seed seg cache (prefix KV gathered from shared pages)."""
        from lia_tpu.ops import paged as pg

        seed_row = np.zeros(self.max_pages, np.int32)
        seed_row[:n_seed] = row_chain[:n_seed]
        seed_key = ("seed", bucket)
        if seed_key not in self._compiled:
            self._compiled[seed_key] = jax.jit(
                partial(pg.seed_prefix_cache, bucket=bucket)
            )
        return self._compiled[seed_key](
            self.k_pool, self.v_pool, jnp.asarray(seed_row),
            jnp.asarray(base, jnp.int32),
        )

    def _paged_commit(self, req, slot, seg, row, chain, base, n_shared, n_seed, pad):
        """Write a finished prompt's KV into its pages and register the prefix.

        APC admissions (base>0) write [n_shared*bs, n) straight from the seg
        (slot 0 == position 0); full prefills arrive left-padded and roll first.
        """
        from lia_tpu.ops import paged as pg

        n = len(req.prompt)
        if "page_prompt" not in self._compiled:
            self._compiled["page_prompt"] = jax.jit(
                pg.write_prompt_all_layers, donate_argnums=(0, 1)
            )
        if base > 0:
            seg_k, seg_v = seg.k[:, 0], seg.v[:, 0]
            write_start = n_shared * self.block_size
            self.prefix_hits += 1
            self.prefix_tokens_reused += base
        else:
            # prompts are left-padded in the slab; pages want tokens from 0
            seg_k = jnp.roll(seg.k[:, 0], -pad, axis=2)  # [L, H, S, D]
            seg_v = jnp.roll(seg.v[:, 0], -pad, axis=2)
            write_start = 0
        self.k_pool, self.v_pool = self._compiled["page_prompt"](
            self.k_pool, self.v_pool, seg_k, seg_v,
            jnp.asarray(row), jnp.asarray(n, jnp.int32),
            jnp.asarray(write_start, jnp.int32),
        )
        if self._sync_pools:
            jax.block_until_ready((self.k_pool, self.v_pool))
        # unpin the boundary chain page (read transiently by the seed)
        self._release_pages(chain[n_shared:n_seed])
        if self.prefix_cache:
            self._register_prefix(req.prompt, row)
        self.block_table[slot] = row
        self.kv_lengths[slot] = n

    def _apc_admit_fn(self, Cb: int, bucket: int):
        """ONE-dispatch APC admission: seed-from-pages + suffix chunk prefill
        + page commit fused in a single jit (see the _admit call-site note —
        separate dispatches cost more than the saved prefill on a
        dispatch-floor-bound link)."""
        key = ("apc_admit", Cb, bucket)
        if key not in self._compiled:
            from lia_tpu.ops import paged as pg

            cfg = self.cfg

            def f(params, k_pool, v_pool, seed_row, base, suffix, row, n,
                  write_start):
                seg = pg.seed_prefix_cache(k_pool, v_pool, seed_row, base,
                                           bucket=bucket)
                logits, seg = T.prefill_chunk(
                    cfg, params, suffix, jnp.ones_like(suffix, bool), seg
                )
                k_pool, v_pool = pg.write_prompt_all_layers(
                    k_pool, v_pool, seg.k[:, 0], seg.v[:, 0], row, n,
                    write_start,
                )
                return logits, k_pool, v_pool

            self._compiled[key] = jax.jit(f, donate_argnums=(1, 2))
        return self._compiled[key]

    def _finish_apc_commit(self, req, slot, row, chain, base, n_shared, n_seed):
        """Host-side bookkeeping for a fused APC admission (the device work —
        seed/chunk/commit — already ran inside _apc_admit_fn)."""
        self.prefix_hits += 1
        self.prefix_tokens_reused += base
        # unpin the boundary chain page (read transiently by the seed)
        self._release_pages(chain[n_shared:n_seed])
        if self.prefix_cache:
            self._register_prefix(req.prompt, row)
        self.block_table[slot] = row
        self.kv_lengths[slot] = len(req.prompt)

    # -- compiled fns ---------------------------------------------------------

    def _decode_fn(self):
        if "decode" not in self._compiled:
            self._compiled["decode"] = jax.jit(
                partial(T.decode_step_ragged, self.cfg), donate_argnums=(3,)
            )
        return self._compiled["decode"]

    def _prefill_fn(self, bucket: int):
        key = ("prefill", bucket)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(partial(T.prefill, self.cfg), donate_argnums=(3,))
        return self._compiled[key]

    def _insert_fn(self):
        if "insert" not in self._compiled:
            self._compiled["insert"] = jax.jit(kvc.insert_slot, donate_argnums=(0,))
        return self._compiled["insert"]

    # -- API ------------------------------------------------------------------

    def submit(
        self,
        prompt: Sequence[int],
        max_new_tokens: Optional[int] = None,
        do_sample: Optional[bool] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        stop_token_ids: Optional[Sequence[int]] = None,
        repetition_penalty: Optional[float] = None,
        min_new_tokens: Optional[int] = None,
        no_repeat_ngram_size: Optional[int] = None,
    ) -> int:
        """Queue a request. Sampling kwargs override the engine's
        GenerationConfig PER REQUEST (mixed greedy/sampled batches decode
        together — :func:`lia_tpu.ops.sampling.sample_per_row`)."""
        if (
            repetition_penalty is not None
            or min_new_tokens is not None
            or no_repeat_ngram_size is not None
        ) and not self.use_processors:
            raise ValueError(
                "per-request repetition_penalty/min_new_tokens need the engine "
                "built with enable_processors=True (or processor defaults in gen)"
            )
        if self.speculate_k is not None and any(
            x is not None for x in (do_sample, temperature, top_k, top_p)
        ):
            raise ValueError(
                "speculative serving samples under the ENGINE-level warp (the "
                "acceptance math needs one shared p/q warp per verify pass); "
                "per-request sampling overrides do not compose"
            )
        rid = self._next_id
        self._next_id += 1
        self.queue.append(Request(
            rid, list(prompt), max_new_tokens or self.gen.max_new_tokens,
            do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p,
            stop_token_ids=list(stop_token_ids) if stop_token_ids else None,
            repetition_penalty=repetition_penalty, min_new_tokens=min_new_tokens,
            no_repeat_ngram_size=no_repeat_ngram_size,
        ))
        return rid

    # -- per-slot sampling params ----------------------------------------

    def _slot_sampling(self, slot: int, req: Request) -> None:
        g = self.gen
        ds = g.do_sample if req.do_sample is None else req.do_sample
        self.s_greedy[slot] = not ds
        self.s_temp[slot] = g.temperature if req.temperature is None else req.temperature
        self.s_topk[slot] = g.top_k if req.top_k is None else req.top_k
        self.s_topp[slot] = g.top_p if req.top_p is None else req.top_p
        if self.use_processors:
            self.s_rep[slot] = (
                g.repetition_penalty if req.repetition_penalty is None
                else req.repetition_penalty
            )
            self.s_minnew[slot] = (
                g.min_new_tokens if req.min_new_tokens is None else req.min_new_tokens
            )
            self.s_ngram[slot] = (
                g.no_repeat_ngram_size if req.no_repeat_ngram_size is None
                else req.no_repeat_ngram_size
            )
        self._s_dev = None  # invalidate the cached device copies

    def _activate_slot(self, slot: int, req: Request, first: int) -> None:
        """Common admission tail: record the first token and bring the slot up."""
        req.first_token_at = time.perf_counter()
        req.output.append(first)
        self.slot_req[slot] = req
        self.active[slot] = True
        self._slot_sampling(slot, req)
        if self.use_processors:
            row = np.zeros((1, self.cfg.vocab_size), bool)
            row[0, np.asarray(req.prompt, np.int64)] = True
            row[0, first] = True
            if "set_seen_row" not in self._compiled:
                self._compiled["set_seen_row"] = jax.jit(
                    lambda seen, r, s: jax.lax.dynamic_update_slice(seen, r, (s, 0)),
                    donate_argnums=(0,),
                )
            self.seen = self._compiled["set_seen_row"](
                self.seen, jnp.asarray(row), jnp.asarray(slot, jnp.int32)
            )
        self.tokens[slot] = first
        self.logical_pos[slot] = len(req.prompt)
        self._maybe_finish(slot, first)

    def _process_rows_fn(self):
        if "process_rows" not in self._compiled:
            self._compiled["process_rows"] = jax.jit(partial(
                sampling.process_logits_rows, eos_token_id=self.gen.eos_token_id
            ))
        return self._compiled["process_rows"]

    @staticmethod
    def _ngram_bans(seq: List[int], n: int) -> List[int]:
        """HF NoRepeatNGram over one un-padded history: tokens that would
        complete an n-gram already present in ``seq``."""
        if n <= 0 or len(seq) < n - 1:
            return []
        if n == 1:
            return sorted(set(seq))
        tail = tuple(seq[len(seq) - (n - 1):])
        return sorted({
            seq[i + n - 1]
            for i in range(len(seq) - n + 1)
            if tuple(seq[i : i + n - 1]) == tail
        })

    def _apply_ngram_bans(self, logits, ban_rows: List[List[int]]):
        """Upload the host-computed ban lists (width bucketed to bound
        compiles) and NEG_INF them in one device scatter."""
        K = max(len(b) for b in ban_rows)
        if K == 0:
            return logits
        K = bucket_length(K, minimum=8)
        arr = np.full((len(ban_rows), K), -1, np.int32)
        for b, bans in enumerate(ban_rows):
            arr[b, : len(bans)] = bans
        if "ban_rows" not in self._compiled:
            self._compiled["ban_rows"] = jax.jit(sampling.ban_tokens_rows)
        return self._compiled["ban_rows"](logits, jnp.asarray(arr))

    def _sample_rows(self, logits, sub):
        if self.s_greedy.all():
            # default/all-greedy batches skip the per-row warp entirely (one
            # dispatch; ~25ms/dispatch through the remote tunnel)
            return sampling.greedy(logits)
        if self._s_dev is None:  # re-upload slot params only when they change
            self._s_dev = (
                jnp.asarray(self.s_temp), jnp.asarray(self.s_topk),
                jnp.asarray(self.s_topp), jnp.asarray(self.s_greedy),
            )
        if "sample_rows" not in self._compiled:
            self._compiled["sample_rows"] = jax.jit(sampling.sample_per_row)
        return self._compiled["sample_rows"](logits, sub, *self._s_dev)

    def _sample_one(self, logits, sub, req: Request) -> int:
        g = self.gen
        if self.use_processors:
            row = np.zeros((1, self.cfg.vocab_size), bool)
            row[0, np.asarray(req.prompt, np.int64)] = True
            rep = (
                g.repetition_penalty if req.repetition_penalty is None
                else req.repetition_penalty
            )
            mn = g.min_new_tokens if req.min_new_tokens is None else req.min_new_tokens
            logits = self._process_rows_fn()(
                logits, jnp.asarray(row), jnp.asarray([rep], jnp.float32),
                jnp.asarray([mn > 0 and g.eos_token_id is not None]),
            )
            ng = (
                g.no_repeat_ngram_size if req.no_repeat_ngram_size is None
                else req.no_repeat_ngram_size
            )
            logits = self._apply_ngram_bans(
                logits, [self._ngram_bans(req.prompt, ng)]
            )
        ds = g.do_sample if req.do_sample is None else req.do_sample
        if not ds:
            return int(jnp.argmax(logits[0]))
        if "sample_one" not in self._compiled:
            self._compiled["sample_one"] = jax.jit(sampling.sample_per_row)
        return int(self._compiled["sample_one"](
            logits, sub,
            jnp.asarray([g.temperature if req.temperature is None else req.temperature],
                        jnp.float32),
            jnp.asarray([g.top_k if req.top_k is None else req.top_k], jnp.int32),
            jnp.asarray([g.top_p if req.top_p is None else req.top_p], jnp.float32),
            jnp.asarray([False]),
        )[0])

    def _chunk_fn(self, C: int):
        key = ("chunk", C)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                partial(T.prefill_chunk, self.cfg), donate_argnums=(3,)
            )
        return self._compiled[key]

    def _admit_chunked(self) -> None:
        """Process at most ONE prompt chunk per engine step; decode continues
        between chunks (chunked/piggybacked prefill). In paged mode the pages
        are reserved up front, a cached prefix seeds the seg (APC), and only
        the uncached suffix is chunked."""
        C = self.prefill_chunk
        if self._pending is None:
            if not self.queue or self.active.all():
                return
            slot = int(np.flatnonzero(~self.active)[0])
            req = self.queue.popleft()
            n = len(req.prompt)
            plan = None
            if self.paged:
                plan = self._paged_admission_plan(req, lambda s: -(-s // C) * C)
                if plan is None:
                    if not self.active.any():  # nothing will ever free pages
                        raise ValueError(
                            f"request {req.req_id} needs more KV pages than the pool holds"
                        )
                    self.queue.appendleft(req)  # no pages — wait for frees
                    return
            base = plan[2] if plan is not None else 0
            total = -(-(n - base) // C) * C  # chunked span (all-real if base>0)
            slack = self.speculate_k + 1 if self.speculate_k is not None else 0
            if total + req.max_new_tokens + slack > self.max_len:
                raise ValueError(
                    f"request {req.req_id} needs {total + req.max_new_tokens + slack} slots > max_len {self.max_len}"
                )
            if base > 0:
                toks = np.asarray(req.prompt[base:], np.int32)  # == total tokens
                mask = np.ones(total, bool)
                seg = self._paged_seed(plan[1], base, plan[4], self.max_len)
            else:
                toks = np.full(total, self.gen.pad_token_id, np.int32)
                toks[total - n:] = np.asarray(req.prompt, np.int32)  # left-pad chunk 0
                mask = np.zeros(total, bool)
                mask[total - n:] = True
                seg = kvc.init_cache(
                    self.cfg, 1, self.max_len, jnp.dtype(self.cfg.dtype),
                    quantized=self.cache is not None
                    and not isinstance(self.cache.k, jnp.ndarray),
                )
                if self._cache_shardings is not None:  # chunked × TP mesh
                    seg = jax.device_put(seg, self._cache_shardings)
            self._pending = [req, slot, seg, toks, mask, 0, plan]
        req, slot, seg, toks, mask, off, plan = self._pending
        logits, seg = self._chunk_fn(C)(
            self.params,
            jnp.asarray(toks[off : off + C])[None],
            jnp.asarray(mask[off : off + C])[None],
            seg,
        )
        off += C
        if off < len(toks):
            self._pending = [req, slot, seg, toks, mask, off, plan]
            return
        # final chunk: sample the first token and splice the segment in
        self._pending = None
        self._rng, sub = jax.random.split(self._rng)
        first = self._sample_one(logits, sub, req)
        if self.paged:
            row, chain, base, n_shared, n_seed = plan
            self._paged_commit(
                req, slot, seg, row, chain, base, n_shared, n_seed,
                pad=len(toks) - len(req.prompt) if base == 0 else 0,
            )
        else:
            self.cache = self._insert_fn()(self.cache, seg, jnp.asarray(slot, jnp.int32))
        if self.draft is not None:
            # the draft prefills whole-prompt at the final chunk (chunking
            # exists to bound TARGET prefill stalls; the draft is small)
            bucket = bucket_length(len(req.prompt))
            dt, dm = pack_prompts([req.prompt], self.gen.pad_token_id, bucket=bucket)
            self._draft_admit(dt, dm, slot, bucket)
        self._activate_slot(slot, req, first)

    def _admit(self) -> None:
        if self.prefill_chunk is not None:
            self._admit_chunked()
            return
        while self.queue and not self.active.all():
            slot = int(np.flatnonzero(~self.active)[0])
            req = self.queue.popleft()
            bucket = bucket_length(len(req.prompt))
            slack = self.speculate_k + 1 if self.speculate_k is not None else 0
            if bucket + req.max_new_tokens + slack > self.max_len:
                raise ValueError(
                    f"request {req.req_id} needs {bucket + req.max_new_tokens + slack} slots > max_len {self.max_len}"
                )
            tokens, mask = pack_prompts([req.prompt], self.gen.pad_token_id, bucket=bucket)
            if self.paged:
                n = len(req.prompt)
                # --- automatic prefix caching: reuse the longest cached
                # full-block chain, recompute only a bucket-sized suffix.
                plan = self._paged_admission_plan(req, bucket_length)
                if plan is None:
                    if not self.active.any():  # nothing will ever free pages
                        raise ValueError(
                            f"request {req.req_id} needs more KV pages than the pool holds"
                        )
                    self.queue.appendleft(req)  # no memory — wait for frees
                    return
                row, chain, base, n_shared, n_seed = plan
                if base > 0:
                    # APC admission in ONE dispatch: seed [0, base) from the
                    # shared pages, chunk-prefill [base, n), and commit the
                    # suffix back to pages inside a single jit — on a
                    # dispatch-floor-bound link (25 ms/dispatch here) the
                    # separate seed/chunk/commit dispatches cost more than
                    # the prefill compute APC saves (measured r5: 0.65-0.78×
                    # at 448/1408-token prefixes), turning the feature into a
                    # loss; fused, APC strictly removes both compute AND a
                    # dispatch vs the full-prefill path.
                    Cb = n - base
                    suffix = np.asarray(req.prompt[base:], np.int32)[None]
                    seed_row = np.zeros(self.max_pages, np.int32)
                    seed_row[:n_seed] = chain[:n_seed]
                    logits, self.k_pool, self.v_pool = self._apc_admit_fn(
                        Cb, bucket
                    )(
                        self.params, self.k_pool, self.v_pool,
                        jnp.asarray(seed_row), jnp.asarray(base, jnp.int32),
                        jnp.asarray(suffix), jnp.asarray(row),
                        jnp.asarray(n, jnp.int32),
                        jnp.asarray(n_shared * self.block_size, jnp.int32),
                    )
                    if self._sync_pools:
                        jax.block_until_ready((self.k_pool, self.v_pool))
                    self._finish_apc_commit(
                        req, slot, row, chain, base, n_shared, n_seed
                    )
                    self._rng, sub = jax.random.split(self._rng)
                    first = self._sample_one(logits, sub, req)
                    if self.draft is not None:
                        self._draft_admit(tokens, mask, slot, bucket)
                    self._activate_slot(slot, req, first)
                    continue
                elif self.sched is not None:
                    # paged × scheduler: streamed prefill into slab segment
                    # caches, then both segments' planes concatenate to one
                    # [L, 1, H, S, D] slab for the page commit
                    logits, seg_state = self.sched.prefill_pass(
                        tokens, mask, bucket
                    )
                    seg = self._sched_seg_to_slab(seg_state)
                    pad = bucket - n
                else:
                    # full prefill into a throwaway contiguous cache
                    seg = kvc.init_cache(self.cfg, 1, bucket, jnp.dtype(self.cfg.dtype))
                    if self._cache_shardings is not None:
                        seg = jax.device_put(seg, self._cache_shardings)
                    logits, seg = self._prefill_fn(bucket)(
                        self.params, jnp.asarray(tokens), jnp.asarray(mask), seg
                    )
                    pad = bucket - n
                self._rng, sub = jax.random.split(self._rng)
                first = self._sample_one(logits, sub, req)
                self._paged_commit(
                    req, slot, seg, row, chain, base, n_shared, n_seed, pad
                )
                if self.draft is not None:
                    self._draft_admit(tokens, mask, slot, bucket)
            elif self.sched is not None:
                logits, seg_state = self.sched.prefill_pass(tokens, mask, self.max_len)
                self._rng, sub = jax.random.split(self._rng)
                first = self._sample_one(logits, sub, req)
                self.state = self.sched.insert_slot_state(self.state, seg_state, slot)
                if self.draft is not None:
                    self._draft_admit(tokens, mask, slot, bucket)
            else:
                seg = kvc.init_cache(
                    self.cfg, 1, self.max_len,
                    jnp.dtype(self.cfg.dtype),
                    quantized=not isinstance(self.cache.k, jnp.ndarray),
                )
                if self._cache_shardings is not None:
                    seg = jax.device_put(seg, self._cache_shardings)
                logits, seg = self._prefill_fn(bucket)(
                    self.params, jnp.asarray(tokens), jnp.asarray(mask), seg
                )
                self._rng, sub = jax.random.split(self._rng)
                first = self._sample_one(logits, sub, req)
                self.cache = self._insert_fn()(self.cache, seg, jnp.asarray(slot, jnp.int32))
                if self.draft is not None:
                    self._draft_admit(tokens, mask, slot, bucket)
            self._activate_slot(slot, req, first)

    def _sched_seg_to_slab(self, seg_state):
        """Concatenate the scheduler's {res, str} b=1 segment caches into one
        [L, 1, H, S, D] slab view for the page commit (TPU-KV plans only, so
        both segments live in HBM)."""
        planes = [
            (c.k, c.v) for c in (seg_state["res"], seg_state["str"]) if c is not None
        ]
        if len(planes) == 1:
            k, v = planes[0]
        else:
            k = jnp.concatenate([p[0] for p in planes], axis=0)
            v = jnp.concatenate([p[1] for p in planes], axis=0)
        return kvc.KVCache(k=k, v=v, length=jnp.asarray(0, jnp.int32),
                           mask=jnp.zeros((1, 1), bool))

    def _draft_admit(self, tokens, mask, slot: int, bucket: int) -> None:
        """Prefill the draft model's slab cache for a newly admitted slot.

        The draft cache is slab-based regardless of the TARGET's storage
        (paged or slab) — draft speculation composes with paged serving
        because the two caches are independent."""
        dkey = ("dprefill", bucket)
        if dkey not in self._compiled:
            self._compiled[dkey] = jax.jit(
                partial(T.prefill, self.dcfg), donate_argnums=(3,)
            )
        dseg = kvc.init_cache(
            self.dcfg, 1, self.max_len, jnp.dtype(self.dcfg.dtype)
        )
        _, dseg = self._compiled[dkey](
            self.dparams, jnp.asarray(tokens), jnp.asarray(mask), dseg
        )
        if "dinsert" not in self._compiled:
            self._compiled["dinsert"] = jax.jit(
                kvc.insert_slot, donate_argnums=(0,)
            )
        self.dcache = self._compiled["dinsert"](
            self.dcache, dseg, jnp.asarray(slot, jnp.int32)
        )
        self.dlen[slot] = bucket

    def _maybe_finish(self, slot: int, tok: int) -> None:
        req = self.slot_req[slot]
        if req is None:
            return
        eos_hit = self.gen.eos_token_id is not None and tok == self.gen.eos_token_id
        if req.stop_token_ids is not None and tok in req.stop_token_ids:
            eos_hit = True
        if eos_hit or len(req.output) >= req.max_new_tokens:
            req.finished_at = time.perf_counter()
            self.done.append(req)
            self.slot_req[slot] = None
            self.active[slot] = False
            if self.paged:  # drop refcounts; prefix pages stay cached
                self._release_pages(self.block_table[slot])
                self.block_table[slot] = 0
                self.kv_lengths[slot] = 0

    def _spec_step(self) -> None:
        """One speculative iteration: propose k tokens per active slot (prompt
        lookup or the draft model), verify all k+1 in one chunked ragged pass,
        accept. Greedy requests take the longest argmax-matching prefix + the
        bonus token (exact); sampled requests run Leviathan acceptance against
        the target's warped distribution on device (prompt-lookup proposals
        use the point-mass special case) — output distribution equals plain
        sampling under the engine-level warp."""
        from lia_tpu.engine import lookahead as la

        k = self.speculate_k
        C = k + 1
        g = self.gen
        sampled = g.do_sample
        active = self.active.copy()
        if sampled:
            self._rng, sub_d, sub_a = jax.random.split(self._rng, 3)
        qs_dev = None
        if self.draft is not None:
            if sampled:
                dk = ("spec_draft_sampled", k, g.temperature, g.top_k, g.top_p)
                if dk not in self._compiled:
                    self._compiled[dk] = la._draft_loop_sampled_fn(self.dcfg, k, g)
                props_dev, qs_dev, self.dcache = self._compiled[dk](
                    self.dparams,
                    jnp.asarray(self.tokens.astype(np.int32)),
                    jnp.asarray(self.logical_pos.astype(np.int32)),
                    self.dcache,
                    sub_d,
                    jnp.asarray(active),
                )
            else:
                dk = ("spec_draft", k)
                if dk not in self._compiled:
                    self._compiled[dk] = la._draft_loop_fn(self.dcfg, k)
                props_dev, self.dcache = self._compiled[dk](
                    self.dparams,
                    jnp.asarray(self.tokens.astype(np.int32)),
                    jnp.asarray(self.logical_pos.astype(np.int32)),
                    self.dcache,
                    jnp.asarray(active),
                )
            props = np.asarray(props_dev)
        else:
            props = np.stack([
                la.propose_ngram(
                    self.slot_req[b].prompt + self.slot_req[b].output,
                    self.speculate_ngram, k, g.pad_token_id,
                )
                if active[b] and self.slot_req[b] is not None
                else [g.pad_token_id] * k
                for b in range(self.B)
            ]).astype(np.int32)
            props_dev = jnp.asarray(props)
        chunk = np.concatenate([self.tokens[:, None].astype(np.int32), props], axis=1)
        positions = (
            self.logical_pos[:, None].astype(np.int32)
            + np.arange(C, dtype=np.int32)[None, :]
        )
        if self.paged:
            from lia_tpu.ops import paged as pg

            vkey = ("spec_verify_paged", C)
            if vkey not in self._compiled:
                self._compiled[vkey] = jax.jit(
                    partial(pg.verify_step_paged, self.cfg), donate_argnums=(4, 5)
                )
            logits, self.k_pool, self.v_pool = self._compiled[vkey](
                self.params, jnp.asarray(chunk), jnp.asarray(positions),
                self.k_pool, self.v_pool,
                jnp.asarray(self.block_table),
                jnp.asarray(self.kv_lengths, jnp.int32),
                jnp.asarray(active),
            )
            if self._sync_pools:
                jax.block_until_ready((self.k_pool, self.v_pool))
            if sampled:
                skey = ("spec_warp", g.temperature, g.top_k, g.top_p)
                if skey not in self._compiled:
                    self._compiled[skey] = jax.jit(
                        partial(sampling.warped_probs, gen=g)
                    )
                ps = self._compiled[skey](logits)
            else:
                greedy = np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))
        elif self.sched is not None:
            # tiered verify: ONE chunked pass streams every layer's weights
            # once for all k+1 candidates (runtime/scheduler.py verify_pass)
            if sampled:
                ps, self.state = self.sched.verify_pass(
                    jnp.asarray(chunk), jnp.asarray(positions), self.state,
                    probs_gen=g,
                )
            else:
                greedy, self.state = self.sched.verify_pass(
                    jnp.asarray(chunk), jnp.asarray(positions), self.state
                )
                greedy = np.asarray(greedy)
        elif sampled:
            vkey = ("spec_verify_sampled", C, g.temperature, g.top_k, g.top_p)
            if vkey not in self._compiled:
                self._compiled[vkey] = la._verify_sampled_fn(self.cfg, g)
                self._compiled["spec_advance"] = la._accept_fn()
            ps, self.cache = self._compiled[vkey](
                self.params, jnp.asarray(chunk), jnp.asarray(positions), self.cache
            )
        else:
            vkey = ("spec_verify", C)
            if vkey not in self._compiled:
                self._compiled[vkey] = la._verify_fn(self.cfg)
                self._compiled["spec_advance"] = la._accept_fn()
            greedy, self.cache = self._compiled[vkey](
                self.params, jnp.asarray(chunk), jnp.asarray(positions), self.cache
            )
            greedy = np.asarray(greedy)
        if sampled:
            akey = ("spec_accept", k, self.draft is not None)
            if akey not in self._compiled:
                self._compiled[akey] = (
                    la._sampled_accept_fn(k)
                    if self.draft is not None
                    else la._lookup_accept_fn(k)
                )
            if self.draft is not None:
                a_dev, extra_dev = self._compiled[akey](props_dev, qs_dev, ps, sub_a)
            else:
                a_dev, extra_dev = self._compiled[akey](props_dev, ps, sub_a)
            a_np, extra_np = np.asarray(a_dev), np.asarray(extra_dev)
        self._steps += 1
        self._dispatches += 1
        accept = np.zeros(self.B, np.int32)
        for b in np.flatnonzero(active):
            b = int(b)
            req = self.slot_req[b]
            if sampled:
                a = int(a_np[b])
                new_toks = [int(t) for t in props[b, :a]] + [int(extra_np[b])]
            else:
                a = 0
                while a < k and props[b, a] == greedy[b, a]:
                    a += 1
                new_toks = [int(t) for t in chunk[b, 1 : a + 1]] + [int(greedy[b, a])]
            new_toks = new_toks[: req.max_new_tokens - len(req.output)]
            stops = set() if g.eos_token_id is None else {g.eos_token_id}
            if req.stop_token_ids:
                stops |= set(req.stop_token_ids)
            for j, t in enumerate(new_toks):
                if t in stops:
                    new_toks = new_toks[: j + 1]
                    break
            accept[b] = len(new_toks)
            req.output.extend(new_toks)
            self.tokens[b] = new_toks[-1]
            self.logical_pos[b] += len(new_toks)
            self._maybe_finish(b, new_toks[-1])
        if self.paged:
            # rejected chunk slots stay dead past the advanced length and are
            # overwritten by the next verify's writes (host-side lengths only);
            # slots that FINISHED this step already released their pages and
            # zeroed their length in _maybe_finish — don't re-advance them
            self.kv_lengths = self.kv_lengths + accept * self.active
        elif self.sched is not None:
            self.state = self.sched.accept_state(self.state, jnp.asarray(accept))
        else:
            if "spec_advance" not in self._compiled:
                self._compiled["spec_advance"] = la._accept_fn()
            self.cache = self._compiled["spec_advance"](self.cache, jnp.asarray(accept))
        if self.draft is not None:
            # the draft loop advanced active rows k+1 slots; rewind each slot
            # to its verified prefix (history[:-1] invariant)
            if "spec_rewind" not in self._compiled:
                self._compiled["spec_rewind"] = la._rewind_fn()
            self.dlen = self.dlen + accept
            self.dcache = self._compiled["spec_rewind"](
                self.dcache, jnp.asarray(self.dlen, jnp.int32)
            )

    # -- fused multi-token decode ----------------------------------------

    def _fused_k(self) -> int:
        """How many decode steps the next dispatch may fuse (1 = per-step path).

        Runs whenever no chunked admission is mid-flight: after ``_admit()``
        returns, any still-queued request has no free slot (or no free pages),
        so a fused block cannot delay its admission beyond the slot-free event
        it is already waiting for — at worst the block overshoots that event by
        the smallest remaining budget (the cap below), trading bounded extra
        queue wait for k× fewer dispatches. Capped at the smallest remaining
        max_new_tokens budget across active slots so in-block cache writes stay
        inside each slot's admission-time reservation (pages and slab alike) —
        and so a block never runs far past the first slot's expected finish."""
        if (
            self.fused_steps <= 1
            or self._pending is not None
            or self.speculate_k is not None
            or self.sched is not None
        ):
            return 1
        if self.use_processors and (self.s_ngram > 0).any():
            # repetition_penalty / min_new_tokens ride the fused scan in-graph
            # (seen bitmap + per-slot vectors); no-repeat-ngram ban lists are
            # computed host-side from each slot's un-padded history, so any
            # slot with ngram active keeps the per-step path
            return 1
        remaining = [
            self.slot_req[b].max_new_tokens - len(self.slot_req[b].output)
            for b in np.flatnonzero(self.active)
            if self.slot_req[b] is not None
        ]
        if not remaining:
            return 1
        return max(1, min(self.fused_steps, min(remaining)))

    def _fused_decode_fn(self, k: int, greedy_all: bool, proc: bool):
        """k decode+sample steps under one jit (lax.scan); returns [k, B] tokens.

        ``proc``: apply the per-slot logits processors IN-GRAPH each scan step
        (repetition-penalty over the ``seen`` presence bitmap + min-new-tokens
        EOS suppression, with the bitmap updated inside the scan) — the
        serving analog of the engine's fused-loop processors
        (engine.py _get_fused_decode). ``p`` = (seen, rep, minnew, gen0) where
        ``gen0`` counts tokens already generated per slot at block entry."""
        key = ("fused", k, greedy_all, self.paged, proc)
        if key in self._compiled:
            return self._compiled[key]
        cfg = self.cfg
        eos = self.gen.eos_token_id

        def emit(logits, sub, s, active, p, j):
            if proc:
                seen, rep, minnew, gen0 = p
                suppress = active & (gen0 + j < minnew)
                logits = sampling.process_logits_rows(
                    logits, seen, rep, suppress, eos
                )
            nxt = (
                sampling.greedy(logits)
                if greedy_all
                else sampling.sample_per_row(logits, sub, *s)
            )
            if proc:
                seen, rep, minnew, gen0 = p
                p = (sampling.mark_seen(seen, nxt, active), rep, minnew, gen0)
            return nxt, p

        if self.paged:
            from lia_tpu.ops import paged as pg

            def fused(params, tokens, pos, k_pool, v_pool, table, lengths,
                      active, rng, s, p):
                adv = active.astype(jnp.int32)

                def body(carry, j):
                    tok, pos, kp, vp, ln, rng, p = carry
                    logits, kp, vp = pg.decode_step_paged(
                        cfg, params, tok[:, None], pos, kp, vp, table, ln, active
                    )
                    rng, sub = jax.random.split(rng)
                    nxt, p = emit(logits, sub, s, active, p, j)
                    return (nxt, pos + adv, kp, vp, ln + adv, rng, p), nxt

                carry = (tokens, pos, k_pool, v_pool, lengths, rng, p)
                (_, _, kp, vp, _, _, p), out = jax.lax.scan(
                    body, carry, jnp.arange(k, dtype=jnp.int32)
                )
                return out, kp, vp, (p[0] if proc else None)

            fn = jax.jit(fused, donate_argnums=(3, 4))
        else:

            def fused(params, tokens, pos, cache, active, rng, s, p):
                adv = active.astype(jnp.int32)

                def body(carry, j):
                    tok, pos, cache, rng, p = carry
                    logits, cache = T.decode_step_ragged(
                        cfg, params, tok[:, None], pos, cache, active
                    )
                    rng, sub = jax.random.split(rng)
                    nxt, p = emit(logits, sub, s, active, p, j)
                    return (nxt, pos + adv.astype(pos.dtype), cache, rng, p), nxt

                carry = (tokens, pos, cache, rng, p)
                (_, _, cache, _, p), out = jax.lax.scan(
                    body, carry, jnp.arange(k, dtype=jnp.int32)
                )
                return out, cache, (p[0] if proc else None)

            fn = jax.jit(fused, donate_argnums=(3,))
        self._compiled[key] = fn
        return fn

    def _fused_block(self, k: int) -> None:
        """Dispatch one fused block of k decode steps, then fold the [k, B]
        token matrix back into per-request host state. Slots that finish
        mid-block stop counting at their stop token; their extra in-block
        writes sit in reserved space and are reset on slot reuse."""
        greedy_all = bool(self.s_greedy.all())
        if greedy_all:
            s = ()
        else:
            if self._s_dev is None:
                self._s_dev = (
                    jnp.asarray(self.s_temp), jnp.asarray(self.s_topk),
                    jnp.asarray(self.s_topp), jnp.asarray(self.s_greedy),
                )
            s = self._s_dev
        proc = self.use_processors
        if proc:
            gen0 = np.array([
                len(self.slot_req[b].output) if self.slot_req[b] is not None else 0
                for b in range(self.B)
            ], np.int32)
            p = (self.seen, jnp.asarray(self.s_rep), jnp.asarray(self.s_minnew),
                 jnp.asarray(gen0))
        else:
            p = None
        self._rng, sub = jax.random.split(self._rng)
        fn = self._fused_decode_fn(k, greedy_all, proc)
        active = jnp.asarray(self.active)
        if self.paged:
            out, self.k_pool, self.v_pool, seen = fn(
                self.params, jnp.asarray(self.tokens),
                jnp.asarray(self.logical_pos, jnp.int32),
                self.k_pool, self.v_pool, jnp.asarray(self.block_table),
                jnp.asarray(self.kv_lengths, jnp.int32), active, sub, s, p,
            )
            if self._sync_pools:
                jax.block_until_ready((self.k_pool, self.v_pool))
        else:
            out, self.cache, seen = fn(
                self.params, jnp.asarray(self.tokens),
                jnp.asarray(self.logical_pos, jnp.int32),
                self.cache, active, sub, s, p,
            )
        if proc:
            self.seen = seen
        toks = np.asarray(out)  # [k, B]
        self._steps += k
        self._dispatches += 1
        for slot in np.flatnonzero(self.active):
            slot = int(slot)
            req = self.slot_req[slot]
            for j in range(k):
                tok = int(toks[j, slot])
                req.output.append(tok)
                self.tokens[slot] = tok
                self.logical_pos[slot] += 1
                if self.paged:
                    self.kv_lengths[slot] += 1
                self._maybe_finish(slot, tok)
                if not self.active[slot]:
                    break

    def step(self) -> bool:
        """One engine iteration: admit waiting requests, then one decode step
        (or a fused block of up to ``fused_steps`` when the queue is empty).
        Returns False when there is nothing left to do."""
        self._admit()
        if not self.active.any():
            return bool(self.queue) or self._pending is not None
        if self.speculate_k is not None:
            self._spec_step()
            return True
        k = self._fused_k()
        if k > 1:
            self._fused_block(k)
            return True
        self._rng, sub = jax.random.split(self._rng)
        if self.paged:
            if self.sched is not None:
                # paged × scheduler: tiered per-layer streaming over the pool
                logits, self.k_pool, self.v_pool = self.sched.decode_pass_paged(
                    jnp.asarray(self.tokens),
                    jnp.asarray(self.logical_pos, jnp.int32),
                    self.k_pool, self.v_pool,
                    jnp.asarray(self.block_table),
                    jnp.asarray(self.kv_lengths, jnp.int32),
                    jnp.asarray(self.active),
                )
            else:
                from lia_tpu.ops import paged as pg

                if "paged_decode" not in self._compiled:
                    self._compiled["paged_decode"] = jax.jit(
                        partial(pg.decode_step_paged, self.cfg), donate_argnums=(3, 4)
                    )
                logits, self.k_pool, self.v_pool = self._compiled["paged_decode"](
                    self.params,
                    jnp.asarray(self.tokens)[:, None],
                    jnp.asarray(self.logical_pos, jnp.int32),
                    self.k_pool,
                    self.v_pool,
                    jnp.asarray(self.block_table),
                    jnp.asarray(self.kv_lengths, jnp.int32),
                    jnp.asarray(self.active),
                )
            if self._sync_pools:
                jax.block_until_ready((self.k_pool, self.v_pool))
            self.kv_lengths[self.active] += 1
        elif self.sched is not None:
            logits, self.state = self.sched.decode_pass_ragged(
                jnp.asarray(self.tokens),
                jnp.asarray(self.logical_pos, jnp.int32),
                self.state,
                jnp.asarray(self.active),
            )
        else:
            decode = self._decode_fn()
            logits, self.cache = decode(
                self.params,
                jnp.asarray(self.tokens)[:, None],
                jnp.asarray(self.logical_pos, jnp.int32),
                self.cache,
                jnp.asarray(self.active),
            )
        if self.use_processors:
            suppress = np.array([
                bool(self.active[b])
                and self.slot_req[b] is not None
                and len(self.slot_req[b].output) < self.s_minnew[b]
                for b in range(self.B)
            ], bool)
            logits = self._process_rows_fn()(
                logits, self.seen, jnp.asarray(self.s_rep), jnp.asarray(suppress)
            )
            if (self.s_ngram > 0).any():
                ban_rows = [
                    self._ngram_bans(
                        self.slot_req[b].prompt + self.slot_req[b].output,
                        int(self.s_ngram[b]),
                    )
                    if self.active[b] and self.slot_req[b] is not None
                    else []
                    for b in range(self.B)
                ]
                logits = self._apply_ngram_bans(logits, ban_rows)
        toks = np.asarray(self._sample_rows(logits, sub))
        if self.use_processors:
            if "mark_seen" not in self._compiled:
                self._compiled["mark_seen"] = jax.jit(
                    sampling.mark_seen, donate_argnums=(0,)
                )
            self.seen = self._compiled["mark_seen"](
                self.seen, jnp.asarray(toks), jnp.asarray(self.active)
            )
        self._steps += 1
        self._dispatches += 1
        for slot in np.flatnonzero(self.active):
            slot = int(slot)
            req = self.slot_req[slot]
            tok = int(toks[slot])
            req.output.append(tok)
            self.tokens[slot] = tok
            self.logical_pos[slot] += 1
            self._maybe_finish(slot, tok)
        return True

    def run(self) -> List[Request]:
        while self.step() or self.queue or self.active.any() or self._pending is not None:
            if not self.queue and not self.active.any() and self._pending is None:
                break
        return self.done

    def stats(self) -> Dict[str, float]:
        """Aggregate serving metrics over finished requests. TTFT percentiles
        + per-request TPOT (time per output token after the first) mirror the
        reference's first-token vs p90/p99 2nd+-token latency split
        (run_generation.py:337-354), per REQUEST rather than per iteration."""
        if not self.done:
            return {}
        ttfts = np.array([r.ttft_s for r in self.done if r.ttft_s is not None])
        tpots = np.array([
            (r.finished_at - r.first_token_at) / (len(r.output) - 1)
            for r in self.done
            if r.first_token_at is not None and len(r.output) > 1
        ])
        total_tokens = sum(len(r.output) for r in self.done)
        t0 = min(r.submitted_at for r in self.done)
        t1 = max(r.finished_at for r in self.done)
        out = {
            "requests": float(len(self.done)),
            "total_tokens": float(total_tokens),
            "tokens_per_s": total_tokens / max(t1 - t0, 1e-9),
            "decode_steps": float(self._steps),
            "decode_dispatches": float(self._dispatches),
            "steps_per_dispatch": self._steps / max(self._dispatches, 1),
        }
        for name, arr in (("ttft_s", ttfts), ("tpot_s", tpots)):
            if arr.size:
                out[f"mean_{name}"] = float(arr.mean())
                out[f"p50_{name}"] = float(np.percentile(arr, 50))
                out[f"p90_{name}"] = float(np.percentile(arr, 90))
                out[f"p99_{name}"] = float(np.percentile(arr, 99))
        if self.paged:
            out["prefix_hits"] = float(self.prefix_hits)
            out["prefix_tokens_reused"] = float(self.prefix_tokens_reused)
        return out
