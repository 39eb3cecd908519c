"""Streaming + hybrid-placement execution scheduler — the LIA core analog.

Re-creates the reference's layer-by-layer pipeline (lia/modeling_opt.py:1021-1586)
the TPU way. The reference drives 5 CUDA streams from Python (stream setup :1208-1212,
prefill pipeline :1268-1365, decode pipelines :1379-1543); here the device pair is
(TPU chip ↔ TPU-VM host via the XLA:CPU backend), and the same overlap falls out of
JAX's async dispatch discipline:

- the **resident prefix** (first ``hbm_percentage``% of layers, policy-3 analog,
  :1175-1184) executes as ONE jitted ``lax.scan`` segment over its own HBM KV
  cache — full XLA fusion, zero per-layer dispatch;
- **streamed layers** run per-layer jitted functions (traced once; the layer index
  is a traced scalar) while :class:`TieredWeightManager` prefetches layer ``i+1``
  host→HBM on a side thread (the load_layer double buffer, :1306-1328);
- **policy placements** (:mod:`lia_tpu.runtime.policy`) split the layer at the
  attention boundary: policy 1 runs whole layers on the host; policies 2/4 run
  linears on TPU and ship q/k/v to host attention over host-resident KV
  (attentions.py:421-424 parity — the KV cache never leaves host DRAM); policy 0
  keeps attention on TPU but stores KV to the host (prefill) / streams it back in
  (decode);
- ``--no-overlap`` (:1173,1348-1365) serializes by blocking on each transfer;
- minibatch-split prefill (``--num-minibatch``, :1284-1346) slices the batch so
  weight transfer of layer ``i+1`` overlaps several compute chunks of layer ``i``.
"""

from __future__ import annotations

import collections
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig, RuntimeConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import dispatch
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.ops import sampling
from lia_tpu.runtime import policy as pol
from lia_tpu.runtime.weight_manager import TieredWeightManager, slice_layer
from lia_tpu.utils.metrics import LatencyStats


def _cpu_device():
    return jax.devices("cpu")[0]


class StreamingScheduler:
    """Drives prefill/decode with tiered weights and hybrid placements."""

    def __init__(
        self, cfg: ModelConfig, runtime: RuntimeConfig, params_host: Any, mesh=None
    ):
        self.cfg = cfg
        self.runtime = runtime
        self.mesh = mesh
        self.prefill_plan, self.decode_plan = pol.phase_plans(runtime)
        hbm_pct = (
            0
            if runtime.stream_weights and runtime.hbm_percentage >= 100
            else runtime.hbm_percentage
        )
        layer_pspecs = None
        if mesh is not None:
            # TP × tiering: the resident prefix and every streamed layer shard
            # over "model"; GSPMD inserts the two per-layer psums exactly as in
            # the resident engine path. Host-compute policies stay out of scope
            # — the host tier is per-host by design (the reference's LIA is a
            # single-node CPU↔GPU orchestrator; its DeepSpeed TP path likewise
            # composes only with device-resident execution).
            if dict(mesh.shape).get("data", 1) != 1:
                raise ValueError("scheduler mesh must be TP-only (data axis 1)")
            for p in (self.prefill_plan, self.decode_plan):
                if p.all_host or p.hybrid or p.kv == "host":
                    raise ValueError(
                        "scheduler×mesh composes with TPU-resident-KV streaming "
                        "plans (policy 3 + hbm_percentage/stream_weights); "
                        "host-placement policies are per-host by design"
                    )
            from lia_tpu.parallel import sharding as shd

            tp = dict(mesh.shape).get("model", 1)
            self._pspecs = shd.param_pspecs(cfg, params_host, tp=tp)
            layer_pspecs = self._pspecs["layers"]
        self.wm = TieredWeightManager(
            params_host["layers"], cfg.num_layers, hbm_pct, overlap=runtime.overlap,
            mesh=mesh, layer_pspecs=layer_pspecs,
        )
        self.layers_host = params_host["layers"]
        # non-layer params (embeddings/norms/head) are small — always TPU-resident
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            is_p = lambda x: isinstance(x, P)
            self.top = {}
            for k, v in params_host.items():
                if k == "layers":
                    continue
                if k not in self._pspecs:  # e.g. lm_head_bias — replicate
                    self.top[k] = jax.device_put(v, NamedSharding(mesh, P()))
                    continue
                sh = jax.tree.map(
                    lambda s: NamedSharding(mesh, s), self._pspecs[k], is_leaf=is_p
                )
                self.top[k] = jax.tree.map(jax.device_put, v, sh)
        else:
            self.top = jax.device_put({k: v for k, v in params_host.items() if k != "layers"})
        self._compiled: Dict[Any, Any] = {}
        self.cpu = _cpu_device()
        # streamed-segment KV lives on host DRAM when either phase plan says so
        # (a prefill that stores host KV forces decode to read it there)
        self.kv_host = (
            self.prefill_plan.kv == "host" or self.decode_plan.kv == "host"
        ) and self.wm.n_resident < cfg.num_layers

    # `resident_params` keeps the engine API uniform (reporting only)
    @property
    def resident_params(self):
        return self.top

    # -- jitted building blocks (TPU) ----------------------------------------

    def _jit(self, key, fn, **kw):
        if key not in self._compiled:
            self._compiled[key] = jax.jit(fn, **kw)
        return self._compiled[key]

    def _embed_fn(self):
        cfg = self.cfg

        def f(top, tokens, input_mask):
            from lia_tpu.ops import attention as att

            positions = jnp.cumsum(input_mask.astype(jnp.int32), axis=1) - 1
            x = T.embed(cfg, top, tokens, positions)
            bias = (att.alibi_prefill_bias(cfg.num_heads, positions, input_mask)
                    if cfg.alibi else None)
            return x, positions, att.prefill_attn_ctx(input_mask, bias=bias)

        return self._jit("embed", f)

    def _dec_embed_fn(self):
        cfg = self.cfg

        def f(top, tokens, positions, slot_mask, length):
            from lia_tpu.ops import attention as att

            x = T.embed(cfg, top, tokens, positions)
            bias = (att.alibi_slot_bias(cfg.num_heads, slot_mask, length, positions)
                    if cfg.alibi else None)
            # two ctx conventions: the resident segment scan merges the fresh
            # token in-kernel (PAST-only ctx), while the streamed per-layer
            # paths write-then-attend (ctx INCLUDING the current token)
            ctx_past = att.decode_attn_ctx(slot_mask, length, bias=bias)
            sm = jax.lax.dynamic_update_slice(
                slot_mask, jnp.ones((tokens.shape[0], 1), jnp.bool_), (0, length)
            )
            return x, ctx_past, att.decode_attn_ctx(sm, length + 1, bias=bias)

        return self._jit("dec_embed", f)

    def _head_fn(self):
        cfg = self.cfg
        return self._jit("head", lambda top, x: T.lm_head(cfg, top, x[:, -1:, :])[:, 0, :])

    def _segment_fn(self, phase: str, n_layers: int):
        """Jitted scan over a stacked layer segment with its own (local) cache."""
        cfg = self.cfg
        layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

        def f(seg_params, x, cache, ctx, positions):
            start = cache.length

            if phase == "decode":
                x, k_new, v_new = T.decode_layers_scan(
                    cfg, seg_params, x, cache.k, cache.v, start, ctx, positions,
                    n_layers,
                )
                return x, cache._replace(k=k_new, v=v_new)

            # prefill: cache rides in the carry (in-place updates inside the loop)
            def body(carry, inputs):
                h, ck, cv = carry
                lp, idx = inputs
                kl = kvc.index_layer_kv(ck, idx)
                vl = kvc.index_layer_kv(cv, idx)
                h, kl, vl = layer(cfg, lp, h, kl, vl, start, ctx, positions)
                return (h, kvc.set_layer_kv(ck, kl, idx), kvc.set_layer_kv(cv, vl, idx)), None

            (x, k_new, v_new), _ = jax.lax.scan(
                body, (x, cache.k, cache.v),
                (seg_params, jnp.arange(n_layers, dtype=jnp.int32)),
            )
            return x, cache._replace(k=k_new, v=v_new)

        return self._jit(("seg", phase, n_layers), f, donate_argnums=(2,))

    def _layer_fn(self, phase: str):
        """Streamed layer, all-TPU, cache plane selected by a traced local index."""
        cfg = self.cfg
        layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

        def f(lp, x, cache, idx, ctx, positions):
            start = cache.length
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            x, kl, vl = layer(cfg, lp, x, kl, vl, start, ctx, positions)
            cache = cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )
            return x, cache

        return self._jit(("layer", phase), f, donate_argnums=(2,))

    def _qkv_fn(self):
        cfg = self.cfg
        return self._jit("qkv", lambda lp, x, positions: T.attn_in(cfg, lp, x, positions))

    def _post_fn(self):
        cfg = self.cfg
        return self._jit(
            "post", lambda lp, residual, attn_out: T.attn_post_mlp(cfg, lp, residual, attn_out)
        )

    def _tpu_prefill_attn_fn(self):
        cfg = self.cfg
        from lia_tpu.ops import attention as att

        return self._jit("pf_attn", lambda q, k, v, ctx: att.attend_prefill(q, k, v, ctx))

    def _tpu_decode_attn_kvin_fn(self):
        """Policy-0 decode: attend on TPU over KV planes streamed in from host."""
        cfg = self.cfg

        def f(q, k, v, kl, vl, start, ctx):
            attn_out, kl, vl = T.attn_core_decode(cfg, q, k, v, kl, vl, start, ctx)
            return attn_out

        return self._jit("dec_attn_kvin", f)

    # -- jitted building blocks (host / XLA:CPU) ------------------------------

    def _host_jit(self, key, fn, **kw):
        """jit a function that must trace with Pallas disabled (host execution).

        The disable has to wrap the traced BODY, not the jit() call — tracing
        happens lazily at first invocation, and on a TPU-default process the
        global dispatch would otherwise pick Pallas for CPU-committed arrays."""
        if key not in self._compiled:

            def wrapped(*args, __fn=fn, **kwargs):
                with dispatch.pallas_disabled():
                    return __fn(*args, **kwargs)

            self._compiled[key] = jax.jit(wrapped, **kw)
        return self._compiled[key]

    def _host_layer_fn(self, phase: str):
        """Whole decoder layer on the host (policy 1 — the AMX baseline analog)."""
        cfg = self.cfg
        layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

        def f(lp, x, cache, idx, ctx, positions):
            start = cache.length
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            x, kl, vl = layer(cfg, lp, x, kl, vl, start, ctx, positions)
            cache = cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )
            return x, cache

        return self._host_jit(("host_layer", phase), f, donate_argnums=(2,))

    def _host_attn_fn(self, phase: str):
        """Attention core on the host over host KV (policies 2/4;
        attentions.py:421-424 parity)."""
        cfg = self.cfg
        core = T.attn_core_prefill if phase == "prefill" else T.attn_core_decode

        def f(q, k, v, cache, idx, ctx):
            start = cache.length
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            attn_out, kl, vl = core(cfg, q, k, v, kl, vl, start, ctx)
            cache = cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )
            return attn_out, cache

        return self._host_jit(("host_attn", phase), f, donate_argnums=(3,))

    def _host_update_fn(self):
        """Write fresh K/V into the host cache (policy-0 store_cache analog,
        lia/modeling_opt.py:334-349)."""

        def f(cache, k, v, idx):
            start = cache.length
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            kl, vl = kvc.update_layer(kl, vl, k, v, start)
            return cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )

        return self._host_jit("host_update", f, donate_argnums=(0,))

    def _host_update_mb_fn(self):
        """Minibatch variant: write fresh K/V for batch rows [b0, b0+mb)."""

        def f(cache, k, v, idx, b0):
            start = cache.length
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            mb = jax.tree.leaves(k)[0].shape[0]
            slice_b = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, mb, 0)
            k_sl, v_sl = jax.tree.map(slice_b, kl), jax.tree.map(slice_b, vl)
            k_sl, v_sl = kvc.update_layer(k_sl, v_sl, k, v, start)
            upd_b = lambda a, sl: jax.lax.dynamic_update_slice_in_dim(a, sl, b0, 0)
            kl = jax.tree.map(upd_b, kl, k_sl)
            vl = jax.tree.map(upd_b, vl, v_sl)
            return cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )

        return self._host_jit("host_update_mb", f, donate_argnums=(0,))

    def _host_attn_mb_fn(self, phase: str):
        """Host attention over batch rows [b0, b0+mb) (hybrid minibatch prefill)."""
        cfg = self.cfg
        core = T.attn_core_prefill if phase == "prefill" else T.attn_core_decode

        def f(q, k, v, cache, idx, b0, ctx_sl):
            start = cache.length
            mb = q.shape[0]
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            slice_b = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, mb, 0)
            k_sl, v_sl = jax.tree.map(slice_b, kl), jax.tree.map(slice_b, vl)
            attn_out, k_sl, v_sl = core(cfg, q, k, v, k_sl, v_sl, start, ctx_sl)
            upd_b = lambda a, sl: jax.lax.dynamic_update_slice_in_dim(a, sl, b0, 0)
            kl = jax.tree.map(upd_b, kl, k_sl)
            vl = jax.tree.map(upd_b, vl, v_sl)
            cache = cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )
            return attn_out, cache

        return self._host_jit(("host_attn_mb", phase), f, donate_argnums=(3,))

    @staticmethod
    def _slice_ctx(ctx, b0: int, mb: int):
        """Slice an attention ctx's per-sequence arrays to batch rows [b0, b0+mb)."""
        return jax.tree.map(
            lambda a: a[b0 : b0 + mb] if getattr(a, "ndim", 0) else a, ctx
        )

    def _advance_fn(self, device_key: str):
        def f(cache, new_mask, n_new):
            return kvc.advance(cache, new_mask, n_new)

        if device_key == "host":
            return self._host_jit(("advance", device_key), f, static_argnums=(2,), donate_argnums=(0,))
        return self._jit(("advance", device_key), f, static_argnums=(2,), donate_argnums=(0,))

    def _get_host_layer(self, idx: int):
        """Layer params on the host device (no TPU transfer — policy 1)."""
        return jax.device_put(slice_layer(self.layers_host, idx), self.cpu)

    # -- streamed-segment execution -------------------------------------------

    def _run_streamed(self, phase: str, plan: pol.Plan, x, cache, ctx, positions):
        """Run the non-resident layers [n_res, L) per the phase plan.

        ``cache`` is the streamed segment's local cache (layer 0 == global n_res),
        living on host DRAM when the plan keeps KV there.
        """
        n_res, L = self.wm.n_resident, self.cfg.num_layers
        nm = max(1, self.runtime.num_minibatch) if phase == "prefill" else 1
        overlap = self.runtime.overlap

        # Throttle dispatch run-ahead. PJRT allocates an executable's output
        # buffers at enqueue, so with overlap on, a loop that never blocks
        # pins every streamed layer's q/k/v/attn_out at once — at OPT-30B
        # b=64 that ran HBM out of memory long before execution caught up.
        # A window of max_inflight_layers keeps transfer/compute overlap
        # (double-buffering) with bounded live memory.
        _pending: collections.deque = collections.deque()

        def _sync(tok):
            if not overlap:
                jax.block_until_ready(tok)
                return
            _pending.append(tok)
            if len(_pending) > max(1, self.runtime.max_inflight_layers):
                jax.block_until_ready(_pending.popleft())

        if plan.all_host:
            # policy 1: whole layers on the host; activations hop once per segment
            layer_f = self._host_layer_fn(phase)
            x = jax.device_put(x, self.cpu)
            ctx_h = jax.device_put(ctx, self.cpu)
            pos_h = jax.device_put(positions, self.cpu)
            for idx in range(n_res, L):
                lp = self._get_host_layer(idx)
                x, cache = layer_f(lp, x, cache, jnp.int32(idx - n_res), ctx_h, pos_h)
            return jax.device_put(x, jax.devices()[0]), cache

        B = x.shape[0]
        use_mb = nm > 1 and B % nm == 0
        mb = B // nm if use_mb else B

        if plan.hybrid:
            # policies 2/4: linears on TPU (streamed weights), attention on host.
            # Minibatch-split prefill (lia/modeling_opt.py:1284-1346): slice c's
            # D2H qkv / host attention / H2D output overlap slice c+1's TPU
            # linears via async dispatch.
            qkv_f, post_f = self._qkv_fn(), self._post_fn()
            attn_f = self._host_attn_fn(phase)
            attn_mb_f = self._host_attn_mb_fn(phase) if use_mb else None
            ctx_h = jax.device_put(ctx, self.cpu)
            self.wm.prefetch(n_res)
            for idx in range(n_res, L):
                self.wm.prefetch(idx + 1)
                lp = self.wm.get_layer(idx)
                if not use_mb:
                    q, k, v = qkv_f(lp, x, positions)
                    q_h, k_h, v_h = jax.device_put((q, k, v), self.cpu)
                    attn_out, cache = attn_f(q_h, k_h, v_h, cache, jnp.int32(idx - n_res), ctx_h)
                    attn_out = jax.device_put(attn_out, jax.devices()[0])
                    x = post_f(lp, x, attn_out)
                else:
                    parts = []
                    for c in range(nm):
                        b0 = c * mb
                        ctx_sl = self._slice_ctx(ctx_h, b0, mb)
                        q, k, v = qkv_f(lp, x[b0 : b0 + mb], positions[b0 : b0 + mb])
                        q_h, k_h, v_h = jax.device_put((q, k, v), self.cpu)
                        attn_out, cache = attn_mb_f(
                            q_h, k_h, v_h, cache, jnp.int32(idx - n_res),
                            jnp.int32(b0), ctx_sl,
                        )
                        attn_out = jax.device_put(attn_out, jax.devices()[0])
                        parts.append(post_f(lp, x[b0 : b0 + mb], attn_out))
                    x = jnp.concatenate(parts, axis=0)
                _sync(x)
            return x, cache

        if plan.kv == "host":
            # policy 0: TPU compute, KV stored on / streamed from the host
            qkv_f, post_f = self._qkv_fn(), self._post_fn()
            upd_f = self._host_update_fn()
            self.wm.prefetch(n_res)
            if phase == "prefill":
                # policy-0 flagship prefill: minibatch slices pipeline the D2H
                # KV store against the next slice's TPU compute
                # (lia/modeling_opt.py:1284-1346 — round-1 gap: nm was dead here)
                attn_f = self._tpu_prefill_attn_fn()
                upd_mb_f = self._host_update_mb_fn() if use_mb else None
                for idx in range(n_res, L):
                    self.wm.prefetch(idx + 1)
                    lp = self.wm.get_layer(idx)
                    if not use_mb:
                        q, k, v = qkv_f(lp, x, positions)
                        attn_out = attn_f(q, k, v, ctx)
                        k_h, v_h = jax.device_put((k, v), self.cpu)  # store_cache (D2H)
                        cache = upd_f(cache, k_h, v_h, jnp.int32(idx - n_res))
                        x = post_f(lp, x, attn_out)
                    else:
                        parts = []
                        for c in range(nm):
                            b0 = c * mb
                            ctx_sl = self._slice_ctx(ctx, b0, mb)
                            q, k, v = qkv_f(lp, x[b0 : b0 + mb], positions[b0 : b0 + mb])
                            attn_out = attn_f(q, k, v, ctx_sl)
                            k_h, v_h = jax.device_put((k, v), self.cpu)
                            cache = upd_mb_f(
                                cache, k_h, v_h, jnp.int32(idx - n_res), jnp.int32(b0)
                            )
                            parts.append(post_f(lp, x[b0 : b0 + mb], attn_out))
                        x = jnp.concatenate(parts, axis=0)
                    _sync(x)
            else:
                attn_f = self._tpu_decode_attn_kvin_fn()
                tpu = jax.devices()[0]
                for idx in range(n_res, L):
                    self.wm.prefetch(idx + 1)
                    lp = self.wm.get_layer(idx)
                    q, k, v = qkv_f(lp, x, positions)
                    li = idx - n_res
                    # stream KV in (H2D); index_layer_kv handles QuantizedKV planes
                    kl = jax.device_put(kvc.index_layer_kv(cache.k, li), tpu)
                    vl = jax.device_put(kvc.index_layer_kv(cache.v, li), tpu)
                    ln = jax.device_put(cache.length, tpu)
                    attn_out = attn_f(q, k, v, kl, vl, ln, ctx)
                    k_h, v_h = jax.device_put((k, v), self.cpu)
                    cache = upd_f(cache, k_h, v_h, jnp.int32(li))
                    x = post_f(lp, x, attn_out)
                    _sync(x)
            return x, cache

        # plan: streamed weights, TPU attention, HBM KV (policy-3 tail)
        layer_f = self._layer_fn(phase)
        self.wm.prefetch(n_res)
        for idx in range(n_res, L):
            self.wm.prefetch(idx + 1)
            lp = self.wm.get_layer(idx)
            B = x.shape[0]
            if nm == 1 or B % nm != 0:
                x, cache = layer_f(lp, x, cache, jnp.int32(idx - n_res), ctx, positions)
            else:
                mb = B // nm
                mb_f = self._mb_layer_fn(phase)
                parts = []
                for c in range(nm):
                    b0 = c * mb
                    ctx_sl = jax.tree.map(
                        lambda a: a[b0 : b0 + mb] if getattr(a, "ndim", 0) else a, ctx
                    )
                    xx, cache = mb_f(
                        lp,
                        x[b0 : b0 + mb],
                        cache,
                        jnp.int32(idx - n_res),
                        jnp.int32(b0),
                        ctx_sl,
                        positions[b0 : b0 + mb],
                    )
                    parts.append(xx)
                x = jnp.concatenate(parts, axis=0)
            _sync(x)
        return x, cache

    def _mb_layer_fn(self, phase: str):
        """Streamed layer over one batch slice; cache rows [b0:b0+mb] updated
        (minibatch-split prefill, lia/modeling_opt.py:1284-1346)."""
        cfg = self.cfg
        layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

        def f(lp, x_sl, cache, idx, b0, ctx_sl, pos_sl):
            start = cache.length
            mb = x_sl.shape[0]
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            slice_b = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, mb, 0)
            k_sl = jax.tree.map(slice_b, kl)
            v_sl = jax.tree.map(slice_b, vl)
            x_sl, k_sl, v_sl = layer(cfg, lp, x_sl, k_sl, v_sl, start, ctx_sl, pos_sl)
            upd_b = lambda a, sl: jax.lax.dynamic_update_slice_in_dim(a, sl, b0, 0)
            kl = jax.tree.map(upd_b, kl, k_sl)
            vl = jax.tree.map(upd_b, vl, v_sl)
            cache = cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )
            return x_sl, cache

        return self._jit(("mb_layer", phase), f, donate_argnums=(2,))

    # -- generation ------------------------------------------------------------

    def _init_caches(self, B: int, max_len: int):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        qkv = self.runtime.quant.kv_cache_dtype == "int8"
        n_res = self.wm.n_resident
        n_str = cfg.num_layers - n_res
        res = (
            kvc.init_cache(cfg.replace(num_layers=n_res), B, max_len, dt, quantized=qkv)
            if n_res
            else None
        )
        if n_str:
            if self.kv_host:
                # allocate the host cache ON the host: materializing the zeros
                # on TPU first would transiently claim HBM the resident prefix
                # already owns (observed OOM at 40% residency on OPT-30B)
                with jax.default_device(self.cpu):
                    st = kvc.init_cache(
                        cfg.replace(num_layers=n_str), B, max_len, dt, quantized=qkv
                    )
            else:
                st = kvc.init_cache(
                    cfg.replace(num_layers=n_str), B, max_len, dt, quantized=qkv
                )
        else:
            st = None
        if self.mesh is not None:
            # mesh plans guarantee device KV (kv_host is unreachable): both
            # segments shard KV heads over "model" like the engine's TP caches
            from lia_tpu.parallel.sharding import shard_cache_tree

            res = shard_cache_tree(res, self.mesh) if res is not None else None
            st = shard_cache_tree(st, self.mesh) if st is not None else None
        return res, st

    # -- step-level passes (the seams generation modes compose over) ----------

    def prefill_pass(self, tokens, mask, max_len: int):
        """Run the prompt through both segments. Returns (last-token logits,
        state) where ``state`` is the {res_cache, str_cache} pair."""
        B, S = tokens.shape
        res_cache, str_cache = self._init_caches(B, max_len)
        n_res = self.wm.n_resident
        adv_t = self._advance_fn("tpu")
        adv_h = self._advance_fn("host") if self.kv_host else adv_t

        x, positions, ctx = self._embed_fn()(
            self.top, jnp.asarray(tokens), jnp.asarray(mask)
        )
        if res_cache is not None:
            seg = self._segment_fn("prefill", n_res)
            x, res_cache = seg(self.wm.resident, x, res_cache, ctx, positions)
            res_cache = adv_t(res_cache, jnp.asarray(mask), S)
        if str_cache is not None:
            x, str_cache = self._run_streamed(
                "prefill", self.prefill_plan, x, str_cache, ctx, positions
            )
            m = jax.device_put(jnp.asarray(mask), self.cpu) if self.kv_host else jnp.asarray(mask)
            str_cache = (adv_h if self.kv_host else adv_t)(str_cache, m, S)
        logits = self._head_fn()(self.top, x)
        return logits, {"res": res_cache, "str": str_cache}

    def _cur_mask_len(self, state):
        """Slot mask / length bookkeeping from whichever cache exists (lockstep)."""
        c = state["res"] if state["res"] is not None else state["str"]
        m, ln = c.mask, c.length
        if c is state["str"] and self.kv_host:
            m, ln = jax.device_put((m, ln), jax.devices()[0])
        return m, ln

    def decode_pass(self, tok, pos, state):
        """One decode step over both segments. Returns (logits [B, V], state)."""
        n_res = self.wm.n_resident
        adv_t = self._advance_fn("tpu")
        adv_h = self._advance_fn("host") if self.kv_host else adv_t
        B = tok.shape[0]
        ones_t = jnp.ones((B, 1), jnp.bool_)
        res_cache, str_cache = state["res"], state["str"]

        m, ln = self._cur_mask_len(state)
        x, ctx_past, ctx = self._dec_embed_fn()(
            self.top, tok[:, None], pos[:, None], m, ln
        )
        if res_cache is not None:
            seg = self._segment_fn("decode", n_res)
            x, res_cache = seg(self.wm.resident, x, res_cache, ctx_past, pos[:, None])
            res_cache = adv_t(res_cache, ones_t, 1)
        if str_cache is not None:
            x, str_cache = self._run_streamed(
                "decode", self.decode_plan, x, str_cache, ctx, pos[:, None]
            )
            ones = jax.device_put(ones_t, self.cpu) if self.kv_host else ones_t
            str_cache = (adv_h if self.kv_host else adv_t)(str_cache, ones, 1)
        logits = self._head_fn()(self.top, x)
        return logits, {"res": res_cache, "str": str_cache}

    def _dec_embed_ragged_fn(self):
        cfg = self.cfg

        def f(top, tokens, logical_pos, slot_mask, length, active):
            from lia_tpu.ops import attention as att

            x = T.embed(cfg, top, tokens, logical_pos[:, None])
            bias = (att.alibi_slot_bias(cfg.num_heads, slot_mask, length,
                                        logical_pos[:, None])
                    if cfg.alibi else None)
            ctx_past = att.decode_attn_ctx(slot_mask, length, bias=bias)
            sm = jax.vmap(
                lambda row, p, a: jax.lax.dynamic_update_slice(row, a[None], (p,))
            )(slot_mask, length, active)
            return x, ctx_past, att.decode_attn_ctx(sm, length + 1, bias=bias)

        return self._jit("dec_embed_ragged", f)

    def _adv_ragged_fn(self, device_key: str):
        def f(cache, active):
            return kvc.advance_ragged(cache, active)

        if device_key == "host":
            return self._host_jit(("adv_ragged", device_key), f, donate_argnums=(0,))
        return self._jit(("adv_ragged", device_key), f, donate_argnums=(0,))

    # -- continuous-batching (ragged) seams -----------------------------------

    def init_serving_state(self, B: int, max_len: int):
        """Ragged {res, str} cache state for slot-based serving (per-slot
        lengths; ContinuousBatcher composition with tiered weights)."""
        res, st = self._init_caches(B, max_len)
        if res is not None:
            res = res._replace(length=jnp.zeros((B,), jnp.int32))
        if st is not None:
            z = jnp.zeros((B,), jnp.int32)
            if self.kv_host:
                z = jax.device_put(z, self.cpu)
            st = st._replace(length=z)
        return {"res": res, "str": st}

    def insert_slot_state(self, state, seg_state, slot):
        """Splice a freshly-prefilled b=1 segment state into batch row ``slot``."""
        out = dict(state)
        slot = jnp.asarray(slot, jnp.int32)
        if state["res"] is not None:
            out["res"] = self._jit("ins_res", kvc.insert_slot, donate_argnums=(0,))(
                state["res"], seg_state["res"], slot
            )
        if state["str"] is not None:
            seg = seg_state["str"]
            if self.kv_host:
                slot_h = jax.device_put(slot, self.cpu)
                out["str"] = self._host_jit(
                    "ins_str_h", kvc.insert_slot, donate_argnums=(0,)
                )(state["str"], seg, slot_h)
            else:
                out["str"] = self._jit("ins_str", kvc.insert_slot, donate_argnums=(0,))(
                    state["str"], seg, slot
                )
        return out

    def decode_pass_ragged(self, tok, logical_pos, state, active):
        """One ragged decode step (per-slot lengths). Returns (logits, state)."""
        n_res = self.wm.n_resident
        res_cache, str_cache = state["res"], state["str"]
        m, ln = self._cur_mask_len(state)
        x, ctx_past, ctx = self._dec_embed_ragged_fn()(
            self.top, tok[:, None], logical_pos, m, ln, active
        )
        if res_cache is not None:
            seg = self._segment_fn("decode", n_res)
            x, res_cache = seg(
                self.wm.resident, x, res_cache, ctx_past, logical_pos[:, None]
            )
            res_cache = self._adv_ragged_fn("tpu")(res_cache, active)
        if str_cache is not None:
            x, str_cache = self._run_streamed(
                "decode", self.decode_plan, x, str_cache, ctx, logical_pos[:, None]
            )
            a = jax.device_put(active, self.cpu) if self.kv_host else active
            str_cache = self._adv_ragged_fn("host" if self.kv_host else "tpu")(
                str_cache, a
            )
        logits = self._head_fn()(self.top, x)
        return logits, {"res": res_cache, "str": str_cache}

    # -- paged serving over tiered weights (r5: paged × scheduler cell) -------
    #
    # The paged pool replaces BOTH slab segment caches: one [L, nb, H, bs, D]
    # pool covers resident and streamed layers alike (the layer index selects
    # the plane inside the Pallas block-table kernel), so the scheduler's two
    # cache segments collapse into layer ranges of the same pool. TPU-KV
    # streaming plans only — host-placement policies have no paged host
    # attention kernel, exactly like the grouped-beam/verify gates.

    def _paged_res_segment_fn(self, n_res: int):
        cfg = self.cfg
        from lia_tpu.ops import attention as att
        from lia_tpu.ops import paged as pg

        def f(seg_params, x, k_pool, v_pool, table, lengths, positions):
            slopes = att.alibi_slopes(cfg.num_heads) if cfg.alibi else None

            def body(h, inputs):
                lp, idx = inputs
                residual = h
                q, k, v = T.attn_in(cfg, lp, h, positions)
                attn_out = pg.attend_decode_paged(
                    q, k, v, k_pool, v_pool, idx, table, lengths,
                    alibi_slopes=slopes,
                )
                h = T.attn_post_mlp(cfg, lp, residual, attn_out)
                return h, (k, v)

            x, (ks, vs) = jax.lax.scan(
                body, x, (seg_params, jnp.arange(n_res, dtype=jnp.int32))
            )
            return x, ks, vs

        return self._jit(("paged_res", n_res), f)

    def _paged_layer_fn(self):
        cfg = self.cfg
        from lia_tpu.ops import attention as att
        from lia_tpu.ops import paged as pg

        def f(lp, x, k_pool, v_pool, idx, table, lengths, positions):
            slopes = att.alibi_slopes(cfg.num_heads) if cfg.alibi else None
            residual = x
            q, k, v = T.attn_in(cfg, lp, x, positions)
            attn_out = pg.attend_decode_paged(
                q, k, v, k_pool, v_pool, idx, table, lengths,
                alibi_slopes=slopes,
            )
            x = T.attn_post_mlp(cfg, lp, residual, attn_out)
            return x, k, v

        return self._jit("paged_layer", f)

    def decode_pass_paged(
        self, tok, logical_pos, k_pool, v_pool, block_table, lengths, active
    ):
        """One ragged decode step over a PAGED pool with tiered weights.

        The resident prefix runs as one fused scan (reads pages in-kernel via
        the block table); each streamed layer's weights arrive through the
        prefetch pipeline and cover all its pages in one transfer. All layers'
        fresh K/V stack up and TWO scatters commit them (the paged analog of
        write_token_all — one commit per step, not per layer). Returns
        (logits, k_pool, v_pool).
        """
        if not self.tpu_kv_plans:
            raise NotImplementedError(
                "paged serving over the scheduler needs TPU-KV streaming "
                "plans; host-placement policies have no paged host kernel"
            )
        from lia_tpu.ops import paged as pg

        n_res, L = self.wm.n_resident, self.cfg.num_layers
        cfg = self.cfg
        x = self._jit(
            "paged_embed", lambda top, t, p: T.embed(cfg, top, t, p)
        )(self.top, tok[:, None], logical_pos[:, None])
        positions = logical_pos[:, None]
        stacks = []
        if n_res:
            x, ks, vs = self._paged_res_segment_fn(n_res)(
                self.wm.resident, x, k_pool, v_pool, block_table, lengths,
                positions,
            )
            stacks.append((ks, vs))
        if n_res < L:
            layer_f = self._paged_layer_fn()
            overlap = self.runtime.overlap
            _pending: collections.deque = collections.deque()
            kv_list = []
            self.wm.prefetch(n_res)
            for idx in range(n_res, L):
                self.wm.prefetch(idx + 1)
                lp = self.wm.get_layer(idx)
                x, k, v = layer_f(
                    lp, x, k_pool, v_pool, jnp.int32(idx), block_table,
                    lengths, positions,
                )
                if not overlap:
                    jax.block_until_ready(x)
                else:
                    _pending.append(x)
                    if len(_pending) > max(1, self.runtime.max_inflight_layers):
                        jax.block_until_ready(_pending.popleft())
                kv_list.append((k, v))
            ks = jnp.stack([k for k, _ in kv_list])
            vs = jnp.stack([v for _, v in kv_list])
            stacks.append((ks, vs))
        k_stack = (
            jnp.concatenate([s[0] for s in stacks]) if len(stacks) > 1 else stacks[0][0]
        )
        v_stack = (
            jnp.concatenate([s[1] for s in stacks]) if len(stacks) > 1 else stacks[0][1]
        )
        k_pool, v_pool = self._jit(
            "paged_commit", pg.write_token_all_layers, donate_argnums=(0, 1)
        )(k_pool, v_pool, k_stack, v_stack, block_table, lengths, active)
        logits = self._head_fn()(self.top, x)
        return logits, k_pool, v_pool

    def reorder_state(self, state, beam_idx):
        """Gather both caches' batch rows by ``beam_idx`` (beam hypothesis
        shuffle). This is the whole-cache-gather form — O(cache) HBM/DRAM
        traffic per step; the fallback for host-KV plans, where the grouped
        layout has no host attention kernel. TPU-KV streaming plans use the
        grouped path instead (:meth:`beam_state_from_prefill` /
        :meth:`decode_pass_beam` / :meth:`reorder_state_beam`)."""

        def f(cache, idx):
            return kvc.beam_reorder(cache, idx)

        out = dict(state)
        if state["res"] is not None:
            out["res"] = self._jit("reorder_t", f, donate_argnums=(0,))(
                state["res"], beam_idx
            )
        if state["str"] is not None:
            if self.kv_host:
                idx_h = jax.device_put(beam_idx, self.cpu)
                out["str"] = self._host_jit("reorder_h", f, donate_argnums=(0,))(
                    state["str"], idx_h
                )
            else:
                out["str"] = self._jit("reorder_t2", f, donate_argnums=(0,))(
                    state["str"], beam_idx
                )
        return out

    # -- grouped beam search under tiering --------------------------------
    #
    # The resident engine's BeamKVCache (shared prompt + per-beam tail,
    # kv_cache.py) extended to the scheduler's two cache segments: the beam
    # shuffle gathers only the generated tails instead of both whole caches
    # (the round-3 trade-off at scheduler.reorder_state). Reference intent:
    # the beam_idx indirection that never copies the cache
    # (intel_extension_for_pytorch/transformers/generation/greedy_search.py:237-282,
    # MaskedMultiHeadAttentionKrnl.cpp). TPU-KV streaming plans only —
    # host-KV/host-attention policies have no grouped host kernel and keep
    # the whole-cache-gather fallback (reorder_state).

    @property
    def tpu_kv_plans(self) -> bool:
        """Both phase plans keep KV in HBM with TPU attention (policy-3
        streaming) — the plans the grouped beam layout and the chunked
        verify pass (tiered speculation) support."""
        return not (
            self.kv_host
            or self.prefill_plan.all_host or self.prefill_plan.hybrid
            or self.decode_plan.all_host or self.decode_plan.hybrid
        )

    # back-compat name used by the grouped-beam gate
    grouped_beam_ok = tpu_kv_plans

    def beam_state_from_prefill(self, state, nb: int, max_new_tokens: int):
        """Wrap both prefilled segment caches (batch B0) as grouped
        :class:`~lia_tpu.ops.kv_cache.BeamKVCache` (prompt shared per group,
        fresh per-beam tails at B0*nb rows)."""
        if not self.grouped_beam_ok:
            raise NotImplementedError(
                "grouped beam needs TPU-KV streaming plans; host-placement "
                "policies use the whole-cache-gather path (reorder_state)"
            )
        return {
            k: None if c is None else kvc.beam_cache_from_prefill(c, nb, max_new_tokens)
            for k, c in state.items()
        }

    def _beam_embed_fn(self):
        cfg = self.cfg

        def f(top, tokens, positions, cache):
            x = T.embed(cfg, top, tokens, positions)
            return x, T._alibi_beam_bias(cfg, cache, positions)

        return self._jit("beam_embed", f)

    def _beam_segment_fn(self, n_layers: int):
        """Resident prefix as one fused scan over the grouped beam cache."""
        cfg = self.cfg

        def f(seg_params, x, cache, bias, positions):
            return T.beam_decode_layers_scan(
                cfg, seg_params, x, cache, bias, positions, n_layers
            )

        return self._jit(("beam_seg", n_layers), f, donate_argnums=(2,))

    def _beam_layer_fn(self):
        """One streamed layer's grouped-beam decode step: attend over
        [shared prompt | this beam's tail | fresh], write the fresh K/V into
        the tail plane at (layer idx, tail_len)."""
        cfg = self.cfg
        from lia_tpu.ops import attention as att
        from lia_tpu.ops.quant import dequantize_kv, is_quantized_kv, quantize_kv

        def f(lp, x, cache, idx, bias, positions):
            residual = x
            q, k, v = T.attn_in(cfg, lp, x, positions)
            if is_quantized_kv(cache.tail_k):
                kq, vq = quantize_kv(k), quantize_kv(v)
                kf, vf = dequantize_kv(kq, x.dtype), dequantize_kv(vq, x.dtype)
            else:
                kq, vq, kf, vf = k, v, k, v
            attn_out = att.attend_decode_beam(q, kf, vf, cache, idx, bias=bias)
            x = T.attn_post_mlp(cfg, lp, residual, attn_out)
            cache = cache._replace(
                tail_k=kvc.write_token(cache.tail_k, kq, idx, cache.tail_len),
                tail_v=kvc.write_token(cache.tail_v, vq, idx, cache.tail_len),
            )
            return x, cache

        return self._jit("beam_layer", f, donate_argnums=(2,))

    def decode_pass_beam(self, tok, pos, state):
        """One grouped beam decode pass: ``tok``/``pos`` are [B0*nb]; the
        resident prefix runs as one fused scan, streamed layers run per-layer
        with weight prefetch (same pipeline as :meth:`decode_pass`)."""
        n_res, L = self.wm.n_resident, self.cfg.num_layers
        res, strc = state["res"], state["str"]
        ref = res if res is not None else strc
        x, bias = self._beam_embed_fn()(
            self.top, tok[:, None], pos[:, None].astype(jnp.int32), ref
        )
        positions = pos[:, None].astype(jnp.int32)
        if res is not None:
            x, res = self._beam_segment_fn(n_res)(
                self.wm.resident, x, res, bias, positions
            )
        if strc is not None:
            layer_f = self._beam_layer_fn()
            overlap = self.runtime.overlap
            _pending: collections.deque = collections.deque()
            self.wm.prefetch(n_res)
            for idx in range(n_res, L):
                self.wm.prefetch(idx + 1)
                lp = self.wm.get_layer(idx)
                x, strc = layer_f(
                    lp, x, strc, jnp.int32(idx - n_res), bias, positions
                )
                if not overlap:
                    jax.block_until_ready(x)
                else:
                    _pending.append(x)
                    if len(_pending) > max(1, self.runtime.max_inflight_layers):
                        jax.block_until_ready(_pending.popleft())
            # per-layer writes all landed at tail_len; advance once per step
            strc = self._jit(
                "beam_adv", lambda c: c._replace(tail_len=c.tail_len + 1),
                donate_argnums=(0,),
            )(strc)
        logits = self._head_fn()(self.top, x)
        return logits, {"res": res, "str": strc}

    def reorder_state_beam(self, state, flat_src):
        """Beam shuffle under tiering: gather ONLY the generated tails —
        O(tail) traffic instead of O(cache) (the grouped win)."""
        out = dict(state)
        for key, jkey in (("res", "beam_reorder_r"), ("str", "beam_reorder_s")):
            if state[key] is not None:
                out[key] = self._jit(
                    jkey, kvc.beam_tail_reorder, donate_argnums=(0,)
                )(state[key], flat_src)
        return out

    # -- chunked verify pass: speculation under tiering ---------------------
    #
    # The single highest-leverage composition for streamed decode: a verify
    # pass runs C = k+1 candidate tokens through every layer in ONE pass, so
    # each streamed layer's weights transfer once per k+1 candidates instead
    # of once per token — streamed decode's dominant cost (the weight
    # transfer) drops by the acceptance factor. TPU-KV plans only (the chunk
    # attention is the Pallas/jnp ragged-chunk path; host attention has no
    # chunk kernel). Additive over the reference (LIA/IPEX ship no
    # speculation); the verify body mirrors engine/lookahead._verify_fn.

    def ragged_state(self, state):
        """Aligned prefill state (scalar lengths) → ragged ([B] lengths) —
        speculation advances sequences unevenly."""
        def f(c):
            B = c.mask.shape[0]
            return c._replace(length=jnp.full((B,), c.length, jnp.int32))

        return {
            k: None if c is None else self._jit(("raggedify", k), f, donate_argnums=(0,))(c)
            for k, c in state.items()
        }

    def _verify_embed_fn(self):
        cfg = self.cfg
        return self._jit(
            "verify_embed",
            lambda top, tokens, positions: T.embed(cfg, top, tokens, positions),
        )

    def _verify_head_fn(self):
        cfg = self.cfg

        def f(top, x):
            return jnp.argmax(T.lm_head(cfg, top, x), axis=-1).astype(jnp.int32)

        return self._jit("verify_head", f)

    def _verify_probs_head_fn(self, gen):
        """Warped target distributions p [B, C, V] over the chunk — the head
        the SAMPLED speculation acceptance needs (Leviathan p/q math)."""
        cfg = self.cfg
        from lia_tpu.ops import sampling

        def f(top, x):
            return sampling.warped_probs(T.lm_head(cfg, top, x), gen)

        return self._jit(
            ("verify_head_probs", gen.temperature, gen.top_k, gen.top_p), f
        )

    @staticmethod
    def _chunk_slot_mask(cache, C: int):
        ones = jnp.ones((C,), jnp.bool_)
        return jax.vmap(
            lambda row, p: jax.lax.dynamic_update_slice(row, ones, (p,))
        )(cache.mask, cache.length)

    def _verify_segment_fn(self, n_layers: int):
        """Resident prefix: C chunk tokens over the stacked segment cache
        (ragged write-then-attend at per-sequence bases, one fused scan)."""
        cfg = self.cfg
        from lia_tpu.ops import attention as att

        def f(seg_params, x, cache, positions):
            base = cache.length  # [B]
            slot_mask = self._chunk_slot_mask(cache, positions.shape[1])
            bias = att.alibi_slot_bias(cfg.num_heads, slot_mask) if cfg.alibi else None

            def body(h, per_layer):
                lp, kl, vl = per_layer
                residual = h
                q, k, v = T.attn_in(cfg, lp, h, positions)
                kl, vl = kvc.update_layer(kl, vl, k, v, base)
                attn_out = att.attend_prefill_cached(
                    q, kl, vl, base, slot_mask, cfg.sliding_window, bias=bias
                )
                h = T.attn_post_mlp(cfg, lp, residual, attn_out)
                return h, (kl, vl)

            x, (k_new, v_new) = jax.lax.scan(body, x, (seg_params, cache.k, cache.v))
            return x, cache._replace(k=k_new, v=v_new)

        return self._jit(("verify_seg", n_layers), f, donate_argnums=(2,))

    def _verify_layer_fn(self):
        """One streamed layer's chunk verify step (weights arrive via the
        prefetch pipeline; ONE transfer covers all C candidates)."""
        cfg = self.cfg
        from lia_tpu.ops import attention as att

        def f(lp, x, cache, idx, positions):
            base = cache.length
            slot_mask = self._chunk_slot_mask(cache, positions.shape[1])
            bias = att.alibi_slot_bias(cfg.num_heads, slot_mask) if cfg.alibi else None
            residual = x
            q, k, v = T.attn_in(cfg, lp, x, positions)
            kl = kvc.index_layer_kv(cache.k, idx)
            vl = kvc.index_layer_kv(cache.v, idx)
            kl, vl = kvc.update_layer(kl, vl, k, v, base)
            attn_out = att.attend_prefill_cached(
                q, kl, vl, base, slot_mask, cfg.sliding_window, bias=bias
            )
            x = T.attn_post_mlp(cfg, lp, residual, attn_out)
            cache = cache._replace(
                k=kvc.set_layer_kv(cache.k, kl, idx),
                v=kvc.set_layer_kv(cache.v, vl, idx),
            )
            return x, cache

        return self._jit("verify_layer", f, donate_argnums=(2,))

    def verify_pass(self, tokens, positions, state, probs_gen=None):
        """Run C candidate tokens through both segments; returns (per-position
        head output, state with the chunk's K/V written). The head is greedy
        argmax [B, C] by default, or warped probs [B, C, V] when ``probs_gen``
        (a GenerationConfig) is given — the sampled-speculation acceptance
        input. Mask/length advance separately by the ACCEPTED amount
        (:meth:`accept_state`)."""
        if not self.tpu_kv_plans:
            raise NotImplementedError(
                "the chunked verify pass needs TPU-KV streaming plans; "
                "host-placement policies have no chunk attention kernel"
            )
        n_res, L = self.wm.n_resident, self.cfg.num_layers
        res, strc = state["res"], state["str"]
        x = self._verify_embed_fn()(self.top, tokens, positions)
        if res is not None:
            x, res = self._verify_segment_fn(n_res)(
                self.wm.resident, x, res, positions
            )
        if strc is not None:
            layer_f = self._verify_layer_fn()
            overlap = self.runtime.overlap
            _pending: collections.deque = collections.deque()
            self.wm.prefetch(n_res)
            for idx in range(n_res, L):
                self.wm.prefetch(idx + 1)
                lp = self.wm.get_layer(idx)
                x, strc = layer_f(lp, x, strc, jnp.int32(idx - n_res), positions)
                if not overlap:
                    jax.block_until_ready(x)
                else:
                    _pending.append(x)
                    if len(_pending) > max(1, self.runtime.max_inflight_layers):
                        jax.block_until_ready(_pending.popleft())
        head = (
            self._verify_head_fn()
            if probs_gen is None
            else self._verify_probs_head_fn(probs_gen)
        )
        out = head(self.top, x)
        return out, {"res": res, "str": strc}

    def accept_state(self, state, accept):
        """Advance both segments' mask/length by the accepted amount (the
        verify wrote ALL C candidates; only [0, accept) become valid)."""
        def f(cache, acc):
            B, S_max = cache.mask.shape
            pos = jax.lax.broadcasted_iota(jnp.int32, (B, S_max), 1)
            lo = cache.length[:, None]
            hi = (cache.length + acc)[:, None]
            mask = cache.mask | ((pos >= lo) & (pos < hi))
            return cache._replace(mask=mask, length=cache.length + acc)

        return {
            k: None if c is None else self._jit(("accept", k), f, donate_argnums=(0,))(c, accept)
            for k, c in state.items()
        }

    def score_logprobs(self, tokens, mask, max_len: int):
        """Per-position next-token log-probs [B, S, V] with tiered weights
        (lm-eval loglikelihood under streaming — engine.score composition)."""
        B, S = tokens.shape
        res_cache, str_cache = self._init_caches(B, max_len)
        n_res = self.wm.n_resident
        x, positions, ctx = self._embed_fn()(
            self.top, jnp.asarray(tokens), jnp.asarray(mask)
        )
        if res_cache is not None:
            seg = self._segment_fn("prefill", n_res)
            x, res_cache = seg(self.wm.resident, x, res_cache, ctx, positions)
        if str_cache is not None:
            x, str_cache = self._run_streamed(
                "prefill", self.prefill_plan, x, str_cache, ctx, positions
            )

        def score_head(top, x):
            logits = T.lm_head(self.cfg, top, x)
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        return self._jit("score_head", score_head)(self.top, x)

    # -- generation ------------------------------------------------------------

    def generate(
        self,
        tokens: np.ndarray,
        mask: np.ndarray,
        gen: GenerationConfig,
        max_len: int,
        lat: LatencyStats,
        rng,
    ):
        from lia_tpu.engine.engine import GenerationResult

        B, S = tokens.shape

        # ---- prefill ----
        from lia_tpu.engine.engine import _needs_processors

        proc = _needs_processors(gen)
        t0 = time.perf_counter()
        logits, state = self.prefill_pass(tokens, mask, max_len)
        seen = (
            sampling.seen_from_prompt(
                jnp.asarray(tokens), jnp.asarray(mask), self.cfg.vocab_size
            )
            if proc else None
        )
        hist = (
            jnp.concatenate(
                [jnp.asarray(tokens),
                 jnp.full((B, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
                axis=1,
            ) if proc else None
        )
        if proc:
            logits = sampling.process_logits(logits, gen, seen, 0, history=hist, cur_len=S)
        rng, sub = jax.random.split(rng)
        tok = sampling.sample(logits, sub, gen)
        if proc:
            seen = sampling.update_seen(seen, tok)
            hist = hist.at[:, S].set(tok)
        tok.block_until_ready()
        lat.record(time.perf_counter() - t0)

        pos = jnp.asarray(mask.sum(1), jnp.int32)
        finished = (
            (tok == gen.eos_token_id)
            if gen.eos_token_id is not None
            else jnp.zeros((B,), bool)
        )
        out = [np.asarray(tok)]

        for i in range(gen.max_new_tokens - 1):
            t0 = time.perf_counter()
            logits, state = self.decode_pass(tok, pos, state)
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
            pos = pos + 1
            out.append(np.asarray(tok))
            if gen.eos_token_id is not None and bool(finished.all()):
                break
        return GenerationResult(np.stack(out, axis=1), lat)
