"""Streaming execution scheduler — the LIA `OPTDecoder.forward` analog.

Re-creates the reference's layer-by-layer pipeline (lia/modeling_opt.py:1021-1586)
the TPU way. The reference drives 5 CUDA streams from Python (stream setup :1208-1212,
prefill pipeline :1268-1365, decode pipelines :1379-1543); here the same overlap falls
out of JAX's async dispatch discipline:

- the **resident prefix** (first ``hbm_percentage``% of layers, policy-3 analog,
  :1175-1184) executes as ONE jitted ``lax.scan`` segment — full XLA fusion, zero
  per-layer dispatch;
- each **streamed layer** runs through a single jitted per-layer function (traced
  once, reused for every streamed layer — the layer index is a traced scalar), while
  the :class:`TieredWeightManager` prefetches layer ``i+1``'s weights host→HBM on a
  side thread (double-buffer analog of load_layer/compute overlap :1306-1328);
- ``--no-overlap`` (:1173,1348-1365) serializes by blocking on each transfer.

Minibatch-split prefill (``--num-minibatch``, :1284-1346) slices the batch so weight
transfer of layer ``i+1`` overlaps several smaller compute chunks of layer ``i``,
which also caps prefill activation memory.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig, RuntimeConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.ops import sampling
from lia_tpu.runtime.weight_manager import TieredWeightManager
from lia_tpu.utils.metrics import LatencyStats


class StreamingScheduler:
    """Drives prefill/decode with tiered weights (resident scan + streamed loop)."""

    def __init__(self, cfg: ModelConfig, runtime: RuntimeConfig, params_host: Any):
        self.cfg = cfg
        self.runtime = runtime
        hbm_pct = 0 if runtime.stream_weights and runtime.hbm_percentage >= 100 else runtime.hbm_percentage
        self.wm = TieredWeightManager(
            params_host["layers"], cfg.num_layers, hbm_pct, overlap=runtime.overlap
        )
        # non-layer params (embeddings/norms/head) are small — always resident
        self.top = jax.device_put({k: v for k, v in params_host.items() if k != "layers"})
        self._compiled: Dict[Any, Any] = {}

    # `resident_params` keeps the engine API uniform (used for reporting only)
    @property
    def resident_params(self):
        return self.top

    # -- jitted building blocks ----------------------------------------------

    def _embed_fn(self):
        if "embed" not in self._compiled:
            cfg = self.cfg

            def f(top, tokens, input_mask):
                from lia_tpu.ops import attention as att

                positions = jnp.cumsum(input_mask.astype(jnp.int32), axis=1) - 1
                x = T.embed(cfg, top, tokens, positions)
                return x, positions, att.prefill_attn_ctx(input_mask)

            self._compiled["embed"] = jax.jit(f)
        return self._compiled["embed"]

    def _head_fn(self):
        if "head" not in self._compiled:
            cfg = self.cfg
            self._compiled["head"] = jax.jit(
                lambda top, x: T.lm_head(cfg, top, x[:, -1:, :])[:, 0, :]
            )
        return self._compiled["head"]

    def _segment_fn(self, phase: str, lo: int, hi: int):
        """Jitted scan over the resident layer range [lo, hi) on the full cache."""
        key = ("seg", phase, lo, hi)
        if key not in self._compiled:
            cfg = self.cfg
            layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

            def f(seg_params, x, cache, mask, positions):
                start = cache.length

                def body(h, per_layer):
                    lp, kl, vl = per_layer
                    h, kl, vl = layer(cfg, lp, h, kl, vl, start, mask, positions)
                    return h, (kl, vl)

                x, (k_new, v_new) = jax.lax.scan(
                    body, x, (seg_params, cache.k[lo:hi], cache.v[lo:hi])
                )
                cache = cache._replace(
                    k=cache.k.at[lo:hi].set(k_new), v=cache.v.at[lo:hi].set(v_new)
                )
                return x, cache

            self._compiled[key] = jax.jit(f, donate_argnums=(2,))
        return self._compiled[key]

    def _layer_fn(self, phase: str):
        """Jitted single streamed layer; layer index is a traced scalar (one compile
        serves every streamed layer — the analog of reusing one gpu_layer buffer)."""
        key = ("layer", phase)
        if key not in self._compiled:
            cfg = self.cfg
            layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

            def f(lp, x, cache, idx, mask, positions):
                start = cache.length
                kl = jax.lax.dynamic_index_in_dim(cache.k, idx, 0, keepdims=False)
                vl = jax.lax.dynamic_index_in_dim(cache.v, idx, 0, keepdims=False)
                x, kl, vl = layer(cfg, lp, x, kl, vl, start, mask, positions)
                cache = cache._replace(
                    k=jax.lax.dynamic_update_index_in_dim(cache.k, kl, idx, 0),
                    v=jax.lax.dynamic_update_index_in_dim(cache.v, vl, idx, 0),
                )
                return x, cache

            self._compiled[key] = jax.jit(f, donate_argnums=(2,))
        return self._compiled[key]

    def _run_layers(self, phase: str, x, cache, mask, positions):
        """Resident segment (one scan) then streamed layers (prefetch pipeline)."""
        n_res, L = self.wm.n_resident, self.cfg.num_layers
        nm = max(1, self.runtime.num_minibatch) if phase == "prefill" else 1
        if n_res > 0:
            seg = self._segment_fn(phase, 0, n_res)
            x, cache = seg(self.wm.resident, x, cache, mask, positions)
        if n_res < L:
            self.wm.prefetch(n_res)
            layer_f = self._layer_fn(phase)
            for idx in range(n_res, L):
                self.wm.prefetch(idx + 1)  # overlap next transfer with this compute
                lp = self.wm.get_layer(idx)
                B = x.shape[0]
                if nm == 1 or B % nm != 0:
                    x, cache = layer_f(lp, x, cache, jnp.int32(idx), mask, positions)
                else:
                    # minibatch-split prefill: equal batch slices pipeline against
                    # the next layer's weight transfer (lia/modeling_opt.py:1284-1346)
                    mb = B // nm
                    mb_f = self._mb_layer_fn(phase)
                    parts = []
                    for c in range(nm):
                        b0 = c * mb
                        ctx_sl = jax.tree.map(lambda a: a[b0 : b0 + mb], mask)
                        xx, cache = mb_f(
                            lp,
                            x[b0 : b0 + mb],
                            cache,
                            jnp.int32(idx),
                            jnp.int32(b0),
                            ctx_sl,
                            positions[b0 : b0 + mb],
                        )
                        parts.append(xx)
                    x = jnp.concatenate(parts, axis=0)
                if not self.runtime.overlap:
                    jax.block_until_ready(x)
        return x, cache

    def _mb_layer_fn(self, phase: str):
        """Streamed layer over one batch slice; cache rows [b0:b0+mb] updated."""
        key = ("mb_layer", phase)
        if key not in self._compiled:
            cfg = self.cfg
            layer = T.decoder_layer_prefill if phase == "prefill" else T.decoder_layer_decode

            def f(lp, x_sl, cache, idx, b0, mask_sl, pos_sl):
                start = cache.length
                mb = x_sl.shape[0]
                kl = jax.lax.dynamic_index_in_dim(cache.k, idx, 0, keepdims=False)
                vl = jax.lax.dynamic_index_in_dim(cache.v, idx, 0, keepdims=False)
                k_sl = jax.lax.dynamic_slice_in_dim(kl, b0, mb, 0)
                v_sl = jax.lax.dynamic_slice_in_dim(vl, b0, mb, 0)
                x_sl, k_sl, v_sl = layer(cfg, lp, x_sl, k_sl, v_sl, start, mask_sl, pos_sl)
                kl = jax.lax.dynamic_update_slice_in_dim(kl, k_sl, b0, 0)
                vl = jax.lax.dynamic_update_slice_in_dim(vl, v_sl, b0, 0)
                cache = cache._replace(
                    k=jax.lax.dynamic_update_index_in_dim(cache.k, kl, idx, 0),
                    v=jax.lax.dynamic_update_index_in_dim(cache.v, vl, idx, 0),
                )
                return x_sl, cache

            self._compiled[key] = jax.jit(f, donate_argnums=(2,))
        return self._compiled[key]

    # -- generation ----------------------------------------------------------

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

        cfg = self.cfg
        B, S = tokens.shape
        cache = kvc.init_cache(cfg, B, max_len, jnp.dtype(cfg.dtype))

        t0 = time.perf_counter()
        x, positions, pmask = self._embed_fn()(self.top, jnp.asarray(tokens), jnp.asarray(mask))
        x, cache = self._run_layers("prefill", x, cache, pmask, positions)
        cache = kvc.advance(cache, jnp.asarray(mask), S)
        logits = self._head_fn()(self.top, x)
        rng, sub = jax.random.split(rng)
        tok = sampling.sample(logits, sub, gen)
        tok.block_until_ready()
        lat.record(time.perf_counter() - t0)

        pos = jnp.asarray(mask.sum(1), jnp.int32)
        finished = (
            (tok == gen.eos_token_id) if gen.eos_token_id is not None else jnp.zeros((B,), bool)
        )
        out = [np.asarray(tok)]
        dec_embed = self._dec_embed_fn()
        for _ in range(gen.max_new_tokens - 1):
            t0 = time.perf_counter()
            x, dmask = dec_embed(self.top, tok[:, None], pos[:, None], cache.mask, cache.length)
            x, cache = self._run_layers("decode", x, cache, dmask, pos[:, None])
            cache = kvc.advance(cache, jnp.ones((B, 1), jnp.bool_), 1)
            logits = self._head_fn()(self.top, x)
            rng, sub = jax.random.split(rng)
            tok = sampling.sample(logits, sub, gen)
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

    def _dec_embed_fn(self):
        if "dec_embed" not in self._compiled:
            cfg = self.cfg

            def f(top, tokens, positions, slot_mask, length):
                from lia_tpu.ops import attention as att

                x = T.embed(cfg, top, tokens, positions)
                sm = jax.lax.dynamic_update_slice(
                    slot_mask, jnp.ones((tokens.shape[0], 1), jnp.bool_), (0, length)
                )
                return x, att.decode_attn_ctx(sm, length + 1)

            self._compiled["dec_embed"] = jax.jit(f)
        return self._compiled["dec_embed"]
