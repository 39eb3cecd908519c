"""Vision-language generation engines (GIT, LLaVA).

Reference scope: MODEL_CLASSES["git"] and the optional llava branch in the
example runners (examples/.../single_instance/run_quantization.py:245-271);
IPEX prepares llava multimodal inputs via
``prepare_inputs_labels_for_multimodal_llavallama`` (optimize.py:188,673).

Same shape discipline as the other engines: the image prefix is encoded once,
the decoder self-cache is preallocated, and generation runs as one fused
on-device ``lax.scan``.
"""

from __future__ import annotations

import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig
from lia_tpu.engine.engine import GenerationResult, bucket_length
from lia_tpu.models import git as G
from lia_tpu.models import transformer as T
from lia_tpu.models.vision import vit_encode
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.ops import sampling
from lia_tpu.utils.metrics import LatencyStats


def _place(cfg: ModelConfig, params_host: Any, mesh):
    """Device placement: TP-shard the text decoder over the mesh's "model"
    axis (vision tower/projector replicate — sharding.param_pspecs) or plain
    single-device put. Reference analog: the deepspeed AutoTP runner lists
    git and llava (distributed/run_generation_with_deepspeed.py:50-66)."""
    if mesh is None:
        return jax.device_put(params_host)
    from lia_tpu.parallel.sharding import shard_params

    return shard_params(cfg, params_host, mesh)


def _reject_unsupported(gen: GenerationConfig) -> None:
    if gen.num_beams > 1:
        raise ValueError("use generate_beam() for num_beams > 1")


def _beam_proc_init(gen, tokens, mask, vocab, T_new, proc_on):
    """Per-beam processor state over (already beam-expanded) text ids."""
    Bnb = tokens.shape[0]
    if not proc_on:
        return None
    seen = sampling.seen_from_prompt(tokens, mask, vocab)
    hist = jnp.concatenate(
        [tokens, jnp.full((Bnb, T_new), gen.pad_token_id, jnp.int32)], axis=1
    )
    return (seen, hist, jnp.asarray(tokens.shape[1], jnp.int32), 0)


class GitEngine:
    """Image captioning / prompted VQA over GIT.

    Text prompts must be uniform-length across the batch (captioning's BOS-only
    start is the common case) — the fused decode writes every row at the same
    cache slot, matching the aligned-batch convention of the main engine.
    """

    def __init__(self, cfg: ModelConfig, params_host: Any, mesh=None):
        assert cfg.family == "git"
        self.cfg = cfg
        self.mesh = mesh
        self.params = _place(cfg, params_host, mesh)
        self._image_prefix = jax.jit(lambda p, px: G.image_prefix(cfg, p, px))
        self._fused = {}

    def _loop(self, S_txt: int, cache_len: int, T_new: int, gen: GenerationConfig):
        cfg = self.cfg
        from lia_tpu.engine.engine import _needs_processors

        proc_on = _needs_processors(gen)

        def run(params, pixels, tokens, text_mask, seed):
            img = G.image_prefix(cfg, params, pixels)
            S_img = img.shape[1]
            logits, kc, vc = G.prefill(cfg, params, img, tokens, text_mask, cache_len)
            key = jax.random.PRNGKey(seed)
            key, sub = jax.random.split(key)
            B = tokens.shape[0]
            # processor state over TEXT ids (HF input_ids; image tokens excluded)
            seen = (
                sampling.seen_from_prompt(tokens, text_mask, cfg.vocab_size)
                if proc_on else jnp.zeros((B, 1), jnp.bool_)
            )
            hist = (
                jnp.concatenate(
                    [tokens, jnp.full((B, T_new), gen.pad_token_id, jnp.int32)], axis=1
                ) if proc_on else jnp.zeros((B, 1), jnp.int32)
            )
            if proc_on:
                logits = sampling.process_logits(
                    logits, gen, seen, 0, history=hist, cur_len=S_txt
                )
            t0 = sampling.sample(logits, sub, gen).astype(jnp.int32)
            if proc_on:
                seen = sampling.update_seen(seen, t0)
                hist = hist.at[:, S_txt].set(t0)

            def body(carry, i):
                tok, kc, vc, key, seen, hist = carry
                logits, kc, vc = G.decode_step(
                    cfg, params, tok[:, None], S_txt + i, S_img + S_txt + i, kc, vc
                )
                if proc_on:
                    logits = sampling.process_logits(
                        logits, gen, seen, i + 1, history=hist, cur_len=S_txt + i + 1
                    )
                key, sub = jax.random.split(key)
                nxt = sampling.sample(logits, sub, gen).astype(jnp.int32)
                if proc_on:
                    seen = sampling.update_seen(seen, nxt)
                    hist = jax.lax.dynamic_update_slice(
                        hist, nxt[:, None], (0, S_txt + i + 1)
                    )
                return (nxt, kc, vc, key, seen, hist), nxt

            # step i feeds token i and emits token i+1: T_new-1 forwards after
            # the prefill-sampled first token — no discarded final forward
            (_, _, _, _, _, _), rest = jax.lax.scan(
                body, (t0, kc, vc, key, seen, hist), jnp.arange(T_new - 1, dtype=jnp.int32)
            )
            return jnp.concatenate([t0[None, :], rest], axis=0).T  # [B, T_new]

        return jax.jit(run)

    def generate(
        self,
        pixels: np.ndarray,  # [B, C, H, W]
        gen: GenerationConfig = GenerationConfig(),
        prompts: Optional[Sequence[Sequence[int]]] = None,  # uniform length; BOS first
        seed: int = 0,
    ) -> GenerationResult:
        cfg = self.cfg
        _reject_unsupported(gen)
        B = pixels.shape[0]
        if prompts is None:
            prompts = [[101]] * B  # BOS (BERT [CLS])
        S_txt = len(prompts[0])
        assert all(len(p) == S_txt for p in prompts), "uniform prompt length required"
        tokens = np.asarray(prompts, np.int32)
        mask = np.ones((B, S_txt), bool)
        n_patches = (cfg.vision_image_size // cfg.vision_patch) ** 2
        cache_len = 1 + n_patches + S_txt + gen.max_new_tokens
        T_new = gen.max_new_tokens
        lat = LatencyStats()

        key = (B, S_txt, gen, T_new)  # gen: frozen dataclass, hashable
        if key not in self._fused:
            self._fused[key] = self._loop(S_txt, cache_len, T_new, gen)
        t0 = time.perf_counter()
        toks = self._fused[key](
            self.params, jnp.asarray(pixels), jnp.asarray(tokens), jnp.asarray(mask), seed
        )
        out = np.asarray(toks)
        lat.record(time.perf_counter() - t0)
        if gen.eos_token_id is not None:
            for b in range(B):
                hits = np.flatnonzero(out[b] == gen.eos_token_id)
                if hits.size:
                    out[b, hits[0] + 1:] = gen.pad_token_id
        return GenerationResult(sequences=out, latency=lat)

    def _beam_loop(self, S_txt: int, cache_len: int, T_new: int,
                   gen: GenerationConfig, nb: int):
        cfg = self.cfg
        from lia_tpu.engine import beam as beam_mod
        from lia_tpu.engine.engine import _needs_processors

        proc_on = _needs_processors(gen)

        def run(params, pixels, tokens, text_mask, seed):
            # tokens/text_mask arrive beam-expanded [B*nb, S_txt]; the image
            # encodes once at B and repeats across beams
            img = G.image_prefix(cfg, params, pixels)
            img = jnp.repeat(img, nb, axis=0)
            S_img = img.shape[1]
            logits, kc, vc = G.prefill(cfg, params, img, tokens, text_mask, cache_len)
            Bnb = tokens.shape[0]
            B = Bnb // nb
            key = jax.random.PRNGKey(seed)
            scores, finished = beam_mod.init_beam_state(B, nb)
            proc = _beam_proc_init(gen, tokens, text_mask, cfg.vocab_size, T_new, proc_on)
            key, sub = jax.random.split(key)
            tok, scores, finished, src = beam_mod.beam_select(
                gen, cfg.vocab_size, logits, scores, finished,
                sub if gen.do_sample else None, proc=proc,
            )
            proc = beam_mod.reorder_proc(proc, src, tok)
            kc = jnp.take(kc, src, axis=1)
            vc = jnp.take(vc, src, axis=1)
            history = jnp.full((Bnb, T_new), gen.pad_token_id, jnp.int32)
            history = history.at[:, 0].set(tok)
            if not proc_on:  # constant-structure scan carry
                proc = (jnp.zeros((Bnb, 1), jnp.bool_),
                        jnp.zeros((Bnb, 1), jnp.int32), jnp.int32(0), 0)

            def step(carry, i):
                tok, kc, vc, scores, finished, history, key, proc = carry
                logits, kc, vc = G.decode_step(
                    cfg, params, tok[:, None], S_txt + i, S_img + S_txt + i, kc, vc
                )
                key, sub = jax.random.split(key)
                ntok, scores, finished, src = beam_mod.beam_select(
                    gen, cfg.vocab_size, logits, scores, finished,
                    sub if gen.do_sample else None,
                    proc=proc if proc_on else None,
                )
                if proc_on:
                    proc = beam_mod.reorder_proc(proc, src, ntok)
                kc = jnp.take(kc, src, axis=1)
                vc = jnp.take(vc, src, axis=1)
                history = jnp.take(history, src, axis=0)
                history = jax.lax.dynamic_update_slice(history, ntok[:, None], (0, i + 1))
                return (ntok, kc, vc, scores, finished, history, key, proc), None

            (tok, kc, vc, scores, finished, history, key, proc), _ = jax.lax.scan(
                step, (tok, kc, vc, scores, finished, history, key, proc),
                jnp.arange(T_new - 1, dtype=jnp.int32),
            )
            return history.reshape(B, nb, T_new), scores

        return jax.jit(run)

    def generate_beam(
        self,
        pixels: np.ndarray,  # [B, C, H, W]
        gen: GenerationConfig,
        prompts: Optional[Sequence[Sequence[int]]] = None,
        seed: int = 0,
    ) -> GenerationResult:
        """Beam-search captioning (the reference's GIT runner decodes with
        num_beams=4 by default — run_generation.py generate_kwargs)."""
        from lia_tpu.engine import beam as beam_mod

        cfg = self.cfg
        nb = gen.num_beams
        B = pixels.shape[0]
        if prompts is None:
            prompts = [[101]] * B  # BOS (BERT [CLS])
        S_txt = len(prompts[0])
        assert all(len(p) == S_txt for p in prompts), "uniform prompt length required"
        tokens = np.repeat(np.asarray(prompts, np.int32), nb, axis=0)
        mask = np.ones((B * nb, S_txt), bool)
        n_patches = (cfg.vision_image_size // cfg.vision_patch) ** 2
        cache_len = 1 + n_patches + S_txt + gen.max_new_tokens
        T_new = gen.max_new_tokens
        lat = LatencyStats()

        key = ("beam", B, S_txt, gen, T_new)
        if key not in self._fused:
            self._fused[key] = self._beam_loop(S_txt, cache_len, T_new, gen, nb)
        t0 = time.perf_counter()
        history, scores = self._fused[key](
            self.params, jnp.asarray(pixels), jnp.asarray(tokens),
            jnp.asarray(mask), seed,
        )
        seqs = beam_mod.select_best(np.asarray(history), np.asarray(scores), gen)
        lat.record(time.perf_counter() - t0)
        return GenerationResult(sequences=seqs, latency=lat)


class LlavaEngine:
    """LLaVA: CLIP-L features (layer -2, CLS dropped) → 2-layer GELU projector
    → spliced over the ``<image>`` placeholder embeddings of a llama LM.

    Each prompt must contain exactly one ``cfg.image_token_id``; the engine
    expands it to ``num_patches`` slots (HF processors pre-expand — we accept
    the compact single-token form and both pre-expanded forms)."""

    def __init__(self, cfg: ModelConfig, params_host: Any, mesh=None):
        assert cfg.family == "llava"
        self.cfg = cfg
        self.mesh = mesh
        self.params = _place(cfg, params_host, mesh)
        self._features = jax.jit(self._image_features)
        self._prefill = jax.jit(lambda p, x, m, c: T.prefill_embeds(cfg, p, x, m, c))
        self._fused = {}

    @property
    def num_patches(self) -> int:
        return (self.cfg.vision_image_size // self.cfg.vision_patch) ** 2

    def _image_features(self, params, pixels):
        cfg = self.cfg
        _, picked = vit_encode(
            params["vision"], pixels, cfg.vision_heads, cfg.vision_patch,
            eps=cfg.vision_norm_eps, hidden_layer=cfg.vision_feature_layer,
        )
        feats = picked[:, 1:]  # drop CLS (vision_feature_select_strategy="default")
        p = params["proj"]
        h = jnp.dot(feats.astype(jnp.float32), p["w1"].astype(jnp.float32)) + p["b1"].astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=False)  # projector_hidden_act="gelu" (erf)
        h = jnp.dot(h, p["w2"].astype(jnp.float32)) + p["b2"].astype(jnp.float32)
        return h.astype(jnp.dtype(cfg.dtype))

    def _expand(self, prompt):
        """Replace the single <image> token with num_patches placeholders."""
        img_id = self.cfg.image_token_id
        n = self.num_patches
        count = sum(1 for t in prompt if t == img_id)
        if count == n:  # already pre-expanded (HF processor form)
            return list(prompt)
        if count != 1:
            raise ValueError(
                f"prompt must contain exactly 1 (or num_patches={n}) image tokens, got {count}"
            )
        i = list(prompt).index(img_id)
        return list(prompt[:i]) + [img_id] * n + list(prompt[i + 1:])

    def _loop(self, T_new: int, gen: GenerationConfig):
        cfg = self.cfg
        from lia_tpu.engine.engine import _needs_processors

        proc_on = _needs_processors(gen)

        def run(params, logits0, cache, positions0, seed, seen0, hist0, cur_len0):
            key = jax.random.PRNGKey(seed)
            key, sub = jax.random.split(key)
            if proc_on:
                logits0 = sampling.process_logits(
                    logits0, gen, seen0, 0, history=hist0, cur_len=cur_len0
                )
            t0 = sampling.sample(logits0, sub, gen).astype(jnp.int32)
            if proc_on:
                seen0 = sampling.update_seen(seen0, t0)
                hist0 = jax.lax.dynamic_update_slice(
                    hist0, t0[:, None], (0, cur_len0)
                )

            def body(carry, i):
                tok, cache, key, seen, hist = carry
                logits, cache = T.decode_step(
                    cfg, params, tok[:, None], positions0 + i, cache
                )
                if proc_on:
                    logits = sampling.process_logits(
                        logits, gen, seen, i + 1, history=hist,
                        cur_len=cur_len0 + i + 1,
                    )
                key, sub = jax.random.split(key)
                nxt = sampling.sample(logits, sub, gen).astype(jnp.int32)
                if proc_on:
                    seen = sampling.update_seen(seen, nxt)
                    hist = jax.lax.dynamic_update_slice(
                        hist, nxt[:, None], (0, cur_len0 + i + 1)
                    )
                return (nxt, cache, key, seen, hist), nxt

            # T_new-1 forwards after the prefill-sampled first token
            (_, _, _, _, _), rest = jax.lax.scan(
                body, (t0, cache, key, seen0, hist0), jnp.arange(T_new - 1, dtype=jnp.int32)
            )
            return jnp.concatenate([t0[None, :], rest], axis=0).T

        return jax.jit(run)

    def generate(
        self,
        pixels: np.ndarray,  # [B, C, H, W]
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig = GenerationConfig(),
        seed: int = 0,
    ) -> GenerationResult:
        cfg = self.cfg
        _reject_unsupported(gen)
        expanded = [self._expand(p) for p in prompts]
        B = len(expanded)
        S = bucket_length(max(len(p) for p in expanded))
        tokens = np.full((B, S), cfg.pad_token_id, np.int32)
        mask = np.zeros((B, S), bool)
        img_pos = np.zeros((B, self.num_patches), np.int32)
        for b, p in enumerate(expanded):
            tokens[b, S - len(p):] = p
            mask[b, S - len(p):] = True
            img_pos[b] = S - len(p) + np.flatnonzero(np.asarray(p) == cfg.image_token_id)

        lat = LatencyStats()
        t0 = time.perf_counter()
        feats = self._features(self.params, jnp.asarray(pixels))  # [B, np, H]
        # text embeddings with image features spliced over the placeholders
        embeds = jnp.take(self.params["embed_tokens"], jnp.asarray(tokens), axis=0,
                          mode="clip").astype(jnp.dtype(cfg.dtype))
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        embeds = embeds.at[bidx, jnp.asarray(img_pos)].set(feats)

        # rounded to 128 keeps the Pallas decode kernel's K tiles aligned
        # (same rule as InferenceEngine.generate's max_len)
        max_len = -(-(S + gen.max_new_tokens) // 128) * 128
        cache = kvc.init_cache(cfg, B, max_len, jnp.dtype(cfg.dtype))
        logits, cache = self._prefill(self.params, embeds, jnp.asarray(mask), cache)
        positions0 = jnp.asarray(mask.sum(1).astype(np.int32))[:, None]  # [B, 1]

        from lia_tpu.engine.engine import _needs_processors

        if _needs_processors(gen):
            # processor history over the UN-expanded ids (HF input_ids carry
            # one <image> token), left-padded so cur_len stays a scalar
            S_u = max(len(p) for p in prompts)
            utoks = np.full((B, S_u), cfg.pad_token_id, np.int32)
            umask = np.zeros((B, S_u), bool)
            for b, p in enumerate(prompts):
                utoks[b, S_u - len(p):] = p
                umask[b, S_u - len(p):] = True
            seen0 = sampling.seen_from_prompt(
                jnp.asarray(utoks), jnp.asarray(umask), cfg.vocab_size
            )
            hist0 = jnp.concatenate(
                [jnp.asarray(utoks),
                 jnp.full((B, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
                axis=1,
            )
            cur_len0 = jnp.asarray(S_u, jnp.int32)
        else:
            seen0 = jnp.zeros((B, 1), jnp.bool_)
            hist0 = jnp.zeros((B, 1), jnp.int32)
            cur_len0 = jnp.asarray(0, jnp.int32)
        key = (B, S, gen, gen.max_new_tokens)  # gen: frozen dataclass, hashable
        if key not in self._fused:
            self._fused[key] = self._loop(gen.max_new_tokens, gen)
        toks = self._fused[key](
            self.params, logits, cache, positions0, seed, seen0, hist0, cur_len0
        )
        out = np.asarray(toks)
        lat.record(time.perf_counter() - t0)
        if gen.eos_token_id is not None:
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

        def run(params, logits0, cache, positions0, seed, seen0, hist0, cur_len0):
            Bnb = logits0.shape[0]
            B = Bnb // nb
            key = jax.random.PRNGKey(seed)
            scores, finished = beam_mod.init_beam_state(B, nb)
            proc = (seen0, hist0, cur_len0, 0) if proc_on else None
            key, sub = jax.random.split(key)
            tok, scores, finished, src = beam_mod.beam_select(
                gen, cfg.vocab_size, logits0, scores, finished,
                sub if gen.do_sample else None, proc=proc,
            )
            proc = beam_mod.reorder_proc(proc, src, tok)
            cache = kvc.beam_reorder(cache, src)
            history = jnp.full((Bnb, T_new), gen.pad_token_id, jnp.int32)
            history = history.at[:, 0].set(tok)
            if not proc_on:  # constant-structure scan carry
                proc = (jnp.zeros((Bnb, 1), jnp.bool_),
                        jnp.zeros((Bnb, 1), jnp.int32), jnp.int32(0), 0)

            def step(carry, i):
                tok, cache, scores, finished, history, key, proc = carry
                logits, cache = T.decode_step(
                    cfg, params, tok[:, None], positions0 + i, cache
                )
                key, sub = jax.random.split(key)
                ntok, scores, finished, src = beam_mod.beam_select(
                    gen, cfg.vocab_size, logits, scores, finished,
                    sub if gen.do_sample else None,
                    proc=proc if proc_on else None,
                )
                if proc_on:
                    proc = beam_mod.reorder_proc(proc, src, ntok)
                cache = kvc.beam_reorder(cache, src)
                history = jnp.take(history, src, axis=0)
                history = jax.lax.dynamic_update_slice(history, ntok[:, None], (0, i + 1))
                return (ntok, cache, scores, finished, history, key, proc), None

            (tok, cache, scores, finished, history, key, proc), _ = jax.lax.scan(
                step, (tok, cache, scores, finished, history, key, proc),
                jnp.arange(T_new - 1, dtype=jnp.int32),
            )
            return history.reshape(B, nb, T_new), scores

        return jax.jit(run)

    def generate_beam(
        self,
        pixels: np.ndarray,  # [B, C, H, W]
        prompts: Sequence[Sequence[int]],
        gen: GenerationConfig,
        seed: int = 0,
    ) -> GenerationResult:
        """Beam search over the multimodal prefix (image features encode once
        per image and repeat across beams; the slab cache reorders with the
        winning beams like the decoder-only engine)."""
        from lia_tpu.engine import beam as beam_mod
        from lia_tpu.engine.engine import _needs_processors

        cfg = self.cfg
        nb = gen.num_beams
        expanded = [self._expand(p) for p in prompts]
        B = len(expanded)
        Bnb = B * nb
        S = bucket_length(max(len(p) for p in expanded))
        tokens = np.full((B, S), cfg.pad_token_id, np.int32)
        mask = np.zeros((B, S), bool)
        img_pos = np.zeros((B, self.num_patches), np.int32)
        for b, p in enumerate(expanded):
            tokens[b, S - len(p):] = p
            mask[b, S - len(p):] = True
            img_pos[b] = S - len(p) + np.flatnonzero(np.asarray(p) == cfg.image_token_id)
        tokens = np.repeat(tokens, nb, axis=0)
        mask = np.repeat(mask, nb, axis=0)
        img_pos = np.repeat(img_pos, nb, axis=0)

        lat = LatencyStats()
        t0 = time.perf_counter()
        feats = self._features(self.params, jnp.asarray(pixels))  # [B, np, H]
        feats = jnp.repeat(feats, nb, axis=0)
        embeds = jnp.take(self.params["embed_tokens"], jnp.asarray(tokens), axis=0,
                          mode="clip").astype(jnp.dtype(cfg.dtype))
        bidx = jnp.arange(Bnb, dtype=jnp.int32)[:, None]
        embeds = embeds.at[bidx, jnp.asarray(img_pos)].set(feats)

        max_len = -(-(S + gen.max_new_tokens) // 128) * 128
        cache = kvc.init_cache(cfg, Bnb, max_len, jnp.dtype(cfg.dtype))
        logits, cache = self._prefill(self.params, embeds, jnp.asarray(mask), cache)
        positions0 = jnp.asarray(mask.sum(1).astype(np.int32))[:, None]  # [Bnb, 1]

        if _needs_processors(gen):
            S_u = max(len(p) for p in prompts)
            utoks = np.full((B, S_u), cfg.pad_token_id, np.int32)
            umask = np.zeros((B, S_u), bool)
            for b, p in enumerate(prompts):
                utoks[b, S_u - len(p):] = p
                umask[b, S_u - len(p):] = True
            utoks = np.repeat(utoks, nb, axis=0)
            umask = np.repeat(umask, nb, axis=0)
            seen0 = sampling.seen_from_prompt(
                jnp.asarray(utoks), jnp.asarray(umask), cfg.vocab_size
            )
            hist0 = jnp.concatenate(
                [jnp.asarray(utoks),
                 jnp.full((Bnb, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
                axis=1,
            )
            cur_len0 = jnp.asarray(S_u, jnp.int32)
        else:
            seen0 = jnp.zeros((Bnb, 1), jnp.bool_)
            hist0 = jnp.zeros((Bnb, 1), jnp.int32)
            cur_len0 = jnp.asarray(0, jnp.int32)
        key = ("beam", B, S, gen, gen.max_new_tokens)
        if key not in self._fused:
            self._fused[key] = self._beam_loop(gen.max_new_tokens, gen, nb)
        history, scores = self._fused[key](
            self.params, logits, cache, positions0, seed, seen0, hist0, cur_len0
        )
        seqs = beam_mod.select_best(np.asarray(history), np.asarray(scores), gen)
        lat.record(time.perf_counter() - t0)
        return GenerationResult(sequences=seqs, latency=lat)
