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
from lia_tpu.engine.engine import GenerationResult
from lia_tpu.models import git as G
from lia_tpu.ops import sampling
from lia_tpu.utils.metrics import LatencyStats


class GitEngine:
    """Image captioning / prompted VQA over GIT.

    Text prompts must be uniform-length across the batch (captioning's BOS-only
    start is the common case) — the fused decode writes every row at the same
    cache slot, matching the aligned-batch convention of the main engine.
    """

    def __init__(self, cfg: ModelConfig, params_host: Any):
        assert cfg.family == "git"
        self.cfg = cfg
        self.params = jax.device_put(params_host)
        self._image_prefix = jax.jit(lambda p, px: G.image_prefix(cfg, p, px))
        self._fused = {}

    def _loop(self, S_txt: int, cache_len: int, T_new: int, gen: GenerationConfig):
        cfg = self.cfg

        def run(params, pixels, tokens, text_mask, seed):
            img = G.image_prefix(cfg, params, pixels)
            S_img = img.shape[1]
            logits, kc, vc = G.prefill(cfg, params, img, tokens, text_mask, cache_len)

            def body(carry, i):
                tok, kc, vc, key = carry
                key, sub = jax.random.split(key)
                nxt = sampling.sample(tok, sub, gen)[:, None].astype(jnp.int32)
                logits, kc, vc = G.decode_step(
                    cfg, params, nxt, S_txt + i, S_img + S_txt + i, kc, vc
                )
                return (logits, kc, vc, key), nxt[:, 0]

            key = jax.random.PRNGKey(seed)
            (last, _, _, _), toks = jax.lax.scan(
                body, (logits, kc, vc, key), jnp.arange(T_new, dtype=jnp.int32)
            )
            return toks.T  # [B, T_new]

        return jax.jit(run)

    def generate(
        self,
        pixels: np.ndarray,  # [B, C, H, W]
        gen: GenerationConfig = GenerationConfig(),
        prompts: Optional[Sequence[Sequence[int]]] = None,  # uniform length; BOS first
        seed: int = 0,
    ) -> GenerationResult:
        cfg = self.cfg
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

        key = (B, S_txt, T_new, gen.do_sample, gen.temperature, gen.top_k, gen.top_p)
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
