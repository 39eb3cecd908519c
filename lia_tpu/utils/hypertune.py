"""Hypertune: grid search over runtime placement knobs.

Parity with the reference's ``intel_extension_for_pytorch.cpu.hypertune`` (grid/
random search over launcher knobs + user hyperparameters, cpu/hypertune/README:1-30)
— here the search space is the LIA policy surface itself: (prefill_policy,
decode_policy, hbm_percentage, num_minibatch), objective = measured decode
throughput or total latency on a short probe workload.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from lia_tpu.config import GenerationConfig, ModelConfig, QuantConfig, RuntimeConfig


@dataclass
class TuneResult:
    runtime: RuntimeConfig
    tokens_per_s: float
    total_s: float


@dataclass
class Hypertune:
    cfg: ModelConfig
    params_host: Any
    gen: GenerationConfig = GenerationConfig(max_new_tokens=8)
    batch: int = 4
    input_tokens: int = 64
    quant: QuantConfig = QuantConfig()
    prefill_policies: Sequence[int] = (0, 3)
    decode_policies: Sequence[int] = (1, 2, 3)
    hbm_percentages: Sequence[int] = (0, 50, 100)
    num_minibatches: Sequence[int] = (1, 2)

    def candidates(self) -> List[RuntimeConfig]:
        out = []
        for pf, dec, pct, nm in itertools.product(
            self.prefill_policies, self.decode_policies, self.hbm_percentages, self.num_minibatches
        ):
            if pct == 100 and (pf != 3 or dec != 3):
                continue  # policies only apply to non-resident layers
            out.append(
                RuntimeConfig(
                    prefill_policy=pf,
                    decode_policy=dec,
                    hbm_percentage=pct,
                    num_minibatch=nm,
                    stream_weights=pct < 100,
                    quant=self.quant,
                )
            )
        return out

    def run(self, verbose: bool = True) -> List[TuneResult]:
        from lia_tpu.engine.engine import InferenceEngine

        rng = np.random.default_rng(0)
        prompts = [
            list(rng.integers(10, self.cfg.vocab_size - 10, size=self.input_tokens))
            for _ in range(self.batch)
        ]
        results = []
        for rt in self.candidates():
            try:
                eng = InferenceEngine(self.cfg, self.params_host, rt)
                eng.generate(prompts, self.gen)  # warmup/compile
                t0 = time.perf_counter()
                res = eng.generate(prompts, self.gen)
                dt = time.perf_counter() - t0
                tps = res.sequences.size / dt
                results.append(TuneResult(rt, tps, dt))
                if verbose:
                    print(
                        f"[hypertune] pf={rt.prefill_policy} dec={rt.decode_policy} "
                        f"hbm%={rt.hbm_percentage} nm={rt.num_minibatch}: {tps:.1f} tok/s"
                    )
            except Exception as e:  # candidate invalid on this machine — record & skip
                if verbose:
                    print(f"[hypertune] candidate failed: {e}")
        results.sort(key=lambda r: -r.tokens_per_s)
        return results

    def best(self) -> Optional[TuneResult]:
        results = self.run(verbose=False)
        return results[0] if results else None
