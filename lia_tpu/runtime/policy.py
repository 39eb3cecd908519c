"""Placement policies: per-(phase, operator-group) execution plans.

TPU-native re-creation of LIA's policy semantics (lia/modeling_opt.py:1167-1176,
README.md:75-87, CLI mapping run.py:196-215). The reference's device pair
(A100 GPU ↔ AMX Xeon + CXL DRAM) maps to (TPU chip ↔ TPU-VM host via the XLA:CPU
backend + host DRAM); placements per policy:

| policy | weights        | attention | KV cache | reference semantics              |
|--------|----------------|-----------|----------|----------------------------------|
| 0      | streamed→TPU   | TPU       | host     | GPU compute, KV stored on CPU    |
| 1      | host           | host      | host     | pure CPU/AMX baseline            |
| 2      | streamed→TPU   | host      | host     | GPU linears, CPU attention       |
| 3      | TPU-resident   | TPU       | HBM      | resident layers (gpu_percentage) |
| 4      | streamed→TPU   | host      | host     | decode variant of 2 (explicit    |
|        |                |           |          | ship-back, attentions.py:450-454)|

The first ``hbm_percentage``% of layers always run policy 3 (the
``prefill_policy_gpu = decoding_policy_gpu = 3`` rule, lia/modeling_opt.py:1175-1176);
the rest follow the phase policy. ``auto`` picks per-phase policies from the
microbenchmark-calibrated cost model (:mod:`lia_tpu.runtime.cost_model`).
"""

from __future__ import annotations

from dataclasses import dataclass

from lia_tpu.config import RuntimeConfig


@dataclass(frozen=True)
class Plan:
    """Execution plan for the non-resident layers of one phase."""

    weights: str  # "streamed" (host→TPU per layer) | "host" (stay in DRAM)
    attention: str  # "tpu" | "host"
    kv: str  # "hbm" | "host"

    @property
    def all_host(self) -> bool:
        return self.weights == "host" and self.attention == "host"

    @property
    def hybrid(self) -> bool:
        """Linears on TPU, attention on host (the decode-policy-2 shape)."""
        return self.weights != "host" and self.attention == "host"


_PLANS = {
    0: Plan(weights="streamed", attention="tpu", kv="host"),
    1: Plan(weights="host", attention="host", kv="host"),
    2: Plan(weights="streamed", attention="host", kv="host"),
    3: Plan(weights="streamed", attention="tpu", kv="hbm"),  # non-resident tail
    4: Plan(weights="streamed", attention="host", kv="host"),
}


def plan_for(policy: int) -> Plan:
    if policy not in _PLANS:
        raise ValueError(f"unknown policy {policy}; known: {sorted(_PLANS)}")
    return _PLANS[policy]


def phase_plans(runtime: RuntimeConfig):
    """(prefill_plan, decode_plan) for the non-resident layers."""
    return plan_for(runtime.prefill_policy), plan_for(runtime.decode_policy)


def uses_host_kv(runtime: RuntimeConfig) -> bool:
    p, d = phase_plans(runtime)
    return p.kv == "host" or d.kv == "host"
