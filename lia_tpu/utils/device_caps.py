"""TPU generation capability registry.

Reference analog: the ISA dynamic-dispatch capability layer
(csrc/cpu/isa/cpu_feature.cpp:99-109 AMX detection + DispatchStub). A TPU has one
ISA per chip, so "dispatch" reduces to knowing the generation's roofline numbers —
consumed by the cost model (SystemProfile defaults) and reporting.

Peak numbers from public TPU specs; the cost model derates them (and can override
via live microbenchmarks, Microbench.calibrate).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class TpuCaps:
    name: str
    bf16_flops: float  # peak bf16 FLOP/s per chip
    int8_ops: float  # peak int8 OP/s per chip
    hbm_bytes: float
    hbm_bw: float  # bytes/s
    ici_bw: float  # bytes/s per link


REGISTRY = {
    "v4": TpuCaps("v4", 275e12, 275e12, 32e9, 1228e9, 50e9),
    "v5e": TpuCaps("v5e", 197e12, 394e12, 16e9, 819e9, 50e9),
    "v5p": TpuCaps("v5p", 459e12, 918e12, 95e9, 2765e9, 100e9),
    "v6e": TpuCaps("v6e", 918e12, 1836e12, 32e9, 1640e9, 100e9),
}


def detect() -> Optional[TpuCaps]:
    """Identify the local TPU generation from jax device metadata."""
    import jax

    try:
        d = jax.devices()[0]
    except Exception:
        return None
    if d.platform != "tpu":
        return None
    kind = getattr(d, "device_kind", "").lower()
    for key, caps in REGISTRY.items():
        if key in kind.replace(" ", "").replace("lite", "e"):
            return caps
    if "v5lite" in kind.replace(" ", "") or "v5 lite" in kind:
        return REGISTRY["v5e"]
    return None


def system_profile_defaults():
    """SystemProfile seeded from the detected generation (cost model entry)."""
    from lia_tpu.runtime.cost_model import SystemProfile

    caps = detect()
    if caps is None:
        return SystemProfile()
    return SystemProfile(
        tpu_flops=caps.bf16_flops * 0.5,  # achievable derate
        hbm_bw=caps.hbm_bw * 0.85,
        hbm_bytes=caps.hbm_bytes * 0.875,
    )
