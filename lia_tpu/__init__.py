"""LIA-TPU: a TPU-native cooperative-offload LLM inference framework.

Re-creates the capabilities of the ISCA'25 LIA system (reference:
ece-fast-lab/ISCA-2025-LIA, an IPEX fork) with a JAX/XLA/Pallas-first design:
per-phase operator placement policies, tiered HBM/host-DRAM weight management with
async streaming, minibatch-split prefill, weight-only INT8/INT4 quantization with
dequant fused into the matmul, preallocated indirect-access KV cache, and
multi-chip/multi-host sharding over an ICI mesh.
"""

from lia_tpu.config import (
    GenerationConfig,
    ModelConfig,
    Placement,
    QuantConfig,
    RuntimeConfig,
)
from lia_tpu.api import load_engine
from lia_tpu import modules  # public fused-op API (ipex.llm.modules analog)
from lia_tpu.engine.engine import GenerationResult, InferenceEngine, pack_prompts
from lia_tpu.engine.serving import ContinuousBatcher
from lia_tpu.models.registry import REGISTRY, get_config

__version__ = "0.1.0"

__all__ = [
    "GenerationConfig",
    "GenerationResult",
    "InferenceEngine",
    "ModelConfig",
    "Placement",
    "QuantConfig",
    "REGISTRY",
    "RuntimeConfig",
    "get_config",
    "load_engine",
    "modules",
    "ContinuousBatcher",
    "pack_prompts",
]
