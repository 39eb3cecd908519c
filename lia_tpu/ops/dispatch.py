"""Kernel dispatch: Pallas fast path vs pure-XLA fallback.

The reference picks kernels via ISA dynamic dispatch
(csrc/cpu/dyndisp/DispatchStub.cpp + cpu_feature.cpp AMX detection); on TPU there is
one ISA per chip, so dispatch reduces to: use the Pallas kernel when (a) we are on a
TPU backend (or tests force interpret mode) and (b) the shapes satisfy the kernel's
tiling constraints — otherwise fall back to the jnp golden path. The
``--no-pallas`` CLI flag (RuntimeConfig.use_pallas=False) is the kill-switch.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax

_FORCE: Optional[bool] = None  # None = auto (pallas on TPU, jnp elsewhere)
_INTERPRET: Optional[bool] = None  # None = auto (interpret off TPU)
_TP_ACTIVE: bool = False  # process-level: a >1-way "model" mesh axis exists
_tls = threading.local()  # per-trace override (host-execution tracing)


def set_use_pallas(v: Optional[bool]) -> None:
    global _FORCE
    _FORCE = v


def set_tp_active(v: bool) -> None:
    """Flag that a tensor-parallel mesh (model axis > 1) is in use.

    Pallas kernels here are written for per-chip shapes; under GSPMD-sharded
    operands a ``pallas_call`` is not partitioned — XLA would all-gather the
    sharded operands around it (silently defeating TP) or fail to lower. Until
    the kernels are wrapped in ``shard_map`` with per-shard shapes AND validated
    on real multi-chip hardware (this rig has one chip), an active TP mesh
    forces the jnp paths, which GSPMD partitions correctly. Set by
    :class:`lia_tpu.engine.engine.InferenceEngine` when its mesh has a >1
    "model" axis; process-level and sticky by design (conservative for
    mixed-engine processes).
    """
    global _TP_ACTIVE
    _TP_ACTIVE = v or _TP_ACTIVE


@contextlib.contextmanager
def pallas_disabled():
    """Disable Pallas for code traced inside this context.

    The hybrid scheduler traces host-side (XLA:CPU) functions through the same
    model code; jit caches the host trace per input placement, so disabling
    Pallas at first-trace time is sufficient and thread-safe.
    """
    prev = getattr(_tls, "force_off", False)
    _tls.force_off = True
    try:
        yield
    finally:
        _tls.force_off = prev


def set_interpret(v: Optional[bool]) -> None:
    """Force Pallas interpreter mode (tests exercise kernels on CPU this way)."""
    global _INTERPRET
    _INTERPRET = v


def use_pallas() -> bool:
    if getattr(_tls, "force_off", False):
        return False
    if _TP_ACTIVE:
        return False  # see set_tp_active: unpartitioned pallas_call defeats TP
    if _FORCE is not None:
        return _FORCE
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"


_STACKED_KERNEL: Optional[bool] = None  # None = auto (off: see note below)


def set_stacked_kernel(v: Optional[bool]) -> None:
    global _STACKED_KERNEL
    _STACKED_KERNEL = v


def stacked_kernel_enabled() -> bool:
    """Scalar-prefetch stacked-cache decode kernel gate.

    Default ON: reads each layer's K/V plane straight out of the stacked cache
    (no per-layer plane copy). Round-1's Mosaic helper rejected
    PrefetchScalarGridSpec; the current toolchain compiles it for both OPT
    (G=1, D=64) and Llama (G=4, D=128) shape families (re-validated 2026-08-17).
    ``set_stacked_kernel(False)`` is the kill-switch.
    """
    if _STACKED_KERNEL is not None:
        return _STACKED_KERNEL
    return True


_STACKED_W4A8: Optional[bool] = None


def set_stacked_w4a8(v: Optional[bool]) -> None:
    global _STACKED_W4A8
    _STACKED_W4A8 = v


def stacked_w4a8_enabled() -> bool:
    """Scalar-prefetch stacked-weight W4A8 gate (fused decode scan pulls
    int4-dyn weights out of the scan xs; kernel reads blocks straight from
    the stacked buffer — no per-layer slice copy).

    Default OFF: measured r4 on the v5e, OPT-6.7B b16 fused decode, the
    stacked route LOSES at model level (747.6 vs 931.9 tok/s) even though it
    WINS isolated per-call A/Bs (306 vs 353 µs at the qkv shape). XLA's scan
    lowering overlaps the next layer's xs copy with the current layer's
    compute, so the 'hidden copy' is pipelined — while the pallas kernel's
    own block DMA competes with its compute windows (same mechanism as the
    fused-MLP verdict below). Kept as infrastructure + kill-switch for
    future toolchains; `set_stacked_w4a8(True)` enables.
    """
    if _STACKED_W4A8 is not None:
        return _STACKED_W4A8
    return False


_FUSED_MLP: Optional[bool] = None


def set_fused_mlp(v: Optional[bool]) -> None:
    global _FUSED_MLP
    _FUSED_MLP = v


def fused_mlp_enabled() -> bool:
    """Fused-MLP megakernel gate. Default OFF: measured on the v5e (round 2,
    OPT-1.3B b8) the single-launch kernel LOSES to XLA's unfused chain
    (1060 vs 1160 tok/s) — pallas weight streaming at M=8 runs ~2-3× below
    XLA's matmul pipeline, outweighing the ~75µs/layer of launch savings.
    Kept for larger-batch / future-toolchain experiments."""
    if _FUSED_MLP is not None:
        return _FUSED_MLP
    return False


def gqa_kernel_ok(num_heads: int, num_kv_heads: int, head_dim: int) -> bool:
    """GQA-grouped attention kernels reshape [*, G*D] ↔ [*·G, D] in-register;
    Mosaic only supports that relayout when the lane dim stays 128-aligned.
    MHA (G == 1) reshapes are no-ops, so any D works. Small-D GQA configs
    (tiny test models) take the jnp path instead."""
    return num_heads == num_kv_heads or head_dim % 128 == 0


def pick_block(n: int, target: int, minimum: int = 8) -> Optional[int]:
    """Largest divisor of ``n`` that is ≤ target and a multiple of ``minimum``."""
    b = min(target, n)
    while b >= minimum:
        if n % b == 0 and b % minimum == 0:
            return b
        b -= minimum
    return None
