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

    Pallas kernels are per-chip programs: under GSPMD-sharded operands an
    unwrapped ``pallas_call`` would force all-gathers (silently defeating TP).
    The shard-aware dispatch (:func:`set_tp_mesh` + the ``shard_map`` wrappers
    in :mod:`lia_tpu.ops.attention` / :mod:`lia_tpu.ops.quant`) runs each
    kernel per shard with per-shard shapes instead — the analog of the
    reference running its AMX kernels on every TP rank
    (models/reference/modules/decoder.py:60-77). When no mesh is registered
    (``tp_pallas`` kill-switch off), an active TP flag conservatively forces
    the jnp paths, which GSPMD partitions correctly. Process-level and sticky
    by design (conservative for mixed-engine processes).
    """
    global _TP_ACTIVE
    _TP_ACTIVE = v or _TP_ACTIVE


_TP_MESH = None  # jax.sharding.Mesh registered for shard-aware kernel dispatch


def set_tp_mesh(mesh) -> None:
    """Register the TP mesh for shard-aware Pallas dispatch (None clears it).

    With a mesh registered, the dispatched entry points wrap their kernels in
    ``jax.shard_map`` over it (heads/features on "model", batch on "data"),
    so ``use_pallas()`` stays true under TP. Process-global — set by the
    engine at init; tests use :func:`tp_mesh_ctx` for scoped overrides.
    """
    global _TP_MESH
    _TP_MESH = mesh


@contextlib.contextmanager
def tp_mesh_ctx(mesh):
    """Scoped (thread-local) TP-mesh override for tests / multi-engine runs."""
    prev = getattr(_tls, "tp_mesh", _UNSET)
    _tls.tp_mesh = mesh
    try:
        yield
    finally:
        if prev is _UNSET:
            del _tls.tp_mesh
        else:
            _tls.tp_mesh = prev


_UNSET = object()


@contextlib.contextmanager
def tp_inner():
    """Mark code traced INSIDE a shard_map shard: ``tp_mesh()`` reports None
    there, so per-shard kernel calls dispatch as single-device programs."""
    prev = getattr(_tls, "tp_inner", False)
    _tls.tp_inner = True
    try:
        yield
    finally:
        _tls.tp_inner = prev


def tp_mesh():
    """The mesh to shard-map kernels over, or None (single-device dispatch).

    Any registered multi-device mesh is returned (a >1 "data" axis also needs
    the wrap when operand batches are sharded over it, not just "model")."""
    if getattr(_tls, "tp_inner", False):
        return None
    m = getattr(_tls, "tp_mesh", _UNSET)
    if m is _UNSET:
        m = _TP_MESH
    if m is None:
        return None
    # the shard_map wrappers hardcode the "model" axis name; a pure-dp mesh
    # (model==1) keeps the unwrapped single-device dispatch
    return m if dict(m.shape).get("model", 1) > 1 else None


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
    if _TP_ACTIVE and tp_mesh() is None and not getattr(_tls, "tp_inner", False):
        # TP in use but shard-aware dispatch unavailable (tp_pallas off):
        # an unpartitioned pallas_call would defeat TP — jnp paths only.
        return False
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
