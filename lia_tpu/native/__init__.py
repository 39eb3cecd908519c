"""ctypes bindings for the liahost native library (native/liahost.cpp).

Native host-side runtime pieces (the reference keeps these in C/C++ too:
lia/cxl/numa_alloc.c, csrc/cpu WOQ packing): multithreaded dummy-weight synthesis,
f32→bf16 casting, group-wise INT8/INT4 quantization, wide memcpy. Every entry point
has a numpy fallback so the framework works without the compiled library; build it
with ``make -C native`` for load-time speedups at 30B+ scale.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libliahost.so")
    if not os.path.exists(path) and os.environ.get("LIA_NATIVE_AUTOBUILD") == "1":
        # the .so is untracked build output — a fresh checkout loses it, and
        # 7B+ dummy-weight synthesis without it crawls on one numpy core
        # (observed: bench.py stalled ~20 min in synthesis). The CLI entry
        # points (run.py / bench.py / serve.py) opt in by setting
        # LIA_NATIVE_AUTOBUILD=1 before first use; plain library imports never
        # spawn a compiler or write build artifacts (read-only checkouts,
        # sandboxes, concurrent pytest workers). Fall back to numpy silently
        # if the toolchain is absent.
        import subprocess
        import sys

        src = os.path.normpath(
            os.path.join(os.path.dirname(__file__), "..", "..", "native")
        )
        if os.path.exists(os.path.join(src, "Makefile")):
            print("[lia-tpu] building native/libliahost.so (make -C native)…",
                  file=sys.stderr)
            subprocess.run(["make", "-C", src], capture_output=True, check=False)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        i64, f32 = ctypes.c_int64, ctypes.c_float
        p = ctypes.POINTER
        lib.cast_f32_to_bf16.argtypes = [p(f32), p(ctypes.c_uint16), i64]
        lib.randn_bf16.argtypes = [p(ctypes.c_uint16), i64, ctypes.c_uint64, f32]
        lib.randn_int8.argtypes = [p(ctypes.c_int8), p(f32), i64, i64, i64, ctypes.c_uint64, f32]
        lib.randn_int4.argtypes = [p(ctypes.c_uint8), p(f32), i64, i64, i64, ctypes.c_uint64, f32]
        lib.quantize_int8.argtypes = [p(f32), p(ctypes.c_int8), p(f32), i64, i64, i64]
        lib.quantize_int4.argtypes = [p(f32), p(ctypes.c_uint8), p(f32), i64, i64, i64]
        lib.memcpy_mt.argtypes = [ctypes.c_void_p, ctypes.c_void_p, i64]
        lib.liahost_version.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def memcpy(dst: np.ndarray, src: np.ndarray) -> bool:
    """Multithreaded wide copy into a preallocated buffer (liahost memcpy_mt).

    Both arrays must be contiguous and byte-size-equal. Returns False (no-op)
    when the native lib is unavailable — callers fall back to numpy assignment.
    """
    lib = _load()
    if lib is None:
        return False
    assert dst.nbytes == src.nbytes
    assert dst.flags["C_CONTIGUOUS"] and src.flags["C_CONTIGUOUS"]
    lib.memcpy_mt(
        dst.ctypes.data_as(ctypes.c_void_p),
        src.ctypes.data_as(ctypes.c_void_p),
        np.int64(dst.nbytes),
    )
    return True


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def randn_bf16(shape, seed: int, scale: float) -> np.ndarray:
    """Fast normal(0, scale) array in bf16 (native) or numpy fallback."""
    import ml_dtypes

    n = int(np.prod(shape))
    lib = _load()
    if lib is not None:
        out = np.empty(n, np.uint16)
        lib.randn_bf16(_ptr(out, ctypes.c_uint16), n, seed & (2**64 - 1), scale)
        return out.view(ml_dtypes.bfloat16).reshape(shape)
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n, dtype=np.float32) * scale).astype(ml_dtypes.bfloat16).reshape(shape)


def quantize_int8(w: np.ndarray, group: int) -> Tuple[np.ndarray, np.ndarray]:
    """Group-wise symmetric int8 quantization of [rows, cols] f32."""
    rows, cols = w.shape
    lib = _load()
    if lib is not None and w.dtype == np.float32 and w.flags.c_contiguous:
        q = np.empty((rows, cols), np.int8)
        s = np.empty((rows // group, cols), np.float32)
        lib.quantize_int8(_ptr(w, ctypes.c_float), _ptr(q, ctypes.c_int8),
                          _ptr(s, ctypes.c_float), rows, cols, group)
        return q, s
    wg = w.reshape(rows // group, group, cols).astype(np.float32)
    s = np.maximum(np.abs(wg).max(axis=1) / 127.0, 1e-8)
    q = np.rint(wg / s[:, None, :]).clip(-128, 127).astype(np.int8).reshape(rows, cols)
    return q, s


def quantize_int4(w: np.ndarray, group: int) -> Tuple[np.ndarray, np.ndarray]:
    """Group-wise symmetric int4 (packed nibbles) of [rows, cols] f32."""
    rows, cols = w.shape
    lib = _load()
    if lib is not None and w.dtype == np.float32 and w.flags.c_contiguous:
        packed = np.empty((rows // 2, cols), np.uint8)
        s = np.empty((rows // group, cols), np.float32)
        lib.quantize_int4(_ptr(w, ctypes.c_float), _ptr(packed, ctypes.c_uint8),
                          _ptr(s, ctypes.c_float), rows, cols, group)
        return packed, s
    wg = w.reshape(rows // group, group, cols).astype(np.float32)
    s = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-8)
    q = np.rint(wg / s[:, None, :]).clip(-8, 7).astype(np.int8)
    b = (q + 8).astype(np.uint8)  # [ng, g, cols]
    gh = group // 2
    packed = ((b[:, :gh] & 0xF) | (b[:, gh:] << 4)).reshape(rows // 2, cols)
    return packed, s


def randn_int8(rows: int, cols: int, group: int, seed: int, scale: float):
    """Synthesize normal(0, scale) weights directly in group-quantized int8 form
    (no fp transient) — the dummy-weight fast path for 30B/175B configs.
    Returns (q int8 [rows, cols], scales f32 [rows//group, cols])."""
    lib = _load()
    if lib is not None:
        q = np.empty((rows, cols), np.int8)
        s = np.empty((rows // group, cols), np.float32)
        lib.randn_int8(_ptr(q, ctypes.c_int8), _ptr(s, ctypes.c_float),
                       rows, cols, group, seed & (2**64 - 1), scale)
        return q, s
    rng = np.random.default_rng(seed)
    q = np.clip(np.rint(rng.standard_normal((rows, cols), dtype=np.float32) / 3.0 * 127.0),
                -127, 127).astype(np.int8)
    s = np.full((rows // group, cols), scale * 3.0 / 127.0, np.float32)
    return q, s


def randn_int4(rows: int, cols: int, group: int, seed: int, scale: float):
    """Synthesize dummy weights directly in nibble-packed int4 form.
    Returns (packed uint8 [rows//2, cols], scales f32 [rows//group, cols])."""
    lib = _load()
    if lib is not None:
        packed = np.empty((rows // 2, cols), np.uint8)
        s = np.empty((rows // group, cols), np.float32)
        lib.randn_int4(_ptr(packed, ctypes.c_uint8), _ptr(s, ctypes.c_float),
                       rows, cols, group, seed & (2**64 - 1), scale)
        return packed, s
    rng = np.random.default_rng(seed)
    q = rng.integers(1, 16, (rows, cols)).astype(np.uint8)
    packed = (q[0::2] & 0xF) | (q[1::2] << 4)
    s = np.full((rows // group, cols), scale / 4.3205, np.float32)
    return packed, s
