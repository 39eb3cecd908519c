"""Device capability registry + multi-host mesh helper tests (CPU backend)."""

import jax
import pytest

from lia_tpu.parallel.multihost import hybrid_mesh
from lia_tpu.utils.device_caps import REGISTRY, detect, system_profile_defaults


def test_registry_generations():
    assert {"v4", "v5e", "v5p", "v6e"} <= set(REGISTRY)
    assert REGISTRY["v5e"].hbm_bytes == 16e9


def test_detect_on_cpu_returns_none():
    assert detect() is None  # tests run on the CPU backend


def test_profile_defaults_fallback():
    p = system_profile_defaults()
    assert p.tpu_flops > 0 and p.hbm_bw > 0


def test_hybrid_mesh_single_process():
    mesh = hybrid_mesh((2, 4))
    assert mesh.shape == {"data": 2, "model": 4}
