"""Device-mesh construction.

TPU-native replacement of the reference's process-per-rank oneCCL world
(csrc/cpu/comm/messager.h:8-140, deepspeed launcher): a single-controller
``jax.sharding.Mesh`` over ("data", "model") axes. Collectives are emitted by XLA
from sharding annotations — there is no hand-written transport layer to port.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Tuple[int, ...] = (1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def single_device_mesh() -> Mesh:
    return make_mesh((1, 1))
