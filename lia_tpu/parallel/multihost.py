"""Multi-host (DCN) mesh construction.

Reference analog: the oneCCL/MPI multi-rank world (deepspeed launcher,
csrc/cpu/comm). TPU-native shape: ``jax.distributed.initialize`` per host, then a
hybrid mesh whose outer axis spans hosts over DCN and inner axes span the local
ICI slice. Sharding rules (parallel/sharding.py) are mesh-agnostic: put "data"
(batch) on the DCN axis — per-token collectives then ride ICI only, and only
batch-level traffic crosses hosts (the scaling-book recipe).

Single-host environments exercise this path via the 8-virtual-device CPU mesh
(tests) and ``__graft_entry__.dryrun_multichip``; a real multi-host run needs only
``initialize()`` + ``hybrid_mesh()`` at startup.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Start the JAX distributed runtime (no-op if already initialized or single
    process). On Cloud TPU the arguments auto-detect from the metadata server."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def hybrid_mesh(
    ici_shape: Tuple[int, ...],
    axis_names: Sequence[str] = ("data", "model"),
    dcn_axis: str = "data",
) -> Mesh:
    """(hosts × local-chips) mesh: ``dcn_axis`` spans hosts, the rest span ICI.

    ``ici_shape`` describes the per-host mesh (e.g. (1, 8) for 8-way TP on one
    host); the ``dcn_axis`` dimension is multiplied by the process count.
    """
    from jax.experimental import mesh_utils

    n_hosts = jax.process_count()
    if n_hosts == 1:
        devices = np.asarray(jax.devices()).reshape(ici_shape)
        return Mesh(devices, tuple(axis_names))
    idx = list(axis_names).index(dcn_axis)
    n_slices = len({getattr(d, "slice_index", 0) or 0 for d in jax.devices()})
    if n_slices == n_hosts:
        # real multi-slice TPU topology: let mesh_utils minimize DCN hops
        dcn_shape = [1] * len(ici_shape)
        dcn_shape[idx] = n_hosts
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=list(ici_shape), dcn_mesh_shape=dcn_shape
        )
        return Mesh(devices, tuple(axis_names))
    # no slice topology info (CPU emulation / single-slice): group by process so
    # the dcn axis crosses processes and every other axis stays host-local
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs, dtype=object).reshape((n_hosts,) + tuple(ici_shape))
    arr = np.moveaxis(arr, 0, idx)
    final = list(ici_shape)
    final[idx] *= n_hosts
    return Mesh(arr.reshape(final), tuple(axis_names))
