"""shard_map wrappers: run Pallas kernels per-shard under a TP/DP mesh.

The reference runs its AMX kernels on every TP rank — tensor parallelism
shards the weights and each rank calls the same tpp/woq/flash kernels on its
shard, with an allreduce after out-proj and fc2
(models/reference/modules/decoder.py:60-77, transformers/tensor_parallel.py:266-414).
The TPU-native analog: wrap each ``pallas_call`` in ``jax.shard_map`` over the
engine's mesh so every chip runs the kernel on its own head/feature shard.
Head-major K/V ([.., N_kv, S, D]) makes this legal by construction — sharding
the head axis leaves each head's [S, D] plane intact, so per-shard blocks
satisfy the same Mosaic tiling rules as the single-chip call.

Dispatch contract (used by :mod:`lia_tpu.ops.attention` / ``quant``):
- :func:`axis_sizes` reports (tp, dp) for the registered mesh;
- entry points check per-shard viability (heads divisible by tp, batch by dp,
  kernel tiling rules on the PER-SHARD shapes) and fall back to the jnp path
  (which GSPMD partitions) when the wrap is not legal;
- :func:`shard_call` traces the kernel inside :func:`dispatch.tp_inner`, so
  nested dispatch inside the shard sees single-device shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from jax.sharding import PartitionSpec as P

from lia_tpu.ops import dispatch

MODEL = "model"
DATA = "data"


def axis_sizes(mesh) -> tuple[int, int]:
    """(tp, dp) axis sizes of a mesh; absent axes count as 1."""
    shape = dict(mesh.shape)
    return shape.get(MODEL, 1), shape.get(DATA, 1)


def batch_axis(mesh, b: int) -> str | None:
    """The mesh axis to shard a batch dim of size ``b`` over, or None.

    Replicating the batch (None) is always legal; sharding needs dp | b."""
    tp, dp = axis_sizes(mesh)
    return DATA if dp > 1 and b % dp == 0 else None


def shard_call(
    fn,
    mesh,
    in_specs: Sequence[Any],
    out_specs: Any,
    *args,
):
    """``jax.shard_map(fn)(*args)`` with nested dispatch forced single-device.

    ``check_vma=False``: pallas_call outputs carry no varying-manual-axes
    info, and the wrappers state their out_specs explicitly.
    """
    with dispatch.tp_inner():
        return jax.shard_map(
            fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
            check_vma=False,
        )(*args)


def qspec(d: str | None) -> P:
    """Query/output activations [B, S|1, N, D]: heads on model."""
    return P(d, None, MODEL, None)


def kvspec(d: str | None) -> P:
    """Head-major K/V plane [B, N_kv, S, D]: heads on model."""
    return P(d, MODEL, None, None)


def kv_stacked_spec(d: str | None) -> P:
    """Stacked cache [L, B, N_kv, S, D]: heads on model, batch on data."""
    return P(None, d, MODEL, None, None)


def scale_stacked_spec(d: str | None) -> P:
    """Stacked int8-KV scale planes [L, B, N_kv, S]."""
    return P(None, d, MODEL, None)


def maskspec(d: str | None) -> P:
    """[B, S] masks: batch on data."""
    return P(d, None)


def lenspec(length, d: str | None) -> P:
    """Cache length: scalar (aligned) replicates, [B] (ragged) rides data."""
    return P(d) if getattr(length, "ndim", 0) == 1 else P()
