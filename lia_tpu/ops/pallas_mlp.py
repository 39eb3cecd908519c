"""Fused decoder-MLP Pallas kernel: LN2 + up-projection + activation + down-
projection + residual in ONE kernel launch.

Motivation (measured, round 2): every XLA op inside a compiled loop costs
~15µs of launch overhead on this rig, so the decode step is launch-bound at
small batch — the MLP's ln/matmul/act/matmul/add chain is ~5 launches/layer.
This kernel replaces them with one pallas_call whose grid streams the two
weight matrices tile-by-tile at full HBM bandwidth (fp32 accumulation in VMEM
scratch across the FFN grid axis).

Reference analog: the TPP GEMM fused epilogues (csrc/cpu/aten/TPPGEMM.cpp
fused bias/relu/gelu + add; kernels/TPPGEMMKrnl.cpp) — where IPEX fuses the
epilogue into one AMX call, the TPU version fuses the whole MLP block.

Supports OPT (relu/gelu, LayerNorm, biases) and Llama (SwiGLU, RMSNorm, no
biases). bf16 weights only — quantized layers use the WOQ matmul path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _mlp_kernel(
    x_ref,  # [B, H] layer input (pre-LN2 residual)
    lnw_ref,  # [1, H] norm scale
    lnb_ref,  # [1, H] norm bias (zeros for rmsnorm)
    w1_ref,  # [H, bf] up-projection tile
    b1_ref,  # [1, bf] up bias (zeros if none)
    wg_ref,  # [H, bf] gate tile (zeros if not swiglu)
    w2_ref,  # [bf, H] down-projection tile
    b2_ref,  # [1, H] down bias
    o_ref,  # [B, H]
    h_s,  # VMEM scratch [B, H] — the normalized input (computed once)
    acc_s,  # VMEM scratch [B, H] f32 — accumulated down-projection
    *,
    n_f: int,
    activation: str,
    rms: bool,
    eps: float,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        if rms:
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            xn = x * jax.lax.rsqrt(var + eps)
        else:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            xc = x - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            xn = xc * jax.lax.rsqrt(var + eps)
        xn = xn * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
        h_s[:] = xn.astype(h_s.dtype)
        acc_s[:] = jnp.zeros_like(acc_s)

    xn = h_s[:]
    up = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[0].astype(jnp.float32)
    if activation == "silu":  # SwiGLU: silu(gate) * up
        gate = jax.lax.dot_general(
            xn, wg_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        act = jax.nn.silu(gate) * up
    elif activation == "gelu":
        act = jax.nn.gelu(up, approximate=False)
    elif activation == "gelu_new":
        act = jax.nn.gelu(up, approximate=True)
    else:
        act = jax.nn.relu(up)
    acc_s[:] += jax.lax.dot_general(
        act.astype(xn.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_f - 1)
    def _():
        out = acc_s[:] + b2_ref[0].astype(jnp.float32)
        o_ref[:] = (x_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "rms", "eps", "block_f", "interpret"),
)
def fused_mlp(
    x: jnp.ndarray,  # [B, H] — the residual input (norm applied in-kernel)
    ln_scale: jnp.ndarray,  # [H]
    ln_bias: jnp.ndarray | None,  # [H] or None
    w1: jnp.ndarray,  # [H, F]
    b1: jnp.ndarray | None,
    wg: jnp.ndarray | None,  # [H, F] (SwiGLU gate) or None
    w2: jnp.ndarray,  # [F, H]
    b2: jnp.ndarray | None,
    activation: str = "relu",
    rms: bool = False,
    eps: float = 1e-5,
    block_f: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """residual + mlp(norm(residual)) in one kernel. Returns [B, H]."""
    B, H = x.shape
    F = w1.shape[1]
    interpret = _interpret_default() if interpret is None else interpret
    bf = min(block_f, F)
    assert F % bf == 0
    n_f = F // bf

    zeros_h = jnp.zeros((1, H), x.dtype)
    zeros_f = jnp.zeros((1, bf), x.dtype)  # broadcast block; index map pins (0, j)
    b1_a = b1.reshape(1, F).astype(x.dtype) if b1 is not None else None
    swiglu = wg is not None
    wg_a = wg if swiglu else jnp.zeros((H, bf), x.dtype)

    in_specs = [
        pl.BlockSpec((B, H), lambda j: (0, 0)),
        pl.BlockSpec((1, H), lambda j: (0, 0)),
        pl.BlockSpec((1, H), lambda j: (0, 0)),
        pl.BlockSpec((H, bf), lambda j: (0, j)),
        pl.BlockSpec((1, bf), (lambda j: (0, j)) if b1 is not None else (lambda j: (0, 0))),
        pl.BlockSpec((H, bf), (lambda j: (0, j)) if swiglu else (lambda j: (0, 0))),
        pl.BlockSpec((bf, H), lambda j: (j, 0)),
        pl.BlockSpec((1, H), lambda j: (0, 0)),
    ]
    return pl.pallas_call(
        functools.partial(
            _mlp_kernel, n_f=n_f, activation=activation, rms=rms, eps=eps
        ),
        grid=(n_f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, H), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), x.dtype),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, H).astype(x.dtype),
        (ln_bias.reshape(1, H).astype(x.dtype) if ln_bias is not None else zeros_h),
        w1.astype(x.dtype),
        (b1_a if b1 is not None else zeros_f),
        wg_a.astype(x.dtype),
        w2.astype(x.dtype),
        (b2.reshape(1, H).astype(x.dtype) if b2 is not None else zeros_h),
    )
