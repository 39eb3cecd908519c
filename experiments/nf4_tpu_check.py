#!/usr/bin/env python
"""NF4 select-tree kernel: TPU compile-check + true per-call cost vs int4/int8.

Harness rules (bench_model_kernels.py): STEPS-step single-dispatch scan with
the output fed back into the next iteration's activations, so device time
dominates the ~ms tunnel dispatch floor. Shapes: OPT-6.7B fc2 decode (M=16,
K=4096, N=4096). Records the RESULTS.md WOQ ladder row for --weight-dtype nf4
(reference: WoqTppKrnl.cpp NF4 LUT dequant; run.py:114-166).
"""
import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from lia_tpu.config import QuantConfig
from lia_tpu.ops.quant import quantize_weight, dequantize
from lia_tpu.ops.pallas_matmul import woq_matmul

STEPS = 100
rng = np.random.default_rng(0)
M, K, N = 16, 4096, 4096
x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
w = rng.standard_normal((K, N)).astype(np.float32) * 0.1

for wd, gs in [("int8", -1), ("int4", 128), ("nf4", -1), ("nf4", 128)]:
    rec = jax.tree.map(
        jnp.asarray, quantize_weight(w, QuantConfig(weight_dtype=wd, group_size=gs))
    )
    int4 = wd != "int8"
    call = functools.partial(
        woq_matmul, group_size=gs, int4=int4, nf4=(wd == "nf4"),
        block_m=16, block_n=512, block_k=1024, interpret=False,
    )
    # correctness first
    out = np.asarray(jax.jit(call)(x0, rec.q, rec.s))
    ref = np.asarray(x0, np.float32) @ np.asarray(dequantize(rec, jnp.float32))
    err = np.abs(out - ref).max() / np.abs(ref).max()

    @jax.jit
    def loop(x, q, s):
        def body(carry, _):
            y = call(carry, q, s)
            return jnp.tanh(y[:, :K]).astype(jnp.bfloat16), ()
        final, _ = jax.lax.scan(body, x, None, length=STEPS)
        return final

    np.asarray(loop(x0, rec.q, rec.s))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x0, rec.q, rec.s))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    gbs = rec.q.nbytes / best / 1e9
    print(f"{wd:5s} gs={gs:4d}: rel_err={err:.4f} {best*1e6:8.1f} us  {gbs:6.1f} GB/s",
          flush=True)
