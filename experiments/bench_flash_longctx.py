#!/usr/bin/env python
"""Long-context flash-prefill MFU (VERDICT r4 item 3: beat 18.8% at s8192).

Times the flash kernel scan-amortized (NITER back-to-back calls inside one
jit; single-dispatch probes drown in the ~5 ms relay floor), syncs via D2H
readback, reports causal MFU = 0.5 * 4 * B*N*S^2*D FLOPs / time against the
v5e's 197 bf16 TFLOP/s, plus max-err vs the jnp golden path.

    timeout 900 python experiments/bench_flash_longctx.py
"""

import json
import os
import sys
import time
from functools import partial

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lia_tpu.ops import attention as att
from lia_tpu.ops.pallas_attention import flash_attention_prefill

PEAK = 197e12
NITER = int(os.environ.get("NITER", "8"))


def sync(x):
    np.asarray(jax.device_get(x[..., :1, :8]))


def main():
    N, D = int(os.environ.get("HEADS", "32")), 128
    rows = []
    for B, S in ((16, 512), (4, 2048), (4, 4096), (2, 8192)):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, S, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, N, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, N, S, D)), jnp.bfloat16)
        mask = np.ones((B, S), bool)
        mask[0, : S // 8] = False
        maskd = jnp.asarray(mask)

        bq = min(256, S)
        bk = min(int(os.environ.get("BK", "512")), S)

        @jax.jit
        def many(q, k, v, m):
            def body(c, _):
                o = flash_attention_prefill(
                    q + c.astype(q.dtype) * 0, k, v, m,
                    block_q=bq, block_k=bk, interpret=False,
                )
                return o[0, 0, 0, 0].astype(jnp.float32), o

            c, os_ = jax.lax.scan(body, jnp.float32(0), None, length=NITER)
            return os_[-1]

        out = many(q, k, v, maskd)
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        out = many(q, k, v, maskd)
        sync(out)
        dt = (time.perf_counter() - t0) / NITER

        flops = 0.5 * 4 * B * N * S * S * D
        mfu = flops / dt / PEAK
        # parity vs golden (single call; the jnp scores tensor is O(B*N*S^2)
        # fp32 — at s4096+ it exceeds HBM, so check a 1-sequence slice there)
        if S <= 4096:
            nb = B if S <= 2048 else 1
            ctx = att.prefill_attn_ctx(maskd[:nb])
            gold = att.attend(q[:nb], k[:nb], v[:nb], ctx.mask)
            one = flash_attention_prefill(q[:nb], k[:nb], v[:nb], maskd[:nb],
                                          block_q=bq, block_k=bk, interpret=False)
            d = jnp.abs(one.astype(jnp.float32) - gold.astype(jnp.float32))
            # pad rows are fully masked — garbage by contract; compare real rows
            err = float(jnp.max(d * maskd[:nb][:, :, None, None]))
        else:
            err = -1.0  # golden scores tensor exceeds HBM; parity pinned at <=4096
        row = {"B": B, "S": S, "bk": bk, "ms": round(dt * 1e3, 2),
               "causal_TFLOPs": round(flops / dt / 1e12, 1),
               "causal_MFU_pct": round(100 * mfu, 1), "max_err": err}
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
