"""TPU compile-check: Pallas kernels at PER-SHARD shapes (r5 verdict item 1).

Under shard_map each chip runs the kernel on its head/feature shard — on this
one-chip rig the multi-chip story is validated as: (a) interpret-mode parity
on the 8-device CPU mesh (tests/test_tp_kernels.py), (b) THIS script — real
Mosaic lowering + numeric check of every kernel at the per-shard shape
instances the wrap produces (interpret mode does not check block legality).

Shapes: OPT-6.7B at tp=4 (N=32/4=8 heads, D=128) and Llama-2-70B-style GQA at
tp=8 (N=64/8=8, Nkv=8/8=1, G=8), plus the WOQ matmuls at col (N/tp) and row
(locally-packed K/tp) per-shard shapes.

Run: timeout 560 python experiments/tpu_check_tp_shard.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def main():
    from lia_tpu.ops import attention as att
    from lia_tpu.ops import dispatch
    from lia_tpu.ops import quant as Q
    from lia_tpu.config import QuantConfig

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    results = {}

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

    # --- decode fresh/stacked at OPT-6.7B tp=4 and llama-70B tp=8 shards ----
    for tag, (B, N, Nkv, D, S, L) in {
        "opt6.7b-tp4": (16, 8, 8, 128, 512, 4),
        "llama70b-tp8": (8, 8, 1, 128, 512, 4),
    }.items():
        q = mk(B, 1, N, D)
        kf, vf = mk(B, Nkv, 1, D), mk(B, Nkv, 1, D)
        kc, vc = mk(L, B, Nkv, S, D), mk(L, B, Nkv, S, D)
        length = jnp.asarray(S - 100, jnp.int32)
        slot_mask = jnp.zeros((B, S), bool).at[:, : S - 100].set(True)
        ctx = att.decode_attn_ctx(slot_mask, length)
        li = jnp.asarray(1, jnp.int32)
        dispatch.set_use_pallas(True)
        out = att.attend_decode_fresh(q, kf, vf, kc, vc, li, ctx)
        dispatch.set_use_pallas(False)
        ref = att.attend_decode_fresh(q, kf, vf, kc, vc, li, ctx)
        dispatch.set_use_pallas(None)
        results[f"fresh/{tag}"] = err(out, ref)

        # int8-KV fresh
        kq, vq = Q.quantize_kv(kc.astype(jnp.float32)), Q.quantize_kv(vc.astype(jnp.float32))
        dispatch.set_use_pallas(True)
        out = att.attend_decode_fresh(q, kf, vf, kq, vq, li, ctx)
        dispatch.set_use_pallas(False)
        ref = att.attend_decode_fresh(q, kf, vf, kq, vq, li, ctx)
        dispatch.set_use_pallas(None)
        results[f"fresh-int8/{tag}"] = err(out, ref)

        # prefill flash at the per-shard head count
        Sp = 512
        qp, kp, vp = mk(B, Sp, N, D), mk(B, Nkv, Sp, D), mk(B, Nkv, Sp, D)
        mask = np.ones((B, Sp), bool)
        mask[1, :17] = False
        pctx = att.prefill_attn_ctx(jnp.asarray(mask))
        dispatch.set_use_pallas(True)
        out = att.attend_prefill(qp, kp, vp, pctx)
        dispatch.set_use_pallas(False)
        ref = att.attend_prefill(qp, kp, vp, pctx)
        dispatch.set_use_pallas(None)
        results[f"prefill/{tag}"] = err(out, ref)

    # --- beam kernel at per-shard heads --------------------------------------
    B0, nb, N, D, S_p, T_max, L = 2, 4, 8, 128, 512, 128, 2
    B = B0 * nb
    from lia_tpu.ops import kv_cache as kvc

    cache = kvc.BeamKVCache(
        prompt_k=mk(L, B0, N, S_p, D), prompt_v=mk(L, B0, N, S_p, D),
        prompt_len=jnp.asarray(400, jnp.int32),
        prompt_mask=jnp.zeros((B0, S_p), bool).at[:, 8:400].set(True),
        tail_k=mk(L, B, N, T_max, D), tail_v=mk(L, B, N, T_max, D),
        tail_len=jnp.asarray(5, jnp.int32), nb=nb,
    )
    q = mk(B, 1, N, D)
    kf, vf = mk(B, N, 1, D), mk(B, N, 1, D)
    li = jnp.asarray(1, jnp.int32)
    dispatch.set_use_pallas(True)
    out = att.attend_decode_beam(q, kf, vf, cache, li)
    dispatch.set_use_pallas(False)
    ref = att.attend_decode_beam(q, kf, vf, cache, li)
    dispatch.set_use_pallas(None)
    results["beam/tp4-shard"] = err(out, ref)

    # --- WOQ matmuls at per-shard shapes ------------------------------------
    # col split: N/tp columns; row split: the locally-half-split K/tp record
    # the wrap builds (a contiguous byte shard IS a valid local packing).
    H = 4096
    xf = jnp.asarray(rng.standard_normal((16, H)), jnp.float32)
    for fmt_tag, (wd, act, gs) in {
        "int8dyn": ("int8", "dynamic", -1),
        "w4a8-g128": ("int4", "dynamic", 128),
        "int4": ("int4", "none", 128),
        "nf4": ("nf4", "none", 128),
    }.items():
        # col per-shard: [H, 12288/4]
        w = np.asarray(rng.standard_normal((H, 12288 // 4)), np.float32) * 0.02
        r = Q.quantize_weight(w, QuantConfig(weight_dtype=wd, act_quant=act, group_size=gs))
        rec = Q.QuantizedWeight(jnp.asarray(r.q), jnp.asarray(r.s), r.fmt,
                                None if r.z is None else jnp.asarray(r.z))
        dispatch.set_use_pallas(True)
        out = Q.quantized_matmul(xf, rec)
        dispatch.set_use_pallas(False)
        ref = Q.quantized_matmul(xf, rec)
        dispatch.set_use_pallas(None)
        denom = float(jnp.max(jnp.abs(ref))) + 1e-9
        results[f"woq-col/{fmt_tag}"] = err(out, ref) / denom

        # row per-shard: local K = H/4, locally packed (what f_row builds)
        Kl = H // 4
        xl = jnp.asarray(rng.standard_normal((16, Kl)), jnp.float32)
        wl = np.asarray(rng.standard_normal((Kl, H)), np.float32) * 0.02
        rl = Q.quantize_weight(wl, QuantConfig(weight_dtype=wd, act_quant=act, group_size=gs))
        recl = Q.QuantizedWeight(jnp.asarray(rl.q), jnp.asarray(rl.s), rl.fmt,
                                 None if rl.z is None else jnp.asarray(rl.z))
        dispatch.set_use_pallas(True)
        out = Q.quantized_matmul(xl, recl)
        dispatch.set_use_pallas(False)
        ref = Q.quantized_matmul(xl, recl)
        dispatch.set_use_pallas(None)
        denom = float(jnp.max(jnp.abs(ref))) + 1e-9
        results[f"woq-row/{fmt_tag}"] = err(out, ref) / denom

    bad = {k: v for k, v in results.items() if not np.isfinite(v) or v > 0.05}
    for k, v in sorted(results.items()):
        print(f"  {k:24s} maxerr {v:.3e}")
    if bad:
        raise SystemExit(f"FAIL: {bad}")
    print("TPU per-shard kernel compile-check: ALL OK")


if __name__ == "__main__":
    main()
