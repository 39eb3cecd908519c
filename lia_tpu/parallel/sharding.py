"""Tensor-parallel sharding rules for parameters and KV cache.

Mirror of the reference's two TP flavors — DeepSpeed AutoTP's row/col split with an
allreduce after out-proj and fc2 (models/reference/modules/decoder.py:233-247) and
IPEX-native head sharding (transformers/tensor_parallel.py:266-414:
``shard_mha_weights``/``shard_mlp_weights``/``shard_lm_head_weights``) — expressed the
TPU way: ``NamedSharding`` annotations on the parameter pytree. XLA GSPMD derives the
two per-layer ``psum`` points (post-attention out-proj, post-fc2) automatically from
the row-sharded wo/w2, so no explicit collective calls appear in model code.

Column-split (output dim on "model"): wq, wk, wv, w1, wg + their biases.
Row-split   (input dim on "model"):  wo, w2.
Vocab-split: embed_tokens, lm_head.
Replicated:  norms, positions, small biases after row-split matmuls.
KV cache:    heads on "model", batch on "data".
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lia_tpu.config import ModelConfig
from lia_tpu.ops.kv_cache import KVCache


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_pspecs(
    cfg: ModelConfig, params: Dict[str, Any], tp: int = 1, ep_axis: str | None = None
) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params``' structure (stacked [L, ...] layers).

    :class:`~lia_tpu.ops.quant.QuantizedWeight` leaves get a QuantizedWeight spec
    node (``q`` takes the weight's spec adapted to the packed shape, ``s`` a
    matching group spec), so TP serving composes with WOQ weights — the analog of
    the reference sharding quantized op-contexts (tensor_parallel.py:266-414 over
    WeightOnlyQuantizedLinear modules).

    ``ep_axis`` names a mesh axis to shard the MoE expert dimension over
    (expert parallelism — additive over the reference, whose Mixtral runs
    single-device, SURVEY §2.5); GSPMD turns the batched-expert einsums into
    per-shard partial FFNs combined by an all-reduce over the expert axis.
    """
    M = "model"

    def wspec(w: Any, base: P) -> Any:
        """Adapt a weight spec to a possibly-quantized leaf."""
        from lia_tpu.ops.quant import QuantizedWeight, is_quantized

        if not is_quantized(w):
            return base
        # q [..., K_packed, N] shards like the fp weight (int4 half-split packing
        # is per-group along K, so a whole-groups row split keeps packing local;
        # the sum over K rows is permutation-invariant so GSPMD's propagation
        # through the dequant concat stays correct).
        row_split = base[-2] == M  # wo/w2: K on "model"
        ng = w.s.shape[-2]
        if row_split and ng % max(tp, 1) != 0:
            # scale groups don't tile the TP axis (incl. per-channel ng=1):
            # replicate scales; GSPMD reshards through the dequant reshape
            s_spec = P(*([None] * len(base)))
        else:
            s_spec = base  # s [..., ng, N] splits the same axis (groups ride K)
        z_spec = None if w.z is None else s_spec
        return QuantizedWeight(base, s_spec, w.fmt, z_spec)

    def attn_spec(attn: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in attn.items():
            if k in ("wq", "wk", "wv"):
                out[k] = wspec(v, P(None, None, M))  # [L, H, out] — column split
            elif k == "wo":
                out[k] = wspec(v, P(None, M, None))  # [L, QD, H] — row split
            elif k in ("bq", "bk", "bv"):
                out[k] = P(None, M)
            else:  # bo — after the psum, replicated
                out[k] = P(None, None)
        return out

    def mlp_spec(mlp: Dict[str, Any]) -> Dict[str, Any]:
        moe = "router" in mlp
        out = {}
        for k, v in mlp.items():
            if k == "router":
                out[k] = P(None, None, None)  # [L, H, E] fp — replicated
            elif k in ("w1", "wg"):
                # MoE experts [L, E, H, F]: EP shards E on ep_axis, TP the F/H
                # matmul axes — the per-expert FFN keeps the dense col/row split
                out[k] = wspec(v, P(None, ep_axis, None, M) if moe else P(None, None, M))
            elif k == "w2":
                out[k] = wspec(v, P(None, ep_axis, M, None) if moe else P(None, M, None))
            elif k == "b1":
                out[k] = P(None, M)
            else:  # b2
                out[k] = P(None, None)
        return out

    def norm_spec(n: Dict[str, Any]) -> Dict[str, Any]:
        return {k: P(None, None) for k in n}

    if "enc" in params and "dec" in params:  # t5 encoder-decoder tree
        # (the reference's deepspeed AutoTP runner covers t5 —
        # distributed/run_generation_with_deepspeed.py:50)
        def t5_stack(layers: Dict[str, Any]) -> Dict[str, Any]:
            s = {
                "ln1": norm_spec(layers["ln1"]),
                "attn": attn_spec(layers["attn"]),
                "ln2": norm_spec(layers["ln2"]),
                "mlp": mlp_spec(layers["mlp"]),
            }
            if "cross" in layers:
                s["cross"] = attn_spec(layers["cross"])
                s["ln3"] = norm_spec(layers["ln3"])
            return s

        def t5_side(side: Dict[str, Any]) -> Dict[str, Any]:
            return {
                "layers": t5_stack(side["layers"]),
                "final_norm": {k: P(None) for k in side["final_norm"]},
                # bias table [num_buckets, N] — heads ride the model axis like
                # the attention activations they add onto
                "rel_bias": P(None, M),
            }

        specs = {
            "embed_tokens": P(M, None),
            "enc": t5_side(params["enc"]),
            "dec": t5_side(params["dec"]),
        }
        if "lm_head" in params:
            specs["lm_head"] = wspec(params["lm_head"], P(None, M))
        return specs

    specs: Dict[str, Any] = {
        "embed_tokens": P(M, None),
        "layers": {
            "ln1": norm_spec(params["layers"]["ln1"]),
            "attn": attn_spec(params["layers"]["attn"]),
            "ln2": norm_spec(params["layers"]["ln2"]),
            "mlp": mlp_spec(params["layers"]["mlp"]),
        },
    }
    if "embed_positions" in params:
        specs["embed_positions"] = P(None, None)
    if "embed_norm" in params:
        specs["embed_norm"] = {k: P(None) for k in params["embed_norm"]}
    if "proj_in" in params:
        specs["proj_in"] = P(None, None)
        specs["proj_out"] = P(None, None)
    if "final_norm" in params:
        specs["final_norm"] = {k: P(None) for k in params["final_norm"]}
    if "lm_head" in params:
        specs["lm_head"] = wspec(params["lm_head"], P(None, M))  # vocab split
    # --- vision-language extras (git / llava; reference deepspeed runner
    # covers both — distributed/run_generation_with_deepspeed.py:50-66). The
    # vision tower and projector replicate (one-time prefix cost, tiny vs the
    # LM); the text decoder shards like any decoder-only tree above.
    if "embed_ln" in params:  # git
        specs["embed_ln"] = {k: P(None) for k in params["embed_ln"]}
    if "output" in params:  # git head: [H, V] vocab split + split bias
        specs["output"] = {"w": wspec(params["output"]["w"], P(None, M)), "b": P(M)}
    if "vision" in params:
        specs["vision"] = jax.tree.map(lambda _: P(), params["vision"])
    if "proj" in params:
        specs["proj"] = jax.tree.map(lambda _: P(), params["proj"])
    return specs


def param_shardings(
    cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh, ep_axis: str | None = None
):
    tp = dict(mesh.shape).get("model", 1)
    if ep_axis is None and cfg.num_experts and "expert" in mesh.shape:
        ep_axis = "expert"
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(cfg, params, tp=tp, ep_axis=ep_axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def cache_pspecs() -> KVCache:
    """KV cache: [L, B, N_kv, S, D] head-major — batch on data, heads on model."""
    return KVCache(
        k=P(None, "data", "model", None, None),
        v=P(None, "data", "model", None, None),
        length=P(),
        mask=P("data", None),
    )


def cache_shardings(mesh: Mesh) -> KVCache:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        cache_pspecs(),
        is_leaf=lambda x: isinstance(x, P),
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Token/mask arrays: [B, S] — batch on data."""
    return NamedSharding(mesh, P("data", None))


def shard_cache_tree(cache: Any, mesh: Mesh) -> Any:
    """Place a (possibly quantized/beam) KV-cache pytree onto the mesh by rank:
    5-D [L, B, N_kv, S, D] planes shard heads on "model" (+ batch on "data"
    when the mesh has one), 4-D quantized scale planes likewise, 2-D masks
    batch-shard, scalars/lengths replicate. Works for the engine's TP serving
    caches and the scheduler's segment caches alike."""
    d = "data" if "data" in mesh.shape else None

    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd == 5:  # [L, B, N_kv, S, D]
            p = P(None, d, "model", None, None)
        elif nd == 4:  # quantized scales [L, B, N_kv, S]
            p = P(None, d, "model", None)
        elif nd == 2:  # [B, S] masks
            p = P(d, None)
        else:
            p = P()
        return NamedSharding(mesh, p)

    return jax.tree.map(lambda a: jax.device_put(a, spec(a)), cache)


def shard_params(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh):
    """Place a host parameter tree onto the mesh with TP/DP shardings."""
    shardings = param_shardings(cfg, params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
