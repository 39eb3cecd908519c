"""Multi-device TP sharding tests on the 8-virtual-device CPU mesh.

Mirrors the reference's single-node multi-rank strategy (test_deepspeed.py /
test_ipex_tensor_parallel.py): assert the sharding rules are applied and the sharded
model is numerically identical to single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.config import ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.parallel import sharding as shd
from lia_tpu.parallel.mesh import make_mesh
from lia_tpu.utils.checkpoint import init_dummy_params

from functools import partial


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        name="tp-test",
        vocab_size=512,
        hidden_size=128,
        ffn_size=256,
        num_layers=2,
        num_heads=8,
        num_kv_heads=8,
        head_dim=16,
        max_position_embeddings=64,
        dtype="float32",
    )


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh((2, 4))
    assert mesh.shape == {"data": 2, "model": 4}


def test_param_shardings_cover_tree(cfg):
    params = init_dummy_params(cfg)
    mesh = make_mesh((1, 4))
    sh = shd.param_shardings(cfg, params, mesh)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
    assert len(flat_p) == len(flat_s)


def test_tp_matches_single_device(cfg):
    params_host = init_dummy_params(cfg, seed=5, scale=0.02)
    B, S, NEW = 2, 16, 4
    tokens = np.random.default_rng(0).integers(3, 500, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)

    # single device reference
    cache1 = kvc.init_cache(cfg, B, S + NEW, jnp.float32)
    p1 = jax.device_put(params_host)
    ref_logits, ref_cache = jax.jit(partial(T.prefill, cfg))(
        p1, jnp.asarray(tokens), jnp.asarray(mask), cache1
    )

    # (1, 4) TP mesh
    mesh = make_mesh((1, 4))
    params = shd.shard_params(cfg, params_host, mesh)
    cache = jax.device_put(kvc.init_cache(cfg, B, S + NEW, jnp.float32), shd.cache_shardings(mesh))
    ds = shd.data_sharding(mesh)
    logits, cache = jax.jit(partial(T.prefill, cfg))(
        params, jax.device_put(jnp.asarray(tokens), ds), jax.device_put(jnp.asarray(mask), ds), cache
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)

    # decode step parity
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B, 1), S, jnp.int32)
    d_logits, _ = jax.jit(partial(T.decode_step, cfg))(params, tok, pos, cache)
    r_logits, _ = jax.jit(partial(T.decode_step, cfg))(p1, tok, pos, ref_cache)
    np.testing.assert_allclose(np.asarray(d_logits), np.asarray(r_logits), rtol=2e-4, atol=2e-4)


def test_dp_tp_mesh(cfg):
    """(2 data, 2 model) mesh — batch and heads sharded together."""
    params_host = init_dummy_params(cfg, seed=5, scale=0.02)
    mesh = make_mesh((2, 2))
    params = shd.shard_params(cfg, params_host, mesh)
    B, S = 4, 16
    tokens = np.random.default_rng(1).integers(3, 500, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)
    cache = jax.device_put(kvc.init_cache(cfg, B, S + 2, jnp.float32), shd.cache_shardings(mesh))
    ds = shd.data_sharding(mesh)
    logits, cache = jax.jit(partial(T.prefill, cfg))(
        params, jax.device_put(jnp.asarray(tokens), ds), jax.device_put(jnp.asarray(mask), ds), cache
    )
    p1 = jax.device_put(params_host)
    cache1 = kvc.init_cache(cfg, B, S + 2, jnp.float32)
    ref_logits, _ = jax.jit(partial(T.prefill, cfg))(p1, jnp.asarray(tokens), jnp.asarray(mask), cache1)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)


def test_moe_ep_tp_matches_single_device():
    """Mixtral-style MoE on a (data=2, expert=2, model=2) mesh: experts sharded
    over the expert axis (EP — additive over the reference, whose Mixtral is
    single-device, SURVEY §2.5) and the per-expert FFN col/row-split on model."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lia_tpu.config import Activation, Norm

    cfg = ModelConfig(
        name="moe-test", vocab_size=512, hidden_size=128, ffn_size=256,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16,
        max_position_embeddings=64, dtype="float32",
        activation=Activation.SILU, norm=Norm.RMSNORM, rope=True,
        learned_pos=False, attn_bias=False, mlp_bias=False,
        num_experts=4, num_experts_per_tok=2,
    )
    params_host = init_dummy_params(cfg, seed=7, scale=0.02)
    B, S, NEW = 2, 16, 2
    tokens = np.random.default_rng(2).integers(3, 500, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)

    cache1 = kvc.init_cache(cfg, B, S + NEW, jnp.float32)
    p1 = jax.device_put(params_host)
    ref_logits, ref_cache = jax.jit(partial(T.prefill, cfg))(
        p1, jnp.asarray(tokens), jnp.asarray(mask), cache1
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2), ("data", "expert", "model"))
    sh = shd.param_shardings(cfg, params_host, mesh)  # ep_axis auto-detected
    moe_sh = sh["layers"]["mlp"]
    assert moe_sh["wg"].spec == P(None, "expert", None, "model")
    assert moe_sh["w2"].spec == P(None, "expert", "model", None)
    params = jax.tree.map(lambda x, s: jax.device_put(x, s), params_host, sh)
    cache = jax.device_put(
        kvc.init_cache(cfg, B, S + NEW, jnp.float32), shd.cache_shardings(mesh)
    )
    ds = shd.data_sharding(mesh)
    logits, cache = jax.jit(partial(T.prefill, cfg))(
        params, jax.device_put(jnp.asarray(tokens), ds),
        jax.device_put(jnp.asarray(mask), ds), cache,
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)

    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B, 1), S, jnp.int32)
    d_logits, _ = jax.jit(partial(T.decode_step, cfg))(params, tok, pos, cache)
    r_logits, _ = jax.jit(partial(T.decode_step, cfg))(p1, tok, pos, ref_cache)
    np.testing.assert_allclose(np.asarray(d_logits), np.asarray(r_logits), rtol=2e-4, atol=2e-4)


def test_graft_dryrun_runs():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_opt175b_tp_program_lowers_abstractly():
    """Ladder step 5 (compile-time): the TP-sharded prefill program for OPT-175B
    must lower on an 8-device mesh from abstract shapes alone (no weights
    materialized) — validates sharding rules divide every tensor at full scale."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from lia_tpu.models.registry import get_config
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.utils import checkpoint as ckpt

    cfg = get_config("opt-175b").replace(num_layers=4)  # layer count is sharding-neutral
    mesh = make_mesh((2, 4))

    def abstract_params(cfg):
        H, F, L, V = cfg.hidden_size, cfg.ffn_size, cfg.num_layers, cfg.vocab_size
        QD = cfg.num_heads * cfg.head_dim
        out = {
            "embed_tokens": jax.ShapeDtypeStruct((V, H), jnp.bfloat16),
            "embed_positions": jax.ShapeDtypeStruct(
                (cfg.max_position_embeddings + cfg.pos_offset, H), jnp.bfloat16
            ),
            "final_norm": {
                "scale": jax.ShapeDtypeStruct((H,), jnp.bfloat16),
                "bias": jax.ShapeDtypeStruct((H,), jnp.bfloat16),
            },
            "layers": {
                "ln1": {"scale": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
                        "bias": jax.ShapeDtypeStruct((L, H), jnp.bfloat16)},
                "ln2": {"scale": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
                        "bias": jax.ShapeDtypeStruct((L, H), jnp.bfloat16)},
                "attn": {
                    "wq": jax.ShapeDtypeStruct((L, H, QD), jnp.bfloat16),
                    "wk": jax.ShapeDtypeStruct((L, H, QD), jnp.bfloat16),
                    "wv": jax.ShapeDtypeStruct((L, H, QD), jnp.bfloat16),
                    "wo": jax.ShapeDtypeStruct((L, QD, H), jnp.bfloat16),
                    "bq": jax.ShapeDtypeStruct((L, QD), jnp.bfloat16),
                    "bk": jax.ShapeDtypeStruct((L, QD), jnp.bfloat16),
                    "bv": jax.ShapeDtypeStruct((L, QD), jnp.bfloat16),
                    "bo": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
                },
                "mlp": {
                    "w1": jax.ShapeDtypeStruct((L, H, F), jnp.bfloat16),
                    "b1": jax.ShapeDtypeStruct((L, F), jnp.bfloat16),
                    "w2": jax.ShapeDtypeStruct((L, F, H), jnp.bfloat16),
                    "b2": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
                },
            },
        }
        return out

    from jax.sharding import PartitionSpec as P

    aparams = abstract_params(cfg)
    param_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), shd.param_pspecs(cfg, aparams),
        is_leaf=lambda x: isinstance(x, P),
    )
    B, S = 4, 64
    cache_shape = kvc.KVCache(
        k=jax.ShapeDtypeStruct((cfg.num_layers, B, cfg.num_kv_heads, 128, cfg.head_dim), jnp.bfloat16),
        v=jax.ShapeDtypeStruct((cfg.num_layers, B, cfg.num_kv_heads, 128, cfg.head_dim), jnp.bfloat16),
        length=jax.ShapeDtypeStruct((), jnp.int32),
        mask=jax.ShapeDtypeStruct((B, 128), jnp.bool_),
    )
    tokens = jax.ShapeDtypeStruct((B, S), jnp.int32)
    mask = jax.ShapeDtypeStruct((B, S), jnp.bool_)
    ds = shd.data_sharding(mesh)
    lowered = jax.jit(
        partial(T.prefill, cfg),
        in_shardings=(param_sh, ds, ds, shd.cache_shardings(mesh)),
    ).lower(aparams, tokens, mask, cache_shape)
    txt = lowered.as_text()
    assert "num_partitions = 8" in txt
    # full-scale tensors present and partitioned-compile succeeds
    compiled = lowered.compile()
    assert compiled is not None


@pytest.mark.parametrize(
    "wdtype,gsize,aq",
    [
        ("int8", -1, "none"),
        ("int8", 64, "none"),
        ("int4", 64, "none"),
        ("int8", -1, "dynamic"),
        ("int4", 64, "dynamic"),
    ],
)
def test_tp_with_quantized_weights(cfg, wdtype, gsize, aq):
    """TP sharding composes with WOQ weights: QuantizedWeight leaves get q/s
    pspecs (ADVICE round-1 medium: shard_params crashed on the pytree node
    mismatch) and the sharded forward matches the single-device one.

    Dynamic-act formats quantize activations per token over the *local* K
    shard in row-parallel layers, so sharded numerics legitimately differ
    from single-device within int8-act error — those variants use a loose
    tolerance that still catches structural breakage (wrong scale specs)."""
    from lia_tpu.config import QuantConfig
    from lia_tpu.ops.quant import quantize_params

    params_host = quantize_params(
        cfg, init_dummy_params(cfg, seed=5, scale=0.02),
        QuantConfig(weight_dtype=wdtype, group_size=gsize, act_quant=aq),
    )
    tol = dict(rtol=2e-4, atol=2e-4) if aq == "none" else dict(rtol=5e-2, atol=5e-2)
    B, S = 2, 16
    tokens = np.random.default_rng(2).integers(3, 500, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)

    p1 = jax.device_put(params_host)
    cache1 = kvc.init_cache(cfg, B, S + 2, jnp.float32)
    ref_logits, ref_cache = jax.jit(partial(T.prefill, cfg))(
        p1, jnp.asarray(tokens), jnp.asarray(mask), cache1
    )

    mesh = make_mesh((1, 4))
    params = shd.shard_params(cfg, params_host, mesh)  # crashed before the fix
    cache = jax.device_put(
        kvc.init_cache(cfg, B, S + 2, jnp.float32), shd.cache_shardings(mesh)
    )
    ds = shd.data_sharding(mesh)
    logits, cache = jax.jit(partial(T.prefill, cfg))(
        params, jax.device_put(jnp.asarray(tokens), ds),
        jax.device_put(jnp.asarray(mask), ds), cache,
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), **tol)

    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B, 1), S, jnp.int32)
    d_logits, _ = jax.jit(partial(T.decode_step, cfg))(params, tok, pos, cache)
    r_logits, _ = jax.jit(partial(T.decode_step, cfg))(p1, tok, pos, ref_cache)
    np.testing.assert_allclose(np.asarray(d_logits), np.asarray(r_logits), **tol)


@pytest.mark.parametrize("model", ["baichuan-tiny", "chatglm-tiny", "baichuan2-tiny"])
def test_tp_new_families_match_single_device(model):
    """Round-2 families compose with TP: baichuan (MHA rope / ALiBi+NormHead)
    and chatglm (2 KV groups on a wider model axis — KV replication path)."""
    from lia_tpu.models.registry import get_config

    # vocab-sharded embed/lm_head need vocab % mesh == 0 (tiny registry entries
    # use an intentionally odd 503 to exercise OOB-pad clamping elsewhere)
    cfg = get_config(model).replace(dtype="float32", vocab_size=504)
    params_host = init_dummy_params(cfg, seed=7, scale=0.02)
    B, S, NEW = 2, 16, 2
    tokens = np.random.default_rng(2).integers(3, 500, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)

    cache1 = kvc.init_cache(cfg, B, S + NEW, jnp.float32)
    p1 = jax.device_put(params_host)
    ref_logits, ref_cache = jax.jit(partial(T.prefill, cfg))(
        p1, jnp.asarray(tokens), jnp.asarray(mask), cache1
    )

    # chatglm-tiny has 2 KV groups — a (1, 2) mesh shards them 1-per-device;
    # the 4-head q axis shards 2-per-device.
    mesh = make_mesh((1, 2))
    params = shd.shard_params(cfg, params_host, mesh)
    cache = jax.device_put(
        kvc.init_cache(cfg, B, S + NEW, jnp.float32), shd.cache_shardings(mesh)
    )
    ds = shd.data_sharding(mesh)
    logits, cache = jax.jit(partial(T.prefill, cfg))(
        params, jax.device_put(jnp.asarray(tokens), ds),
        jax.device_put(jnp.asarray(mask), ds), cache,
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)

    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B, 1), S, jnp.int32)
    d_logits, _ = jax.jit(partial(T.decode_step, cfg))(params, tok, pos, cache)
    r_logits, _ = jax.jit(partial(T.decode_step, cfg))(p1, tok, pos, ref_cache)
    np.testing.assert_allclose(np.asarray(d_logits), np.asarray(r_logits), rtol=2e-4, atol=2e-4)


def test_t5_tp_matches_single_device():
    """T5 encoder-decoder TP (the reference's AutoTP runner covers t5):
    greedy output on a (1, 2) mesh must bit-match single-device."""
    from lia_tpu.config import GenerationConfig
    from lia_tpu.engine.seq2seq import Seq2SeqEngine
    from lia_tpu.models.registry import get_config

    cfg = get_config("flan-t5-tiny").replace(dtype="float32", vocab_size=504)
    params = init_dummy_params(cfg, seed=9, scale=0.05)
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    gen = GenerationConfig(max_new_tokens=6)

    ref = Seq2SeqEngine(cfg, params).generate(prompts, gen).sequences
    mesh = make_mesh((1, 2))
    got = Seq2SeqEngine(cfg, params, mesh=mesh).generate(prompts, gen).sequences
    np.testing.assert_array_equal(got, ref)

    # scoring parity on the same mesh
    a = Seq2SeqEngine(cfg, params).loglikelihood(prompts, [[3, 4], [5]])
    b = Seq2SeqEngine(cfg, params, mesh=mesh).loglikelihood(prompts, [[3, 4], [5]])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_vlm_tp_matches_single_device():
    """GIT and LLaVA TP: text decoder sharded, vision tower replicated —
    greedy captions on a (1, 2) mesh bit-match single-device."""
    from lia_tpu.config import GenerationConfig
    from lia_tpu.engine.vlm import GitEngine, LlavaEngine
    from lia_tpu.models.registry import get_config

    mesh = make_mesh((1, 2))
    gen = GenerationConfig(max_new_tokens=5)

    cfg = get_config("git-tiny").replace(dtype="float32", vocab_size=504)
    params = init_dummy_params(cfg, seed=11, scale=0.05)
    px = np.random.default_rng(3).standard_normal(
        (2, 3, cfg.vision_image_size, cfg.vision_image_size), np.float32)
    ref = GitEngine(cfg, params).generate(px, gen).sequences
    got = GitEngine(cfg, params, mesh=mesh).generate(px, gen).sequences
    np.testing.assert_array_equal(got, ref)

    cfg = get_config("llava-tiny").replace(dtype="float32", vocab_size=504)
    params = init_dummy_params(cfg, seed=12, scale=0.05)
    px = np.random.default_rng(4).standard_normal(
        (2, 3, cfg.vision_image_size, cfg.vision_image_size), np.float32)
    prompts = [[1, cfg.image_token_id, 7, 8], [2, 9, cfg.image_token_id]]
    ref = LlavaEngine(cfg, params).generate(px, prompts, gen).sequences
    got = LlavaEngine(cfg, params, mesh=mesh).generate(px, prompts, gen).sequences
    np.testing.assert_array_equal(got, ref)


def test_engine_tp_generate_and_beam_match_single_device():
    """Engine-level TP (the AutoTP analog): InferenceEngine(mesh=...) shards
    weights/KV over the model axis; greedy, fused, and GROUPED BEAM outputs
    must match the unsharded engine (reference: every generation mode runs
    under DeepSpeed AutoTP)."""
    from lia_tpu.config import GenerationConfig
    from lia_tpu.engine.engine import InferenceEngine
    from lia_tpu.models.registry import get_config
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-tiny").replace(vocab_size=512, dtype="float32")
    params = init_dummy_params(cfg, seed=22, scale=0.12)
    prompts = [[5, 9, 23, 41], [100, 7, 3], [12, 13], [8, 8, 9]]
    gen = GenerationConfig(max_new_tokens=5)

    ref = InferenceEngine(cfg, params)
    mesh = make_mesh((1, 4))
    tp = InferenceEngine(cfg, params, mesh=mesh)

    np.testing.assert_array_equal(
        tp.generate(prompts, gen).sequences, ref.generate(prompts, gen).sequences
    )
    np.testing.assert_array_equal(
        tp.generate(prompts, gen, fused=True).sequences,
        ref.generate(prompts, gen, fused=True).sequences,
    )
    bg = gen.replace(num_beams=3)
    np.testing.assert_array_equal(
        tp.generate_beam(prompts, bg).sequences,
        ref.generate_beam(prompts, bg).sequences,
    )
