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


def test_graft_dryrun_runs():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
