"""Multi-host execution evidence (SURVEY §2.5 / BASELINE ladder step 5).

The reference validates distribution with single-node multi-rank runs over
oneCCL's SHM transport (tests/cpu/run_distributed_test.sh, test_deepspeed.py) —
no fake network backends. The TPU-native equivalent: TWO real OS processes, each
a JAX distributed controller with 4 virtual CPU devices, forming a (2 data ×
4 model) hybrid mesh via ``multihost.initialize`` + ``multihost.hybrid_mesh``,
running a TP+DP-sharded prefill whose logits must match the single-process
reference. Plus: the OPT-175B-config INT4 dummy-weight TP dryrun (scaled layer
count) — the final ladder step's program, executed not just lowered.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import sys, json, os
sys.path.insert(0, os.getcwd())
import jax

jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])

from lia_tpu.parallel import multihost

multihost.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4, jax.local_devices()
assert len(jax.devices()) == 8

mesh = multihost.hybrid_mesh((1, 4))  # data axis spans the two processes
assert dict(mesh.shape) == {"data": 2, "model": 4}, mesh.shape

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.sharding import NamedSharding, PartitionSpec as P

from lia_tpu.config import ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.ops import kv_cache as kvc
from lia_tpu.parallel import sharding as shd
from lia_tpu.utils.checkpoint import init_dummy_params

cfg = ModelConfig(name="mh-test", vocab_size=256, hidden_size=64, ffn_size=128,
                  num_layers=2, num_heads=8, num_kv_heads=8, head_dim=8,
                  max_position_embeddings=32, dtype="float32")
params_host = init_dummy_params(cfg, seed=11, scale=0.02)
B, S = 4, 8  # global batch 4 -> 2 rows per process
rng = np.random.default_rng(0)
tokens = rng.integers(3, 250, (B, S)).astype(np.int32)
mask = np.ones((B, S), bool)

# every process computes the full-batch single-device reference locally
ref_logits, _ = jax.jit(partial(T.prefill, cfg))(
    jax.device_put(params_host), jnp.asarray(tokens), jnp.asarray(mask),
    kvc.init_cache(cfg, B, S + 2, jnp.float32),
)
ref = np.asarray(ref_logits)

with mesh:
    sharded_params = shd.shard_params(cfg, params_host, mesh)
    ds = shd.data_sharding(mesh)
    tok_g = jax.make_array_from_process_local_data(ds, tokens[pid * 2:(pid + 1) * 2])
    mask_g = jax.make_array_from_process_local_data(ds, mask[pid * 2:(pid + 1) * 2])
    cache = jax.device_put(kvc.init_cache(cfg, B, S + 2, jnp.float32),
                           shd.cache_shardings(mesh))
    logits, _ = jax.jit(partial(T.prefill, cfg))(sharded_params, tok_g, mask_g, cache)
    from jax.experimental import multihost_utils

    full = multihost_utils.process_allgather(logits, tiled=True)
np.testing.assert_allclose(np.asarray(full), ref, rtol=2e-4, atol=2e-4)
print(json.dumps({"pid": pid, "ok": True}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_prefill(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err[-2000:]}"
        assert '"ok": true' in out


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("LIA_SLOW_TESTS"),
    reason="~4.5 min on CPU; run with LIA_SLOW_TESTS=1 (passed 2026-08-17, see RESULTS.md)",
)
def test_opt175b_int4_tp_dryrun_executes():
    """BASELINE ladder step 5 execution-side: the OPT-175B config (hidden 12288,
    ffn 49152, 96 heads; layer count scaled to 2 for CI memory) with INT4 dummy
    weights runs prefill + a decode step TP-sharded on the 8-device mesh —
    executed, not just abstractly lowered (round-1 had only the lowering check)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from lia_tpu.config import QuantConfig
    from lia_tpu.models import transformer as T
    from lia_tpu.models.registry import get_config
    from lia_tpu.ops import kv_cache as kvc
    from lia_tpu.parallel import sharding as shd
    from lia_tpu.parallel.mesh import make_mesh
    from lia_tpu.utils.checkpoint import init_dummy_params

    cfg = get_config("opt-175b").replace(num_layers=2, dtype="float32")
    params_host = init_dummy_params(
        cfg, seed=1, quant=QuantConfig(weight_dtype="int4", group_size=128)
    )
    mesh = make_mesh((1, 8))
    params = shd.shard_params(cfg, params_host, mesh)
    B, S = 1, 8
    tokens = np.full((B, S), 7, np.int32)
    mask = np.ones((B, S), bool)
    cache = jax.device_put(
        kvc.init_cache(cfg, B, S + 4, jnp.float32), shd.cache_shardings(mesh)
    )
    ds = shd.data_sharding(mesh)
    logits, cache = jax.jit(partial(T.prefill, cfg))(
        params, jax.device_put(jnp.asarray(tokens), ds),
        jax.device_put(jnp.asarray(mask), ds), cache,
    )
    assert np.isfinite(np.asarray(logits)).all()
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B, 1), S, jnp.int32)
    d_logits, _ = jax.jit(partial(T.decode_step, cfg))(params, tok, pos, cache)
    assert np.isfinite(np.asarray(d_logits)).all()
