"""Fused-MLP megakernel vs the unfused jnp path (interpret mode).

Reference analog: TPPGEMM fused epilogues (TPPGEMMKrnl.cpp) — here the whole
LN2+up+act+down+residual block is one launch (launch overhead dominates decode
on the target rig)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lia_tpu.config import ModelConfig
from lia_tpu.models import transformer as T
from lia_tpu.models.registry import get_config
from lia_tpu.ops.pallas_mlp import fused_mlp
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.mark.parametrize("model,act", [("opt-tiny", "relu"), ("llama-tiny", "silu")])
def test_fused_mlp_matches_unfused(rng, model, act):
    cfg = get_config(model).replace(dtype="float32")
    params = init_dummy_params(cfg, seed=3, scale=0.05)
    lp = {g: {k: jnp.asarray(v)[0] for k, v in grp.items()}
          for g, grp in params["layers"].items()}
    B, H = 4, cfg.hidden_size
    x = jnp.asarray(rng.standard_normal((B, 1, H)), jnp.float32)

    # unfused reference
    residual = x
    h = T.norm(cfg, lp["ln2"], x)
    h = T.mlp(cfg, lp, h)
    ref = residual + h

    m, ln = lp["mlp"], lp["ln2"]
    out = fused_mlp(
        x.reshape(B, H), ln["scale"], ln.get("bias"),
        m["w1"], m.get("b1"),
        m.get("wg") if act == "silu" else None,
        m["w2"], m.get("b2"),
        activation=act, rms=cfg.norm.value == "rmsnorm", eps=cfg.norm_eps,
        block_f=cfg.ffn_size // 2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[:, 0, :], rtol=2e-5, atol=2e-5
    )
