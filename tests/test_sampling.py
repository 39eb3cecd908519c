"""Sampling op tests (greedy/top-k/top-p)."""

import jax
import jax.numpy as jnp
import numpy as np

from lia_tpu.config import GenerationConfig
from lia_tpu.ops import sampling


def test_greedy():
    logits = jnp.array([[0.1, 5.0, -1.0], [2.0, 0.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(sampling.greedy(logits)), [1, 2])


def test_top_k_masks_rest():
    logits = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    out = sampling.apply_top_k(logits, 2)
    assert float(out[0, 3]) == 4.0 and float(out[0, 2]) == 3.0
    assert float(out[0, 0]) <= sampling.NEG_INF and float(out[0, 1]) <= sampling.NEG_INF


def test_top_p_keeps_top_token():
    logits = jnp.array([[10.0, 0.0, -10.0]])
    out = sampling.apply_top_p(logits, 0.01)  # tiny p: only the argmax survives
    assert float(out[0, 0]) == 10.0
    assert float(out[0, 1]) <= sampling.NEG_INF


def test_sample_respects_masking():
    gen = GenerationConfig(do_sample=True, temperature=1.0, top_k=1)
    logits = jnp.tile(jnp.array([[0.0, 3.0, 1.0]]), (8, 1))
    toks = sampling.sample(logits, jax.random.PRNGKey(0), gen)
    np.testing.assert_array_equal(np.asarray(toks), np.ones(8, np.int32))


def test_sample_distribution_sane():
    gen = GenerationConfig(do_sample=True, temperature=1.0)
    logits = jnp.tile(jnp.array([[0.0, 5.0]]), (512, 1))
    toks = np.asarray(sampling.sample(logits, jax.random.PRNGKey(1), gen))
    assert toks.mean() > 0.9  # overwhelmingly the high-logit token
