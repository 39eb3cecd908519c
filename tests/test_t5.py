"""T5 encoder-decoder golden parity vs HF transformers (torch CPU).

Strategy mirrors tests/test_model_golden.py (the reference's tiny-config
golden approach, tests/cpu/test_ipex_optimize_transformers.py): random tiny
HF T5, map the state dict, compare encoder output, teacher-forced decoder
logits (exercises the self-cache + relative bias + cross-attention), and
greedy generation.
"""

import numpy as np
import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.seq2seq import Seq2SeqEngine, pack_encoder_inputs
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import params_from_hf_state_dict

torch = pytest.importorskip("torch")


def _to_numpy_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _make_pair(name, gated):
    from transformers import T5Config, T5ForConditionalGeneration

    cfg = get_config(name).replace(dtype="float32")
    hf_cfg = T5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.hidden_size,
        d_kv=cfg.head_dim,
        d_ff=cfg.ffn_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.rel_buckets,
        relative_attention_max_distance=cfg.rel_max_distance,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=cfg.tie_embeddings,
        layer_norm_epsilon=cfg.norm_eps,
        dropout_rate=0.0,
        decoder_start_token_id=0,
        pad_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    params = params_from_hf_state_dict(cfg, _to_numpy_sd(hf))
    return cfg, hf, params


@pytest.fixture(scope="module")
def t5_pair():
    return _make_pair("t5-tiny", gated=False)


@pytest.fixture(scope="module")
def flan_pair():
    return _make_pair("flan-t5-tiny", gated=True)


def _enc_inputs(cfg, lens=(7, 12, 3), seed=1):
    rng = np.random.default_rng(seed)
    prompts = [list(rng.integers(3, 400, size=n)) for n in lens]
    tokens, mask = pack_encoder_inputs(prompts, pad_id=cfg.pad_token_id)
    return prompts, tokens, mask


@pytest.mark.parametrize("pair", ["t5_pair", "flan_pair"])
def test_encoder_matches_hf(pair, request):
    cfg, hf, params = request.getfixturevalue(pair)
    _, tokens, mask = _enc_inputs(cfg)
    with torch.no_grad():
        want = hf.encoder(
            input_ids=torch.tensor(tokens, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    import jax
    import jax.numpy as jnp
    from lia_tpu.models import t5 as M

    got = np.asarray(
        M.encode(cfg, jax.device_put(params), jnp.asarray(tokens), jnp.asarray(mask))
    )
    # compare only valid positions (HF computes pad rows too; we mask keys the
    # same way but pad-row outputs are unused downstream)
    for b in range(tokens.shape[0]):
        v = mask[b]
        np.testing.assert_allclose(got[b, v], want[b, v], rtol=2e-2, atol=8e-3)


@pytest.mark.parametrize("pair", ["t5_pair", "flan_pair"])
def test_teacher_forced_decoder_logits_match_hf(pair, request):
    cfg, hf, params = request.getfixturevalue(pair)
    _, tokens, mask = _enc_inputs(cfg, seed=2)
    B = tokens.shape[0]
    T = 6
    rng = np.random.default_rng(3)
    dec_in = np.concatenate(
        [np.zeros((B, 1), np.int64), rng.integers(3, 400, size=(B, T - 1))], axis=1
    )
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(tokens, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec_in, dtype=torch.long),
        ).logits.numpy()

    import jax
    import jax.numpy as jnp
    from lia_tpu.models import t5 as M

    p = jax.device_put(params)
    enc_out = M.encode(cfg, p, jnp.asarray(tokens), jnp.asarray(mask))
    ck, cv = M.cross_kv(cfg, p, enc_out)
    L, N, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
    sk = jnp.zeros((L, B, N, T, D), jnp.float32)
    sv = jnp.zeros((L, B, N, T, D), jnp.float32)
    for t in range(T):
        logits, sk, sv = M.decode_step(
            cfg, p, jnp.asarray(dec_in[:, t : t + 1].astype(np.int32)),
            jnp.int32(t), sk, sv, ck, cv, jnp.asarray(mask),
        )
        np.testing.assert_allclose(
            np.asarray(logits), want[:, t], rtol=2e-2, atol=8e-3
        )


@pytest.mark.parametrize("pair", ["t5_pair", "flan_pair"])
def test_greedy_generation_matches_hf(pair, request):
    cfg, hf, params = request.getfixturevalue(pair)
    prompts, tokens, mask = _enc_inputs(cfg, lens=(9, 5), seed=4)
    n_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(tokens, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_new_tokens=n_new,
            do_sample=False,
        ).numpy()[:, 1:]  # drop decoder_start_token

    eng = Seq2SeqEngine(cfg, params)
    res = eng.generate(
        prompts, GenerationConfig(max_new_tokens=n_new, eos_token_id=1, pad_token_id=0)
    )
    T_hf = hf_out.shape[1]
    np.testing.assert_array_equal(res.sequences[:, :T_hf], hf_out)


def test_loglikelihood_matches_hf(t5_pair):
    """score() vs HF teacher-forced log-probs, and is_greedy vs HF argmax."""
    cfg, hf, params = t5_pair
    rng = np.random.default_rng(11)
    contexts = [list(rng.integers(3, 400, size=6)), list(rng.integers(3, 400, size=4))]
    conts = [list(rng.integers(3, 400, size=3)), list(rng.integers(3, 400, size=5))]

    from lia_tpu.engine.seq2seq import Seq2SeqEngine

    eng = Seq2SeqEngine(cfg, params)
    got, greedy_ok = eng.score(contexts, conts)

    import torch.nn.functional as F

    for b in range(2):
        ids = torch.tensor([contexts[b]])
        attn = torch.ones_like(ids)
        dec = torch.tensor([[0] + conts[b][:-1]])
        with torch.no_grad():
            logits = hf(input_ids=ids, attention_mask=attn, decoder_input_ids=dec).logits[0]
        lp = F.log_softmax(logits.float(), dim=-1)
        want = sum(lp[t, conts[b][t]].item() for t in range(len(conts[b])))
        np.testing.assert_allclose(got[b], want, rtol=2e-3, atol=2e-3)
        hf_greedy = all(int(lp[t].argmax()) == conts[b][t] for t in range(len(conts[b])))
        assert bool(greedy_ok[b]) == hf_greedy


def test_beam1_equals_greedy(t5_pair):
    cfg, hf, params = t5_pair
    rng = np.random.default_rng(12)
    prompts = [list(rng.integers(3, 400, size=6)), list(rng.integers(3, 400, size=4))]
    eng = Seq2SeqEngine(cfg, params)
    g = eng.generate(prompts, GenerationConfig(max_new_tokens=6)).sequences
    b = eng.generate_beam(prompts, GenerationConfig(max_new_tokens=6, num_beams=1)).sequences
    np.testing.assert_array_equal(g, b)


def test_beam_scores_at_least_greedy(t5_pair):
    """The best beam's summed log-prob must be ≥ the greedy trajectory's."""
    cfg, hf, params = t5_pair
    rng = np.random.default_rng(13)
    prompts = [list(rng.integers(3, 400, size=6))]
    eng = Seq2SeqEngine(cfg, params)
    gen = GenerationConfig(max_new_tokens=5)
    g = eng.generate(prompts, gen).sequences
    bm = eng.generate_beam(prompts, gen.replace(num_beams=4)).sequences
    lg = eng.loglikelihood(prompts, [list(map(int, g[0]))])[0]
    lb = eng.loglikelihood(prompts, [list(map(int, bm[0]))])[0]
    assert lb >= lg - 1e-4


def test_greedy_processors_match_hf(t5_pair):
    """Seq2seq greedy with repetition_penalty + no_repeat_ngram + min_new
    matches HF T5 generate (processors run over decoder ids incl. the start
    token, HF convention)."""
    cfg, hf, params = t5_pair
    prompts, tokens, mask = _enc_inputs(cfg, lens=(9, 5), seed=4)
    n_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(tokens, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_new_tokens=n_new, min_new_tokens=4, do_sample=False,
            repetition_penalty=1.5, no_repeat_ngram_size=2,
        ).numpy()[:, 1:]

    eng = Seq2SeqEngine(cfg, params)
    res = eng.generate(
        prompts,
        GenerationConfig(
            max_new_tokens=n_new, eos_token_id=1, pad_token_id=0,
            repetition_penalty=1.5, no_repeat_ngram_size=2, min_new_tokens=4,
        ),
    )
    T_hf = hf_out.shape[1]
    np.testing.assert_array_equal(res.sequences[:, :T_hf], hf_out)


def test_beam_processors_run_and_change_output(t5_pair):
    """Seq2seq beam search composes with processors: ngram-banned beams
    contain no repeated bigram; output differs from the unprocessed beam."""
    cfg, hf, params = t5_pair
    prompts, _, _ = _enc_inputs(cfg, lens=(9, 5), seed=4)
    eng = Seq2SeqEngine(cfg, params)
    base = eng.generate_beam(
        prompts, GenerationConfig(max_new_tokens=8, num_beams=3, eos_token_id=None)
    ).sequences
    got = eng.generate_beam(
        prompts,
        GenerationConfig(
            max_new_tokens=8, num_beams=3, eos_token_id=None,
            no_repeat_ngram_size=1,  # every decoder token unique (incl. start=0)
        ),
    ).sequences
    assert not np.array_equal(base, got)
    for row in got:
        assert len(set(row.tolist())) == len(row)
        assert 0 not in row  # start token banned from step 1 on
