"""Sampling selector tests: greedy default, temperature/top-k/top-p filters,
and sampled decode through the full generate path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.decode import generate
from probing_rag_tpu.models.gemma import GemmaConfig, init_params
from probing_rag_tpu.models.sampling import SamplingConfig, select_token
from probing_rag_tpu.models.tokenizer import ByteTokenizer

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)


def test_greedy_matches_argmax():
    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.0]])
    out = select_token(logits, SamplingConfig())
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    cfg = SamplingConfig(do_sample=True, top_k=2)
    seen = {
        int(select_token(logits, cfg, jax.random.PRNGKey(i))[0]) for i in range(50)
    }
    assert seen <= {2, 3}
    assert len(seen) == 2  # both survivors appear


def test_top_p_keeps_nucleus():
    # one dominant token: p=0.5 nucleus keeps only it
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    cfg = SamplingConfig(do_sample=True, top_p=0.5)
    seen = {
        int(select_token(logits, cfg, jax.random.PRNGKey(i))[0]) for i in range(20)
    }
    assert seen == {0}


def test_temperature_zero_limit_is_sharp():
    logits = jnp.asarray([[1.0, 1.1, 0.9]])
    cfg = SamplingConfig(do_sample=True, temperature=1e-4)
    seen = {
        int(select_token(logits, cfg, jax.random.PRNGKey(i))[0]) for i in range(10)
    }
    assert seen == {1}


def test_freq_penalty_shifts_selection():
    # reference order (transformer_lens sample_logits, exp_rag.py:58):
    # logits -= penalty * count BEFORE temperature; with a sharp
    # temperature the penalized favorite loses to the runner-up
    logits = jnp.asarray([[2.0, 1.5, 0.0]])
    counts = jnp.asarray([[3, 0, 0]], jnp.int32)
    cfg = SamplingConfig(do_sample=True, temperature=1e-4, freq_penalty=1.0)
    out = select_token(logits, cfg, jax.random.PRNGKey(0), counts)
    assert int(out[0]) == 1
    # penalty 0.0 => counts ignored (and not required)
    cfg0 = SamplingConfig(do_sample=True, temperature=1e-4)
    assert int(select_token(logits, cfg0, jax.random.PRNGKey(0))[0]) == 0


@pytest.mark.slow
def test_freq_penalty_decode_discourages_repeats():
    """Through the full generate path: a large penalty must produce more
    distinct tokens than penalty-free sampling from the same seed (the
    count carry includes the prompt and grows with each generated token)."""
    params = init_params(CFG, jax.random.PRNGKey(0))
    tok = ByteTokenizer(CFG.vocab_size)
    base = SamplingConfig(do_sample=True, temperature=0.3)
    pen = dataclasses.replace(base, freq_penalty=50.0)
    _, r0 = generate(params, CFG, tok, ["ababab"], max_new_tokens=12,
                     sampling=base, seed=3, paragraph_stop=False)
    _, r1 = generate(params, CFG, tok, ["ababab"], max_new_tokens=12,
                     sampling=pen, seed=3, paragraph_stop=False)
    uniq = lambda r: len(set(r.tokens[0, : r.n_generated[0]].tolist()))
    assert uniq(r1) >= uniq(r0)
    # with a huge penalty every generated token is distinct until a stop
    toks = r1.tokens[0, : r1.n_generated[0]][
        r1.token_valid[0, : r1.n_generated[0]]
    ].tolist()
    assert len(set(toks)) == len(toks)


@pytest.mark.slow
def test_sampled_generate_runs_and_is_seeded():
    params = init_params(CFG, jax.random.PRNGKey(0))
    tok = ByteTokenizer(CFG.vocab_size)
    s = SamplingConfig(do_sample=True, temperature=1.0, top_k=50)
    t1, _ = generate(params, CFG, tok, ["hello"], max_new_tokens=6, sampling=s, seed=1)
    t2, _ = generate(params, CFG, tok, ["hello"], max_new_tokens=6, sampling=s, seed=1)
    t3, _ = generate(params, CFG, tok, ["hello"], max_new_tokens=6, sampling=s, seed=2)
    assert t1 == t2  # deterministic per seed
    greedy, _ = generate(params, CFG, tok, ["hello"], max_new_tokens=6)
    assert isinstance(t3[0], str) and isinstance(greedy[0], str)
