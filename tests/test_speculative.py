"""Speculative decode exactness: regardless of what the drafter proposes,
the committed output must equal the sequential greedy decode — tokens,
validity, stop behavior, max_new cap, and the prober-gate pooled captures.

The drafts only change HOW FAST tokens commit (tokens per verify forward),
never WHAT commits; these tests drive both an adversarial oracle (garbage
drafts -> acceptance 0) and a perfect oracle (the recorded greedy output ->
full acceptance), plus the production prompt-lookup drafter, against
``decode.decode_greedy`` on a tiny f32 model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.decode import StopTables, generate
from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig, init_params
from probing_rag_tpu.models.speculative import (
    SpecConfig,
    _prompt_lookup_drafts,
    decode_speculative,
)
from probing_rag_tpu.models.tokenizer import ByteTokenizer

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)
PARAMS = init_params(CFG, jax.random.PRNGKey(0))
TOK = ByteTokenizer(CFG.vocab_size)


def _run(prompts, max_new=12, spec=None, oracle=None, paragraph_stop=True,
         kv_int8=False):
    return generate(
        PARAMS, CFG, TOK, prompts, max_new_tokens=max_new,
        paragraph_stop=paragraph_stop, spec=spec, spec_oracle=oracle,
        kv_int8=kv_int8,
    )


def _assert_equal(seq, spc, pooled_tol=2e-3):
    st, sr = seq
    pt, pr = spc
    assert st == pt
    np.testing.assert_array_equal(pr.tokens, sr.tokens)
    np.testing.assert_array_equal(pr.token_valid, sr.token_valid)
    np.testing.assert_array_equal(pr.n_generated, sr.n_generated)
    np.testing.assert_array_equal(pr.n_pooled, sr.n_pooled)
    # same sums, different accumulation shapes: f32-close, not bit-equal
    np.testing.assert_allclose(
        pr.pooled_captures, sr.pooled_captures, rtol=pooled_tol, atol=pooled_tol
    )


PROMPTS = ["the cat sat on the mat. the cat", "ab ab ab ab ab", "hello"]


def test_prompt_lookup_matches_sequential():
    seq = _run(PROMPTS)
    spc = _run(PROMPTS, spec=SpecConfig(k=4, drafter="prompt"))
    _assert_equal(seq, spc)


def test_adversarial_oracle_still_exact():
    # garbage drafts: acceptance ~0, output must be untouched
    bad = jnp.full((len(PROMPTS), 32), 3, jnp.int32)
    seq = _run(PROMPTS)
    spc = _run(PROMPTS, spec=SpecConfig(k=3, drafter="oracle"), oracle=bad)
    _assert_equal(seq, spc)


def test_perfect_oracle_full_acceptance():
    """Drafting the recorded greedy output verifies it in ~n/(k+1) rounds."""
    seq = _run(PROMPTS, max_new=12, paragraph_stop=False)
    rec = jnp.asarray(seq[1].tokens)  # [B, max_new] greedy tokens
    k = 3
    prompt_ids = [TOK.encode(p, add_bos=True) for p in PROMPTS]
    from probing_rag_tpu.models.decode import _pad_batch

    tokens, valid = _pad_batch(prompt_ids, TOK.pad_id)
    out = decode_speculative(
        PARAMS, jnp.asarray(tokens), jnp.asarray(valid),
        jnp.zeros(CFG.vocab_size, bool), jnp.zeros(CFG.vocab_size, bool),
        jnp.zeros(CFG.vocab_size, bool), rec,
        cfg=CFG, capture=CaptureSpec.for_probing(CFG), max_new_tokens=12,
        eos_id=TOK.eos_id, k=k, drafter="oracle",
    )
    gen, valid_buf, _, _, n_gen, stats = out
    np.testing.assert_array_equal(np.asarray(gen), seq[1].tokens)
    rounds = int(stats["rounds"])
    worst = int(np.max(np.asarray(n_gen)))
    # full acceptance: every round commits k+1 tokens (except the last)
    assert rounds <= -(-max(worst - 1, 1) // (k + 1)) + 1, (rounds, worst)


def test_paragraph_stop_mid_block():
    # paragraph-stop tables on: outputs with early "\n\n" stops must match
    seq = _run(PROMPTS, max_new=10, paragraph_stop=True)
    spc = _run(PROMPTS, max_new=10, paragraph_stop=True,
               spec=SpecConfig(k=5, drafter="prompt"))
    _assert_equal(seq, spc)


def test_max_new_cap_crossing_block():
    # max_new not a multiple of the block: the cap clamps mid-block
    seq = _run(PROMPTS, max_new=7, paragraph_stop=False)
    spc = _run(PROMPTS, max_new=7, paragraph_stop=False,
               spec=SpecConfig(k=4, drafter="prompt"))
    _assert_equal(seq, spc)


@pytest.mark.slow
def test_spec_with_int8_kv_matches_its_own_sequential():
    seq = _run(PROMPTS, kv_int8=True)
    spc = _run(PROMPTS, kv_int8=True, spec=SpecConfig(k=4, drafter="prompt"))
    # int8-KV requantization differs between the 1-token and block writes
    # only via f32 rounding of identical values -> still token-exact
    _assert_equal(seq, spc, pooled_tol=5e-3)


def test_prompt_lookup_drafts_prefer_bigram():
    #           0  1  2  3  4  5  6
    prompt = jnp.asarray([[9, 5, 7, 3, 5, 7, 4]], jnp.int32)
    valid = jnp.ones((1, 7), bool)
    # cur=7, prev=5: bigram (5,7) last at pos 5 -> draft [4, eos]
    d = _prompt_lookup_drafts(
        prompt, valid, jnp.asarray([5]), jnp.asarray([7]), 2, eos_id=0)
    np.testing.assert_array_equal(np.asarray(d), [[4, 0]])
    # cur=3, prev=99: no bigram, unigram 3 at pos 3 -> drafts [5, 7]
    d = _prompt_lookup_drafts(
        prompt, valid, jnp.asarray([99]), jnp.asarray([3]), 2, eos_id=0)
    np.testing.assert_array_equal(np.asarray(d), [[5, 7]])
    # cur absent -> eos drafts
    d = _prompt_lookup_drafts(
        prompt, valid, jnp.asarray([1]), jnp.asarray([88]), 2, eos_id=0)
    np.testing.assert_array_equal(np.asarray(d), [[0, 0]])


def test_sampling_plus_spec_rejected():
    from probing_rag_tpu.models.sampling import SamplingConfig

    with pytest.raises(ValueError, match="greedy-exact"):
        generate(PARAMS, CFG, TOK, ["x"], max_new_tokens=4,
                 sampling=SamplingConfig(do_sample=True),
                 spec=SpecConfig())
