"""LM core tests: cache/no-cache consistency, padding invariance, capture
semantics, and decode parity against a Python reference simulation of the
hook-based loop (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.decode import StopTables, decode_greedy, generate
from probing_rag_tpu.models.gemma import (
    CaptureSpec,
    GemmaConfig,
    forward,
    init_kv_cache,
    init_params,
    param_count,
)
from probing_rag_tpu.models.tokenizer import ByteTokenizer

# float32 compute on the CPU test backend: keeps the cache/no-cache argmax
# comparison deterministic (the TPU path runs bfloat16)
CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_forward_shapes_and_captures(params):
    tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % CFG.vocab_size
    capture = CaptureSpec(((1, "resid_mid"), (2, "resid_post")))
    logits, _, caps = forward(params, tokens, CFG, capture=capture)
    assert logits.shape == (2, 6, CFG.vocab_size)
    assert caps.shape == (2, 2, 6, CFG.d_model)
    assert not np.allclose(np.asarray(caps[0]), np.asarray(caps[1]))


@pytest.mark.slow
def test_resid_sites_are_consistent(params):
    # resid_post of layer l == resid_mid of layer l + mlp branch; check the
    # stream actually differs between sites and layers feed forward.
    tokens = jnp.ones((1, 4), jnp.int32)
    capture = CaptureSpec(((0, "resid_mid"), (0, "resid_post"), (1, "resid_mid")))
    _, _, caps = forward(params, tokens, CFG, capture=capture)
    mid0, post0, mid1 = np.asarray(caps)
    assert not np.allclose(mid0, post0)
    # attention output of layer 1 is added to post0 to make mid1
    assert not np.allclose(post0, mid1)


@pytest.mark.slow
def test_chunked_prefill_attention_matches_unchunked(params):
    """``attn_q_chunk`` maps the attention over query chunks to bound the
    f32 score temporaries (the 7B-prefill OOM fix); each chunk attends
    over the FULL key row, so logits and captures must match the unchunked
    forward. Non-dividing or oversized chunks fall back to unchunked."""
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, CFG.vocab_size)
    capture = CaptureSpec.for_probing(CFG)
    ref_l, _, ref_c = forward(params, tokens, CFG, capture=capture)
    for chunk in (4, 8, 5, 16, 64):  # 5: non-dividing; 16/64: >= T
        cfg_c = dataclasses.replace(CFG, attn_q_chunk=chunk)
        got_l, _, got_c = forward(params, tokens, cfg_c, capture=capture)
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(ref_l), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(ref_c), rtol=1e-5, atol=1e-5)
    # decode with a cache: prefill chunked, steps are T=1 (never chunked)
    cfg_c = dataclasses.replace(CFG, attn_q_chunk=4)
    stop = StopTables.disabled(CFG.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    valid = jnp.ones(tokens.shape, bool)
    ref = decode_greedy(params, tokens, valid, zeros, zeros, zeros,
                        cfg=CFG, capture=capture, max_new_tokens=4, eos_id=-1)
    got = decode_greedy(params, tokens, valid, zeros, zeros, zeros,
                        cfg=cfg_c, capture=capture, max_new_tokens=4, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))


@pytest.mark.slow
def test_chunked_prefill_mlp_matches_unchunked(params):
    """``mlp_t_chunk`` maps the block MLP over token chunks to bound the
    [B, T, d_ff] gate/up temporaries (the 7B batch-64 w8a8 OOM fix —
    logs/measure_decode_mistral7b_int8a8_b64.err); each chunk runs the
    identical matmuls over a token slice, so logits and captures must match
    the unchunked forward (up to XLA fusion-order f32 rounding).
    Non-dividing or oversized chunks fall back to unchunked."""
    tokens = jax.random.randint(jax.random.PRNGKey(7), (2, 16), 0, CFG.vocab_size)
    capture = CaptureSpec.for_probing(CFG)
    ref_l, _, ref_c = forward(params, tokens, CFG, capture=capture)
    for chunk in (4, 8, 5, 16, 64):  # 5: non-dividing; 16/64: >= T
        cfg_c = dataclasses.replace(CFG, mlp_t_chunk=chunk)
        got_l, _, got_c = forward(params, tokens, cfg_c, capture=capture)
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(ref_l), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(ref_c), rtol=1e-5, atol=1e-5)
    # combined with chunked attention AND a decode cache: prefill chunks,
    # steps are T=1 (never chunked) — committed tokens must be identical
    cfg_c = dataclasses.replace(CFG, mlp_t_chunk=4, attn_q_chunk=4)
    stop = StopTables.disabled(CFG.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    valid = jnp.ones(tokens.shape, bool)
    ref = decode_greedy(params, tokens, valid, zeros, zeros, zeros,
                        cfg=CFG, capture=capture, max_new_tokens=4, eos_id=-1)
    got = decode_greedy(params, tokens, valid, zeros, zeros, zeros,
                        cfg=cfg_c, capture=capture, max_new_tokens=4, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))


@pytest.mark.slow
def test_split_prefill_decode_matches_fused(params):
    """``decode_greedy_split`` (two programs, donated-cache hand-off — the
    7B batch-64 OOM fix, logs/measure_decode_mistral7b_int8a8_b64.err) runs
    the exact same prefill and loop graphs as the fused ``decode_greedy``,
    so every output must be identical: tokens, validity, pooled captures,
    counts — across left-padding, paragraph stops, int8 KV, sampling, and
    boundary-format int4 weights."""
    from probing_rag_tpu.models.decode import decode_greedy_split
    from probing_rag_tpu.models.gemma import quantize_lm_params
    from probing_rag_tpu.models.sampling import SamplingConfig

    tok = ByteTokenizer(CFG.vocab_size)
    stop = StopTables.from_token_strings(tok.token_strings())
    tabs = tuple(jnp.asarray(x) for x in
                 (stop.contains_dbl_nl, stop.ends_nl, stop.starts_nl))
    capture = CaptureSpec.for_probing(CFG)
    rng = jax.random.PRNGKey(11)
    tokens = jax.random.randint(rng, (3, 16), 3, CFG.vocab_size)
    valid = jnp.asarray(np.array([[False] * 4 + [True] * 12,
                                  [True] * 16,
                                  [False] * 9 + [True] * 7]))
    cfg_unstacked = dataclasses.replace(CFG, kv_unstacked=True)
    cases = [
        dict(kv_int8=False, sampling=SamplingConfig(), p=params),
        dict(kv_int8=True, sampling=SamplingConfig(), p=params),
        dict(kv_int8=False,
             sampling=SamplingConfig(do_sample=True, top_k=4, freq_penalty=0.5),
             p=params),
        dict(kv_int8=True, sampling=SamplingConfig(),
             p=quantize_lm_params(params, bits=4, int4_scheme="rank1")),
        # per-layer (kv_unstacked) cache: the 7B big-batch serving form
        dict(kv_int8=True, sampling=SamplingConfig(), p=params,
             cfg=cfg_unstacked),
        dict(kv_int8=False, sampling=SamplingConfig(), p=params,
             cfg=cfg_unstacked),
    ]
    for case in cases:
        kw = dict(cfg=case.get("cfg", CFG), capture=capture,
                  max_new_tokens=10,
                  eos_id=tok.eos_id, sampling=case["sampling"],
                  kv_int8=case["kv_int8"])
        key = jax.random.PRNGKey(5)
        ref = decode_greedy(case["p"], tokens, valid, *tabs, key, **kw)
        got = decode_greedy_split(case["p"], tokens, valid, *tabs, key, **kw)
        for r, g, name in zip(ref, got,
                              ("tokens", "valid", "pooled", "n_pooled", "n_gen")):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(g), err_msg=f"{name} ({case})")


@pytest.mark.slow
def test_unstacked_kv_cache_matches_stacked(params):
    """GemmaConfig(kv_unstacked=True) stores the cache as per-layer
    {"k","v",scales} dicts (the 7B big-batch serving form — stacked 2.3 GB
    carries defeat XLA's in-place while_loop reuse); committed tokens and
    captures must equal the stacked-cache decode exactly."""
    tok = ByteTokenizer(CFG.vocab_size)
    stop = StopTables.disabled(CFG.vocab_size)
    tabs = tuple(jnp.asarray(x) for x in
                 (stop.contains_dbl_nl, stop.ends_nl, stop.starts_nl))
    capture = CaptureSpec.for_probing(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(21), (2, 12), 3, CFG.vocab_size)
    valid = jnp.ones(tokens.shape, bool)
    cfg_u = dataclasses.replace(CFG, kv_unstacked=True)
    for kv_int8 in (False, True):
        ref = decode_greedy(params, tokens, valid, *tabs,
                            cfg=CFG, capture=capture, max_new_tokens=8,
                            eos_id=tok.eos_id, kv_int8=kv_int8)
        got = decode_greedy(params, tokens, valid, *tabs,
                            cfg=cfg_u, capture=capture, max_new_tokens=8,
                            eos_id=tok.eos_id, kv_int8=kv_int8)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_kv_cache_matches_full_forward(params):
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, CFG.vocab_size)
    full_logits, _, _ = forward(params, tokens, CFG)

    kv = init_kv_cache(CFG, 2, 10, dtype=jnp.float32)
    # prefill 6, then 4 single-token steps
    logits_a, kv, _ = forward(params, tokens[:, :6], CFG, kv_cache=kv)
    outs = [logits_a]
    for i in range(6, 10):
        step_logits, kv, _ = forward(params, tokens[:, i : i + 1], CFG, kv_cache=kv)
        outs.append(step_logits)
    inc_logits = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(inc_logits), rtol=2e-2, atol=2e-2
    )
    # argmax (greedy choice) must agree everywhere
    np.testing.assert_array_equal(
        np.argmax(np.asarray(full_logits), -1), np.argmax(np.asarray(inc_logits), -1)
    )


@pytest.mark.slow
def test_int8_kv_cache_bounded_logit_drift(params):
    """int8 KV cache (per-token-per-head scales, dequant fused into the
    attention read) must track the f32-cache logits closely and keep the
    greedy path identical on a well-separated distribution."""
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 0, CFG.vocab_size)
    full_logits, _, _ = forward(params, tokens, CFG)

    kv = init_kv_cache(CFG, 2, 10, dtype=jnp.int8)
    assert kv["k"].dtype == jnp.int8 and "k_scale" in kv
    logits_a, kv, _ = forward(params, tokens[:, :6], CFG, kv_cache=kv)
    outs = [logits_a]
    for i in range(6, 10):
        step_logits, kv, _ = forward(params, tokens[:, i : i + 1], CFG, kv_cache=kv)
        outs.append(step_logits)
    inc = np.asarray(jnp.concatenate(outs, axis=1))
    ref = np.asarray(full_logits)
    # drift bounded relative to the logit scale (int8 quantization error)
    assert np.max(np.abs(inc - ref)) < 0.05 * np.max(np.abs(ref))
    # greedy tokens agree
    np.testing.assert_array_equal(np.argmax(ref, -1), np.argmax(inc, -1))


@pytest.mark.slow
def test_int4_kv_cache_bounded_logit_drift(params):
    """int4 KV cache (sub-channel group scales, unpack + dequant fused into
    the attention read — the batch-64 7B w8a8 enabler, ROUND5_NOTES §10):
    quantization must be within half a quantization step elementwise, and
    the end-to-end logits must stay bounded relative to the logit scale.
    (4-bit carries ~8x the int8 error, so exact-argmax is only asserted at
    the quantizer level, not on this random near-tied-logit tiny model.)"""
    from probing_rag_tpu.models.gemma import _dequant_kv4, _quant_kv4

    # quantizer contract: round-trip within half a step of the group scale
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 5, 32), jnp.float32)
    q, s = _quant_kv4(x)
    assert q.dtype == jnp.int4 and s.shape == (2, 3, 5, 1)
    # merged-store layout: q [B, KV, S, hd], scales [B, KV*G, S]
    s_m = jnp.swapaxes(s, -1, -2).reshape(2, 3, 5)
    back = np.asarray(_dequant_kv4(q, s_m, jnp.float32))
    err = np.abs(back - np.asarray(x))
    assert np.all(err <= np.asarray(s)[..., :] * 0.5 + 1e-6)

    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 0, CFG.vocab_size)
    full_logits, _, _ = forward(params, tokens, CFG)
    kv = init_kv_cache(CFG, 2, 10, dtype=jnp.int4)
    assert kv["k"].dtype == jnp.int4
    # scale layout [L, B, KV*G, S]: S minormost, merged KV*G second-minor
    # (a minormost or second-minor G of 1-8 would tile-pad 2-32x)
    assert kv["k_scale"].shape == (CFG.n_layers, 2, CFG.n_kv_heads, 10)
    logits_a, kv, _ = forward(params, tokens[:, :6], CFG, kv_cache=kv)
    outs = [logits_a]
    for i in range(6, 10):
        step_logits, kv, _ = forward(params, tokens[:, i : i + 1], CFG, kv_cache=kv)
        outs.append(step_logits)
    inc = np.asarray(jnp.concatenate(outs, axis=1))
    ref = np.asarray(full_logits)
    # ~8x the int8 test's 0.05 bound (4-bit step is 8x wider); measured
    # 0.26 on this fixture
    assert np.max(np.abs(inc - ref)) < 0.35 * np.max(np.abs(ref))


@pytest.mark.slow
def test_int4_kv_decode_paths_agree(params):
    """Every serving form of the int4 KV cache — fused, two-program split,
    per-layer (unstacked), and speculative prompt-lookup — quantizes
    identically, so committed tokens and pooled captures must be EXACTLY
    equal across all four."""
    from probing_rag_tpu.models.decode import decode_greedy_split
    from probing_rag_tpu.models.speculative import decode_speculative

    stop = StopTables.disabled(CFG.vocab_size)
    tabs = tuple(jnp.asarray(x) for x in
                 (stop.contains_dbl_nl, stop.ends_nl, stop.starts_nl))
    capture = CaptureSpec.for_probing(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(13), (2, 12), 3, CFG.vocab_size)
    valid = jnp.ones(tokens.shape, bool)
    kw = dict(capture=capture, max_new_tokens=8, eos_id=-1, kv_int4=True)

    ref = decode_greedy(params, tokens, valid, *tabs, cfg=CFG, **kw)
    split = decode_greedy_split(params, tokens, valid, *tabs, cfg=CFG, **kw)
    cfg_u = dataclasses.replace(CFG, kv_unstacked=True)
    unstacked = decode_greedy(params, tokens, valid, *tabs, cfg=cfg_u, **kw)
    spec = decode_speculative(params, tokens, valid, *tabs, cfg=CFG,
                              capture=capture, max_new_tokens=8, eos_id=-1,
                              k=2, drafter="prompt", kv_int4=True)
    for got, name in ((split, "split"), (unstacked, "unstacked"), (spec, "spec")):
        np.testing.assert_array_equal(
            np.asarray(ref[0]), np.asarray(got[0]), err_msg=name)
        np.testing.assert_allclose(
            np.asarray(ref[2]), np.asarray(got[2]), rtol=1e-5, atol=1e-5,
            err_msg=name)

    with pytest.raises(ValueError):
        decode_greedy(params, tokens, valid, *tabs, cfg=CFG, capture=capture,
                      max_new_tokens=4, eos_id=-1, kv_int8=True, kv_int4=True)


@pytest.mark.slow
def test_left_padding_invariance(params):
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 7), 0, CFG.vocab_size)
    logits_plain, _, _ = forward(params, ids, CFG)

    pad = 5
    padded = jnp.concatenate([jnp.zeros((1, pad), jnp.int32), ids], axis=-1)
    valid = jnp.concatenate([jnp.zeros((1, pad), bool), jnp.ones((1, 7), bool)], axis=-1)
    positions = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
    logits_padded, _, _ = forward(
        params, padded, CFG, positions=positions, attn_valid=valid
    )
    np.testing.assert_allclose(
        np.asarray(logits_plain[0, -1]),
        np.asarray(logits_padded[0, -1]),
        rtol=2e-2,
        atol=2e-2,
    )


def _simulate_reference_decode(params, prompt_ids, max_new, eos_id, capture, tok_strings):
    """Python transliteration of the reference generate loop + hook cache
    (exp_rag.py:129-200, 315-329): full re-forward each step, cache entry per
    forward, paragraph stop on decoded text, pooling = sum of cache[1:]."""
    tokens = list(prompt_ids)
    cache = []  # list of [n_sites, d] activations, one entry per forward call
    finished = False
    for index in range(max_new):
        arr = jnp.asarray([tokens], jnp.int32)
        logits, _, caps = forward(params, arr, CFG, capture=capture)
        cache.append(np.asarray(caps[:, 0, -1 if index else slice(None), :]))
        nxt = int(jnp.argmax(logits[0, -1]))
        if finished:
            nxt = eos_id
        tokens.append(nxt)
        text = "".join(tok_strings[t] for t in tokens)
        if text.count("\n\n") > "".join(tok_strings[t] for t in prompt_ids).count("\n\n"):
            break
        if nxt == eos_id:
            finished = True
        if finished:
            break
    pooled = np.zeros((capture.n_sites, CFG.d_model), np.float32)
    for entry in cache[1:]:
        pooled += entry if entry.ndim == 2 else entry[:, -1]
    return tokens[len(prompt_ids):], pooled, len(cache) - 1


@pytest.mark.slow
def test_decode_matches_reference_simulation(params):
    tok = ByteTokenizer(CFG.vocab_size)
    capture = CaptureSpec.for_probing(CFG)
    tok_strings = tok.token_strings()
    prompt = "Question: who?\nRationale:"
    prompt_ids = tok.encode(prompt, add_bos=True)
    max_new = 12

    ref_tokens, ref_pooled, ref_n = _simulate_reference_decode(
        params, prompt_ids, max_new, tok.eos_id, capture, tok_strings
    )

    texts, result = generate(
        params, CFG, tok, [prompt], max_new_tokens=max_new, capture=capture
    )
    got_tokens = [int(t) for t in result.tokens[0, : result.n_generated[0]]]
    assert got_tokens == ref_tokens
    assert int(result.n_pooled[0]) == ref_n
    np.testing.assert_allclose(
        result.pooled_captures[:, 0, :], ref_pooled, rtol=5e-2, atol=5e-2
    )
    assert texts[0].startswith(prompt)


@pytest.mark.slow
def test_decode_batch_rows_match_single(params):
    tok = ByteTokenizer(CFG.vocab_size)
    prompts = ["alpha beta", "some longer different prompt here"]
    texts_batch, res_batch = generate(params, CFG, tok, prompts, max_new_tokens=8)
    for i, p in enumerate(prompts):
        texts_one, res_one = generate(params, CFG, tok, [p], max_new_tokens=8)
        assert texts_one[0] == texts_batch[i]
        np.testing.assert_allclose(
            res_one.pooled_captures[:, 0], res_batch.pooled_captures[:, i],
            rtol=5e-2, atol=5e-2,
        )


def test_stop_tables():
    st = StopTables.from_token_strings(["a", "\n", "x\n\ny", "b\n", "\nc"])
    assert list(st.contains_dbl_nl) == [False, False, True, False, False]
    assert list(st.ends_nl) == [False, True, False, True, False]
    assert list(st.starts_nl) == [False, True, False, False, True]


def test_param_count_runs(params):
    assert param_count(params) > 0


def test_gemma_2b_config_matches_reference_geometry():
    cfg = GemmaConfig.gemma_2b()
    assert cfg.probe_layers == (6, 8, 10, 12, 14, 16)  # exp_rag.py:311
    assert cfg.d_model == 2048 and cfg.n_layers == 18


@pytest.mark.slow
def test_gqa_config_forward_and_cache():
    # Mistral-family geometry: grouped-query attention (n_kv_heads > 1)
    cfg = dataclasses.replace(
        GemmaConfig.tiny(), n_heads=4, n_kv_heads=2, compute_dtype=jnp.float32
    )
    params = init_params(cfg, jax.random.PRNGKey(5))
    tokens = jax.random.randint(jax.random.PRNGKey(6), (2, 9), 0, cfg.vocab_size)
    full, _, _ = forward(params, tokens, cfg)

    kv = init_kv_cache(cfg, 2, 9, dtype=jnp.float32)
    l1, kv, _ = forward(params, tokens[:, :5], cfg, kv_cache=kv)
    outs = [l1]
    for i in range(5, 9):
        li, kv, _ = forward(params, tokens[:, i : i + 1], cfg, kv_cache=kv)
        outs.append(li)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), rtol=2e-4, atol=2e-4)


def test_mistral_7b_config_geometry():
    cfg = GemmaConfig.mistral_7b()
    assert cfg.probe_layers == (12, 14, 16, 18, 20, 22)  # utils.py:295-297
    assert cfg.n_heads % cfg.n_kv_heads == 0


def test_stop_tables_decode_byte_fallback_newlines():
    """Mistral-family vocabs encode '\n' as the byte-fallback piece <0x0A>;
    StopTables must still flag it or the paragraph stop never fires."""
    from probing_rag_tpu.models.tokenizer import _piece_to_string

    assert _piece_to_string("<0x0A>") == "\n"
    assert _piece_to_string("<0xFF>") == ""  # lone continuation byte
    assert _piece_to_string("▁hello") == " hello"
    st = StopTables.from_token_strings(
        [_piece_to_string(p) for p in ["a", "<0x0A>", "b"]]
    )
    assert st.ends_nl[1] and st.starts_nl[1]
    assert not st.ends_nl[0] and not st.ends_nl[2]


def test_unstacked_layers_exact_and_quantized_decode(params):
    """The unstacked serving format (params["layers"] as a tuple of
    per-layer trees — the 7B OOM fix, see gemma.unstack_layer_params) is
    bit-identical to the stacked tree: same forward logits, same greedy
    decode through every quantization scheme's unpack path."""
    from probing_rag_tpu.models.gemma import (
        init_quantized_lm_params,
        quantize_lm_params,
        unstack_layer_params,
    )

    rng = np.random.default_rng(7)
    toks = jnp.asarray(rng.integers(3, CFG.vocab_size, (2, 12)), jnp.int32)
    valid = jnp.ones((2, 12), bool)
    capture = CaptureSpec.for_probing(CFG)

    un = unstack_layer_params(params)
    assert isinstance(un["layers"], tuple) and len(un["layers"]) == CFG.n_layers
    assert unstack_layer_params(un) is un  # idempotent passthrough
    lo, _, _ = forward(params, toks, CFG, capture=capture)
    lu, _, _ = forward(un, toks, CFG, capture=capture)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(lu))

    stop = StopTables.disabled(CFG.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    for scheme_kw in ({"bits": 8}, {"bits": 4, "int4_scheme": "grouped"},
                      {"bits": 4, "int4_scheme": "rank1"}):
        qp = quantize_lm_params(params, **scheme_kw)
        qu = unstack_layer_params(qp)
        outs = []
        for p in (qp, qu):
            g = decode_greedy(
                p, toks, valid, zeros, zeros, zeros,
                cfg=CFG, capture=capture, max_new_tokens=6, eos_id=-1,
            )
            outs.append(g)
        np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(outs[1][0]))
        np.testing.assert_array_equal(
            np.asarray(outs[0][2]), np.asarray(outs[1][2]))


def test_init_quantized_unstacked_structure():
    """init_quantized_lm_params(unstacked=True) emits the tuple-of-layers
    format with per-layer shapes matching a stacked init's slices, for
    both int8 and rank-1 int4."""
    from probing_rag_tpu.models.gemma import init_quantized_lm_params

    for kw in ({"bits": 8}, {"bits": 4, "int4_scheme": "rank1"}):
        pu = init_quantized_lm_params(CFG, jax.random.PRNGKey(1),
                                      unstacked=True, **kw)
        ps = init_quantized_lm_params(CFG, jax.random.PRNGKey(1), **kw)
        assert isinstance(pu["layers"], tuple)
        assert len(pu["layers"]) == CFG.n_layers
        flat_u = jax.tree.leaves(pu["layers"][0])
        flat_s = jax.tree.leaves(
            jax.tree.map(lambda a: a[0], ps["layers"]))
        assert [l.shape for l in flat_u] == [l.shape for l in flat_s]
        assert [l.dtype for l in flat_u] == [l.dtype for l in flat_s]
