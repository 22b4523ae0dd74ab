"""HF checkpoint loader round trip: write a synthetic safetensors checkpoint
in the HF Gemma/BERT layouts and verify the mapped pytree drives the forward
(shapes, transposition, norm passthrough)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.encoder import EncoderConfig, encoder_forward
from probing_rag_tpu.models.gemma import GemmaConfig, forward
from probing_rag_tpu.models.hf_loader import load_encoder_params, load_gemma_params

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)


def _write_safetensors(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, path)


def _synthetic_gemma_ckpt(tmp_path, cfg):
    rng = np.random.default_rng(0)
    d, h, kv, hd, f = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_ff
    t = {}
    t["model.embed_tokens.weight"] = rng.normal(size=(cfg.vocab_size, d)).astype(np.float32)
    t["model.norm.weight"] = rng.normal(size=(d,)).astype(np.float32)
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = rng.normal(size=(d,)).astype(np.float32)
        t[p + "post_attention_layernorm.weight"] = rng.normal(size=(d,)).astype(np.float32)
        t[p + "self_attn.q_proj.weight"] = rng.normal(size=(h * hd, d)).astype(np.float32)
        t[p + "self_attn.k_proj.weight"] = rng.normal(size=(kv * hd, d)).astype(np.float32)
        t[p + "self_attn.v_proj.weight"] = rng.normal(size=(kv * hd, d)).astype(np.float32)
        t[p + "self_attn.o_proj.weight"] = rng.normal(size=(d, h * hd)).astype(np.float32)
        t[p + "mlp.gate_proj.weight"] = rng.normal(size=(f, d)).astype(np.float32)
        t[p + "mlp.up_proj.weight"] = rng.normal(size=(f, d)).astype(np.float32)
        t[p + "mlp.down_proj.weight"] = rng.normal(size=(d, f)).astype(np.float32)
    _write_safetensors(tmp_path / "model.safetensors", t)
    return t


@pytest.mark.slow
def test_gemma_loader_roundtrip(tmp_path):
    raw = _synthetic_gemma_ckpt(tmp_path, CFG)
    params = load_gemma_params(tmp_path, CFG)
    # torch [out, in] -> ours [in, out]
    np.testing.assert_array_equal(
        params["layers"]["wq"][0], raw["model.layers.0.self_attn.q_proj.weight"].T
    )
    np.testing.assert_array_equal(
        params["layers"]["attn_norm"][1], raw["model.layers.1.input_layernorm.weight"]
    )
    np.testing.assert_array_equal(params["embed"], raw["model.embed_tokens.weight"])
    # loaded params drive the forward
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    params = jax.tree.map(jnp.asarray, params)
    logits, _, _ = forward(params, tokens, CFG)
    assert logits.shape == (1, 4, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_gemma_loader_geometry_mismatch_raises(tmp_path):
    _synthetic_gemma_ckpt(tmp_path, CFG)
    wrong = dataclasses.replace(CFG, d_model=CFG.d_model * 2)
    with pytest.raises(AssertionError):
        load_gemma_params(tmp_path, wrong)


@pytest.mark.slow
def test_encoder_loader_roundtrip(tmp_path):
    cfg = dataclasses.replace(EncoderConfig.tiny(), compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    d, f = cfg.d_model, cfg.d_ff
    t = {
        "embeddings.word_embeddings.weight": rng.normal(size=(cfg.vocab_size, d)).astype(np.float32),
        "embeddings.position_embeddings.weight": rng.normal(size=(cfg.max_positions, d)).astype(np.float32),
        "embeddings.token_type_embeddings.weight": rng.normal(size=(cfg.n_token_types, d)).astype(np.float32),
        "embeddings.LayerNorm.weight": np.ones(d, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(d, np.float32),
    }
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        for name, shape in [
            ("attention.self.query", (d, d)), ("attention.self.key", (d, d)),
            ("attention.self.value", (d, d)), ("attention.output.dense", (d, d)),
            ("intermediate.dense", (f, d)), ("output.dense", (d, f)),
        ]:
            t[p + name + ".weight"] = rng.normal(size=shape).astype(np.float32)
            t[p + name + ".bias"] = np.zeros(shape[0], np.float32)
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            t[p + ln + ".weight"] = np.ones(d, np.float32)
            t[p + ln + ".bias"] = np.zeros(d, np.float32)
    _write_safetensors(tmp_path / "model.safetensors", t)

    params = load_encoder_params(tmp_path, cfg)
    params = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray([[5, 6, 7]], jnp.int32)
    mask = jnp.ones((1, 3), bool)
    out = encoder_forward(params, tokens, mask, cfg)
    assert out.shape == (1, d)
    assert np.isfinite(np.asarray(out)).all()


def _mistral_tiny_cfg():
    return dataclasses.replace(GemmaConfig.tiny_mistral(), compute_dtype=jnp.float32)


@pytest.mark.parametrize("family", ["gemma", "mistral"])
@pytest.mark.slow
def test_logit_parity_against_hf_transformers(tmp_path, family):
    """End-to-end numeric parity with the HF torch implementation the
    reference runs on (exp_rag.py:302 via transformer_lens): a tiny random
    checkpoint saved by transformers must produce matching logits through
    our loader + forward. Covers RMSNorm convention, GeGLU-vs-SwiGLU,
    rope, MQA/GQA, embedding scaling and tied/untied heads per family."""
    import torch

    if family == "gemma":
        from transformers import GemmaConfig as HFCfg, GemmaForCausalLM as HFModel

        cfg = CFG
        hf_cfg = HFCfg(
            vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
            intermediate_size=cfg.d_ff, num_hidden_layers=cfg.n_layers,
            num_attention_heads=cfg.n_heads, num_key_value_heads=cfg.n_kv_heads,
            head_dim=cfg.head_dim, rms_norm_eps=cfg.norm_eps,
            rope_theta=cfg.rope_theta, attention_bias=False,
            hidden_activation="gelu_pytorch_tanh", tie_word_embeddings=True,
        )
    else:
        from transformers import MistralConfig as HFCfg, MistralForCausalLM as HFModel

        cfg = _mistral_tiny_cfg()
        hf_cfg = HFCfg(
            vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
            intermediate_size=cfg.d_ff, num_hidden_layers=cfg.n_layers,
            num_attention_heads=cfg.n_heads, num_key_value_heads=cfg.n_kv_heads,
            head_dim=cfg.head_dim, rms_norm_eps=cfg.norm_eps,
            rope_theta=cfg.rope_theta, sliding_window=None,
            tie_word_embeddings=False,
        )

    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    params = load_gemma_params(tmp_path, cfg)
    params = jax.tree.map(jnp.asarray, params)
    tokens = np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    ours, _, _ = forward(params, jnp.asarray(tokens, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_int8_quantized_forward_bounds_logit_drift():
    """Per-channel int8 weights: HBM payload shrinks ~2x (decode is
    weight-bandwidth-bound) while logits stay within a small drift bound."""
    from probing_rag_tpu.models.gemma import init_params, quantize_lm_params

    cfg = CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_lm_params(params)
    assert qparams["layers"]["wq"]["q"].dtype == jnp.int8
    assert qparams["embed"]["q"].dtype == jnp.int8

    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    ref, _, caps = forward(params, tokens, cfg)
    got, _, qcaps = forward(qparams, tokens, cfg)
    ref, got = np.asarray(ref), np.asarray(got)
    # random tiny-model logits are near-uniform (std ~0.35) — the hardest
    # case; measured drift: rms ~2.8% of spread, max ~17%
    spread = ref.std()
    rms = np.sqrt(((got - ref) ** 2).mean())
    assert rms < 0.05 * spread, (rms, spread)
    assert np.abs(got - ref).max() < 0.25 * spread
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.85, agree


def test_init_quantized_lm_params_matches_quantize_of_init():
    """Leafwise serving init (one bf16 leaf resident at a time — how the
    7B bench fits a single chip) must produce the EXACT tree that
    quantize_lm_params(init_params(...)) produces: same keys, same
    rounding, bit-for-bit."""
    from probing_rag_tpu.models.gemma import (
        init_params, init_quantized_lm_params, quantize_lm_params)

    for cfg in (CFG, _mistral_tiny_cfg()):
        key = jax.random.PRNGKey(3)
        ref = quantize_lm_params(init_params(cfg, key, dtype=jnp.bfloat16))
        got = init_quantized_lm_params(cfg, key)
        assert jax.tree.structure(ref) == jax.tree.structure(got)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    # int4, both schemes: the leafwise path (how the 7B int4 bench fits one
    # chip) must be bit-for-bit the quantize-of-init tree too
    for scheme in ("grouped", "rank1"):
        cfg = _mistral_tiny_cfg()
        key = jax.random.PRNGKey(3)
        ref = quantize_lm_params(
            init_params(cfg, key, dtype=jnp.bfloat16),
            bits=4, group_size=16, int4_scheme=scheme)
        got = init_quantized_lm_params(
            cfg, key, bits=4, group_size=16, int4_scheme=scheme)
        assert jax.tree.structure(ref) == jax.tree.structure(got)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    with pytest.raises(ValueError):
        init_quantized_lm_params(CFG, jax.random.PRNGKey(0), bits=3)
    with pytest.raises(ValueError):
        init_quantized_lm_params(
            CFG, jax.random.PRNGKey(0), bits=4, int4_scheme="rank2")


@pytest.mark.slow
def test_w8a8_prefill_gating_and_drift():
    """``act_int8_rows``: above the row threshold, per-channel-int8 weights
    run int8 x int8 on the MXU with per-row activation scales applied
    outside the dot (the w8a8 prefill path — v5e doubles the s8 MAC rate
    and prefill is MXU-bound). Below the threshold (decode: rows = batch)
    the path must be BIT-IDENTICAL to the drift-free w8a16 form — the gate
    is the quality contract for the serving decode loop."""
    from probing_rag_tpu.models.gemma import init_params, quantize_lm_params

    cfg = CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_lm_params(params)
    tokens = jnp.asarray(
        np.random.default_rng(7).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )  # 32 activation rows

    w8a16, _, _ = forward(qparams, tokens, cfg)  # act_int8_rows=0: disabled
    gated_off, _, _ = forward(
        qparams, tokens, dataclasses.replace(cfg, act_int8_rows=64))
    np.testing.assert_array_equal(np.asarray(gated_off), np.asarray(w8a16))

    a8, _, _ = forward(qparams, tokens, dataclasses.replace(cfg, act_int8_rows=1))
    a8, w8a16 = np.asarray(a8), np.asarray(w8a16)
    assert not np.array_equal(a8, w8a16)  # the s8 x s8 path actually ran
    # activation rounding adds drift on top of weight rounding; both stay
    # small next to the logit spread (same bound family as the w8a16 test)
    ref = np.asarray(forward(params, tokens, cfg)[0])
    spread = ref.std()
    assert np.sqrt(((a8 - w8a16) ** 2).mean()) < 0.05 * spread
    assert np.sqrt(((a8 - ref) ** 2).mean()) < 0.08 * spread
    agree = (ref.argmax(-1) == a8.argmax(-1)).mean()
    assert agree >= 0.85, agree


@pytest.mark.slow
def test_int8_quantization_mistral_untied_head():
    from probing_rag_tpu.models.gemma import init_params, quantize_lm_params

    cfg = _mistral_tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    qparams = quantize_lm_params(params)
    assert qparams["lm_head"]["q"].dtype == jnp.int8
    tokens = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    ref, _, _ = forward(params, tokens, cfg)
    got, _, _ = forward(qparams, tokens, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=0.2 * float(np.asarray(ref).std())
    )


@pytest.mark.slow
def test_int4_grouped_quantization_formats_and_rtn_bound():
    """Grouped w4a16 (bits=4): layer matmuls become the boundary format
    {"qp": uint8 [D, F/2] nibble-packed, "gs": f32 [D/group, F]} (native S4
    jit args crash the TPU runtime — gemma._pack_int4), unpacked to
    {"q": int4 [D, F]} inside jitted calls; the embedding stays per-row
    int8 by default. Round-to-nearest correctness: every reconstructed
    weight is within half a quantization step (gs/2) of the original —
    the exact RTN property."""
    from probing_rag_tpu.models.gemma import (
        init_params, quantize_lm_params, unpack_int4_params)

    cfg = CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    g = 16
    q4 = quantize_lm_params(params, bits=4, group_size=g)
    wq = q4["layers"]["wq"]
    d, f = params["layers"]["wq"].shape[-2:]
    assert wq["qp"].dtype == jnp.uint8
    assert wq["qp"].shape == (cfg.n_layers, d, f // 2)
    assert wq["gs"].shape == (cfg.n_layers, d // g, f)
    assert q4["embed"]["q"].dtype == jnp.int8  # sensitive: per-row int8 default
    assert q4["embed"]["s"].shape == (cfg.vocab_size, 1)

    up = unpack_int4_params(q4)
    uq = up["layers"]["wq"]["q"]
    assert uq.dtype == jnp.int4 and uq.shape == params["layers"]["wq"].shape
    assert "qp" not in up["layers"]["wq"]
    assert unpack_int4_params(up)["layers"]["wq"]["q"].dtype == jnp.int4  # idempotent

    w = np.asarray(params["layers"]["w_up"], np.float32)  # [L, D, F]
    q = np.asarray(up["layers"]["w_up"]["q"], np.float32)
    gs = np.asarray(q4["layers"]["w_up"]["gs"])  # [L, D/g, F]
    step = np.repeat(gs, g, axis=1)  # per-element scale
    recon = q.reshape(w.shape) * step
    assert np.all(np.abs(recon - w) <= 0.5 * step + 1e-6)

    q4e = quantize_lm_params(params, bits=4, group_size=g, embed_bits=4)
    assert q4e["embed"]["qp"].dtype == jnp.uint8
    assert unpack_int4_params(q4e)["embed"]["q"].dtype == jnp.int4

    with pytest.raises(ValueError):
        quantize_lm_params(params, bits=3)
    with pytest.raises(ValueError):
        quantize_lm_params(params, bits=8, embed_bits=4)
    with pytest.raises(ValueError):  # silent int4 wraparound if accepted
        quantize_lm_params(params, bits=4, embed_bits=16)

    # group_size=None resolves to the largest group <= 128 dividing every
    # grouped reduction dim (64 for the tiny config: d_model=64, d_ff=128)
    q4d = quantize_lm_params(params, bits=4)
    assert q4d["layers"]["wq"]["gs"].shape[1] == d // 64
    assert q4d["layers"]["w_down"]["gs"].shape[1] == cfg.d_ff // 64


@pytest.mark.slow
def test_int4_forward_drift_bounded_and_branches_agree(monkeypatch):
    """int4 logits drift more than int8 (15 levels vs 255) but stay bounded;
    and the two matmul implementations — grouped batched dot (decode rows)
    vs transient dequantized copy (prefill rows) — agree to bf16 rounding."""
    import probing_rag_tpu.models.gemma as G

    cfg = CFG
    params = G.init_params(cfg, jax.random.PRNGKey(0))
    q4 = G.quantize_lm_params(params, bits=4, group_size=16)
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    ref = np.asarray(forward(params, tokens, cfg)[0])
    got = np.asarray(forward(q4, tokens, cfg)[0])
    spread = ref.std()
    # random tiny-model weights are int4's worst case (gaussian, no
    # structure, 4 layers of error accumulation at d_model=64): measured
    # rms ~0.44 spread at group 16. Real-checkpoint quality belongs to the
    # parity drill; this pins the arithmetic from regressing.
    rms = np.sqrt(((got - ref) ** 2).mean())
    assert rms < 0.6 * spread, (rms, spread)

    grouped = np.asarray(forward(q4, tokens, cfg)[0])
    monkeypatch.setattr(G, "_INT4_DEQUANT_ROWS", 0)  # force the prefill branch
    dequant = np.asarray(forward(q4, tokens, cfg)[0])
    np.testing.assert_allclose(grouped, dequant, rtol=0.02, atol=0.05 * spread)


@pytest.mark.slow
def test_int4_rank1_quantization_format_and_coverage():
    """Rank-1 int4 (``int4_scheme="rank1"``): the per-(group, channel)
    scale matrix is constrained to ``rs[k] * s[f]`` so the decode matmul
    is ONE fused-convert dot with true int4 HBM reads (grouped int4's
    batched-over-groups dot measured SLOWER than int8 on v5e — MEASURE_r4
    decode_int4_b32). The max-plus fit guarantees coverage: after the
    final rs update, ``rs[k]*s[f] >= max|w|/7`` per (group, channel), so
    nothing clips and the RTN half-step bound holds elementwise."""
    from probing_rag_tpu.models.gemma import (
        init_params, quantize_lm_params, unpack_int4_params)

    cfg = CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    g = 16
    q4 = quantize_lm_params(params, bits=4, group_size=g, int4_scheme="rank1")
    wq = q4["layers"]["wq"]
    d, f = params["layers"]["wq"].shape[-2:]
    assert wq["qp"].dtype == jnp.uint8
    assert wq["rs"].shape == (cfg.n_layers, d // g, 1)
    assert wq["s"].shape == (cfg.n_layers, 1, f)
    assert "gs" not in wq
    assert q4["embed"]["q"].dtype == jnp.int8  # embed unaffected by scheme

    up = unpack_int4_params(q4)
    w = np.asarray(params["layers"]["w_up"], np.float32)  # [L, D, F]
    q = np.asarray(up["layers"]["w_up"]["q"], np.float32)
    rs = np.asarray(q4["layers"]["w_up"]["rs"])  # [L, K, 1]
    s = np.asarray(q4["layers"]["w_up"]["s"])  # [L, 1, F]
    assert np.abs(q).max() <= 7  # coverage: no wraparound, no clipping
    step = np.repeat(rs * s, g, axis=1)  # [L, D, F] per-element scale
    recon = q * step
    assert np.all(np.abs(recon - w) <= 0.5 * step + 1e-6)

    with pytest.raises(ValueError):
        quantize_lm_params(params, bits=4, int4_scheme="rank2")


@pytest.mark.slow
def test_int4_rank1_forward_factorization_and_drift():
    """The rank-1 forward folds rs into the activations and s into the
    output — exactly ``x @ (q * rs * s)`` up to float associativity. Pin
    the ``_mm`` factorization against the explicit dequantized matmul, and
    bound the end-to-end drift in the grouped-int4 family (gaussian
    weights have near-rank-1 group-max structure, so rank1 tracks grouped
    closely here; real-checkpoint quality belongs to the parity drill)."""
    import probing_rag_tpu.models.gemma as G

    cfg = CFG
    params = G.init_params(cfg, jax.random.PRNGKey(0))
    r1 = G.quantize_lm_params(params, bits=4, group_size=16,
                              int4_scheme="rank1")
    gr = G.quantize_lm_params(params, bits=4, group_size=16)
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 16)),
        jnp.int32)
    ref = np.asarray(forward(params, tokens, cfg)[0])
    got_r1 = np.asarray(forward(r1, tokens, cfg)[0])
    got_gr = np.asarray(forward(gr, tokens, cfg)[0])
    spread = ref.std()
    rms_r1 = np.sqrt(((got_r1 - ref) ** 2).mean())
    rms_gr = np.sqrt(((got_gr - ref) ** 2).mean())
    assert rms_r1 < 0.6 * spread, (rms_r1, spread)
    assert rms_r1 < 1.5 * rms_gr + 1e-6, (rms_r1, rms_gr)

    # _mm factorization exactness on one family (per-layer 2D leaves)
    up = G.unpack_int4_params(r1)
    leaf = {k: jnp.asarray(np.asarray(v)[0])
            for k, v in up["layers"]["w_gate"].items()}
    q0 = np.asarray(leaf["q"], np.float32)
    rs0, s0 = np.asarray(leaf["rs"]), np.asarray(leaf["s"])
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (4, q0.shape[0]),
                          jnp.float32))
    wd = q0 * np.repeat(rs0 * s0, q0.shape[0] // rs0.shape[0], axis=0)
    got = np.asarray(G._mm(jnp.asarray(x), leaf, jnp.float32))
    np.testing.assert_allclose(got, x @ wd, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_w4a8_rank1_prefill_gating_and_drift():
    """``act_int8_rows`` with rank-1 int4 weights: above the row threshold
    the dot runs s8 x s4 -> s32 (per-row activation scales + both rank-1
    weight factors outside the dot); below it — every decode step — the
    path must be BIT-IDENTICAL to the drift-free w4a16-rank1 form."""
    from probing_rag_tpu.models.gemma import init_params, quantize_lm_params

    cfg = CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    r1 = quantize_lm_params(params, bits=4, group_size=16,
                            int4_scheme="rank1")
    tokens = jnp.asarray(
        np.random.default_rng(7).integers(0, cfg.vocab_size, (2, 16)),
        jnp.int32)  # 32 activation rows

    w4a16, _, _ = forward(r1, tokens, cfg)  # act_int8_rows=0: disabled
    gated_off, _, _ = forward(
        r1, tokens, dataclasses.replace(cfg, act_int8_rows=64))
    np.testing.assert_array_equal(np.asarray(gated_off), np.asarray(w4a16))

    a8, _, _ = forward(r1, tokens, dataclasses.replace(cfg, act_int8_rows=1))
    a8, w4a16 = np.asarray(a8), np.asarray(w4a16)
    assert not np.array_equal(a8, w4a16)  # the s8 x s4 path actually ran
    ref = np.asarray(forward(params, tokens, cfg)[0])
    spread = ref.std()
    # activation rounding adds drift on top of the (already larger) int4
    # weight rounding; both must stay in the int4 drift family
    assert np.sqrt(((a8 - w4a16) ** 2).mean()) < 0.15 * spread
    assert np.sqrt(((a8 - ref) ** 2).mean()) < 0.7 * spread


@pytest.mark.slow
def test_int4_rank1_decode_loop_runs_with_int8_kv():
    """The rank-1 int4 matmul must trace inside the decode while_loop with
    the int8 KV cache (the int4 speed serving stack) and keep the int4
    weights un-dequantized in the carry."""
    from probing_rag_tpu.models.decode import StopTables, decode_greedy
    from probing_rag_tpu.models.gemma import (
        CaptureSpec, init_params, quantize_lm_params)

    cfg = CFG
    params = quantize_lm_params(
        init_params(cfg, jax.random.PRNGKey(0)), bits=4, group_size=16,
        int4_scheme="rank1")
    toks = jnp.asarray(
        np.random.default_rng(0).integers(3, cfg.vocab_size, (2, 12)),
        jnp.int32)
    valid = jnp.ones((2, 12), bool)
    stop = StopTables.disabled(cfg.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    out = decode_greedy(
        params, toks, valid, zeros, zeros, zeros,
        cfg=cfg, capture=CaptureSpec.for_probing(cfg),
        max_new_tokens=6, eos_id=-1, kv_int8=True)
    assert out[0].shape == (2, 6)
    assert np.all(np.asarray(out[0]) >= 0)


@pytest.mark.slow
def test_int4_quantization_mistral_untied_head():
    from probing_rag_tpu.models.gemma import init_params, quantize_lm_params

    cfg = _mistral_tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    q4 = quantize_lm_params(params, bits=4, group_size=16)
    assert q4["lm_head"]["qp"].dtype == jnp.uint8
    assert q4["lm_head"]["gs"].shape[0] == params["lm_head"].shape[0] // 16
    tokens = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    ref, _, _ = forward(params, tokens, cfg)
    got, _, _ = forward(q4, tokens, cfg)
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.sqrt(((got - ref) ** 2).mean()) < 0.6 * ref.std()


@pytest.mark.slow
def test_int4_decode_loop_runs_with_int8_kv():
    """The grouped-int4 matmul must trace inside the decode while_loop with
    the int8 KV cache (the full serving quantization stack) and keep the
    int4 weights un-dequantized in the carry (no shape blow-up)."""
    from probing_rag_tpu.models.decode import StopTables, decode_greedy
    from probing_rag_tpu.models.gemma import (
        CaptureSpec, init_params, quantize_lm_params)

    cfg = CFG
    params = quantize_lm_params(
        init_params(cfg, jax.random.PRNGKey(0)), bits=4, group_size=16)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(3, cfg.vocab_size, (2, 12)), jnp.int32)
    valid = jnp.ones((2, 12), bool)
    stop = StopTables.disabled(cfg.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    out = decode_greedy(
        params, toks, valid, zeros, zeros, zeros,
        cfg=cfg, capture=CaptureSpec.for_probing(cfg),
        max_new_tokens=6, eos_id=-1, kv_int8=True)
    assert out[0].shape == (2, 6)
    assert np.all(np.asarray(out[0]) >= 0)
