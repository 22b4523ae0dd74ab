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
