"""Sanitizer CI target (SURVEY.md §5.2): the reference has no race/NaN
tooling; here JAX's functional model makes data races structurally
impossible, and this file pins the two dynamic checks the build plan
promises — jax_debug_nans over the numeric hot paths, and an explicit
interpret-mode sweep of every Pallas kernel."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.gemma import GemmaConfig, forward, init_params


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def test_debug_nans_is_live(debug_nans):
    # the sanitizer itself must trip on an injected NaN
    with pytest.raises((FloatingPointError, ZeroDivisionError)):
        jax.block_until_ready(jnp.log(jnp.zeros(4)) * 0.0 + jnp.asarray(float("nan")))


def test_lm_forward_nan_clean(debug_nans):
    cfg = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    logits, _, caps = forward(params, tokens, cfg)
    jax.block_until_ready(logits)  # debug_nans raises here if any NaN appeared


@pytest.mark.slow
def test_prober_train_step_nan_clean(debug_nans):
    from probing_rag_tpu.prober.train import (
        ProberTrainConfig, init_prober_stack, make_optimizer, prober_train_step,
    )

    cfg = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = ProberTrainConfig(layers=cfg.probe_layers, positions=("resid_post",))
    stack = init_prober_stack(tc, cfg.d_model, jax.random.PRNGKey(1))
    opt = make_optimizer(tc)
    state = opt.init(stack)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16)), jnp.int32
    )
    from probing_rag_tpu.models.gemma import CaptureSpec

    _, _, caps = forward(params, tokens, cfg, capture=CaptureSpec(tc.sites))
    labels = jnp.asarray([0, 1, 0, 1], jnp.int32)
    pred_lens = jnp.full((4,), 4, jnp.int32)
    stack, state, losses = prober_train_step(
        stack, state, caps, labels, pred_lens, jax.random.PRNGKey(2),
        tc=tc, optimizer=opt,
    )
    jax.block_until_ready(losses)
    assert np.isfinite(np.asarray(losses)).all()


@pytest.mark.slow
def test_pallas_kernel_interpret_sweep(debug_nans):
    """Every Pallas kernel executes in interpreter mode with NaN checking on:
    DMA gather, fused search, segment+top-k, dense matmul+top-k."""
    from probing_rag_tpu.ops.pallas_dense import dense_topk_pallas
    from probing_rag_tpu.ops.pallas_sparse import (
        bm25_search_padded_fused, segment_topk_pallas,
    )

    rng = np.random.default_rng(0)
    # sparse fused path (gather + sort + segment + topk)
    offsets = jnp.asarray(np.array([0, 4, 8, 12], np.int32))
    doc = jnp.asarray(np.array([0, 1, 2, 3] * 3, np.int32))
    imp = jnp.asarray(rng.random(12).astype(np.float32))
    qt = jnp.asarray(np.array([[0, 1], [1, 2]], np.int32))
    qm = jnp.ones((2, 2), bool)
    s, d = bm25_search_padded_fused(
        offsets, doc, imp, qt, qm, pad=16, sentinel_doc=4, k=3, interpret=True,
    )
    jax.block_until_ready(s)
    assert (np.asarray(d) >= -1).all()

    # segment kernel standalone
    sd = jnp.asarray(np.sort(rng.integers(0, 5, (2, 16)), axis=-1).astype(np.int32))
    si = jnp.asarray(rng.random((2, 16)).astype(np.float32))
    v, i = segment_topk_pallas(sd, si, k=3, sentinel=5, interpret=True)
    jax.block_until_ready(v)

    # dense kernel
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    dv, di = dense_topk_pallas(q, emb, k=3, interpret=True)
    jax.block_until_ready(dv)
    assert np.isfinite(np.asarray(dv)).all()
