"""Prober model/loss/pooling/gate tests, including parity of the
double-softmax loss and the sum-vs-mean pooling asymmetry (SURVEY.md §7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.gemma import GemmaConfig, init_params
from probing_rag_tpu.models.tokenizer import ByteTokenizer
from probing_rag_tpu.prober.gate import gate_decision
from probing_rag_tpu.prober.model import (
    improved_probe_forward,
    init_improved_probe,
    probe_param_count,
)
from probing_rag_tpu.prober.train import (
    ProberExample,
    ProberTrainConfig,
    pool_mean_answer_tokens,
    pool_sum_answer_tokens,
    probe_loss,
    train_probers,
)

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)


def test_probe_param_count_matches_reference():
    # 1,318,914 params at d_model=2048 (exp_parameter_check.py:48-54)
    params = init_improved_probe(jax.random.PRNGKey(0), 2048)
    assert probe_param_count(params) == 1_318_914


def test_probe_forward_shape_and_determinism():
    params = init_improved_probe(jax.random.PRNGKey(0), 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 64))
    out1 = improved_probe_forward(params, x)
    out2 = improved_probe_forward(params, x)
    assert out1.shape == (5, 2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # dropout changes outputs
    out3 = improved_probe_forward(params, x, dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_double_softmax_loss_differs_from_standard():
    logits = jnp.asarray([[2.0, -1.0], [0.5, 0.7]])
    labels = jnp.asarray([0, 1])
    l_double = probe_loss(logits, labels, double_softmax=True)
    l_std = probe_loss(logits, labels, double_softmax=False)
    assert not np.isclose(float(l_double), float(l_std))
    # double softmax still decreases as the right class dominates
    better = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
    assert float(probe_loss(better, labels, True)) < float(l_double)


def test_pooling_mean_vs_sum():
    acts = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
    pred_lens = jnp.asarray([3])
    mean = pool_mean_answer_tokens(acts, pred_lens)
    summed = pool_sum_answer_tokens(acts, pred_lens)
    np.testing.assert_allclose(np.asarray(summed), np.asarray(mean) * 3)
    expected_mean = np.asarray(acts[0, 3:]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(mean[0]), expected_mean)


@pytest.mark.slow
def test_gate_decision_threshold_semantics():
    # Construct probers whose output is controlled via the input:
    # use real probers but check the decision rule holds on their scores.
    stack = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[init_improved_probe(jax.random.PRNGKey(i), 8) for i in range(3)],
    )
    pooled = jax.random.normal(jax.random.PRNGKey(9), (3, 4, 8))
    retrieve, scores = gate_decision(stack, pooled, threshold=0.0)
    expected_stop = np.asarray(scores[:, 0]) < np.asarray(scores[:, 1])
    np.testing.assert_array_equal(np.asarray(~retrieve), expected_stop)
    # a huge threshold forces retrieval everywhere (S0 + big >= S1)
    retrieve_hi, _ = gate_decision(stack, pooled, threshold=1e6)
    assert np.asarray(retrieve_hi).all()
    # a hugely negative threshold forces stop everywhere
    retrieve_lo, _ = gate_decision(stack, pooled, threshold=-1e6)
    assert not np.asarray(retrieve_lo).any()


@pytest.mark.slow
def test_gate_ablation_drops_probers():
    stack = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[init_improved_probe(jax.random.PRNGKey(i), 8) for i in range(4)],
    )
    pooled = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 8))
    _, s_all = gate_decision(stack, pooled, ablation=0)
    _, s_abl = gate_decision(stack, pooled, ablation=2)
    assert np.asarray(s_all).max() <= 4.0 + 1e-5
    assert np.asarray(s_abl).max() <= 2.0 + 1e-5


@pytest.mark.slow
def test_train_probers_learns_separable_labels():
    """End-to-end: frozen tiny LM + vmapped prober training on a dataset
    whose label is decodable from the text (distinct token patterns)."""
    lm = init_params(CFG, jax.random.PRNGKey(0))
    tok = ByteTokenizer(CFG.vocab_size)
    pos = [ProberExample("question alpha", "yes yes yes yes", 1) for _ in range(24)]
    neg = [ProberExample("question beta", "no no no no no", 0) for _ in range(24)]
    examples = [x for pair in zip(pos, neg) for x in pair]
    tc = ProberTrainConfig(
        layers=CFG.probe_layers,
        positions=("resid_post",),
        epochs=2,
        batch_size=8,
        max_len=64,
        lr=3e-3,
    )
    stacked, history = train_probers(lm, CFG, tok, examples, examples[:16], tc)
    assert history, "no training happened"
    dev_acc = [h["dev_acc"] for h in history if "dev_acc" in h][-1]
    assert max(dev_acc) > 0.9, f"probers failed to fit separable data: {dev_acc}"


@pytest.mark.slow
def test_probe_loss_bce_branch_matches_torch():
    """1-logit probers take the reference's sigmoid+BCE branch
    (utils.py:132-137); parity against torch.nn.BCELoss."""
    import torch

    from probing_rag_tpu.prober.train import probe_loss

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 1)).astype(np.float32)
    labels = rng.integers(0, 2, 16)
    ours = float(probe_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = torch.nn.BCELoss()(
        torch.sigmoid(torch.tensor(logits).squeeze()),
        torch.tensor(labels, dtype=torch.float32),
    ).item()
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_probe_loss_bce_branch_with_weights():
    from probing_rag_tpu.prober.train import probe_loss

    logits = jnp.asarray([[2.0], [-2.0], [50.0]])
    labels = jnp.asarray([1, 0, 0])
    w = jnp.asarray([1.0, 1.0, 0.0])  # masked row can't poison the mean
    loss = float(probe_loss(logits, labels, weights=w))
    assert np.isfinite(loss) and loss < 0.2


@pytest.mark.slow
def test_one_logit_probe_trains():
    """A 1-logit ImprovedProbe (output_size=1) flows through init + loss."""
    from probing_rag_tpu.prober.model import improved_probe_forward, init_improved_probe
    from probing_rag_tpu.prober.train import probe_loss

    probe = init_improved_probe(jax.random.PRNGKey(0), 32, output_size=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    labels = jnp.asarray([0, 1] * 4)

    def loss_fn(p):
        return probe_loss(improved_probe_forward(p, x), labels)

    l0 = loss_fn(probe)
    grads = jax.grad(loss_fn)(probe)
    probe2 = jax.tree.map(lambda p, g: p - 0.1 * g, probe, grads)
    assert float(loss_fn(probe2)) < float(l0)
