"""Analysis-suite tests (C21/C22 equivalents)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.eval.analysis import (
    PUBLISHED,
    confusion_matrix,
    consistency_with_direct_qa,
    inverse_weighted_average,
    pearson_correlation,
    prober_offline_eval,
    retrieval_step_distribution,
)
from probing_rag_tpu.models.gemma import GemmaConfig, init_params
from probing_rag_tpu.models.tokenizer import ByteTokenizer
from probing_rag_tpu.prober.train import (
    ProberExample,
    ProberTrainConfig,
    init_prober_stack,
    train_probers,
)

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)


def test_confusion_matrix():
    m = confusion_matrix([0, 0, 1, 1], [0, 1, 1, 1])
    np.testing.assert_array_equal(m, [[1, 1], [0, 2]])


def test_retrieval_step_distribution():
    d = retrieval_step_distribution([0, 0, 1, 2, 3])
    assert d["no_retrieval_pct"] == 40.0
    assert d["single_pct"] == 20.0
    assert d["multi_pct"] == 40.0
    assert d["total_calls"] == 6


def test_pearson_correlation():
    assert abs(pearson_correlation([1, 2, 3], [2, 4, 6]) - 1.0) < 1e-9
    assert abs(pearson_correlation([1, 2, 3], [3, 2, 1]) + 1.0) < 1e-9


def test_inverse_weighted_average_favors_hard_datasets():
    rows = {"a": [10.0, 1.0], "b": [20.0, 2.0]}
    out = inverse_weighted_average(rows)
    assert out["b"] > out["a"]
    # hard dataset (col mean 1.5) gets 10x the weight of the easy one (15)
    assert abs(out["a"] - (10 * (1 / 15) + 1 * (1 / 1.5)) / (1 / 15 + 1 / 1.5)) < 1e-9


def test_consistency_with_direct_qa():
    assert abs(consistency_with_direct_qa([1, 1, 0, 1], [1, 0, 1, 1]) - 200 / 3) < 1e-9


def test_published_tables_shape():
    for table in PUBLISHED.values():
        for row in table.values():
            assert len(row) == 6  # six datasets


@pytest.mark.slow
def test_prober_offline_eval_on_trained_probers():
    lm = init_params(CFG, jax.random.PRNGKey(0))
    tok = ByteTokenizer(CFG.vocab_size)
    pos = [ProberExample("q alpha", "yes yes yes", 1) for _ in range(16)]
    neg = [ProberExample("q beta", "no no no no", 0) for _ in range(16)]
    examples = [x for pair in zip(pos, neg) for x in pair]
    tc = ProberTrainConfig(
        layers=CFG.probe_layers, positions=("resid_post",), epochs=2,
        batch_size=8, max_len=32, lr=3e-3,
    )
    stacked, _ = train_probers(lm, CFG, tok, examples, (), tc)
    res = prober_offline_eval(lm, CFG, tok, examples, stacked, tc, collect_logits=True)
    assert res.n_examples == len(examples)
    assert res.logits.shape == (len(examples), len(tc.sites), 2)
    # note: offline eval pools by SUM (inference parity) while training pools
    # by mean — constant-length examples keep these proportional, so the
    # trained probers should still separate the classes
    assert res.site_accuracy.max() > 0.7


@pytest.mark.slow
def test_figure_rendering_and_report(tmp_path):
    """C22 figure suite on fixture data: KDE projection, layer x position
    heatmap, and the assembled markdown report."""
    pytest.importorskip("matplotlib")
    import json

    from probing_rag_tpu.eval.figures import (
        assemble_report,
        kde_projection_figure,
        layer_position_heatmap,
    )

    rng = np.random.default_rng(0)
    # two shifted populations so the KDE has structure
    logits = rng.normal(size=(80, 6, 2))
    logits[:, :, 1] += 1.5
    p1 = kde_projection_figure(logits, tmp_path / "kde.png")
    assert p1.exists() and p1.stat().st_size > 1000

    acc = {
        "resid_mid(ep=2)": [0.662, 0.692, 0.708, 0.706, 0.682, 0.668],
        "resid_post(ep=2)": [0.692, 0.7, 0.718, 0.71, 0.674, 0.688],
    }
    p2 = layer_position_heatmap(acc, [6, 8, 10, 12, 14, 16], tmp_path / "hm.png")
    assert p2.exists() and p2.stat().st_size > 1000

    runs = [
        {"retr_method": "probing", "dataset": "nq", "accuracy": 0.355,
         "em": 21.2, "f1": 30.0, "elapsed_s": 10.0,
         "retr_counts": [0, 0, 1, 2, 0, 3]},
    ]
    report = assemble_report(
        runs, tmp_path / "report", kde_logits=logits,
        site_accuracy=acc, layers=[6, 8, 10, 12, 14, 16],
    )
    text = report.read_text()
    assert "Published comparison" in text
    assert "kde_projection.png" in text and "layer_accuracy_heatmap.png" in text
    assert (report.parent / "kde_projection.png").exists()
    assert (report.parent / "layer_accuracy_heatmap.png").exists()
    # step distribution rendered from the manifest's retr_counts
    assert "/" in text.split("probing | nq")[1].split("|")[4]
