"""Metric parity tests against SQuAD reference values and the reference
implementation's quirks (SURVEY.md §4 'unit' strategy)."""

from probing_rag_tpu.eval.metrics import (
    EmF1Metric,
    SupportEmF1Metric,
    compute_exact,
    compute_f1,
    normalize_answer,
)


def test_normalize_answer():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("A man; an apple") == "man apple"
    assert normalize_answer("1969 to 1974") == "1969 to 1974"
    # article removal happens after punctuation removal in the reference:
    # "the." -> "the" -> removed
    assert normalize_answer("the.") == ""


def test_compute_exact():
    assert compute_exact("The Beatles", "beatles!") == 1
    assert compute_exact("Paris", "London") == 0


def test_compute_f1_squad_reference_values():
    assert compute_f1("Paris", "Paris") == 1.0
    assert compute_f1("New York City", "York City New") == 1.0  # bag-of-words
    assert abs(compute_f1("w x y z", "y z u v") - 0.5) < 1e-9
    assert compute_f1("", "") == 1.0  # both no-answer agree
    assert compute_f1("x", "") == 0.0
    assert compute_f1("a b", "c d") == 0.0


def test_emf1_accumulator():
    m = EmF1Metric()
    m("Paris", ["Paris", "City of Paris"])
    m("wrong", ["right"])
    out = m.get_metric()
    assert out == {"em": 0.5, "f1": 0.5, "count": 2}
    # reference tolerates list-wrapped preds and tuple-wrapped golds
    m2 = EmF1Metric()
    m2(["Paris"], [("Paris", "paris")])
    assert m2.get_metric()["em"] == 1.0


def test_emf1_max_over_golds():
    m = EmF1Metric()
    m("the answer", ["something else", "answer"])
    assert m.get_metric()["em"] == 1.0


def test_support_metric_answer_strings():
    # The multihop path feeds single answer strings through the support metric
    # (exp_rag.py:259-264): title and para views must coincide.
    m = SupportEmF1Metric()
    m(["winner"], ["winner"])
    m(["loser"], ["winner"])
    out = m.get_metric()
    assert out["title_em"] == 0.5
    assert out["para_em"] == 0.5
    assert out["title_f1"] == 0.5
    assert out["count"] == 2


def test_support_metric_whitespace_case_insensitive():
    m = SupportEmF1Metric()
    m(["The  Answer"], ["theanswer"])
    assert m.get_metric()["title_em"] == 1.0


def test_support_metric_pid_format():
    m = SupportEmF1Metric()
    m(["pid1___TitleA___p0"], ["pid1___TitleA___p0", "pid2___TitleB___p0"])
    out = m.get_metric()
    assert out["title_em"] == 0.0
    assert out["title_recall"] == 0.5
    assert out["title_precision"] == 1.0


def test_support_metric_empty_sets():
    m = SupportEmF1Metric()
    m([], [])
    out = m.get_metric()
    assert out["title_em"] == 1.0 and out["title_f1"] == 1.0
