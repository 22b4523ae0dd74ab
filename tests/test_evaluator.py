from probing_rag_tpu.data import prompts
from probing_rag_tpu.eval.evaluator import (
    answer_line,
    evaluate_predictions,
    extract_answer,
)
from probing_rag_tpu.eval.metrics import EmF1Metric, SupportEmF1Metric


def _fake_generation(question, rationale, answer):
    """A prompt+generation round trip as the decode loop would produce it."""
    prompt = prompts.cot_prompt(question)
    return prompt + f" {rationale}\nAnswer: {answer}<eos>"


def test_extract_answer_cot_roundtrip():
    gen = _fake_generation("Who is X?", "X is clearly Y.", "Y")
    block, train_block = extract_answer(gen, is_cot=True)
    assert "Y" in block
    assert "Who is X?" not in block  # question line dropped
    assert "Answer:" not in block
    assert "<eos>" not in block
    assert train_block.startswith("Rationale:")
    # raw line keeps the space left by stripping "Answer:"; normalization
    # downstream removes it (parity with utils.py:411,427)
    assert answer_line(block).strip() == "Y"


def test_extract_answer_noncot():
    text = "para0\n\npara1\n\nsome question\nAnswer: Z\n\nrest"
    block, _ = extract_answer(text, is_cot=False)
    assert block == "some question\n Z"


def test_extract_answer_freeform_methods():
    text = "The capital is Paris. Answer: Paris\n\nmore stuff"
    block, _ = extract_answer(text, is_cot=True, retr_method="dragin")
    assert "paris" in block
    assert "more stuff" not in block


def test_evaluate_predictions_accuracy_and_em():
    gens = [
        _fake_generation("q1", "reasoning", "George Washington"),
        _fake_generation("q2", "reasoning", "wrong answer"),
    ]
    answers = [["George Washington"], ["Right Answer"]]
    acc, metric, to_train = evaluate_predictions(
        gens, answers, EmF1Metric(), dataset_name="nq", is_cot=True
    )
    assert acc == [1, 0]
    out = metric.get_metric()
    assert out["em"] == 0.5
    assert len(to_train) == 2


def test_evaluate_predictions_multihop_uses_support_metric():
    gens = [_fake_generation("q", "because", "WINNER")]
    acc, metric, _ = evaluate_predictions(
        gens, [["WINNER"]], SupportEmF1Metric(), dataset_name="hotpotqa", is_cot=True
    )
    assert acc == [1]
    assert metric.get_metric()["title_em"] == 1.0


def test_accuracy_is_substring_on_whole_block():
    # gold appears in the rationale but not the answer line -> acc counts it
    gens = [_fake_generation("q", "the answer Paris is here", "London")]
    acc, _, _ = evaluate_predictions(
        gens, [["Paris"]], EmF1Metric(), dataset_name="nq", is_cot=True
    )
    assert acc == [1]


class _RaisingMetric:
    """Raises on a chosen answer line (simulates the reference's per-example
    metric exceptions, utils.py:431-436)."""

    def __init__(self, poison: str):
        self.poison = poison
        self.n = 0

    def __call__(self, pred, golds):
        if self.poison in pred:
            raise ValueError("poisoned")
        self.n += 1


def test_evaluate_predictions_stays_aligned_on_metric_failure():
    gens = [
        _fake_generation("q1", "reasoning", "George Washington"),
        _fake_generation("q2", "reasoning", "BOOM"),
        _fake_generation("q3", "reasoning", "Abraham Lincoln"),
    ]
    answers = [["George Washington"], ["BOOM"], ["Abraham Lincoln"]]
    metric = _RaisingMetric("boom")
    acc, metric, to_train = evaluate_predictions(
        gens, answers, metric, dataset_name="nq", is_cot=True
    )
    # a skipped example holds its slot (None) instead of shifting later rows
    assert acc == [1, None, 1]
    assert len(to_train) == 3
    assert metric.n == 2
