from probing_rag_tpu.eval.metrics import (
    EmF1Metric,
    SupportEmF1Metric,
    compute_exact,
    compute_f1,
    normalize_answer,
)
from probing_rag_tpu.eval.evaluator import evaluate_predictions, extract_answer

__all__ = [
    "EmF1Metric",
    "SupportEmF1Metric",
    "compute_exact",
    "compute_f1",
    "normalize_answer",
    "evaluate_predictions",
    "extract_answer",
]
