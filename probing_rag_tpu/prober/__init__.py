from probing_rag_tpu.prober.model import (
    improved_probe_forward,
    init_improved_probe,
    init_linear_probe,
    linear_probe_forward,
)
from probing_rag_tpu.prober.gate import gate_decision, prober_ensemble_logits
from probing_rag_tpu.prober.train import ProberTrainConfig, train_probers

__all__ = [
    "ProberTrainConfig",
    "gate_decision",
    "improved_probe_forward",
    "init_improved_probe",
    "init_linear_probe",
    "linear_probe_forward",
    "prober_ensemble_logits",
    "train_probers",
]
