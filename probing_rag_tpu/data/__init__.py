from probing_rag_tpu.data import prompts
from probing_rag_tpu.data.qa import load_qa_dataset, preprocess_multihop_answers

__all__ = ["prompts", "load_qa_dataset", "preprocess_multihop_answers"]
