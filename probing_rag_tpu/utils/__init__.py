from probing_rag_tpu.utils.checkpoint import load_pytree, save_pytree
from probing_rag_tpu.utils.logging import JsonlWriter, get_logger

__all__ = ["JsonlWriter", "get_logger", "load_pytree", "save_pytree"]
