from probing_rag_tpu.models.gemma import (
    CaptureSpec,
    GemmaConfig,
    forward,
    init_params,
)
from probing_rag_tpu.models.decode import DecodeResult, StopTables, generate

__all__ = [
    "CaptureSpec",
    "DecodeResult",
    "GemmaConfig",
    "StopTables",
    "forward",
    "generate",
    "init_params",
]
