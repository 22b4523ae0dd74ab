from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index
from probing_rag_tpu.retrieval.bm25 import BM25Engine
from probing_rag_tpu.retrieval.dense import DenseEngine, DenseIndex
from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, IVFEngine
from probing_rag_tpu.retrieval.text import Analyzer

__all__ = [
    "Analyzer",
    "BM25Config",
    "BM25Engine",
    "BM25Index",
    "DenseEngine",
    "DenseIndex",
    "IVFDenseIndex",
    "IVFEngine",
]
