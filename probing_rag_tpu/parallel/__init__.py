from probing_rag_tpu.parallel.mesh import lm_param_shardings, make_mesh
from probing_rag_tpu.parallel.sharded_bm25 import ShardedBM25Engine
from probing_rag_tpu.parallel.sharded_dense import sharded_dense_topk
from probing_rag_tpu.parallel.sharded_ivf import ShardedIVFEngine

__all__ = [
    "ShardedBM25Engine",
    "ShardedIVFEngine",
    "lm_param_shardings",
    "make_mesh",
    "sharded_dense_topk",
]
