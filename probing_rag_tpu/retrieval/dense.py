"""Dense flat index: build (batched encoder), persist, and search.

Replaces the reference's sentence-transformers + faiss flat-L2 pipeline
(make_indexer.py:446-457 build; utils.py:374-380 / exp_rag.py:246-248 search)
with a device-resident embedding matrix searched by the tiled matmul +
running top-k op (ops/dense_topk.py). Default metric ``l2`` for
faiss-IndexFlatL2 parity; ``ip`` available.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from probing_rag_tpu.ops.dense_topk import matmul_topk


@dataclass
class DenseSearchResult:
    doc_indices: np.ndarray  # [Q, k]
    scores: np.ndarray  # [Q, k] (L2: ascending distances; IP: descending)


class DenseIndex:
    def __init__(self, embeddings: np.ndarray, metric: str = "l2"):
        self.embeddings = np.asarray(embeddings, np.float32)
        self.metric = metric

    @property
    def n_docs(self) -> int:
        return self.embeddings.shape[0]

    @classmethod
    def build(
        cls,
        texts: Sequence[str],
        encode_fn: Callable[[Sequence[str]], np.ndarray],
        batch_size: int = 512,  # make_indexer.py:446-455 encodes in 512s
        metric: str = "l2",
    ) -> "DenseIndex":
        chunks = []
        for start in range(0, len(texts), batch_size):
            chunks.append(np.asarray(encode_fn(texts[start : start + batch_size])))
        return cls(np.concatenate(chunks, axis=0), metric)

    def save(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.save(path.with_suffix(".npy"), self.embeddings)
        path.with_suffix(".json").write_text(
            json.dumps({"metric": self.metric, "n_docs": self.n_docs,
                        "dim": int(self.embeddings.shape[1])})
        )

    @classmethod
    def load(cls, path: Path) -> "DenseIndex":
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        return cls(np.load(path.with_suffix(".npy")), meta["metric"])


class DenseEngine:
    """Device-resident dense search over a flat index; queries are encoded by
    ``encode_fn`` (a jitted encoder forward) or passed pre-embedded."""

    def __init__(
        self,
        index: DenseIndex,
        encode_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        device: Optional[jax.Device] = None,
        tile_n: int = 16384,
        store_dtype=jnp.bfloat16,
        use_pallas: Optional[bool] = None,  # default: on TPU backends
        rerank: Optional[bool] = None,  # int8 sweep + exact bf16 refine
        # (faiss IndexRefineFlat design; default ON for int8 stores —
        # restores recall@k to bf16's at ~0.1% extra sweep traffic, for
        # 1.5x the HBM capacity)
    ):
        self.index = index
        self.encode_fn = encode_fn
        self.tile_n = tile_n
        self._int8 = jnp.dtype(store_dtype) == jnp.int8
        self._rerank = self._int8 if rerank is None else (rerank and self._int8)
        self.use_pallas = (
            use_pallas if use_pallas is not None else jax.default_backend() == "tpu"
        )
        if self._int8 and not self.use_pallas:
            raise ValueError(
                "store_dtype=int8 is a pallas-kernel feature; the XLA "
                "fallback path streams bf16/f32 stores only"
            )
        emb = jnp.asarray(
            index.embeddings, jnp.float32 if self._int8 else store_dtype
        )
        self._emb = jax.device_put(emb, device) if device is not None else emb
        self._scales = None
        if self.use_pallas:
            # pad + norms (+ int8 quantization) once at construction: doing
            # it per call re-reads and re-writes the full store (3x the
            # kernel's HBM traffic)
            from probing_rag_tpu.ops.pallas_dense import prepare_dense_store

            self._pallas_tile_n = min(4096, max(128, index.n_docs))
            self._emb, self._sqn, self._scales, _ = prepare_dense_store(
                self._emb, tile_n=self._pallas_tile_n, metric=index.metric,
                store_dtype=jnp.int8 if self._int8 else None,
            )
            self._rerank_emb = (
                jnp.asarray(index.embeddings, jnp.bfloat16)
                if self._rerank else None
            )

    def search_embeddings(
        self, query_emb: np.ndarray, k: int = 5, as_numpy: bool = True
    ) -> DenseSearchResult:
        q = jnp.asarray(query_emb, jnp.float32)
        if self.use_pallas:
            from probing_rag_tpu.ops.pallas_dense import (
                dense_topk_pallas, dense_topk_rerank,
            )

            if self._rerank:
                vals, idx = dense_topk_rerank(
                    q, self._emb, self._rerank_emb, k=k,
                    metric=self.index.metric, tile_n=self._pallas_tile_n,
                    sq_norms=self._sqn, scales=self._scales,
                    n_total=self.index.n_docs,
                    k_pad=max(32, k),
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                vals, idx = dense_topk_pallas(
                    q, self._emb, k=k, metric=self.index.metric,
                    tile_n=self._pallas_tile_n,
                    sq_norms=self._sqn, scales=self._scales,
                    n_total=self.index.n_docs,
                    interpret=jax.default_backend() != "tpu",
                )
        else:
            vals, idx = matmul_topk(
                q,
                self._emb,
                k=k,
                metric=self.index.metric,
                tile_n=min(self.tile_n, max(256, self.index.n_docs)),
            )
        if not as_numpy:
            return DenseSearchResult(idx, vals)
        return DenseSearchResult(np.asarray(idx), np.asarray(vals))

    def search(self, queries: Sequence[str], k: int = 5) -> DenseSearchResult:
        if self.encode_fn is None:
            raise ValueError("DenseEngine needs encode_fn to search raw text")
        return self.search_embeddings(np.asarray(self.encode_fn(list(queries))), k=k)
