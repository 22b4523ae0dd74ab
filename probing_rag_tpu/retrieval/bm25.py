"""BM25 search engine: host analysis + device sparse scoring.

Replaces ``BM25Retriever.retrieve(query)`` (exp_rag.py:426-428) with a
batched, jitted TPU path. Queries are analyzed host-side (the same chain as
index build), padded into term-id tiles, and scored by
``ops.sparse.bm25_search_padded``. Shapes are bucketed (powers of two) so a
stream of differently-sized queries hits a handful of compiled variants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probing_rag_tpu.ops.sparse import bm25_search_padded
from probing_rag_tpu.retrieval.bm25_index import BM25Index


def _next_pow2(n: int, floor: int) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


@dataclass
class BM25SearchResult:
    doc_indices: np.ndarray  # [Q, k] int32, -1 for empty slots
    scores: np.ndarray  # [Q, k] f32


class BM25Engine:
    """Device-resident BM25 index + batched search.

    ``max_pad`` caps the padded posting tile per query; queries whose terms
    match more postings than the cap are scored with their most selective
    (shortest posting list) terms first — with stopword removal this path is
    effectively never taken on the eval corpora, and the cap is configurable.
    """

    def __init__(
        self,
        index: BM25Index,
        device: Optional[jax.Device] = None,
        max_pad: int = 1 << 20,
        min_pad: int = 512,
        min_tq: int = 8,
    ):
        if index.nnz >= 2**31:
            raise ValueError(
                "single-shard postings exceed int32 indexing; shard the index "
                "(probing_rag_tpu.parallel.sharded_bm25)"
            )
        self.index = index
        self.analyzer = index.config.analyzer()
        self.max_pad = max_pad
        self.min_pad = min_pad
        self.min_tq = min_tq
        put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
        self._term_offsets = put(index.term_offsets.astype(np.int32))
        self._postings_doc = put(index.postings_doc)
        self._postings_impact = put(index.postings_impact)
        # host copies for planning (posting lengths per term)
        self._term_lens = (index.term_offsets[1:] - index.term_offsets[:-1]).astype(np.int64)

    # ------------------------------------------------------------ planning
    def _plan(self, term_id_lists: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray, int]:
        """Pad query term ids and pick the bucketed posting tile width."""
        kept: List[np.ndarray] = []
        for ids in term_id_lists:
            ids = np.asarray(ids, dtype=np.int32)
            total = int(self._term_lens[ids].sum()) if ids.size else 0
            if total > self.max_pad:
                # Keep the most selective terms under the cap.
                order = np.argsort(self._term_lens[ids], kind="stable")
                lens_sorted = self._term_lens[ids[order]]
                keep = int(np.searchsorted(np.cumsum(lens_sorted), self.max_pad, side="right"))
                ids = ids[np.sort(order[:keep])]
            kept.append(ids)

        tq = _next_pow2(max((len(i) for i in kept), default=1) or 1, self.min_tq)
        qterms = np.zeros((len(kept), tq), dtype=np.int32)
        qmask = np.zeros((len(kept), tq), dtype=bool)
        for row, ids in enumerate(kept):
            qterms[row, : len(ids)] = ids
            qmask[row, : len(ids)] = True
        max_total = max(
            (int(self._term_lens[ids].sum()) for ids in kept if ids.size), default=0
        )
        pad = _next_pow2(max(max_total, 1), self.min_pad)
        return qterms, qmask, pad

    # -------------------------------------------------------------- search
    def search_term_ids(self, term_id_lists: Sequence[np.ndarray], k: int = 5) -> BM25SearchResult:
        qterms, qmask, pad = self._plan(term_id_lists)
        scores, docs = bm25_search_padded(
            self._term_offsets,
            self._postings_doc,
            self._postings_impact,
            jnp.asarray(qterms),
            jnp.asarray(qmask),
            pad=pad,
            sentinel_doc=self.index.n_docs,
            k=k,
        )
        return BM25SearchResult(np.asarray(docs), np.asarray(scores))

    def search(self, queries: Sequence[str], k: int = 5) -> BM25SearchResult:
        term_ids = [self.index.encode_query(self.analyzer(q)) for q in queries]
        return self.search_term_ids(term_ids, k=k)

    def retrieve(self, query: str, k: int = 5) -> List[int]:
        """Top-k doc row indices for one query (the exp_rag.py:426 call shape)."""
        result = self.search([query], k=k)
        return [int(d) for d in result.doc_indices[0] if d >= 0]
