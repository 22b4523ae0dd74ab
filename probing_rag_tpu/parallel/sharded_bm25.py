"""Doc-sharded BM25 over a device mesh with collective top-k merge.

The Wikipedia-scale path (BASELINE.json config 5, SURVEY.md §5.8): postings
are partitioned by doc range into one CSR sub-index per device; every device
scores the full query batch against its shard with the same
gather->sort->segment-sum->top-k op as the single-chip engine
(ops/sparse.py), then a tiny ``all_gather`` (k per shard per query) merges
shard-local top-k into global top-k — collectives ride ICI, never the
posting arrays.

Sharding mechanics: the shard sub-indexes are padded to a common NNZ and
stacked on a leading axis laid out over the flattened mesh axes via
``shard_map``; doc ids stay global so the merge is a pure top-k over the
gathered (score, doc) pairs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probing_rag_tpu.ops.sparse import postings_gather, sorted_segment_topk
from probing_rag_tpu.retrieval.bm25 import BM25SearchResult, _next_pow2
from probing_rag_tpu.retrieval.bm25_index import (
    BM25Index, align_csr, build_bitonic_store,
)


def shard_index_by_docs(index: BM25Index, n_shards: int):
    """Split a CSR index into per-doc-range sub-CSRs (host-side, build time).

    Returns stacked arrays: term_offsets [S, T+1], postings_doc [S, NNZmax]
    (global doc ids), postings_impact [S, NNZmax]; sentinel-padded.
    """
    n_docs = index.n_docs
    bounds = np.linspace(0, n_docs, n_shards + 1).astype(np.int64)
    t = index.n_terms
    per_shard: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    doc = index.postings_doc
    imp = index.postings_impact
    offs = index.term_offsets.astype(np.int64)
    term_lens = offs[1:] - offs[:-1]
    # Postings are doc-sorted within each term, so the composite key
    # (term-major, doc ascending) is GLOBALLY sorted — every (term, doc-bound)
    # cut point is then one vectorized searchsorted over all terms at once
    # (the per-term Python loop was minutes-to-hours at Wikipedia scale).
    stride = np.int64(n_docs) + 1
    term_of_posting = np.repeat(np.arange(t, dtype=np.int64), term_lens)
    key = term_of_posting * stride + doc.astype(np.int64)
    term_base = np.arange(t, dtype=np.int64) * stride
    cuts = np.stack([np.searchsorted(key, term_base + b) for b in bounds])  # [S+1, T]
    for s in range(n_shards):
        starts, ends = cuts[s], cuts[s + 1]
        lens = ends - starts
        new_offs = np.zeros(t + 1, np.int64)
        np.cumsum(lens, out=new_offs[1:])
        nnz = int(new_offs[-1])
        # gather positions: rank within term + source term start
        pos = (
            np.arange(nnz, dtype=np.int64)
            - np.repeat(new_offs[:-1], lens)
            + np.repeat(starts, lens)
        )
        per_shard.append((new_offs, doc[pos], imp[pos]))

    nnz_max = max(1, max(p[1].size for p in per_shard))
    offsets = np.stack([p[0] for p in per_shard]).astype(np.int32)
    docs = np.full((n_shards, nnz_max), n_docs, np.int32)
    imps = np.zeros((n_shards, nnz_max), np.float32)
    for s, (_, d, i) in enumerate(per_shard):
        docs[s, : d.size] = d
        imps[s, : i.size] = i
    return offsets, docs, imps


class ShardedBM25Engine:
    """BM25 search over an index doc-sharded across every device of a mesh.

    ``mode="bitonic"`` (the TPU default) runs the single-dispatch bitonic
    path (ops/pallas_sparse.bm25_search_bitonic) per shard inside shard_map:
    each shard holds its own block-alternated postings store and scores the
    replicated query batch; the k-per-shard all_gather merge is unchanged.
    ``mode="dma"``/``mode="xla"`` keep the legacy per-shard paths."""

    def __init__(self, index: BM25Index, mesh: Mesh, max_pad: int = 1 << 20,
                 use_pallas: Optional[bool] = None, mode: Optional[str] = None,
                 interpret: Optional[bool] = None):
        self.index = index
        self.mesh = mesh
        self.analyzer = index.config.analyzer()
        self.max_pad = max_pad
        if mode is None and use_pallas is not None:
            mode = "dma" if use_pallas else "xla"
        if mode is None:
            mode = "bitonic" if jax.default_backend() == "tpu" else "xla"
        if mode not in ("bitonic", "dma", "xla"):
            raise ValueError(f"unknown sharded BM25 mode {mode!r}")
        self.mode = mode
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        self.use_pallas = mode == "dma"
        self.n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self._axes = tuple(mesh.axis_names)
        if mode == "bitonic":
            self.max_pad = min(max_pad, 1 << 15)  # see BM25Engine
            self._init_bitonic(index, mesh)
            return
        offsets, docs, imps = shard_index_by_docs(index, self.n_shards)
        if self.use_pallas:
            # per-shard aligned CSR for the DMA gather (ops/pallas_sparse.py)
            aligned = [
                align_csr(
                    offsets[s_].astype(np.int64),
                    docs[s_][: int(offsets[s_][-1])],  # drop common-NNZ padding
                    imps[s_][: int(offsets[s_][-1])],
                    sentinel=index.n_docs,
                )
                for s_ in range(self.n_shards)
            ]
            nnz_max = max(a[1].size for a in aligned)
            offsets = np.stack([a[0] for a in aligned])
            docs = np.full((self.n_shards, nnz_max), index.n_docs, np.int32)
            imps = np.zeros((self.n_shards, nnz_max), np.float32)
            for s_, (_, d, i) in enumerate(aligned):
                docs[s_, : d.size] = d
                imps[s_, : i.size] = i
        shard_spec = P(self._axes)  # leading shard axis over all mesh axes
        self._term_offsets = jax.device_put(offsets, NamedSharding(mesh, shard_spec))
        self._postings_doc = jax.device_put(docs, NamedSharding(mesh, shard_spec))
        self._postings_impact = jax.device_put(imps, NamedSharding(mesh, shard_spec))
        # worst-case per-shard posting lengths for tile planning
        self._term_lens = (offsets[:, 1:] - offsets[:, :-1]).max(axis=0).astype(np.int64)

    def _init_bitonic(self, index: BM25Index, mesh: Mesh) -> None:
        offsets, docs, imps = shard_index_by_docs(index, self.n_shards)
        stores = []
        for s in range(self.n_shards):
            nnz_s = int(offsets[s][-1])
            stores.append(build_bitonic_store(
                offsets[s].astype(np.int64), docs[s][:nnz_s], imps[s][:nnz_s],
                sentinel=index.n_docs,
            ))
        self._stores = stores

        def stack(field, fill):
            arrs = [getattr(st, field) for st in stores]
            n = max(1, max(a.size for a in arrs))
            out = np.full((self.n_shards, 1, n), fill, arrs[0].dtype)
            for s, a in enumerate(arrs):
                out[s, 0, : a.size] = a
            return out

        sent = index.n_docs
        shard_spec = P(self._axes)
        put = lambda a: jax.device_put(a, NamedSharding(mesh, shard_spec))
        self._dev_store = tuple(
            put(stack(f, fill))
            for f, fill in (
                ("doc_e", sent), ("imp_e", 0.0), ("doc_o", sent), ("imp_o", 0.0),
                ("doc_c", sent), ("imp_c", 0.0), ("doc_r", sent), ("imp_r", 0.0),
            )
        )
        # per-shard planning tables (host)
        self._a_start = np.stack([st.aligned_start for st in stores])  # [S, T]
        self._a_len = np.stack([st.aligned_len for st in stores])
        self._sh_lens = np.stack(
            [(offsets[s][1:] - offsets[s][:-1]).astype(np.int64)
             for s in range(self.n_shards)]
        )  # [S, T]
        self._sh_offs = offsets[:, :-1].astype(np.int64)  # [S, T]
        self._sh_nnz = offsets[:, -1].astype(np.int64)  # [S]
        self.block = stores[0].block

    def _plan_bitonic_shards(self, term_id_lists: Sequence[np.ndarray]):
        """Per-(shard, query, term) descriptors; each shard trims its own
        overflow (a doc lives in exactly one shard, so per-shard trimming
        keeps that shard's kept-term scores exact)."""
        S = self.n_shards
        block = self.block
        tq = _next_pow2(max((len(i) for i in term_id_lists), default=1) or 1, 8)
        n = len(term_id_lists)
        src = np.zeros((S, n, tq), np.int32)
        srcr = np.zeros((S, n, tq), np.int32)
        slot = np.zeros((S, n, tq), np.int32)
        rlen = np.zeros((S, n, tq), np.int32)
        big = np.zeros((S, n, tq), np.int32)
        max_total = 1
        for r, ids in enumerate(term_id_lists):
            ids = np.asarray(ids, dtype=np.int64)
            if ids.size == 0:
                continue
            for s in range(S):
                lens = self._sh_lens[s][ids]
                keep = lens > 0  # terms absent from this shard take no slot
                kid, klen = ids[keep], lens[keep]
                if kid.size == 0:
                    continue
                isbig = self._a_len[s][kid] > 0
                slots = np.where(isbig, self._a_len[s][kid], block).astype(np.int64)
                if slots.sum() > self.max_pad:
                    order = np.argsort(klen, kind="stable")
                    cut = int(np.searchsorted(np.cumsum(slots[order]), self.max_pad, "right"))
                    sel = np.sort(order[:cut])
                    kid, klen, isbig, slots = kid[sel], klen[sel], isbig[sel], slots[sel]
                m = len(kid)
                starts = self._sh_offs[s][kid]
                src[s, r, :m] = np.where(isbig, self._a_start[s][kid], starts)
                srcr[s, r, :m] = np.where(isbig, 0, self._sh_nnz[s] - starts - klen)
                slot[s, r, :m] = slots
                rlen[s, r, :m] = klen
                big[s, r, :m] = isbig
                max_total = max(max_total, int(slots.sum()))
        return src, srcr, slot, rlen, big, max_total

    @functools.partial(jax.jit, static_argnames=("self", "pad", "k"))
    def _search_bitonic(self, src, srcr, slot, rlen, big, *, pad: int, k: int):
        from probing_rag_tpu.ops.pallas_sparse import bm25_search_bitonic

        sentinel = self.index.n_docs
        axes = self._axes
        block = self.block
        interpret = self.interpret

        def shard_fn(de, ie, do, io, dc, ic, dr, ir, src, srcr, slot, rlen, big):
            scores, idx = bm25_search_bitonic(
                de[0], ie[0], do[0], io[0], dc[0], ic[0], dr[0], ir[0],
                src[0], srcr[0], slot[0], rlen[0], big[0],
                pad=pad, sentinel_doc=sentinel, k=k, block=block,
                interpret=interpret,
            )
            all_scores = jax.lax.all_gather(scores, axes, tiled=False)  # [S,Q,k]
            all_idx = jax.lax.all_gather(idx, axes, tiled=False)
            s, q, _ = all_scores.shape
            flat_s = jnp.transpose(all_scores, (1, 0, 2)).reshape(q, s * k)
            flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, s * k)
            flat_s = jnp.where(flat_i >= 0, flat_s, -jnp.inf)
            top_vals, pos = jax.lax.top_k(flat_s, k)
            top_idx = jnp.take_along_axis(flat_i, pos, axis=-1)
            hit = jnp.isfinite(top_vals)
            return jnp.where(hit, top_vals, 0.0), jnp.where(hit, top_idx, -1)

        ax = P(self._axes)
        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(ax,) * 8 + (ax,) * 5,
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated post-all_gather
        )(*self._dev_store, src, srcr, slot, rlen, big)

    @functools.partial(jax.jit, static_argnames=("self", "pad", "k"))
    def _search(self, qterms, qmask, *, pad: int, k: int):
        sentinel = self.index.n_docs
        axes = self._axes

        use_pallas = self.use_pallas

        def shard_fn(offs, docs, imps, qt, qm):
            if use_pallas:
                from probing_rag_tpu.ops.pallas_sparse import bm25_search_padded_fused

                scores, idx = bm25_search_padded_fused(
                    offs[0], docs[0], imps[0], qt, qm,
                    pad=pad, sentinel_doc=sentinel, k=k,
                    interpret=jax.default_backend() != "tpu", guarded=True,
                )
            else:
                doc, imp = postings_gather(
                    offs[0], docs[0], imps[0], qt, qm, pad, sentinel
                )
                scores, idx = sorted_segment_topk(doc, imp, k, sentinel=sentinel)  # local top-k
            # merge across shards: gather k-per-shard candidates (tiny)
            all_scores = jax.lax.all_gather(scores, axes, tiled=False)  # [S,Q,k]
            all_idx = jax.lax.all_gather(idx, axes, tiled=False)
            s, q, _ = all_scores.shape
            flat_s = jnp.transpose(all_scores, (1, 0, 2)).reshape(q, s * k)
            flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, s * k)
            flat_s = jnp.where(flat_i >= 0, flat_s, -jnp.inf)
            top_vals, pos = jax.lax.top_k(flat_s, k)
            top_idx = jnp.take_along_axis(flat_i, pos, axis=-1)
            hit = jnp.isfinite(top_vals)
            return jnp.where(hit, top_vals, 0.0), jnp.where(hit, top_idx, -1)

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(axes), P(axes), P(axes), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated post-all_gather
        )(self._term_offsets, self._postings_doc, self._postings_impact, qterms, qmask)

    def search(self, queries: Sequence[str], k: int = 5) -> BM25SearchResult:
        term_ids = [
            self.index.encode_query(self.analyzer(q)) for q in queries
        ]
        if self.mode == "bitonic":
            return self.search_term_ids(term_ids, k=k)
        tq = _next_pow2(max((len(i) for i in term_ids), default=1) or 1, 8)
        qterms = np.zeros((len(term_ids), tq), np.int32)
        qmask = np.zeros((len(term_ids), tq), bool)
        max_total = 1
        for row, ids in enumerate(term_ids):
            qterms[row, : len(ids)] = ids
            qmask[row, : len(ids)] = True
            if ids.size:
                max_total = max(max_total, int(self._term_lens[ids].sum()))
        # the Pallas DMA path's Mosaic alignment contract needs pad to be a
        # 1024-multiple (matching BM25Engine's min_pad floor), and the pad
        # bucket must hold max_total within the gather's in-block capacity
        total = min(max_total, self.max_pad)
        if self.use_pallas:
            from probing_rag_tpu.ops.pallas_sparse import gather_capacity

            pad = _next_pow2(total, 1024)
            while gather_capacity(pad) < total:
                pad *= 2
        else:
            pad = _next_pow2(total, 512)
        scores, idx = self._search(
            jnp.asarray(qterms), jnp.asarray(qmask), pad=pad, k=k
        )
        return BM25SearchResult(np.asarray(idx), np.asarray(scores))

    def search_term_ids(
        self, term_id_lists: Sequence[np.ndarray], k: int = 5
    ) -> BM25SearchResult:
        if self.mode != "bitonic":
            raise NotImplementedError("search_term_ids: bitonic mode only")
        src, srcr, slot, rlen, big, max_total = self._plan_bitonic_shards(
            term_id_lists
        )
        pad = _next_pow2(max_total, self.block)
        sharding = NamedSharding(self.mesh, P(self._axes))
        args = tuple(
            jax.device_put(a, sharding) for a in (src, srcr, slot, rlen, big)
        )
        scores, idx = self._search_bitonic(*args, pad=pad, k=k)
        return BM25SearchResult(np.asarray(idx), np.asarray(scores))
