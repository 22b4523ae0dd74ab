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
from probing_rag_tpu.retrieval.bm25 import BM25SearchResult, _next_pow2, trim_to_cap
from probing_rag_tpu.retrieval.bm25_index import (
    BM25Index, align_csr, build_bitonic_store,
)



def _merge_shard_topk(scores, idx, axes, k):
    """k-per-shard all_gather merge -> global top-k (one implementation for
    every sharded search path: bitonic, legacy, and the over-cap fallback).
    Pad slots (idx < 0) mask to -inf; rows with no real hits return 0/-1."""
    import jax
    import jax.numpy as jnp

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
                 interpret: Optional[bool] = None, dedup: bool = True,
                 q_tile: int = 256,
                 narrow_sort_max: Optional[int] = None):
        self.index = index
        self.mesh = mesh
        self.analyzer = index.config.analyzer()
        self.max_pad = max_pad
        self.q_tile = q_tile
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
        # exact weighted-slot dedup, matching BM25Engine (bitonic mode only
        # — keeps sharded-vs-single score comparisons bit-consistent)
        self.dedup = dedup and mode == "bitonic"
        self.n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self._axes = tuple(mesh.axis_names)
        self.last_stats = {"n_queries": 0, "n_fallback": 0, "n_trimmed": 0}
        if mode == "bitonic":
            # see BM25Engine: rows up to 32768 sort on the unrolled network,
            # wider rows up to BITONIC_MAX_PAD (524288) on the while_loop-
            # form wide network; queries over THAT cap (on ANY shard) run
            # the exact XLA fallback per shard
            from probing_rag_tpu.ops.pallas_sparse import (
                BITONIC_MAX_PAD, NARROW_SORT_MAX_PAD,
            )

            self.fallback_max_pad = 1 << 20
            self.max_pad = min(max_pad, BITONIC_MAX_PAD)
            self.narrow_sort_max = (
                narrow_sort_max if narrow_sort_max is not None
                else NARROW_SORT_MAX_PAD
            )
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
        # stacked per-shard CSR offsets for the exact over-cap fallback
        self._dev_sh_offsets = jax.device_put(
            offsets.astype(np.int32), NamedSharding(mesh, P(self._axes))
        )

    def _plan_bitonic_shards(
        self,
        term_id_lists: Sequence[np.ndarray],
        weight_lists: Optional[Sequence[np.ndarray]] = None,
    ):
        """Per-(shard, query, term) descriptors, fully vectorized over the
        stacked [S, T] shard tables — the per-(query x shard) Python double
        loop it replaces cost ~20 us x n_shards per query (35% of single-chip
        throughput at bench scale, multiplied by S here). Terms absent from a
        shard keep their position with slot width 0 (the gather kernel skips
        zero-width slots; destination offsets come from the slot cumsum, so
        holes cost nothing). No trimming: rows whose slot total exceeds
        max_pad on any shard are routed to the exact fallback by the caller.

        Returns (src, srcr, slot, rlen, big) as [S, N, TQ] int32, per-query
        max-over-shards slot totals [N], and the [N, TQ] dedup weight table
        (occurrence counts are shard-independent; 1.0 where absent)."""
        S = self.n_shards
        block = self.block
        n = len(term_id_lists)
        tq = _next_pow2(max((len(i) for i in term_id_lists), default=1) or 1, 8)
        ids = np.zeros((n, tq), np.int64)
        mask = np.zeros((n, tq), bool)
        wt = np.ones((n, tq), np.float32)
        for r, row in enumerate(term_id_lists):
            m = len(row)
            if m:
                ids[r, :m] = row
                mask[r, :m] = True
                if weight_lists is not None:
                    wt[r, :m] = weight_lists[r]

        lens = self._sh_lens[:, ids]  # [S, N, TQ]
        present = mask[None] & (lens > 0)  # absent-from-shard terms: no slot
        alen = self._a_len[:, ids]
        isbig = present & (alen > 0)
        slot = np.where(isbig, alen, np.where(present, block, 0)).astype(np.int64)
        starts = self._sh_offs[:, ids]
        src = np.where(isbig, self._a_start[:, ids], np.where(present, starts, 0))
        srcr = np.where(
            present & ~isbig, self._sh_nnz[:, None, None] - starts - lens, 0
        )
        totals = slot.sum(axis=2).max(axis=0)  # [N] worst shard per query
        return (
            src.astype(np.int32),
            srcr.astype(np.int32),
            slot.astype(np.int32),
            np.where(present, lens, 0).astype(np.int32),
            isbig.astype(np.int32),
            totals,
            wt,
        )

    @functools.partial(jax.jit, static_argnames=("self", "pad", "k"))
    def _search_bitonic(
        self, src, srcr, slot, rlen, big, wtblk=None, *, pad: int, k: int
    ):
        from probing_rag_tpu.ops.pallas_sparse import bm25_search_bitonic

        sentinel = self.index.n_docs
        axes = self._axes
        block = self.block
        interpret = self.interpret
        narrow_sort_max = self.narrow_sort_max

        def shard_fn(de, ie, do, io, dc, ic, dr, ir, src, srcr, slot, rlen, big,
                     *wt):
            scores, idx = bm25_search_bitonic(
                de[0], ie[0], do[0], io[0], dc[0], ic[0], dr[0], ir[0],
                src[0], srcr[0], slot[0], rlen[0], big[0],
                wt[0][0] if wt else None,
                pad=pad, sentinel_doc=sentinel, k=k, block=block,
                interpret=interpret, narrow_sort_max=narrow_sort_max,
            )
            return _merge_shard_topk(scores, idx, axes, k)

        ax = P(self._axes)
        extra = () if wtblk is None else (wtblk,)
        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(ax,) * 8 + (ax,) * (5 + len(extra)),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated post-all_gather
        )(*self._dev_store, src, srcr, slot, rlen, big, *extra)

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
                scores, idx = sorted_segment_topk(
                    doc, imp, k, sentinel=sentinel,
                    max_run=int(qt.shape[1]),  # a doc matches <= TQ terms
                )  # local top-k
            # merge across shards: gather k-per-shard candidates (tiny)
            return _merge_shard_topk(scores, idx, axes, k)

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
        # over-cap queries keep their most selective terms under the cap
        # (the same GLOBAL trim as BM25Engine._plan — global term lens give
        # every shard the same kept set, so cross-shard scores stay
        # comparable; without it each shard's gather truncates mid-term at
        # a different cut and the merge compares inconsistent subsets)
        kept = []
        for ids in term_ids:
            ids, _, _, trimmed = trim_to_cap(
                self._term_lens, np.asarray(ids, np.int32), self.max_pad
            )
            if trimmed:
                self.last_stats["n_trimmed"] += 1
            kept.append(ids)
        term_ids = kept
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

    @functools.partial(
        jax.jit, static_argnames=("self", "pad_big", "pad_short", "k")
    )
    def _search_fallback_sharded(
        self, bstarts, blens, qterms, qmask, s_src, s_rlen,
        big_wtblk=None, qw_short=None,
        *, pad_big: int, pad_short: int, k: int
    ):
        """Exact per-shard scoring for over-cap queries, hybrid-gathered
        like the single-chip path (retrieval/bm25.py::_search_fallback):
        each shard runs the same ``_hybrid_gather_sort`` program over its
        own E/O/compact stores (parity-selected DMA big terms + folded,
        preconditioned short tail + pass-skipping wide sort), then the
        Pallas run-reduction and the k-per-shard all_gather merge. The
        big/short split
        is PER SHARD (a term's df differs per shard); zero-width descriptor
        slots are skipped by both gathers, so no compaction is needed.
        Every shard scores the SAME term set (the planner trims globally,
        if at all), so cross-shard scores stay comparable."""
        sentinel = self.index.n_docs
        axes = self._axes
        doc_e, imp_e = self._dev_store[0], self._dev_store[1]
        doc_o, imp_o = self._dev_store[2], self._dev_store[3]
        doc_c, imp_c = self._dev_store[4], self._dev_store[5]
        interpret = self.interpret

        block = self.block

        def shard_fn(de, ie, do, io, offs, docs, imps, bs, bl, qt, qm,
                     ss, sr, *wts):
            from probing_rag_tpu.ops.pallas_sparse import segment_topk_pallas
            from probing_rag_tpu.retrieval.bm25 import (
                _fallback_gather_sort, _hybrid_gather_sort,
            )

            # optional dedup weights ride at the tail: (big_wtblk?, qw_short?)
            wts = list(wts)
            bw = wts.pop(0)[0] if big_wtblk is not None else None
            qw = wts.pop(0)[0] if qw_short is not None else None
            if pad_big:
                doc, imp = _hybrid_gather_sort(
                    de[0], ie[0], do[0], io[0], bs[0], bl[0],
                    offs[0], docs[0], imps[0], qt[0], qm[0], bw, qw,
                    ss[0], sr[0],
                    pad_big=pad_big, pad_short=pad_short,
                    sentinel_doc=sentinel, block=block, interpret=interpret,
                )
            else:
                doc, imp = _fallback_gather_sort(
                    offs[0], docs[0], imps[0], qt[0], qm[0], qw,
                    ss[0], sr[0],
                    pad=pad_short, sentinel_doc=sentinel, interpret=interpret,
                )
            scores, idx = segment_topk_pallas(
                doc, imp, k=k, sentinel=sentinel, interpret=interpret,
            )
            return _merge_shard_topk(scores, idx, axes, k)

        ax = P(self._axes)
        extra = tuple(a for a in (big_wtblk, qw_short) if a is not None)
        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(ax,) * 7 + (ax,) * (6 + len(extra)),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated post-all_gather
        )(doc_e, imp_e, doc_o, imp_o, self._dev_sh_offsets, doc_c, imp_c,
          bstarts, blens, qterms, qmask, s_src, s_rlen, *extra)

    def search_term_ids(
        self, term_id_lists: Sequence[np.ndarray], k: int = 5
    ) -> BM25SearchResult:
        if self.mode != "bitonic":
            raise NotImplementedError("search_term_ids: bitonic mode only")
        weights = None
        if self.dedup:
            from probing_rag_tpu.retrieval.bm25 import _dedup_term_ids

            term_id_lists, weights, _ = _dedup_term_ids(term_id_lists)
        src, srcr, slot, rlen, big, totals, wt = self._plan_bitonic_shards(
            term_id_lists, weights
        )
        n = len(term_id_lists)
        over = np.nonzero(totals > self.max_pad)[0]
        over_set = set(over.tolist())
        self.last_stats = {
            "n_queries": n, "n_fallback": len(over), "n_trimmed": 0,
        }
        out_docs = np.full((n, k), -1, np.int32)
        out_scores = np.zeros((n, k), np.float32)

        # pow2 (pad, Qb) buckets, mirroring the single-chip stream search:
        # light queries must not pay the heaviest query's sort width
        sharding = NamedSharding(self.mesh, P(self._axes))
        buckets: dict = {}
        for i in range(n):
            if i in over_set:
                continue
            buckets.setdefault(
                _next_pow2(max(int(totals[i]), 1), self.block), []
            ).append(i)
        for pad, rows in sorted(buckets.items()):
            for start in range(0, len(rows), 1024):
                chunk = rows[start : start + 1024]
                qb = _next_pow2(len(chunk), 8)
                sel = np.asarray(chunk + [chunk[-1]] * (qb - len(chunk)))
                args = tuple(
                    jax.device_put(a[:, sel], sharding)
                    for a in (src, srcr, slot, rlen, big)
                )
                wtblk = None
                # ALWAYS-weighted when dedup is on (identity weights for
                # dup-free rows), matching BM25Engine: a data-gated variant
                # made the compiled program set depend on which chunk a
                # duplicated query landed in, so shuffled streams compiled
                # mid-pass
                if self.dedup:
                    from probing_rag_tpu.retrieval.bm25 import _weight_blocks

                    S = self.n_shards
                    # per-shard maps: slot widths differ per shard, the
                    # weight (occurrence count) does not
                    wtblk = jax.device_put(
                        _weight_blocks(
                            slot[:, sel].reshape(S * qb, -1),
                            np.broadcast_to(
                                wt[sel][None], (S, qb, wt.shape[1])
                            ).reshape(S * qb, -1),
                            pad, self.block,
                        ).reshape(S, qb, pad // self.block),
                        sharding,
                    )
                scores, idx = self._search_bitonic(
                    *args, wtblk, pad=pad, k=k
                )
                out_docs[chunk] = np.asarray(idx)[: len(chunk)]
                out_scores[chunk] = np.asarray(scores)[: len(chunk)]

        if len(over):
            self._fallback_into(
                term_id_lists, over, k, out_docs, out_scores,
                weight_lists=weights,
            )
        return BM25SearchResult(out_docs, out_scores)

    def _fallback_into(self, term_id_lists, over, k, out_docs, out_scores,
                       weight_lists=None):
        """Score over-cap queries exactly (or, beyond fallback_max_pad, with
        a GLOBALLY consistent most-selective term subset — the same kept set
        on every shard, so the merge compares like with like). Descriptors
        are per-shard [S, Qb, TQ]: the hybrid big/short split follows each
        shard's own aligned table."""
        from probing_rag_tpu.ops.pallas_sparse import gather_capacity

        # worst-shard compact posting total per term governs the trim
        worst_lens = self._sh_lens.max(axis=0)  # [T]
        kept: List[np.ndarray] = []
        kept_w: List[np.ndarray] = []
        for i in over:
            ids = np.asarray(term_id_lists[i], dtype=np.int64)
            w = (
                np.asarray(weight_lists[i], np.float32)
                if weight_lists is not None
                else np.ones(ids.size, np.float32)
            )
            ids, w, _, trimmed = trim_to_cap(
                worst_lens, ids, self.fallback_max_pad, w
            )
            if trimmed:
                self.last_stats["n_trimmed"] += 1
            kept.append(ids)
            kept_w.append(w)
        # static program choice (matches BM25Engine._search_fallback): dedup
        # mode always runs the weighted programs with identity weights for
        # dup-free rows, so the variant set never depends on query contents
        any_wt = self.dedup

        S = self.n_shards
        r_count = len(kept)
        tq_all = _next_pow2(max((len(i) for i in kept), default=1) or 1, 8)
        ids_pad = np.zeros((r_count, tq_all), np.int64)
        mask = np.zeros((r_count, tq_all), bool)
        wtab = np.ones((r_count, tq_all), np.float32)
        for r, ids in enumerate(kept):
            ids_pad[r, : len(ids)] = ids
            mask[r, : len(ids)] = True
            wtab[r, : len(ids)] = kept_w[r]

        lens = self._sh_lens[:, ids_pad]  # [S, R, TQ]
        present = mask[None] & (lens > 0)
        isbig = present & (self._a_len[:, ids_pad] > 0)
        short = present & ~isbig
        # per-QUERY pad requirements (worst shard): light over-cap queries
        # must not pay the heaviest query's gather+sort width, and one
        # unbucketed dispatch at the batch max (qb x pad_big x 8B of gather
        # output alone) OOMs on wide streams — mirror the single-chip
        # engine's (pad_big, pad_short) buckets + q_tile chunks
        bt_q = np.where(isbig, self._a_len[:, ids_pad], 0).sum(2).max(0)
        st_q = np.where(short, lens, 0).sum(2).max(0)

        def pads_for(btot: int, stot: int):
            # 2*block short floor when big terms exist: keeps the fold seam
            # on an even block boundary so the sort-network pass skip stays
            # valid; pad_big additionally reserves DMA chunk capacity and a
            # pad_short-wide tail for the short-part fold
            ps = _next_pow2(
                max(stot, 1), 2 * self.block if btot else 512
            )
            if not btot:
                return 0, ps
            pb = _next_pow2(btot, 1024)
            while gather_capacity(pb) < btot or pb - ps < btot:
                pb *= 2
            return pb, ps

        buckets: dict = {}
        for r in range(r_count):
            buckets.setdefault(
                pads_for(int(bt_q[r]), int(st_q[r])), []
            ).append(r)

        sharding = NamedSharding(self.mesh, P(self._axes))
        over_arr = np.asarray(over)
        for (pad_big, pad_short), rows in sorted(buckets.items()):
            tq = _next_pow2(
                max((len(kept[r]) for r in rows), default=1) or 1, 8
            )
            for start in range(0, len(rows), self.q_tile):
                chunk = rows[start : start + self.q_tile]
                qb = _next_pow2(len(chunk), 8)
                csel = np.asarray(chunk)
                c_big = isbig[:, csel, :tq]
                c_short = short[:, csel, :tq]
                c_ids = ids_pad[csel, :tq]
                c_lens = lens[:, csel, :tq]

                bstarts = np.zeros((S, qb, tq), np.int32)
                blens = np.zeros((S, qb, tq), np.int32)
                qt = np.zeros((S, qb, tq), np.int32)
                qm = np.zeros((S, qb, tq), bool)
                # per-shard compact descriptors for the VMEM assembly gather
                s_src = np.zeros((S, qb, tq), np.int32)
                s_rlen = np.zeros((S, qb, tq), np.int32)
                nc = len(chunk)
                bstarts[:, :nc] = np.where(c_big, self._a_start[:, c_ids], 0)
                blens[:, :nc] = np.where(c_big, self._a_len[:, c_ids], 0)
                qt[:, :nc] = np.where(c_short, c_ids[None], 0)
                qm[:, :nc] = c_short
                s_src[:, :nc] = np.where(c_short, self._sh_offs[:, c_ids], 0)
                s_rlen[:, :nc] = np.where(c_short, c_lens, 0)

                args = tuple(
                    jax.device_put(a, sharding)
                    for a in (bstarts, blens, qt, qm, s_src, s_rlen)
                )
                big_wtblk = qw_short = None
                if any_wt:
                    from probing_rag_tpu.retrieval.bm25 import _weight_blocks

                    c_wt = wtab[csel, :tq]
                    qw = np.ones((S, qb, tq), np.float32)
                    qw[:, :nc] = np.where(c_short, c_wt[None], 1.0)
                    qw_short = jax.device_put(qw, sharding)
                    if pad_big:
                        bw = np.ones((S, qb, tq), np.float32)
                        bw[:, :nc] = np.where(c_big, c_wt[None], 1.0)
                        big_wtblk = jax.device_put(
                            _weight_blocks(
                                blens.reshape(S * qb, tq),
                                bw.reshape(S * qb, tq),
                                pad_big, self.block,
                            ).reshape(S, qb, pad_big // self.block),
                            sharding,
                        )
                scores, idx = self._search_fallback_sharded(
                    *args, big_wtblk, qw_short,
                    pad_big=pad_big, pad_short=pad_short, k=k
                )
                out_docs[over_arr[csel]] = np.asarray(idx)[:nc]
                out_scores[over_arr[csel]] = np.asarray(scores)[:nc]
