"""BM25 search engine: host analysis + device sparse scoring.

Replaces ``BM25Retriever.retrieve(query)`` (exp_rag.py:426-428) with a
batched, jitted TPU path. Queries are analyzed host-side (the same chain as
index build) and planned into per-(query, term) descriptor tiles; shapes
are bucketed (powers of two) so a stream of differently-sized queries hits
a handful of compiled variants.

Engine modes (``BM25Engine(mode=...)``):
- ``"bitonic"`` (TPU default): the single-dispatch Pallas path over the
  block-alternated postings store — DMA/roll gather producing pre-sorted
  1024-blocks, pass-skipping in-VMEM bitonic sort, fused run-reduction +
  top-k. 26.7k queries/s/chip end-to-end on v5e (PARITY.md).
- ``"dma"``: legacy aligned-CSR DMA gather + XLA sort + Pallas segment.
- ``"xla"`` (CPU default): pure-XLA gather/sort/scan reference path.
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



def trim_to_cap(lens: np.ndarray, ids: np.ndarray, cap: int, weights=None):
    """Keep the most selective (shortest-postings) terms whose posting
    total fits under ``cap``, preserving query order. ONE implementation
    for every trim site in both engines (single-chip plan/stream/mega and
    the sharded fallback): the rule — and any future change to it — must
    stay identical everywhere or sharded and single-chip engines diverge
    on over-cap queries. Returns ``(ids, weights, total, trimmed)``."""
    total = int(lens[ids].sum()) if len(ids) else 0
    if total <= cap:
        return ids, weights, total, False
    order = np.argsort(lens[ids], kind="stable")
    keep = int(np.searchsorted(np.cumsum(lens[ids[order]]), cap, side="right"))
    sel = np.sort(order[:keep])
    ids = ids[sel]
    w = weights[sel] if weights is not None else None
    return ids, w, int(lens[ids].sum()), True

def _next_pow4(n: int, floor: int) -> int:
    p = floor
    while p < n:
        p *= 4
    return p


def _dedup_term_ids(term_id_lists: Sequence[np.ndarray]):
    """Collapse repeated term ids into (unique ids, occurrence counts).

    rank_bm25 scores a query term once PER OCCURRENCE (exp_rag.py:426 passes
    the raw token list), so a term repeated m times contributes m x impact
    per doc — expressed exactly as weight m on a single planned slot. Long
    adaptive-RAG retrieval queries (the full prompt + generation string,
    exp_rag.py:425-428) repeat common words heavily; deduping shrinks their
    slot totals, sort widths, and over-cap fallbacks together.

    Returns (unique_lists, weight_lists [f32] | None, any_dup); weights are
    None when no query had a repeated term (the caller's identity case).

    Vectorized over the padded [N, TQ] id matrix (row sort + neighbor
    compare + run-length scatter): a per-query ``np.unique`` loop measured
    0.12 s per 8k-query pass — ~25% of end-to-end BM25 throughput at the
    bench point, the same per-query-Python trap the descriptor planner
    vectorized away."""
    n = len(term_id_lists)
    lens = np.fromiter((len(x) for x in term_id_lists), np.int64, count=n)
    tq = int(lens.max()) if n else 0
    if tq == 0:
        return list(term_id_lists), None, False
    mask = lens[:, None] > np.arange(tq)
    flat = (
        np.concatenate([np.asarray(x, np.int64).ravel() for x in term_id_lists])
        if int(lens.sum())
        else np.zeros(0, np.int64)
    )
    ids = np.zeros((n, tq), np.int64)
    ids[mask] = flat  # boolean scatter fills in C order == concat order

    sentinel = np.int64(np.iinfo(np.int64).max)
    skey = np.sort(np.where(mask, ids, sentinel), axis=1)
    valid = skey != sentinel
    is_first = valid.copy()
    is_first[:, 1:] &= skey[:, 1:] != skey[:, :-1]
    if not bool((valid & ~is_first).any()):
        return list(term_id_lists), None, False

    # left-pack each row's run heads; weight = run length (occurrences)
    dest = np.cumsum(is_first, axis=1) - 1  # every elem -> its run head's col
    cnt = is_first.sum(axis=1)
    tq2 = int(cnt.max())
    rows = np.repeat(np.arange(n), tq)
    f, v = is_first.ravel(), valid.ravel()
    uniq_ids = np.zeros((n, tq2), np.int64)
    uniq_ids[rows[f], dest.ravel()[f]] = skey.ravel()[f]
    wt = np.zeros((n, tq2), np.float32)
    np.add.at(wt, (rows[v], dest.ravel()[v]), 1.0)
    uniq = [uniq_ids[r, : cnt[r]] for r in range(n)]
    weights = [wt[r, : cnt[r]] for r in range(n)]
    return uniq, weights, True


def _weight_blocks(
    slot_rows: np.ndarray,  # [R, TQ] int: per-term slot widths (block-aligned)
    wt_rows: np.ndarray,  # [R, TQ] f32: per-term weights
    pad: int,
    block: int,
) -> np.ndarray:
    """Expand per-term weights into the [R, pad // block] per-1024-block map
    the weighted kernels consume: block b of row r carries the weight of the
    term whose slot covers it (tail blocks: 1.0). Vectorized (np.repeat +
    flat scatter) — no per-query Python, matching the planner discipline."""
    nblk = pad // block
    reps = (slot_rows // block).astype(np.int64)  # [R, TQ] blocks per term
    lengths = reps.sum(axis=1)  # [R] blocks used
    out = np.ones((slot_rows.shape[0], nblk), np.float32)
    flat_w = np.repeat(wt_rows.ravel(), reps.ravel())
    if flat_w.size:
        rowi = np.repeat(np.arange(slot_rows.shape[0]), lengths)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        coli = np.arange(flat_w.size) - np.repeat(starts, lengths)
        out[rowi, coli] = flat_w
    return out


@dataclass
class BM25SearchResult:
    """Top-k per query.

    With ``as_numpy=False`` the top-level ``doc_indices``/``scores`` are only
    the LAST device chunk (bucket/chunk order, padded rows included) — use
    ``parts`` (the full list of per-chunk (scores, docs) device arrays) for
    benchmark folding; the top-level fields are not per-query results in that
    mode."""

    doc_indices: np.ndarray  # [Q, k] int32, -1 for empty slots
    scores: np.ndarray  # [Q, k] f32
    parts: Optional[list] = None  # device-resident per-bucket results (as_numpy=False)


class BM25Engine:
    """Device-resident BM25 index + batched search.

    ``max_pad`` caps the padded posting tile per query. In bitonic mode the
    cap is further clamped to 32768 (unrolled sort-network compile time);
    queries whose block-aligned slot total exceeds it are routed to the exact
    XLA fallback path over the compact postings copy (already device-resident
    in the bitonic store) — no terms are dropped up to ``fallback_max_pad``
    (1M postings). Beyond that, queries keep their most selective terms and
    the trim is counted in ``last_stats``.
    """

    def __init__(
        self,
        index: BM25Index,
        device: Optional[jax.Device] = None,
        max_pad: int = 1 << 20,
        min_pad: int = 512,
        min_tq: int = 8,
        q_tile: int = 256,
        use_pallas: Optional[bool] = None,  # legacy knob: True=dma, False=xla
        mode: Optional[str] = None,  # "bitonic" | "dma" | "xla" (None = auto)
        interpret: Optional[bool] = None,
        dedup: bool = True,  # bitonic mode: collapse repeated query terms
        narrow_sort_max: Optional[int] = None,  # tests: force the wide sort
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
        self.q_tile = q_tile
        if mode is None and use_pallas is not None:
            mode = "dma" if use_pallas else "xla"
        if mode is None:
            mode = "bitonic" if jax.default_backend() == "tpu" else "xla"
        if mode not in ("bitonic", "dma", "xla"):
            raise ValueError(f"unknown BM25 engine mode {mode!r}")
        self.mode = mode
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
        # exact term dedup (weighted slots) lives on the bitonic paths; the
        # legacy dma/xla paths keep one gathered slice per occurrence
        self.dedup = dedup and self.mode == "bitonic"
        self.last_stats = {"n_queries": 0, "n_fallback": 0, "n_trimmed": 0}
        if mode == "bitonic":
            # row width bound: rows up to 32768 sort on the unrolled
            # network (compile time grows with P — 74s at 32768, measured);
            # wider rows up to BITONIC_MAX_PAD (524288) sort on the
            # while_loop-form wide network inside the same fused dispatch
            # (compact compile — 512K in 69 s). Queries over THAT cap run
            # the exact XLA fallback over the compact copy (doc_c), whose
            # tile cap is independent of the bitonic row cap.
            from probing_rag_tpu.ops.pallas_sparse import (
                BITONIC_MAX_PAD, NARROW_SORT_MAX_PAD,
            )

            self.fallback_max_pad = 1 << 20
            self.max_pad = min(max_pad, BITONIC_MAX_PAD)
            self.narrow_sort_max = (
                narrow_sort_max if narrow_sort_max is not None
                else NARROW_SORT_MAX_PAD
            )
            store = index.bitonic_csr()
            self._store = store
            self._dev_offsets = put(index.term_offsets.astype(np.int32))
            # 2-D (1, N) layout: the gather kernel's DMA rules (see
            # ops/pallas_sparse.py::bm25_search_bitonic)
            self._dev_store = tuple(
                put(a.reshape(1, -1))
                for a in (
                    store.doc_e, store.imp_e, store.doc_o, store.imp_o,
                    store.doc_c, store.imp_c, store.doc_r, store.imp_r,
                )
            )
            self._term_lens = (
                index.term_offsets[1:] - index.term_offsets[:-1]
            ).astype(np.int64)
            self._compact_offsets = index.term_offsets[:-1].astype(np.int64)
            self.use_pallas = False  # legacy paths unused in this mode
            self._capacity = lambda pad: pad
            return
        self.use_pallas = mode == "dma"
        if self.use_pallas:
            # aligned CSR: the DMA gather kernel needs tile-aligned slice
            # offsets (bm25_index.aligned_csr); padding entries are inert.
            # Tiny-posting corpora would blow up under 1024-alignment — fall
            # back to the split-XLA path there (random-gather cost is small
            # at that scale anyway).
            offsets, doc, imp = index.aligned_csr()
            if doc.size > max(4 * index.nnz, index.nnz + (4 << 20)):
                self.use_pallas = False
        if self.use_pallas:
            from probing_rag_tpu.ops.pallas_sparse import gather_capacity

            self.min_pad = max(self.min_pad, 1024)
            # compiled DMA path: a pad bucket's usable posting capacity is
            # slightly below pad (in-block copy slack; ops/pallas_sparse.py)
            self._capacity = gather_capacity
            self._term_offsets = put(offsets)
            self._postings_doc = put(doc)
            self._postings_impact = put(imp)
            self._term_lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        else:
            self._capacity = lambda pad: pad
            self._term_offsets = put(index.term_offsets.astype(np.int32))
            self._postings_doc = put(index.postings_doc)
            self._postings_impact = put(index.postings_impact)
            # host copies for planning (posting lengths per term)
            self._term_lens = (index.term_offsets[1:] - index.term_offsets[:-1]).astype(np.int64)

    def _bucket_pad(self, total: int, base: int = 2) -> int:
        """Smallest power-of-``base`` pad whose gather capacity holds
        ``total`` postings."""
        pad = (_next_pow2 if base == 2 else _next_pow4)(max(total, 1), self.min_pad)
        while self._capacity(pad) < total:
            pad *= base
        return pad

    # ------------------------------------------------------------ planning
    def _plan(self, term_id_lists: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray, int]:
        """Pad query term ids and pick the bucketed posting tile width."""
        kept: List[np.ndarray] = []
        for ids in term_id_lists:
            ids = np.asarray(ids, dtype=np.int32)
            ids, _, _, _ = trim_to_cap(self._term_lens, ids, self.max_pad)
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
        return qterms, qmask, self._bucket_pad(max_total)

    # --------------------------------------------------- plan-compiled path
    def default_plan(self, batch_size: int = 2048):
        """Static (pad, capacity) bucket plan for mega-batch search: one
        compiled program scores a whole batch across every bucket in ONE
        dispatch. Capacities are fractions of the batch with slack; queries
        overflowing a bucket escalate to a larger pad (more padding, same
        answer)."""
        caps = [1 / 4, 1 / 4, 1 / 2, 1 / 2, 1 / 4]
        pads = []
        pad = max(self.min_pad, 1024)
        while pad < self.max_pad and len(pads) < len(caps):
            pads.append(pad)
            pad *= 4
        pads.append(min(pad, self.max_pad))
        frac = caps[: len(pads)]
        return tuple(
            (p, max(64, int(batch_size * f))) for p, f in zip(pads, frac)
        )

    def search_mega_batch(
        self, term_id_lists: Sequence[np.ndarray], k: int = 5,
        plan=None, as_numpy: bool = True,
    ) -> BM25SearchResult:
        """Whole-batch search in a handful of dispatches: bucket searches
        are grouped into combined jitted programs, so environments with high
        per-dispatch cost (RPC-attached accelerators) pay it a few times per
        batch instead of once per bucket. Note: memory-constrained compile
        services may fail to build the combined programs (the per-bucket
        ``search_term_ids`` path is the safe default)."""
        if self.mode == "bitonic":
            return self._search_bitonic(term_id_lists, k, as_numpy=as_numpy)
        plan = plan or self.default_plan(len(term_id_lists))
        kept = []
        for ids in term_id_lists:
            ids = np.asarray(ids, dtype=np.int32)
            ids, _, total, _ = trim_to_cap(self._term_lens, ids, self.max_pad)
            kept.append((ids, total))

        tq = _next_pow2(max((len(i) for i, _ in kept), default=1) or 1, self.min_tq)
        # assign each query the smallest bucket with room; escalate when full
        slots_left = [cap for _, cap in plan]
        assign: List[List[int]] = [[] for _ in plan]
        overflow: List[int] = []
        for i, (ids, total) in enumerate(kept):
            placed = False
            for b, (pad, _) in enumerate(plan):
                if total <= self._capacity(pad) and slots_left[b] > 0:
                    assign[b].append(i)
                    slots_left[b] -= 1
                    placed = True
                    break
            if not placed:
                overflow.append(i)

        qterms_list, qmask_list = [], []
        for b, (pad, cap) in enumerate(plan):
            qt = np.zeros((cap, tq), np.int32)
            qm = np.zeros((cap, tq), bool)
            for row, i in enumerate(assign[b]):
                ids = kept[i][0]
                qt[row, : len(ids)] = ids
                qm[row, : len(ids)] = True
            qterms_list.append(jnp.asarray(qt))
            qmask_list.append(jnp.asarray(qm))

        # group buckets into programs of <= buckets_per_dispatch: one giant
        # program OOMs constrained compile environments; small groups keep
        # dispatch count low AND programs compilable
        bpd = 2
        outs = []
        pads = [p for p, _ in plan]
        for g in range(0, len(plan), bpd):
            outs.extend(
                _mega_search(
                    self._term_offsets, self._postings_doc, self._postings_impact,
                    tuple(qterms_list[g : g + bpd]), tuple(qmask_list[g : g + bpd]),
                    plan=tuple(pads[g : g + bpd]), sentinel_doc=self.index.n_docs,
                    k=k, use_pallas=self.use_pallas,
                    interpret=jax.default_backend() != "tpu",
                )
            )
        if not as_numpy:
            if overflow:
                # parts-only results have nowhere to carry extra dispatches;
                # silently skipping the unplaced queries would fold into a
                # throughput number that never scored them
                raise ValueError(
                    f"search_mega_batch(as_numpy=False): {len(overflow)} "
                    f"queries fit no plan bucket; provide a plan with room"
                )
            return BM25SearchResult(
                outs[-1][1], outs[-1][0],
                parts=[(s, d) for s, d in outs],
            )
        n = len(term_id_lists)
        out_docs = np.full((n, k), -1, np.int32)
        out_scores = np.zeros((n, k), np.float32)
        for b, rows in enumerate(assign):
            if not rows:
                continue
            s, d = np.asarray(outs[b][0]), np.asarray(outs[b][1])
            out_docs[rows] = d[: len(rows)]
            out_scores[rows] = s[: len(rows)]
        if overflow:  # plan exhausted: score the remainder bucketed
            res = self.search_term_ids([term_id_lists[i] for i in overflow], k=k)
            out_docs[overflow] = res.doc_indices
            out_scores[overflow] = res.scores
        return BM25SearchResult(out_docs, out_scores)

    # ---------------------------------------------------- bitonic planning
    def _plan_bitonic(
        self,
        term_id_lists: Sequence[np.ndarray],
        weight_lists: Optional[Sequence[np.ndarray]] = None,
    ):
        """Per-(query, term) descriptors for bm25_search_bitonic: slot width
        (aligned len for long terms, one block for short), source offset
        (E/O store | compact), reversed-compact offset, real length,
        long-term flag. Rows whose slot total exceeds max_pad are returned
        untrimmed — the caller routes them to the exact fallback path.
        ``weight_lists`` (dedup occurrence counts) ride along as a
        [N, TQ] f32 table (1.0 where absent).

        Fully vectorized over the [N, TQ] id matrix: a per-query Python
        loop costs ~20 us/query — 35% of end-to-end throughput at the bench
        scale (measured)."""
        st = self._store
        block = st.block
        a_start, a_len = st.aligned_start, st.aligned_len
        n = len(term_id_lists)
        # pow2 tq so a stream of differently-sized queries compiles a bounded
        # set of (pad, Qb, TQ) kernel variants
        tq = _next_pow2(
            max((len(i) for i in term_id_lists), default=1) or 1, self.min_tq
        )
        ids = np.zeros((n, tq), np.int64)
        mask = np.zeros((n, tq), bool)
        wt = np.ones((n, tq), np.float32)
        for r, row in enumerate(term_id_lists):  # ragged -> padded (cheap)
            m = len(row)
            if m:
                ids[r, :m] = row
                mask[r, :m] = True
                if weight_lists is not None:
                    wt[r, :m] = weight_lists[r]

        lens = np.where(mask, self._term_lens[ids], 0)
        alens = np.where(mask, a_len[ids], 0)
        isbig = alens > 0
        slot = np.where(isbig, alens, np.where(mask, block, 0)).astype(np.int64)
        totals = slot.sum(axis=1)

        starts = np.where(mask, self._compact_offsets[ids], 0)
        src = np.where(isbig, a_start[ids], starts).astype(np.int32)
        srcr = np.where(isbig | ~mask, 0, st.nnz - starts - lens).astype(np.int32)
        return (
            src,
            srcr,
            slot.astype(np.int32),
            lens.astype(np.int32),
            isbig.astype(np.int32),
            totals,
            wt,
        )

    def _search_bitonic(
        self, term_id_lists: Sequence[np.ndarray], k: int, as_numpy: bool = True
    ) -> BM25SearchResult:
        """Stream search on the bitonic path: pow2 row-width buckets, one
        fused gather->sort->segment-top-k dispatch per (pad, Qb) tile.
        Queries whose slot total exceeds the 32768-row cap run the exact XLA
        fallback over the compact copy (``_search_fallback``)."""
        from probing_rag_tpu.ops.pallas_sparse import bm25_search_bitonic

        st = self._store
        weights = None
        if self.dedup:
            term_id_lists, weights, _ = _dedup_term_ids(term_id_lists)
        src, srcr, slot, rlen, big, totals, wt = self._plan_bitonic(
            term_id_lists, weights
        )
        n = len(term_id_lists)
        over = set(np.nonzero(totals > self.max_pad)[0].tolist())
        self.last_stats = {
            "n_queries": n, "n_fallback": len(over), "n_trimmed": 0,
        }
        buckets: dict = {}
        for i in range(n):
            if i in over:
                continue
            pad = _next_pow2(max(int(totals[i]), 1), st.block)
            buckets.setdefault(pad, []).append(i)

        out_docs = np.full((n, k), -1, np.int32)
        out_scores = np.zeros((n, k), np.float32)
        parts = []
        max_elems = 1 << 28
        for pad, rows_b in sorted(buckets.items()):
            cap = 64
            while cap * 2 * pad <= max_elems:
                cap *= 2
            start = 0
            while start < len(rows_b):
                remaining = len(rows_b) - start
                if remaining >= 1024:
                    qb = 1024
                    while qb * 2 <= remaining:
                        qb *= 2
                    qb = min(cap, qb)
                else:
                    qb = min(cap, _next_pow2(remaining, 64))
                chunk_rows = rows_b[start : start + qb]
                start += qb
                pad_rows = qb - len(chunk_rows)
                sel = np.asarray(chunk_rows + [chunk_rows[-1]] * pad_rows)
                wtblk = None
                if self.dedup:
                    # ALWAYS-weighted when dedup is on (identity weights for
                    # dup-free rows): gating the weighted variant on data
                    # content made the compiled program set depend on WHICH
                    # chunk a duplicated query landed in — a shuffled stream
                    # hit uncompiled variants mid-pass (measured 19.3k ->
                    # 1.6k q/s). The multiply fuses into the row-tail
                    # masking pass; its cost is unmeasurable.
                    wtblk = jnp.asarray(
                        _weight_blocks(slot[sel], wt[sel], pad, st.block)
                    )
                scores, docs = bm25_search_bitonic(
                    *self._dev_store,
                    jnp.asarray(src[sel]), jnp.asarray(srcr[sel]),
                    jnp.asarray(slot[sel]), jnp.asarray(rlen[sel]),
                    jnp.asarray(big[sel]), wtblk,
                    pad=pad, sentinel_doc=self.index.n_docs, k=k,
                    block=st.block, interpret=self.interpret,
                    narrow_sort_max=self.narrow_sort_max,
                )
                if as_numpy:
                    s = np.asarray(scores)
                    d = np.asarray(docs)
                    out_docs[chunk_rows] = d[: len(chunk_rows)]
                    out_scores[chunk_rows] = s[: len(chunk_rows)]
                else:
                    parts.append((scores, docs))
        if over:
            over_rows = sorted(over)
            fb = self._search_fallback(
                [term_id_lists[i] for i in over_rows], k, as_numpy=as_numpy,
                weight_lists=(
                    [weights[i] for i in over_rows] if weights is not None else None
                ),
            )
            if as_numpy:
                out_docs[over_rows] = fb.doc_indices
                out_scores[over_rows] = fb.scores
            else:
                parts.extend(fb.parts or [])
        if not as_numpy:
            if not parts:
                return BM25SearchResult(
                    np.full((0, k), -1, np.int32), np.zeros((0, k), np.float32)
                )
            return BM25SearchResult(parts[-1][1], parts[-1][0], parts=parts)
        return BM25SearchResult(out_docs, out_scores)

    def _search_fallback(
        self,
        term_id_lists: Sequence[np.ndarray],
        k: int,
        as_numpy: bool = True,
        weight_lists: Optional[Sequence[np.ndarray]] = None,
    ) -> BM25SearchResult:
        """Exact scoring for queries over the bitonic row cap, hybrid-
        gathered: big terms (those with an aligned region in the bitonic
        store) are chunked DMA copies straight from copy E — block order
        inside the row is irrelevant because the row is sorted next — while
        the short tail rides the XLA gather over the compact copy. The DMA
        path moves postings at ~4 ns/element vs ~60-95 for XLA's gather,
        and big terms are ~95% of an over-cap query's posting mass.
        The short tail is folded into the big row's reserved tail slack
        (``_fold_short_tail``) so the row stays pow2-wide, then one in-VMEM
        wide bitonic sort (``_sort_postings_rows``; XLA's variadic sort
        measures ~25 ns/element at these widths) + the Pallas run-reduction
        (the XLA scan segment stage is pathological here — 1,201 s to build
        at [8, 524288], measured). Pad cap ``fallback_max_pad``; only queries
        beyond THAT (1M+ matched postings) keep their most selective terms,
        counted in ``last_stats['n_trimmed']``."""
        from probing_rag_tpu.ops.pallas_sparse import gather_capacity, segment_topk_pallas

        st = self._store
        a_len, a_start = st.aligned_len, st.aligned_start
        # static program choice: dedup mode always runs the weighted
        # fallback programs (identity weights when a row has no dups) so the
        # compiled variant set never depends on query contents
        any_wt = self.dedup
        entries = []
        for qi, ids in enumerate(term_id_lists):
            ids = np.asarray(ids, dtype=np.int64)
            w = (
                np.asarray(weight_lists[qi], np.float32)
                if weight_lists is not None
                else np.ones(ids.size, np.float32)
            )
            ids, w, _, trimmed = trim_to_cap(
                self._term_lens, ids, self.fallback_max_pad, w
            )
            if trimmed:
                self.last_stats["n_trimmed"] += 1
            isbig = a_len[ids] > 0
            big_ids, short_ids = ids[isbig], ids[~isbig]
            entries.append((
                big_ids, short_ids,
                int(a_len[big_ids].sum()), int(self._term_lens[short_ids].sum()),
                w[isbig], w[~isbig],
            ))

        def pad_for_big(total: int, ps: int) -> int:
            # the big row must hold the postings within the DMA capacity
            # AND leave a ``ps``-wide tail for the short-part fold
            # (_fold_short_tail keeps the sorted width pow2)
            if total == 0:
                return 0
            pad = _next_pow2(total, 1024)
            while gather_capacity(pad) < total or pad - ps < total:
                pad *= 2
            return pad

        buckets: dict = {}
        st_block = st.block
        for i, (_, _, bt, stot, _, _) in enumerate(entries):
            # 2*block floor when big terms exist: keeps the fold seam on an
            # even block boundary so the sort-network pass skip stays valid
            # (_hybrid_gather_sort); costs at most one extra block of pad
            ps = _next_pow2(
                max(stot, 1), max(self.min_pad, 2 * st_block) if bt else self.min_pad
            )
            key = (pad_for_big(bt, ps), ps)
            buckets.setdefault(key, []).append(i)

        n = len(term_id_lists)
        out_docs = np.full((n, k), -1, np.int32)
        out_scores = np.zeros((n, k), np.float32)
        parts = []
        sentinel = self.index.n_docs
        doc_e, imp_e = self._dev_store[0], self._dev_store[1]
        doc_o, imp_o = self._dev_store[2], self._dev_store[3]
        doc_c, imp_c = self._dev_store[4], self._dev_store[5]
        for (pad_big, pad_short), rows in sorted(buckets.items()):
            tqb = _next_pow2(
                max((len(entries[i][0]) for i in rows), default=1) or 1, 8
            )
            tqs = _next_pow2(
                max((len(entries[i][1]) for i in rows), default=1) or 1,
                self.min_tq,
            )
            for start in range(0, len(rows), self.q_tile):
                chunk_rows = rows[start : start + self.q_tile]
                qb = _next_pow2(len(chunk_rows), 8)
                bstarts = np.zeros((qb, tqb), np.int32)
                blens = np.zeros((qb, tqb), np.int32)
                qt = np.zeros((qb, tqs), np.int32)
                qm = np.zeros((qb, tqs), bool)
                # compact start/length descriptors for the VMEM assembly
                # gather (short terms are < min_len=256 < 1024 postings by
                # construction — the kernel's per-term bound)
                ssrc = np.zeros((qb, tqs), np.int32)
                srlen = np.zeros((qb, tqs), np.int32)
                bw = np.ones((qb, tqb), np.float32)
                sw = np.ones((qb, tqs), np.float32)
                for row, i in enumerate(chunk_rows):
                    big_ids, short_ids = entries[i][0], entries[i][1]
                    bstarts[row, : len(big_ids)] = a_start[big_ids]
                    blens[row, : len(big_ids)] = a_len[big_ids]
                    qt[row, : len(short_ids)] = short_ids
                    qm[row, : len(short_ids)] = True
                    ssrc[row, : len(short_ids)] = self._compact_offsets[
                        short_ids
                    ]
                    srlen[row, : len(short_ids)] = self._term_lens[short_ids]
                    if any_wt:
                        bw[row, : len(big_ids)] = entries[i][4]
                        sw[row, : len(short_ids)] = entries[i][5]
                short_args = (jnp.asarray(ssrc), jnp.asarray(srlen))
                if pad_big:
                    big_wtblk = qw_short = None
                    if any_wt:
                        big_wtblk = jnp.asarray(
                            _weight_blocks(blens, bw, pad_big, st.block)
                        )
                        qw_short = jnp.asarray(sw)
                    doc, imp = _hybrid_gather_sort(
                        doc_e, imp_e, doc_o, imp_o,
                        jnp.asarray(bstarts), jnp.asarray(blens),
                        self._dev_offsets, doc_c, imp_c,
                        jnp.asarray(qt), jnp.asarray(qm),
                        big_wtblk, qw_short, *short_args,
                        pad_big=pad_big, pad_short=pad_short,
                        sentinel_doc=sentinel, block=st.block,
                        interpret=self.interpret,
                    )
                else:  # no big terms in this bucket
                    doc, imp = _fallback_gather_sort(
                        self._dev_offsets, doc_c, imp_c,
                        jnp.asarray(qt), jnp.asarray(qm),
                        jnp.asarray(sw) if any_wt else None,
                        *short_args,
                        pad=pad_short, sentinel_doc=sentinel,
                        interpret=self.interpret,
                    )
                scores, docs = segment_topk_pallas(
                    doc, imp, k=k, sentinel=sentinel, interpret=self.interpret,
                )
                if as_numpy:
                    out_docs[chunk_rows] = np.asarray(docs)[: len(chunk_rows)]
                    out_scores[chunk_rows] = np.asarray(scores)[: len(chunk_rows)]
                else:
                    parts.append((scores, docs))
        if not as_numpy:
            return BM25SearchResult(out_docs, out_scores, parts=parts)
        return BM25SearchResult(out_docs, out_scores)

    # ------------------------------------------------------- stream search
    def search_stream(
        self,
        term_id_lists: Sequence[np.ndarray],
        k: int = 5,
        as_numpy: bool = True,
    ) -> BM25SearchResult:
        """Whole-stream search in O(occupied pad buckets) dispatches.

        Queries are bucketed by padded posting mass (power-of-4, like
        ``search_term_ids``); each bucket's queries run as ONE fused
        gather->sort->segment-top-k program over a single [Qb, pad] tile
        (Qb padded to a power of two so a stream compiles a handful of
        (Qb, pad) variants). Per-dispatch cost (dominant on RPC-attached
        devices, still ~100us on a local TPU host) is paid once per bucket
        per run instead of once per 256-query tile. A scan over fixed tiles
        would amortize identically but puts the XLA sort inside a loop body
        — a known multi-hour-compile trigger on TPU (ops/sparse.py).
        """
        if self.mode == "bitonic":
            return self._search_bitonic(term_id_lists, k, as_numpy=as_numpy)
        kept: List[Tuple[np.ndarray, int]] = []
        for ids in term_id_lists:
            ids = np.asarray(ids, dtype=np.int32)
            ids, _, total, _ = trim_to_cap(self._term_lens, ids, self.max_pad)
            kept.append((ids, total))

        tq = _next_pow2(max((len(i) for i, _ in kept), default=1) or 1, self.min_tq)
        # pow2 pads (vs the per-tile path's pow4): with one dispatch per
        # bucket per run, the extra compiled variants are cheap and the
        # tighter pads halve the padding the sort pays for
        buckets: dict = {}
        for i, (ids, total) in enumerate(kept):
            pad = self._bucket_pad(min(total, self.max_pad))
            buckets.setdefault(pad, []).append(i)

        n = len(term_id_lists)
        out_docs = np.full((n, k), -1, np.int32)
        out_scores = np.zeros((n, k), np.float32)
        parts = []
        interpret = jax.default_backend() != "tpu"
        # cap mega-tile size so the [Qb, pad] intermediates stay ~2 GB/array
        max_elems = 1 << 28
        for pad, rows in sorted(buckets.items()):
            cap = 64
            while cap * 2 * pad <= max_elems:
                cap *= 2
            start = 0
            while start < len(rows):
                remaining = len(rows) - start
                if remaining >= 1024:
                    # greedy floor-pow2 tiles: 4646 rows -> 4096 + 1024(padded)
                    # instead of one 8192-row tile (43% all-padding rows that
                    # the data-independent sort still pays full price for)
                    qb = 1024
                    while qb * 2 <= remaining:
                        qb *= 2
                    qb = min(cap, qb)
                else:
                    qb = min(cap, _next_pow2(remaining, 64))
                chunk_rows = rows[start : start + qb]
                start += qb
                qt = np.zeros((qb, tq), np.int32)
                qm = np.zeros((qb, tq), bool)
                for slot, i in enumerate(chunk_rows):
                    ids = kept[i][0]
                    qt[slot, : len(ids)] = ids
                    qm[slot, : len(ids)] = True
                if self.use_pallas:
                    from probing_rag_tpu.ops.pallas_sparse import bm25_search_padded_fused

                    scores, docs = bm25_search_padded_fused(
                        self._term_offsets, self._postings_doc, self._postings_impact,
                        jnp.asarray(qt), jnp.asarray(qm),
                        pad=pad, sentinel_doc=self.index.n_docs, k=k,
                        interpret=interpret, guarded=True,
                    )
                else:
                    scores, docs = bm25_search_padded(
                        self._term_offsets, self._postings_doc, self._postings_impact,
                        jnp.asarray(qt), jnp.asarray(qm),
                        pad=pad, sentinel_doc=self.index.n_docs, k=k,
                    )
                if as_numpy:
                    s = np.asarray(scores).reshape(-1, k)
                    d = np.asarray(docs).reshape(-1, k)
                    out_docs[chunk_rows] = d[: len(chunk_rows)]
                    out_scores[chunk_rows] = s[: len(chunk_rows)]
                else:
                    parts.append((scores, docs))
        if not as_numpy:
            if not parts:
                return BM25SearchResult(
                    np.full((0, k), -1, np.int32), np.zeros((0, k), np.float32)
                )
            return BM25SearchResult(parts[-1][1], parts[-1][0], parts=parts)
        return BM25SearchResult(out_docs, out_scores)

    # -------------------------------------------------------------- search
    def search_term_ids(
        self,
        term_id_lists: Sequence[np.ndarray],
        k: int = 5,
        bucket_queries: bool = True,
        as_numpy: bool = True,
    ) -> BM25SearchResult:
        """Batched search. With ``bucket_queries``, queries are grouped by
        their padded posting mass (power-of-4 buckets) and each group runs
        at its own tile width — light queries don't pay for the heaviest
        query in the batch (4-16x on skewed streams), at the cost of one
        dispatch per occupied bucket. ``as_numpy=False`` leaves results on
        device (throughput benchmarking; avoids a host round trip per call).
        """
        if self.mode == "bitonic":
            return self._search_bitonic(term_id_lists, k, as_numpy=as_numpy)
        if not bucket_queries or len(term_id_lists) <= 1:
            return self._search_group(list(term_id_lists), k, as_numpy=as_numpy)

        # power-of-4 pad buckets: at most ~5 tile widths per corpus, so the
        # set of compiled (q_tile, pad) variants stays tiny
        buckets: dict = {}
        for i, ids in enumerate(term_id_lists):
            ids = np.asarray(ids, dtype=np.int32)
            total = int(self._term_lens[ids].sum()) if ids.size else 0
            pad = self._bucket_pad(min(total, self.max_pad), base=4)
            buckets.setdefault(pad, []).append((i, ids))

        if not as_numpy:
            groups = []
            for pad, members in sorted(buckets.items()):
                for start in range(0, len(members), self.q_tile):
                    chunk = members[start : start + self.q_tile]
                    groups.append(
                        self._search_group(
                            [ids for _, ids in chunk], k, pad_hint=pad, as_numpy=False
                        )
                    )
            if not groups:
                return BM25SearchResult(
                    np.full((0, k), -1, np.int32), np.zeros((0, k), np.float32)
                )
            return BM25SearchResult(
                groups[-1].doc_indices, groups[-1].scores,
                parts=[(g.scores, g.doc_indices) for g in groups],
            )

        n = len(term_id_lists)
        out_docs = np.full((n, k), -1, np.int32)
        out_scores = np.zeros((n, k), np.float32)
        for pad, members in sorted(buckets.items()):
            for start in range(0, len(members), self.q_tile):
                chunk = members[start : start + self.q_tile]
                idxs = [i for i, _ in chunk]
                res = self._search_group([ids for _, ids in chunk], k, pad_hint=pad)
                out_docs[idxs] = res.doc_indices
                out_scores[idxs] = res.scores
        return BM25SearchResult(out_docs, out_scores)

    def _search_group(
        self,
        term_id_lists: List[np.ndarray],
        k: int,
        pad_hint: Optional[int] = None,
        as_numpy: bool = True,
    ) -> BM25SearchResult:
        # pad the group's query count to the fixed q_tile so bucketed
        # searches always hit the same compiled (Q, P, TQ) variant
        n_real = len(term_id_lists)
        n_padded = self.q_tile if pad_hint is not None else _next_pow2(max(n_real, 1), 8)
        n_padded = max(n_padded, n_real)
        term_id_lists = list(term_id_lists) + [
            np.zeros(0, np.int32) for _ in range(n_padded - n_real)
        ]
        qterms, qmask, pad = self._plan(term_id_lists)
        if pad_hint is not None:
            pad = pad_hint
        if self.use_pallas:
            from probing_rag_tpu.ops.pallas_sparse import bm25_search_padded_fused

            scores, docs = bm25_search_padded_fused(
                self._term_offsets,
                self._postings_doc,
                self._postings_impact,
                jnp.asarray(qterms),
                jnp.asarray(qmask),
                pad=pad,
                sentinel_doc=self.index.n_docs,
                k=k,
                interpret=jax.default_backend() != "tpu",
                guarded=True,  # aligned_csr already appends the DMA guard
            )
        else:
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
        if not as_numpy:
            return BM25SearchResult(docs[:n_real], scores[:n_real])
        return BM25SearchResult(
            np.asarray(docs)[:n_real], np.asarray(scores)[:n_real]
        )

    def search(self, queries: Sequence[str], k: int = 5) -> BM25SearchResult:
        term_ids = [self.index.encode_query(self.analyzer(q)) for q in queries]
        return self.search_term_ids(term_ids, k=k)

    def retrieve(self, query: str, k: int = 5) -> List[int]:
        """Top-k doc row indices for one query (the exp_rag.py:426 call shape)."""
        result = self.search([query], k=k)
        return [int(d) for d in result.doc_indices[0] if d >= 0]


import functools


# fallback rows at least this wide sort on the in-VMEM wide bitonic network
# (ops/pallas_sort.py::sort_pairs_pallas_wide); below it, XLA's variadic sort
# is cheap enough not to be worth a fresh Mosaic compile per pad bucket
_WIDE_SORT_MIN = 1 << 15
# ... and at most this wide: compiling the network at 1M width (128
# sub-rows) crashed the remote compile service where 512K built in 69 s;
# the raw-1M-pad row is also the rare extreme (dedup keeps full-prompt
# queries near 512K), so XLA sort covers the tail
_WIDE_SORT_MAX = 1 << 19


def _sort_postings_rows(doc, imp, *, interpret, k_start=2):
    """Sort stage of the over-cap fallback. At fallback widths XLA's
    variadic sort costs ~175 ms per [64, 512K] batch while the wide bitonic
    network runs whole rows in VMEM at 4.0 ns/element (134 ms; 2.7 with the
    ``k_start`` pass skip — all measured). Interpret mode keeps the XLA
    sort: the network's O(P log^2 P) passes are pathological to emulate,
    and a full sort makes the ``k_start`` precondition irrelevant."""
    if (
        _WIDE_SORT_MIN <= doc.shape[1] <= _WIDE_SORT_MAX
        and not interpret
    ):
        from probing_rag_tpu.ops.pallas_sort import sort_pairs_pallas_wide

        return sort_pairs_pallas_wide(doc, imp, lane_width=8192, k_start=k_start)
    return jax.lax.sort_key_val(doc, imp, dimension=-1)


def _fold_short_tail(db, ib, ds, is_, *, pad_big, pad_short):
    """Splice the XLA-gathered short tail over the LAST ``pad_short``
    columns of the DMA-gathered big row. The fallback planner reserves that
    slack (each row's big postings end before ``pad_big - pad_short``, and
    the gather sentinel-fills everything past them), so the sorted row
    stays at the pow2 width ``pad_big`` instead of the non-pow2
    ``pad_big + pad_short`` a plain concatenation would produce — the wide
    bitonic sort needs a power of two."""
    doc = jnp.concatenate([db[:, : pad_big - pad_short], ds], axis=1)
    imp = jnp.concatenate([ib[:, : pad_big - pad_short], is_], axis=1)
    return doc, imp


def _short_tail_gather(
    term_offsets, doc_c, imp_c, qterms, qmask, qweights,
    short_src, short_rlen,
    *, pad, sentinel_doc, interpret,
):
    """Short-term gather for the fallback paths: the compact VMEM-assembly
    kernel (~3 DMAs + ~100 vector ops per term) when descriptors are
    provided and the pad is block-aligned; the XLA per-element gather
    (~70 ns/element, measured — the dominant fallback gather cost)
    otherwise. Dedup weights are bitcast to int32 for the kernel's SMEM
    prefetch (32-bit integer scalars only)."""
    if short_src is not None and pad % 1024 == 0:
        from probing_rag_tpu.ops.pallas_sparse import postings_assemble_pallas

        wt_bits = (
            None if qweights is None
            else jax.lax.bitcast_convert_type(qweights, jnp.int32)
        )
        # 8 rows per grid step in the lane-major (1, 1, 8*pad) block
        # layout (the wrapper zero-pads Q up). Round 3's sublane-major
        # variants both failed Mosaic lowering on real TPU and crashed the
        # headline bench at warmup (logs/measure_bm25.err): a (1, pad)
        # block over a (Q, pad) array breaks the block-divisibility rule,
        # and 1-sublane DMA slices of an (8, W) scratch break (8, 128)
        # tiling. Only interpret mode accepted them.
        return postings_assemble_pallas(
            doc_c, imp_c, short_src, short_rlen, wt_bits,
            pad=pad, sentinel=sentinel_doc, row_tile=8, interpret=interpret,
        )
    from probing_rag_tpu.ops.sparse import postings_gather

    return postings_gather(
        term_offsets, doc_c.reshape(-1), imp_c.reshape(-1), qterms, qmask,
        pad, sentinel_doc, qweights=qweights,
    )


@functools.partial(jax.jit, static_argnames=("pad", "sentinel_doc", "interpret"))
def _fallback_gather_sort(
    term_offsets, doc_c, imp_c, qterms, qmask, qweights=None,
    short_src=None, short_rlen=None,
    *, pad, sentinel_doc, interpret=True,
):
    """Gather+sort over the bitonic store's (1, N) compact copies (reshape is
    free inside jit). Kept as its own program: composing the TPU sort with
    the downstream segment scans is a known multi-hour-compile trigger
    (ops/sparse.py::bm25_search_padded)."""
    doc, impact = _short_tail_gather(
        term_offsets, doc_c, imp_c, qterms, qmask, qweights,
        short_src, short_rlen,
        pad=pad, sentinel_doc=sentinel_doc, interpret=interpret,
    )
    return _sort_postings_rows(doc, impact, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("pad_big", "pad_short", "sentinel_doc", "block", "interpret"),
)
def _hybrid_gather_sort(
    doc_e, imp_e, doc_o, imp_o, big_starts, big_lens, term_offsets,
    doc_c, imp_c, qt_short, qm_short, big_wtblk=None, qw_short=None,
    short_src=None, short_rlen=None,
    *, pad_big, pad_short, sentinel_doc, block=1024, interpret,
):
    """Over-cap gather: big terms as chunked DMA copies from the (guarded)
    block-alternated E/O stores — the copy is chosen per term so every
    produced ``block`` is sorted alternating (ops/pallas_sparse.py::
    _gather_kernel) — while the short tail is gathered from the compact
    copy (``_short_tail_gather``: VMEM assembly kernel, or XLA gather when
    descriptors are absent) and PRECONDITIONED to the same block-alternated
    state by a truncated sort network (``k_stop=block``). The tail is folded into
    the big row's reserved slack (``_fold_short_tail``), so the whole
    pow2-wide row satisfies the ``k_start = 2*block`` precondition and the
    wide bitonic sort skips its first log2(block) stages (2.7 vs 4.0
    ns/element, measured at [64, 512K]). Kept as a single program (gathers
    + sort compose fine; only sort+scan blows up — ops/sparse.py).

    Dedup weights: ``big_wtblk`` [Q, pad_big // block] scales each aligned
    block's impacts (big-term slots are ``block``-aligned, and DMA chunk
    overshoot into a later term's slice is overwritten before this multiply
    runs, so block ownership is exact; positive weights keep blocks sorted
    by doc); ``qw_short`` [Q, TQs] rides both short paths (bitcast to int32
    bit patterns for the assembly kernel's SMEM prefetch)."""
    from probing_rag_tpu.ops.pallas_sort import sort_pairs_pallas
    from probing_rag_tpu.ops.pallas_sparse import gather_chunk, postings_gather_pallas

    # the pass skip needs block-aligned parity at the fold seam: pad_short
    # and pad_big - pad_short must both be even multiples of block (pow2s
    # >= 2*block are), and the wide network must actually be in play
    skip = (
        _WIDE_SORT_MIN <= pad_big <= _WIDE_SORT_MAX
        and pad_short >= 2 * block
        and pad_big >= 4 * block
        and not interpret
    )
    db, ib = postings_gather_pallas(
        doc_e.reshape(-1), imp_e.reshape(-1), big_starts, big_lens,
        pad=pad_big, sentinel=sentinel_doc, chunk=gather_chunk(pad_big),
        interpret=interpret,
        postings_doc_o=doc_o.reshape(-1) if skip else None,
        postings_impact_o=imp_o.reshape(-1) if skip else None,
        block=block,
    )
    if big_wtblk is not None:
        qn = ib.shape[0]
        ib = ib * jnp.broadcast_to(
            big_wtblk[:, :, None], (qn, pad_big // block, block)
        ).reshape(qn, pad_big)
    ds, is_ = _short_tail_gather(
        term_offsets, doc_c, imp_c, qt_short, qm_short, qw_short,
        short_src, short_rlen,
        pad=pad_short, sentinel_doc=sentinel_doc, interpret=interpret,
    )
    if skip:
        ds, is_ = sort_pairs_pallas(ds, is_, k_stop=block)
    doc, imp = _fold_short_tail(
        db, ib, ds, is_, pad_big=pad_big, pad_short=pad_short
    )
    return _sort_postings_rows(
        doc, imp, interpret=interpret, k_start=2 * block if skip else 2
    )


@functools.partial(
    jax.jit,
    static_argnames=("plan", "sentinel_doc", "k", "use_pallas", "interpret"),
)
def _mega_search(
    term_offsets, postings_doc, postings_impact, qterms_list, qmask_list,
    *, plan, sentinel_doc, k, use_pallas, interpret,
):
    """All bucket searches of one batch fused into a single XLA program."""
    outs = []
    for pad, qt, qm in zip(plan, qterms_list, qmask_list):
        if use_pallas:
            from probing_rag_tpu.ops.pallas_sparse import bm25_search_padded_fused

            s, d = bm25_search_padded_fused(
                term_offsets, postings_doc, postings_impact, qt, qm,
                pad=pad, sentinel_doc=sentinel_doc, k=k,
                interpret=interpret, guarded=True,
            )
        else:
            s, d = bm25_search_padded(
                term_offsets, postings_doc, postings_impact, qt, qm,
                pad=pad, sentinel_doc=sentinel_doc, k=k,
            )
        outs.append((s, d))
    return tuple(outs)
