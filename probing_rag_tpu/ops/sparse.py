"""Device-side sparse BM25 scoring: gather -> sort -> segment-sum -> top-k.

TPU-native replacement for the posting-list traversal inside rank_bm25 /
llama-index's BM25Retriever (exp_rag.py:426, SURVEY.md §2.3). The classic
CPU formulation (term-at-a-time scatter-add into a dense accumulator) maps
badly onto the TPU's dense-tile execution model — scatter is scalar work. The
TPU formulation used here never materializes an [n_docs] accumulator:

1. ``postings_gather``: every query's posting slices are flattened into a
   fixed-width ``[Q, P]`` tile via a vectorized rank-to-(term, offset)
   decomposition — two XLA gathers, no host loop.
2. ``sorted_segment_topk``: sort (doc_id, impact) pairs per query, reduce
   equal-doc runs with a cumsum difference (no scatter), and take the top-k
   over run totals. Only docs that share >=1 term with the query are ever
   touched — the sparse-skipping property of an inverted index, kept on TPU.

Cost: O(P log^2 P) compare-exchanges on the VPU per query, where P = total
postings matched by the query — bandwidth-trivial, compute-cheap (SURVEY.md
§7 'hard parts'). All shapes are static: P and TQ are bucketed by the caller
so XLA compiles a handful of variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def postings_gather(
    term_offsets: jnp.ndarray,  # [T+1] int32
    postings_doc: jnp.ndarray,  # [NNZ] int32
    postings_impact: jnp.ndarray,  # [NNZ] f32
    qterms: jnp.ndarray,  # [Q, TQ] int32, padded with 0
    qmask: jnp.ndarray,  # [Q, TQ] bool
    pad: int,  # static P: padded postings per query
    sentinel_doc: int,  # static: n_docs (sorts after every real doc)
    qweights: jnp.ndarray | None = None,  # [Q, TQ] f32 per-term multiplier
):
    """Flatten each query's posting slices into a fixed [Q, P] tile.

    Slot p of query q holds the p-th posting of the concatenation of that
    query's term posting lists; slots past the query's total posting count
    hold (sentinel_doc, 0).

    ``qweights`` scales each term's gathered impacts — the exact-dedup hook:
    a term appearing m times in the raw query is planned once with weight m
    (rank_bm25 scores per occurrence; m * impact == the m-fold sum up to one
    rounding).
    """
    lens = term_offsets[qterms + 1] - term_offsets[qterms]  # [Q, TQ]
    lens = jnp.where(qmask, lens, 0)
    cum = jnp.cumsum(lens, axis=-1)  # [Q, TQ] inclusive
    total = cum[:, -1:]  # [Q, 1]

    p_idx = jnp.arange(pad, dtype=jnp.int32)[None, :]  # [1, P]
    # Which term does slot p fall into: the first term whose inclusive cumsum
    # exceeds p. searchsorted keeps this O(P log TQ) — a broadcast compare
    # would materialize [Q, P, TQ].
    term_rank = jax.vmap(
        lambda c, p: jnp.searchsorted(c, p, side="right")
    )(cum, jnp.broadcast_to(p_idx, (cum.shape[0], pad))).astype(jnp.int32)
    term_rank = jnp.minimum(term_rank, qterms.shape[1] - 1)
    start_before = jnp.where(
        term_rank > 0,
        jnp.take_along_axis(cum, jnp.maximum(term_rank - 1, 0), axis=-1),
        0,
    )  # [Q, P]
    term_of_slot = jnp.take_along_axis(qterms, term_rank, axis=-1)  # [Q, P]
    posting_idx = term_offsets[term_of_slot] + (p_idx - start_before)

    valid = p_idx < total
    posting_idx = jnp.where(valid, posting_idx, 0)
    doc = jnp.where(valid, postings_doc[posting_idx], sentinel_doc)
    impact = jnp.where(valid, postings_impact[posting_idx], 0.0)
    if qweights is not None:
        impact = impact * jnp.take_along_axis(qweights, term_rank, axis=-1)
    return doc, impact


def sorted_segment_topk(
    doc: jnp.ndarray,
    impact: jnp.ndarray,
    k: int,
    sentinel: int | None = None,
    presorted: bool = False,
    max_run: int | None = None,
):
    """Per-query top-k of summed impacts over equal-doc runs.

    doc, impact: [Q, P]. Returns (scores [Q, k] f32, doc_idx [Q, k] i32);
    empty slots have score 0 and doc_idx -1. Impacts must be non-negative
    for real postings (BM25 Okapi floors negative idf, so they are). With
    ``sentinel`` set, padding runs are excluded by doc id, so matched docs
    with an exactly-zero total (idf == 0 terms) still count as hits — the
    reference's BM25Retriever returns them too.

    ``max_run`` is a static upper bound on a real run's length (a doc
    appears at most once per query term, so callers pass TQ); it caps the
    scan depth at ceil(log2(max_run)) shift-doubling steps.

    Precision note: an earlier formulation took run totals as DIFFERENCES
    of one [Q, P]-long f32 cumsum. The prefix sum reaches ~1e5-1e6 on
    large corpora (P up to 1M, impacts ~1-5), where an f32 ulp is 0.01-
    0.06 — per-doc totals came out wrong by more than score gaps and the
    oracle spot checks failed at >=625k docs/device. The shift-doubling
    segmented sum below only ever adds values WITHIN one run (<= max_run
    positive f32s), so the error is ~max_run ulps of the run total itself.
    """
    q, p = doc.shape
    if not presorted:
        doc, impact = jax.lax.sort_key_val(doc, impact, dimension=-1)
        doc, impact = jax.lax.optimization_barrier((doc, impact))

    # segmented inclusive run-sum by shift-doubling: rows are sorted, so
    # doc equality at distance s implies every element between is the same
    # doc — no head-flag carry needed. After step d, v[i] holds the sum of
    # the up-to-2^d same-doc elements ending at i; a run of length L is
    # fully absorbed once 2^steps >= L.
    v = impact
    span = p if max_run is None else max(1, min(max_run, p))
    s = 1
    while s < span:
        same = doc[:, s:] == doc[:, :-s]
        v = jnp.concatenate(
            [v[:, :s], v[:, s:] + jnp.where(same, v[:, :-s], 0.0)], axis=-1
        )
        s *= 2

    is_end = jnp.concatenate([doc[:, 1:] != doc[:, :-1], jnp.ones((q, 1), bool)], axis=-1)
    if sentinel is not None:
        is_end = is_end & (doc != sentinel)
    run_total = jnp.where(is_end, v, -jnp.inf)
    run_total = jax.lax.optimization_barrier(run_total)

    top_vals, top_pos = jax.lax.top_k(run_total, k)
    top_doc = jnp.take_along_axis(doc, top_pos, axis=-1)
    hit = (
        jnp.isfinite(top_vals)
        if sentinel is not None
        else top_vals > 0.0  # legacy path: padding runs total exactly 0
    )
    return jnp.where(hit, top_vals, 0.0), jnp.where(hit, top_doc, -1)


@functools.partial(jax.jit, static_argnames=("pad", "sentinel_doc"))
def gather_and_sort(
    term_offsets: jnp.ndarray,
    postings_doc: jnp.ndarray,
    postings_impact: jnp.ndarray,
    qterms: jnp.ndarray,
    qmask: jnp.ndarray,
    *,
    pad: int,
    sentinel_doc: int,
):
    doc, impact = postings_gather(
        term_offsets, postings_doc, postings_impact, qterms, qmask, pad, sentinel_doc
    )
    return jax.lax.sort_key_val(doc, impact, dimension=-1)


@functools.partial(jax.jit, static_argnames=("k", "sentinel", "max_run"))
def presorted_segment_topk(doc, impact, *, k: int, sentinel: int,
                           max_run: int | None = None):
    return sorted_segment_topk(
        doc, impact, k, sentinel=sentinel, presorted=True, max_run=max_run
    )


def bm25_search_padded(
    term_offsets: jnp.ndarray,
    postings_doc: jnp.ndarray,
    postings_impact: jnp.ndarray,
    qterms: jnp.ndarray,
    qmask: jnp.ndarray,
    *,
    pad: int,
    sentinel_doc: int,
    k: int,
):
    """Full BM25 scoring, dispatched as TWO XLA programs (gather+sort, then
    segment-sum+top-k). The split is deliberate: composing the TPU sort with
    the downstream scans in one program sends XLA's optimization passes into
    a multi-hour compile at production tile sizes, while each half compiles
    in seconds; the program boundary costs one HBM round trip of the [Q, P]
    tile, which the op is not bound on."""
    doc, impact = gather_and_sort(
        term_offsets, postings_doc, postings_impact, qterms, qmask,
        pad=pad, sentinel_doc=sentinel_doc,
    )
    return presorted_segment_topk(
        doc, impact, k=k, sentinel=sentinel_doc,
        max_run=int(qterms.shape[1]),
    )
