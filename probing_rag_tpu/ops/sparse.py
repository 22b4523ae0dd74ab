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
):
    """Per-query top-k of summed impacts over equal-doc runs.

    doc, impact: [Q, P]. Returns (scores [Q, k] f32, doc_idx [Q, k] i32);
    empty slots have score 0 and doc_idx -1. Impacts must be non-negative
    for real postings (BM25 Okapi floors negative idf, so they are). With
    ``sentinel`` set, padding runs are excluded by doc id, so matched docs
    with an exactly-zero total (idf == 0 terms) still count as hits — the
    reference's BM25Retriever returns them too.
    """
    q, p = doc.shape
    if not presorted:
        doc, impact = jax.lax.sort_key_val(doc, impact, dimension=-1)
        doc, impact = jax.lax.optimization_barrier((doc, impact))

    cs = jnp.cumsum(impact, axis=-1)  # [Q, P] inclusive
    head = jnp.concatenate(
        [jnp.ones((q, 1), bool), doc[:, 1:] != doc[:, :-1]], axis=-1
    )  # run starts
    # Cumsum before the current run's head, broadcast along the run: cs is
    # monotone (impacts >= 0), so a running max over head-masked cs_before
    # equals cs_before at the most recent head — one scan, no gather.
    cs_before = jnp.concatenate([jnp.zeros((q, 1), cs.dtype), cs[:, :-1]], axis=-1)
    base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, cs_before, -jnp.inf), axis=-1
    )  # [Q, P]

    is_end = jnp.concatenate([doc[:, 1:] != doc[:, :-1], jnp.ones((q, 1), bool)], axis=-1)
    if sentinel is not None:
        is_end = is_end & (doc != sentinel)
    run_total = jnp.where(is_end, cs - base, -jnp.inf)
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


@functools.partial(jax.jit, static_argnames=("k", "sentinel"))
def presorted_segment_topk(doc, impact, *, k: int, sentinel: int):
    return sorted_segment_topk(doc, impact, k, sentinel=sentinel, presorted=True)


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
    return presorted_segment_topk(doc, impact, k=k, sentinel=sentinel_doc)
