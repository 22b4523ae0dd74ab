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
):
    """Flatten each query's posting slices into a fixed [Q, P] tile.

    Slot p of query q holds the p-th posting of the concatenation of that
    query's term posting lists; slots past the query's total posting count
    hold (sentinel_doc, 0).
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
    return doc, impact


def sorted_segment_topk(doc: jnp.ndarray, impact: jnp.ndarray, k: int):
    """Per-query top-k of summed impacts over equal-doc runs.

    doc, impact: [Q, P]. Returns (scores [Q, k] f32, doc_idx [Q, k] i32);
    empty slots have score 0 and doc_idx -1. Impacts must be positive for
    real postings (BM25 Okapi floors negative idf, so they are).
    """
    q, p = doc.shape
    doc, impact = jax.lax.sort_key_val(doc, impact, dimension=-1)

    cs = jnp.cumsum(impact, axis=-1)  # [Q, P] inclusive
    head = jnp.concatenate(
        [jnp.ones((q, 1), bool), doc[:, 1:] != doc[:, :-1]], axis=-1
    )  # run starts
    iota = jnp.arange(p, dtype=jnp.int32)[None, :]
    # Index of the current run's head, broadcast forward along the run.
    head_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, iota, 0), axis=-1
    )  # [Q, P]
    cs_before = jnp.concatenate([jnp.zeros((q, 1), cs.dtype), cs[:, :-1]], axis=-1)
    base = jnp.take_along_axis(cs_before, head_idx, axis=-1)  # cumsum before run head

    is_end = jnp.concatenate([doc[:, 1:] != doc[:, :-1], jnp.ones((q, 1), bool)], axis=-1)
    run_total = jnp.where(is_end, cs - base, -jnp.inf)

    top_vals, top_pos = jax.lax.top_k(run_total, k)
    top_doc = jnp.take_along_axis(doc, top_pos, axis=-1)
    hit = top_vals > 0.0  # padding/sentinel runs total 0; real scores are > 0
    return jnp.where(hit, top_vals, 0.0), jnp.where(hit, top_doc, -1)


@functools.partial(jax.jit, static_argnames=("pad", "sentinel_doc", "k"))
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
    doc, impact = postings_gather(
        term_offsets, postings_doc, postings_impact, qterms, qmask, pad, sentinel_doc
    )
    return sorted_segment_topk(doc, impact, k)
