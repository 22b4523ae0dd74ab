"""Bitonic single-dispatch BM25 path: store invariants + oracle parity in
interpret mode. The compiled TPU path is exercised by bench.py (and was
TPU-verified against the same oracle; PARITY.md)."""

import numpy as np
import pytest

import jax

from probing_rag_tpu.retrieval.bm25 import BM25Engine
from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index


@pytest.fixture(scope="module")
def zipf_index():
    rng = np.random.default_rng(7)
    docs = [
        [f"t{t}" for t in rng.zipf(1.2, rng.integers(3, 30)) % 400]
        for _ in range(3000)
    ]
    return BM25Index.build_tokenized(
        docs, BM25Config(stem=False, remove_stopwords=False)
    ), rng


def test_bitonic_store_invariants(zipf_index):
    idx, _ = zipf_index
    st = idx.bitonic_csr(min_len=256)
    lens = idx.term_offsets[1:] - idx.term_offsets[:-1]
    big = np.nonzero(st.aligned_len > 0)[0]
    assert len(big) > 0
    for t in big[:10]:
        s, al = st.aligned_start[t], st.aligned_len[t]
        reg_e = st.doc_e[s : s + al].reshape(-1, st.block)
        reg_o = st.doc_o[s : s + al].reshape(-1, st.block)
        orig = np.sort(
            idx.postings_doc[idx.term_offsets[t] : idx.term_offsets[t + 1]]
        )
        for b in range(len(reg_e)):
            d_e = np.diff(reg_e[b].astype(np.int64))
            d_o = np.diff(reg_o[b].astype(np.int64))
            # copy E: ascending blocks at even local index; copy O inverted
            assert (d_e >= 0).all() if b % 2 == 0 else (d_e <= 0).all()
            assert (d_o >= 0).all() if b % 2 == 1 else (d_o <= 0).all()
        rec = np.concatenate(
            [reg_e[b] if b % 2 == 0 else reg_e[b][::-1] for b in range(len(reg_e))]
        )
        assert np.array_equal(rec[rec < st.sentinel], orig)
    # reversed compact copy
    assert np.array_equal(st.doc_r[: st.nnz], idx.postings_doc[::-1])
    # guards
    assert (st.doc_c[st.nnz :] == st.sentinel).all()
    assert (st.doc_r[st.nnz :] == st.sentinel).all()


@pytest.mark.slow
def test_bitonic_search_matches_oracle(zipf_index):
    idx, rng = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True)
    qids = [
        idx.encode_query(
            [f"t{t}" for t in (rng.zipf(1.2, rng.integers(1, 6)) % 400)]
        )
        for _ in range(25)
    ]
    qids.append(np.zeros(0, np.int32))  # empty query
    res = eng.search_term_ids(qids, k=5)
    for i, ids in enumerate(qids):
        got = res.scores[i][res.doc_indices[i] >= 0]
        if len(ids) == 0:
            assert len(got) == 0
            continue
        oracle = idx.score_all(ids)
        exp = np.sort(oracle)[::-1][: len(got)]
        # 5e-4: f32 segment sums vs the f64 oracle, plus dedup's m*x vs
        # m-fold-add rounding (one extra f32 rounding per repeated term)
        assert np.allclose(np.sort(got)[::-1], exp, atol=5e-4), i
        # returned doc ids actually achieve the returned scores
        for d, s in zip(res.doc_indices[i], res.scores[i]):
            if d >= 0:
                assert oracle[d] == pytest.approx(s, abs=5e-4)


@pytest.mark.slow
def test_bitonic_duplicate_term_counts_twice(zipf_index):
    idx, _ = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True)
    t = int(np.argmax(idx.term_offsets[1:] - idx.term_offsets[:-1]))
    single = eng.search_term_ids([np.asarray([t], np.int32)], k=3)
    double = eng.search_term_ids([np.asarray([t, t], np.int32)], k=3)
    assert np.allclose(double.scores[0], 2 * single.scores[0], atol=1e-4)


@pytest.mark.slow
def test_bitonic_overcap_query_exact_via_fallback(zipf_index):
    """Queries whose slot total exceeds the bitonic row cap must be EXACT
    (routed to the XLA fallback over the compact copy), not term-trimmed
    (round-2 advisor finding: silent recall loss on high-df terms)."""
    idx, _ = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True, max_pad=2048)
    lens = idx.term_offsets[1:] - idx.term_offsets[:-1]
    heavy = np.argsort(lens)[-3:].astype(np.int32)  # won't fit together
    light = int(np.argsort(lens)[len(lens) // 2])
    q = np.concatenate([heavy, [light]]).astype(np.int32)
    res = eng.search_term_ids([q], k=5)
    assert eng.last_stats == {"n_queries": 1, "n_fallback": 1, "n_trimmed": 0}
    oracle = idx.score_all(q)
    exp = np.sort(oracle)[::-1][:5]
    # f32 cumsum order differs from the float64 oracle on heavy runs
    assert np.allclose(np.sort(res.scores[0])[::-1], exp, rtol=1e-4, atol=1e-3)
    for d, s in zip(res.doc_indices[0], res.scores[0]):
        assert d >= 0 and oracle[d] == pytest.approx(s, rel=1e-4, abs=1e-3)


@pytest.mark.slow
def test_bitonic_single_highdf_term_returns_hits(zipf_index):
    """A single-term query on a term whose aligned slot exceeds max_pad used
    to return ZERO hits (the term was unscorable in bitonic mode). Now it
    scores exactly via the fallback."""
    idx, _ = zipf_index
    lens = idx.term_offsets[1:] - idx.term_offsets[:-1]
    t = int(np.argmax(lens))
    st = idx.bitonic_csr()
    cap = max(1024, int(st.aligned_len[t]) // 2)  # force over-cap
    eng = BM25Engine(idx, mode="bitonic", interpret=True, max_pad=cap)
    res = eng.search_term_ids([np.asarray([t], np.int32)], k=5)
    assert eng.last_stats["n_fallback"] == 1
    oracle = idx.score_all(np.asarray([t]))
    assert np.allclose(np.sort(res.scores[0])[::-1], np.sort(oracle)[::-1][:5],
                       rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_bitonic_wide_sort_main_path_matches_oracle(zipf_index):
    """Row widths over ``narrow_sort_max`` sort on the while_loop-form wide
    bitonic network INSIDE the main fused path (the 32K->512K row-cap
    raise, VERDICT r4 #4b). Forced small via the test knob: every query
    stays on the main path (no fallback) and must match the oracle
    exactly."""
    idx, rng = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True,
                     narrow_sort_max=1024)
    lens = idx.term_offsets[1:] - idx.term_offsets[:-1]
    heavy = np.argsort(lens)[-6:].astype(np.int32)
    # mixed stream: wide-sorted rows (heavy multi-term) + narrow rows
    qids = [
        heavy[:3], heavy[3:], heavy[::2],
        idx.encode_query(
            [f"t{t}" for t in (rng.zipf(1.2, 3) % 400)]),
    ]
    res = eng.search_term_ids(qids, k=5)
    assert eng.last_stats["n_fallback"] == 0
    for i, ids in enumerate(qids):
        if len(ids) == 0:
            continue
        oracle = idx.score_all(ids)
        got = res.scores[i][res.doc_indices[i] >= 0]
        exp = np.sort(oracle)[::-1][: len(got)]
        assert np.allclose(np.sort(got)[::-1], exp, rtol=1e-4, atol=1e-3), i
        for d, s in zip(res.doc_indices[i], res.scores[i]):
            if d >= 0:
                assert oracle[d] == pytest.approx(s, rel=1e-4, abs=1e-3)


@pytest.mark.slow
def test_bitonic_over32k_row_rides_main_path():
    """A genuinely >32768-slot row (the regime that used to fall back —
    78% of queries at the 21M corpus, ROUND4_NOTES §7) now rides the main
    fused path with the wide sort at the PRODUCTION threshold, and scores
    exactly."""
    rng = np.random.default_rng(11)
    n_docs = 40_000
    # one hot term in every doc (40k postings -> ~40960 aligned slots,
    # over the 32768 narrow cap) + per-doc filler terms
    docs = [["hot", f"u{rng.integers(0, 2000)}"] for _ in range(n_docs)]
    idx = BM25Index.build_tokenized(
        docs, BM25Config(stem=False, remove_stopwords=False)
    )
    eng = BM25Engine(idx, mode="bitonic", interpret=True)
    assert eng.max_pad > 1 << 15  # the cap raise is live
    q = idx.encode_query(["hot", "u7"])
    st = idx.bitonic_csr()
    assert int(st.aligned_len[q[0]]) > 1 << 15  # row really is over 32k
    res = eng.search_term_ids([q], k=5)
    assert eng.last_stats["n_fallback"] == 0
    oracle = idx.score_all(q)
    exp = np.sort(oracle)[::-1][:5]
    assert np.allclose(np.sort(res.scores[0])[::-1], exp, rtol=1e-4, atol=1e-3)
    for d, s in zip(res.doc_indices[0], res.scores[0]):
        assert d >= 0 and oracle[d] == pytest.approx(s, rel=1e-4, abs=1e-3)


def test_bitonic_mixed_stream_overcap_and_normal(zipf_index):
    """A stream mixing over-cap and normal queries: every row exact, stats
    split correctly, order preserved."""
    idx, rng = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True, max_pad=2048)
    lens = idx.term_offsets[1:] - idx.term_offsets[:-1]
    heavy = np.argsort(lens)[-2:].astype(np.int32)
    qids = [
        idx.encode_query([f"t{t}" for t in (rng.zipf(1.2, 3) % 400)])
        for _ in range(6)
    ]
    qids.insert(2, heavy.copy())
    qids.insert(5, heavy.copy())
    res = eng.search_term_ids(qids, k=5)
    assert eng.last_stats["n_queries"] == 8
    assert eng.last_stats["n_fallback"] >= 2
    for i, ids in enumerate(qids):
        if len(ids) == 0:
            continue
        oracle = idx.score_all(ids)
        got = res.scores[i][res.doc_indices[i] >= 0]
        assert np.allclose(np.sort(got)[::-1], np.sort(oracle)[::-1][: len(got)],
                           rtol=1e-4, atol=1e-3), i


def test_plan_bitonic_matches_reference_implementation(zipf_index):
    """The vectorized planner (retrieval/bm25.py::_plan_bitonic) must equal
    a straightforward per-query implementation. The planner never trims —
    over-cap rows are returned with their full (over-cap) totals so the
    caller can route them to the exact fallback."""
    idx, rng = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True, max_pad=4096)
    st = eng._store
    qids = [
        idx.encode_query([f"t{t}" for t in (rng.zipf(1.2, rng.integers(1, 8)) % 400)])
        for _ in range(30)
    ] + [np.zeros(0, np.int32)]
    src, srcr, slot, rlen, big, totals, wt = eng._plan_bitonic(qids)
    assert (wt == 1.0).all()  # no weights requested -> identity table
    assert (totals > eng.max_pad).any()  # the stream does exercise over-cap
    for r, ids in enumerate(qids):
        ids = np.asarray(ids, np.int64)
        if ids.size:
            slots = np.where(
                st.aligned_len[ids] > 0, st.aligned_len[ids], st.block
            ).astype(np.int64)
        else:
            slots = np.zeros(0, np.int64)
        m = len(ids)
        assert totals[r] == slots.sum() if m else totals[r] == 0
        kept = slot[r][slot[r] > 0]
        assert sorted(kept.tolist()) == sorted(slots.tolist()) if m else kept.size == 0
        for j in range(m):
            # every term's descriptors are self-consistent
            t_candidates = np.nonzero(
                (rlen[r] == eng._term_lens[ids[j]]) & (slot[r] > 0)
            )[0]
            assert len(t_candidates) >= 1
        for j in range(len(slot[r])):
            if slot[r][j] == 0:
                continue
            if big[r][j]:
                assert slot[r][j] % st.block == 0 and srcr[r][j] == 0
            else:
                assert slot[r][j] == st.block
                assert srcr[r][j] == st.nnz - src[r][j] - rlen[r][j]


def test_weight_blocks_matches_loop_reference():
    """_weight_blocks (vectorized np.repeat + flat scatter) vs a per-row
    loop: block b of row r carries the weight of the slot covering it."""
    from probing_rag_tpu.retrieval.bm25 import _weight_blocks

    rng = np.random.default_rng(3)
    block, pad = 4, 64
    slot = (rng.integers(0, 4, size=(6, 5)) * block).astype(np.int64)
    # keep totals within pad
    while (slot.sum(1) > pad).any():
        slot = np.where(slot.sum(1, keepdims=True) > pad, slot // 2 // block * block, slot)
    wt = rng.integers(1, 5, size=(6, 5)).astype(np.float32)
    got = _weight_blocks(slot, wt, pad, block)
    exp = np.ones((6, pad // block), np.float32)
    for r in range(6):
        b = 0
        for t in range(5):
            for _ in range(slot[r, t] // block):
                exp[r, b] = wt[r, t]
                b += 1
    np.testing.assert_array_equal(got, exp)


@pytest.mark.slow
def test_bitonic_dedup_heavy_duplicates_match_oracle(zipf_index):
    """Repeated terms are planned once with occurrence-count weights (exact
    dedup); scores must match the per-occurrence oracle on both the bitonic
    path and the over-cap fallback."""
    idx, _ = zipf_index
    rng = np.random.default_rng(11)
    base = (rng.zipf(1.2, 6) % 400).astype(np.int64)
    reps = rng.integers(1, 7, size=6)
    q = idx.encode_query([f"t{t}" for t in np.repeat(base, reps)])
    for cap in (1 << 15, 512):  # main path / forced fallback
        eng = BM25Engine(idx, mode="bitonic", interpret=True, max_pad=cap)
        res = eng.search_term_ids([q], k=5)
        if cap == 512:
            assert eng.last_stats["n_fallback"] == 1
        oracle = idx.score_all(q)
        order = np.argsort(oracle)[::-1][:5]
        got = res.scores[0][res.doc_indices[0] >= 0]
        np.testing.assert_allclose(
            np.sort(got)[::-1], oracle[order], rtol=2e-5, atol=5e-4
        )


@pytest.mark.slow
def test_bitonic_dedup_shrinks_planned_totals(zipf_index):
    """Dedup must reduce the planned slot total (the whole point: smaller
    sort widths and fewer over-cap fallbacks on repetitive query text)."""
    idx, _ = zipf_index
    eng = BM25Engine(idx, mode="bitonic", interpret=True)
    t = int(np.argmax(idx.term_offsets[1:] - idx.term_offsets[:-1]))
    q10 = np.asarray([t] * 10, np.int32)
    eng.search_term_ids([q10], k=3)
    assert eng.last_stats["n_fallback"] == 0
    # deduped: one slot, not ten
    _, _, _, _, _, totals, wt = eng._plan_bitonic(*_dedup_args([q10]))
    single_total = totals[0]
    _, _, _, _, _, totals_dup, _ = eng._plan_bitonic([q10])
    assert totals_dup[0] == 10 * single_total
    assert wt[0, 0] == 10.0


def _dedup_args(lists):
    from probing_rag_tpu.retrieval.bm25 import _dedup_term_ids

    u, w, _ = _dedup_term_ids(lists)
    return u, w


@pytest.mark.slow
def test_overcap_many_short_terms_assembly_path(zipf_index):
    """Over-cap queries whose short tail is big enough for the VMEM
    assembly gather (pad_short >= 1024): exact vs the oracle, with and
    without big terms in the row, including duplicated terms (weighted
    slots ride the assembly kernel as bitcast SMEM scalars)."""
    idx, rng = zipf_index
    lens = idx.term_offsets[1:] - idx.term_offsets[:-1]
    order = np.argsort(lens)
    heavy = order[-2:].astype(np.int32)
    # many mid-df short terms: enough raw mass to push pad_short over 1024
    shorts = order[len(order) // 2 : len(order) // 2 + 60].astype(np.int32)
    assert lens[shorts].sum() >= 1024
    eng = BM25Engine(idx, mode="bitonic", interpret=True, max_pad=2048)
    q_mixed = np.concatenate([heavy, shorts, shorts[:5]])  # dups -> weights
    q_short_only = np.concatenate([shorts, shorts[:7]])
    res = eng.search_term_ids([q_mixed, q_short_only], k=5)
    assert eng.last_stats["n_fallback"] >= 1
    for i, q in enumerate([q_mixed, q_short_only]):
        oracle = idx.score_all(q)
        exp = np.sort(oracle)[::-1][:5]
        got = np.sort(res.scores[i])[::-1]
        assert np.allclose(got, exp, rtol=1e-4, atol=1e-3), i
        for d, s in zip(res.doc_indices[i], res.scores[i]):
            assert d >= 0 and oracle[d] == pytest.approx(s, rel=1e-4, abs=1e-3)
