"""BM25 unit tests: hand-computed oracle scores, engine-vs-oracle top-k on a
random corpus, persistence round trip (SURVEY.md §4)."""

import math

import numpy as np
import pytest

from probing_rag_tpu.retrieval.bm25 import BM25Engine
from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index
from probing_rag_tpu.retrieval.text import Analyzer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown dog outpaces a swift fox",
    "the five boxing wizards jump quickly",
    "dogs and foxes are canids",
    "pack my box with five dozen liquor jugs",
]

# no stemming/stopwords for the hand-checked math
PLAIN = BM25Config(stem=False, remove_stopwords=False, lowercase=True)


def okapi_reference_scores(docs_tokens, query_tokens, k1=1.5, b=0.75, epsilon=0.25):
    """Direct transliteration of the BM25Okapi formula for the oracle."""
    n = len(docs_tokens)
    df = {}
    for toks in docs_tokens:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    raw_idf = {t: math.log((n - f + 0.5) / (f + 0.5)) for t, f in df.items()}
    avg_idf = sum(raw_idf.values()) / len(raw_idf)
    idf = {t: (v if v >= 0 else epsilon * avg_idf) for t, v in raw_idf.items()}
    avgdl = sum(map(len, docs_tokens)) / n
    scores = []
    for toks in docs_tokens:
        dl = len(toks)
        s = 0.0
        for q in query_tokens:
            tf = toks.count(q)
            if tf == 0 or q not in idf:
                continue
            s += idf[q] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return np.asarray(scores, dtype=np.float32)


def test_index_against_okapi_formula():
    analyzer = PLAIN.analyzer()
    docs_tokens = [analyzer(t) for t in CORPUS]
    index = BM25Index.build(CORPUS, PLAIN)
    for query in ["quick brown fox", "five dozen wizards", "dog dog"]:
        q_toks = analyzer(query)
        expected = okapi_reference_scores(docs_tokens, q_toks)
        got = index.score_all(index.encode_query(q_toks))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_engine_matches_oracle_topk():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(300)
    ]
    index = BM25Index.build(texts, PLAIN)
    engine = BM25Engine(index)
    queries = [" ".join(rng.choice(vocab, size=rng.integers(1, 6))) for _ in range(32)]
    k = 5
    result = engine.search(queries, k=k)
    analyzer = PLAIN.analyzer()
    for qi, q in enumerate(queries):
        dense = index.score_all(index.encode_query(analyzer(q)))
        order = np.argsort(-dense, kind="stable")
        expected_scores = np.sort(dense[order[:k]])[::-1]
        got_scores = result.scores[qi]
        n_hits = int((dense > 0).sum())
        np.testing.assert_allclose(
            got_scores[: min(k, n_hits)], expected_scores[: min(k, n_hits)], rtol=1e-4
        )
        # returned docs must actually have those scores (ties can permute)
        for slot in range(min(k, n_hits)):
            d = result.doc_indices[qi, slot]
            assert d >= 0
            np.testing.assert_allclose(dense[d], got_scores[slot], rtol=1e-4)


def test_duplicate_query_terms_score_twice():
    index = BM25Index.build(CORPUS, PLAIN)
    engine = BM25Engine(index)
    once = engine.search(["fox"], k=3)
    twice = engine.search(["fox fox"], k=3)
    np.testing.assert_allclose(twice.scores, once.scores * 2, rtol=1e-5)


def test_empty_and_oov_query():
    index = BM25Index.build(CORPUS, PLAIN)
    engine = BM25Engine(index)
    result = engine.search(["zzz unseen tokens"], k=5)
    assert (result.doc_indices == -1).all()
    assert (result.scores == 0).all()


def test_fewer_hits_than_k():
    index = BM25Index.build(CORPUS, PLAIN)
    engine = BM25Engine(index)
    result = engine.search(["wizards"], k=5)
    assert (result.doc_indices[0] >= 0).sum() == 1
    assert result.doc_indices[0, 0] == 2


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    index = BM25Index.build(CORPUS, BM25Config())
    index.save(tmp_path / "idx")
    loaded = BM25Index.load(tmp_path / "idx")
    assert loaded.vocab == index.vocab
    np.testing.assert_array_equal(loaded.postings_doc, index.postings_doc)
    np.testing.assert_allclose(loaded.postings_impact, index.postings_impact)
    assert loaded.config == index.config
    e1, e2 = BM25Engine(index), BM25Engine(loaded)
    q = ["quick brown fox jumping"]
    np.testing.assert_array_equal(e1.search(q).doc_indices, e2.search(q).doc_indices)


def test_analyzer_chain():
    a = Analyzer()
    assert a("The running foxes jumped!") == ["run", "fox", "jump"]
    plain = Analyzer(stem=False, remove_stopwords=False)
    assert plain("The quick fox") == ["the", "quick", "fox"]


def test_retrieve_single_query():
    index = BM25Index.build(CORPUS, PLAIN)
    engine = BM25Engine(index)
    docs = engine.retrieve("quick brown fox", k=2)
    assert len(docs) == 2
    assert set(docs) <= {0, 1}


def test_zero_idf_terms_still_match():
    # a term in exactly half the docs has idf == 0 under Okapi; matched docs
    # score 0.0 but must still be returned (the reference's retriever
    # returns them) — regression for the sentinel-vs-score hit test
    corpus = ["capital france", "capital germany", "ocean pacific", "president usa"]
    index = BM25Index.build(corpus, PLAIN)
    engine = BM25Engine(index)
    res = engine.search(["capital"], k=2)
    assert sorted(res.doc_indices[0].tolist()) == [0, 1]
    np.testing.assert_allclose(res.scores[0], 0.0, atol=1e-7)


@pytest.mark.slow
def test_engine_pallas_fused_path_matches_xla():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(100)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 25))) for _ in range(150)]
    index = BM25Index.build(texts, PLAIN)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(12)]
    r_xla = BM25Engine(index, use_pallas=False).search(queries, k=5)
    r_pal = BM25Engine(index, use_pallas=True).search(queries, k=5)
    np.testing.assert_allclose(r_xla.scores, r_pal.scores, rtol=1e-4, atol=1e-6)
    # scores of the returned docs must agree even when ties permute ids
    for qi, q in enumerate(queries):
        dense = index.score_all(index.encode_query(PLAIN.analyzer()(q)))
        for slot in range(5):
            d1, d2 = r_xla.doc_indices[qi, slot], r_pal.doc_indices[qi, slot]
            if d1 >= 0 or d2 >= 0:
                np.testing.assert_allclose(dense[d1], dense[d2], rtol=1e-4)


@pytest.mark.slow
def test_mega_batch_matches_bucketed():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(150)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30))) for _ in range(200)]
    index = BM25Index.build(texts, PLAIN)
    engine = BM25Engine(index)
    queries = [" ".join(rng.choice(vocab, size=rng.integers(1, 5))) for _ in range(40)]
    term_ids = [index.encode_query(PLAIN.analyzer()(q)) for q in queries]
    r1 = engine.search_term_ids(term_ids, k=5)
    r2 = engine.search_mega_batch(term_ids, k=5)
    np.testing.assert_allclose(r1.scores, r2.scores, rtol=1e-4, atol=1e-6)
    for qi in range(len(queries)):
        dense = index.score_all(term_ids[qi])
        for slot in range(5):
            d1, d2 = r1.doc_indices[qi, slot], r2.doc_indices[qi, slot]
            if d1 >= 0 or d2 >= 0:
                np.testing.assert_allclose(dense[d1], dense[d2], rtol=1e-4)


@pytest.mark.slow
def test_mega_batch_overflow_path():
    # a plan with tiny capacities forces escalation + overflow fallback
    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=10)) for _ in range(100)]
    index = BM25Index.build(texts, PLAIN)
    engine = BM25Engine(index)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(20)]
    term_ids = [index.encode_query(PLAIN.analyzer()(q)) for q in queries]
    plan = ((512, 2), (2048, 2))  # 4 slots for 20 queries
    r1 = engine.search_term_ids(term_ids, k=3)
    r2 = engine.search_mega_batch(term_ids, k=3, plan=plan)
    np.testing.assert_allclose(r1.scores, r2.scores, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_search_stream_matches_bucketed():
    """The O(buckets)-dispatch scanned stream path returns the same answers
    as the per-tile bucketed path (and hence the oracle)."""
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(150)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30))) for _ in range(200)]
    index = BM25Index.build(texts, PLAIN)
    engine = BM25Engine(index)
    queries = [" ".join(rng.choice(vocab, size=rng.integers(1, 6))) for _ in range(70)]
    term_ids = [index.encode_query(PLAIN.analyzer()(q)) for q in queries]
    r1 = engine.search_term_ids(term_ids, k=5)
    r2 = engine.search_stream(term_ids, k=5)
    np.testing.assert_allclose(r1.scores, r2.scores, rtol=1e-4, atol=1e-6)
    for qi in range(len(queries)):
        dense = index.score_all(term_ids[qi])
        for slot in range(5):
            d1, d2 = r1.doc_indices[qi, slot], r2.doc_indices[qi, slot]
            if d1 >= 0 or d2 >= 0:
                np.testing.assert_allclose(dense[d1], dense[d2], rtol=1e-4)


def test_search_stream_device_parts_cover_stream():
    rng = np.random.default_rng(14)
    vocab = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(120)]
    index = BM25Index.build(texts, PLAIN)
    engine = BM25Engine(index)
    term_ids = [
        index.encode_query(PLAIN.analyzer()(" ".join(rng.choice(vocab, size=3))))
        for _ in range(30)
    ]
    res = engine.search_stream(term_ids, k=5, as_numpy=False)
    assert res.parts
    total_rows = sum(int(np.asarray(s).shape[0]) for s, _ in res.parts)
    assert total_rows >= len(term_ids)


def test_build_tokenized_ids_matches_string_build():
    """The vectorized integer-stream builder (the web-scale path,
    bench_wiki_scale.py) must produce the same CSR + impacts as the
    per-doc string builder on an identical corpus."""
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(11)
    doc_lens = rng.integers(3, 20, size=120)
    token_ids = rng.zipf(1.3, size=int(doc_lens.sum())) % 97
    cfg = BM25Config(stem=False, remove_stopwords=False)
    a = BM25Index.build_tokenized_ids(token_ids, doc_lens, cfg)

    docs_tokens, pos = [], 0
    for n in doc_lens:
        docs_tokens.append([f"t{t}" for t in token_ids[pos : pos + n]])
        pos += n
    b = BM25Index.build_tokenized(docs_tokens, cfg)

    # same postings per term (b's term ids come from first-seen order)
    for term, tb in b.vocab.items():
        ta = a.vocab[term]
        sa = slice(a.term_offsets[ta], a.term_offsets[ta + 1])
        sb = slice(b.term_offsets[tb], b.term_offsets[tb + 1])
        np.testing.assert_array_equal(a.postings_doc[sa], b.postings_doc[sb])
        np.testing.assert_allclose(
            a.postings_impact[sa], b.postings_impact[sb], rtol=1e-6
        )


def test_int32_bounds_trip_at_scale_boundary():
    """The engine/store int32 guards (retrieval/bm25.py, bm25_index.py) must
    raise with the 'shard the index' message. Broadcast arrays give the
    huge lengths without allocating."""
    import pytest

    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import (
        BM25Config, BM25Index, build_bitonic_store,
    )

    huge_doc = np.broadcast_to(np.int32(0), (2**31,))
    huge_imp = np.broadcast_to(np.float32(0), (2**31,))
    idx = BM25Index(
        config=BM25Config(),
        vocab={"t0": 0},
        term_offsets=np.asarray([0, 2**31], np.int64),
        postings_doc=huge_doc,
        postings_impact=huge_imp,
        doc_lens=np.ones(4, np.int32),
        doc_ids=["0", "1", "2", "3"],
    )
    with pytest.raises(ValueError, match="shard the index"):
        BM25Engine(idx, mode="xla")
    with pytest.raises(ValueError, match="shard the index"):
        build_bitonic_store(
            idx.term_offsets, huge_doc, huge_imp, sentinel=4
        )


@pytest.mark.slow
def test_serving_scale_top_k_matches_oracle():
    """Scale-regression net for precision bugs that only appear once a
    device scores >=~600k docs (the segment stage's old cumsum-difference
    formulation passed every small-scale exactness test but corrupted run
    totals here — one f32 ulp of a ~1e5 prefix sum exceeds true score
    gaps). Builds 400k synthetic Zipf docs and requires the xla engine's
    top-10 score multiset to match the exact host oracle."""
    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 400_000, 24, 50_000
    need = n_docs * doc_len
    parts = []
    while need > 0:
        z = rng.zipf(1.3, size=need + need // 2)
        z = z[z >= 180][:need]
        parts.append(z)
        need -= len(z)
    token_ids = (np.concatenate(parts) % vocab).astype(np.int64)
    index = BM25Index.build_tokenized_ids(
        token_ids, np.full(n_docs, doc_len, np.int64),
        BM25Config(stem=False, remove_stopwords=False),
    )
    engine = BM25Engine(index, mode="xla")
    queries = [
        (rng.zipf(1.3, size=8)[:4] % vocab).astype(np.int32) + 180
        for _ in range(4)
    ]
    res = engine.search_term_ids(queries, k=10)
    for i, q in enumerate(queries):
        oracle = index.score_all(q)
        got = res.scores[i][res.doc_indices[i] >= 0]
        exp = np.sort(oracle)[::-1][: len(got)]
        np.testing.assert_allclose(
            np.sort(got)[::-1], exp, rtol=1e-4, atol=1e-3
        )
