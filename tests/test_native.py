"""Native (C++) index builder parity: stemmer vs nltk's original-algorithm
Porter, and the full CSR build vs the pure-Python builder."""

import numpy as np
import pytest

from probing_rag_tpu import native
from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native indexer"
)

WORDS = [
    "caresses", "flies", "dies", "mules", "denied", "died", "agreed", "owned",
    "humbled", "sized", "meeting", "stating", "siezing", "itemization",
    "sensational", "traditional", "reference", "colonizer", "plotted",
    "probate", "rate", "controll", "roll", "running", "capital", "president",
    "relational", "conditional", "rational", "valenci", "hesitanci",
    "digitizer", "conformabli", "radicalli", "differentli", "vileli",
    "analogousli", "vietnamization", "predication", "operator", "feudalism",
    "decisiveness", "hopefulness", "callousness", "formaliti", "sensitiviti",
    "sensibiliti", "triplicate", "formative", "formalize", "electriciti",
    "electrical", "hopeful", "goodness", "revival", "allowance", "inference",
    "airliner", "gyroscopic", "adjustable", "defensible", "irritant",
    "replacement", "adjustment", "dependent", "adoption", "homologou",
    "communism", "activate", "angulariti", "homologous", "effective", "bowdlerize",
]


@needs_native
@pytest.mark.slow
def test_porter_stemmer_matches_nltk_original():
    from nltk.stem import PorterStemmer

    ps = PorterStemmer(mode="ORIGINAL_ALGORITHM")
    mismatches = [
        (w, native.porter_stem(w), ps.stem(w))
        for w in WORDS
        if native.porter_stem(w) != ps.stem(w)
    ]
    assert not mismatches, mismatches


@needs_native
def test_native_build_matches_python_build():
    corpus = [
        "The quick brown foxes are jumping over the lazy dogs",
        "A meeting about traditional references and rational decisions",
        "Dogs and foxes running quickly through fields",
        "",
        "capital capital capital of france",
    ]
    cfg = BM25Config(stemmer_mode="original")
    py_index = BM25Index.build(corpus, cfg)
    c_index = BM25Index.build_native(corpus, cfg)
    assert c_index.vocab == py_index.vocab
    np.testing.assert_array_equal(c_index.term_offsets, py_index.term_offsets)
    np.testing.assert_array_equal(c_index.postings_doc, py_index.postings_doc)
    np.testing.assert_allclose(
        c_index.postings_impact, py_index.postings_impact, rtol=1e-6
    )
    np.testing.assert_array_equal(c_index.doc_lens, py_index.doc_lens)


@needs_native
def test_native_build_unicode_and_empty():
    corpus = ["héllo wörld café", "", "plain ascii text"]
    idx = BM25Index.build_native(corpus, BM25Config(stemmer_mode="original"))
    assert idx.n_docs == 3
    assert idx.doc_lens[1] == 0


def test_native_query_encoder_matches_python():
    """Batch query encoder parity: native analyze+encode == Python analyzer
    chain + BM25Index.encode_query on an original-mode index."""
    from probing_rag_tpu import native
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    if not native.available():
        pytest.skip("no C++ compiler")
    texts = [
        "The quick brown foxes are running and jumping over lazy dogs",
        "Retrieval augmented generation improves question answering systems",
        "Paris is the capital of France; Berlin is the capital of Germany",
    ]
    cfg = BM25Config(stemmer_mode="original")
    index = BM25Index.build_native(texts, cfg)
    enc = native.QueryEncoder(index.vocab)
    analyzer = cfg.analyzer()
    queries = [
        "quick foxes jumping",
        "what is the capital of France?",
        "nonexistent zzz terms only",
        "",
        "running running running",  # duplicates kept
    ]
    got = enc.encode(queries)
    for q, ids in zip(queries, got):
        expected = index.encode_query(analyzer(q))
        np.testing.assert_array_equal(ids, expected, err_msg=repr(q))


def test_native_query_encoder_drives_engine():
    from probing_rag_tpu import native
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    if not native.available():
        pytest.skip("no C++ compiler")
    texts = ["paris capital france", "berlin capital germany", "nile river africa"]
    index = BM25Index.build_native(texts, BM25Config(stemmer_mode="original"))
    engine = BM25Engine(index)
    enc = native.QueryEncoder(index.vocab)
    res = engine.search_term_ids(enc.encode(["capital of france"]), k=2)
    assert res.doc_indices[0, 0] == 0
