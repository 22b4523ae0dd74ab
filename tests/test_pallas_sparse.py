"""Pallas segment+top-k kernel vs the XLA reference implementation
(interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.ops.pallas_sparse import bm25_search_padded_fused, segment_topk_pallas
from probing_rag_tpu.ops.sparse import bm25_search_padded, sorted_segment_topk

INTERPRET = jax.default_backend() != "tpu"


def _random_sorted_postings(rng, q, p, n_docs, run_max=6):
    """Sorted doc rows with duplicate runs and sentinel padding tails."""
    doc = np.full((q, p), n_docs, np.int32)
    imp = np.zeros((q, p), np.float32)
    for i in range(q):
        n_fill = rng.integers(0, p)
        docs = np.sort(rng.integers(0, n_docs, n_fill // 2 + 1))
        row = np.repeat(docs, rng.integers(1, run_max, len(docs)))[:n_fill]
        row.sort()
        doc[i, : len(row)] = row
        imp[i, : len(row)] = rng.random(len(row), dtype=np.float32) + 0.01
    return doc, imp


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.slow
def test_segment_topk_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    q, p, n_docs, k = 7, 1500, 40, 5  # non-multiples of the tile sizes
    doc, imp = _random_sorted_postings(rng, q, p, n_docs)
    v_ref, i_ref = sorted_segment_topk(
        jnp.asarray(doc), jnp.asarray(imp), k, sentinel=n_docs, presorted=True
    )
    v_pal, i_pal = segment_topk_pallas(
        jnp.asarray(doc), jnp.asarray(imp), k=k, sentinel=n_docs,
        tile_q=8, tile_p=256, interpret=INTERPRET,
    )
    # compare totals per returned doc (tied totals may permute doc order)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_pal), rtol=1e-4, atol=1e-5)
    # every returned doc's score must match its true total
    for qi in range(q):
        true = {}
        for dd, vv in zip(doc[qi], imp[qi]):
            if dd < n_docs:
                true[dd] = true.get(dd, 0.0) + float(vv)
        for slot in range(k):
            d_p = int(i_pal[qi, slot])
            if d_p >= 0:
                np.testing.assert_allclose(
                    float(v_pal[qi, slot]), true[d_p], rtol=1e-4, atol=1e-5
                )


@pytest.mark.slow
def test_segment_sum_exact_at_large_prefix_sums():
    """Run totals must NOT be computed as differences of a row-long f32
    cumsum: at production widths the prefix sum reaches ~1e5 where an f32
    ulp (~0.01) exceeds real score gaps — the 5M-doc wiki exercise failed
    its oracle spot checks exactly this way. Every run total here is a sum
    of <= 4 values, so both implementations must return it near-exactly
    even though the row's total mass is ~65k."""
    p, n_docs = 65536, 1 << 22
    rng = np.random.default_rng(3)
    # distinct ascending docs, runs of 4, all impacts ~1.0: prefix sum
    # grows to ~65k while each true run total is ~4
    docs = np.sort(rng.choice(n_docs, p // 4, replace=False)).astype(np.int32)
    doc = np.repeat(docs, 4)[None, :]
    imp = (1.0 + rng.random(p).astype(np.float32) * 1e-3)[None, :]
    true = imp.reshape(-1, 4).sum(1, dtype=np.float64)
    # plant a unique winner deep in the tail where cumsum error is maximal
    imp[0, -3:] += 2.0
    true[-1] += 6.0
    order = np.argsort(true)[::-1][:5]
    v_x, i_x = sorted_segment_topk(
        jnp.asarray(doc), jnp.asarray(imp), 5, sentinel=n_docs,
        presorted=True, max_run=4,
    )
    v_p, i_p = segment_topk_pallas(
        jnp.asarray(doc), jnp.asarray(imp), k=5, sentinel=n_docs,
        interpret=INTERPRET,
    )
    for v, i in ((v_x, i_x), (v_p, i_p)):
        np.testing.assert_array_equal(np.asarray(i[0]), docs[order])
        np.testing.assert_allclose(
            np.asarray(v[0]), true[order], rtol=1e-6, atol=1e-5
        )


def test_segment_topk_runs_spanning_tiles():
    # one doc's run crosses several P tiles
    q, p, n_docs = 2, 1024, 10
    doc = np.full((q, p), n_docs, np.int32)
    imp = np.zeros((q, p), np.float32)
    doc[0, :700] = 3  # single long run across 2+ tiles of 256
    imp[0, :700] = 0.5
    doc[1, :256] = 1
    imp[1, :256] = 1.0
    doc[1, 256:512] = 2  # run exactly tile-aligned
    imp[1, 256:512] = 2.0
    v, i = segment_topk_pallas(
        jnp.asarray(doc), jnp.asarray(imp), k=3, sentinel=n_docs,
        tile_q=8, tile_p=256, interpret=INTERPRET,
    )
    assert int(i[0, 0]) == 3
    np.testing.assert_allclose(float(v[0, 0]), 350.0, rtol=1e-5)
    assert int(i[0, 1]) == -1
    assert int(i[1, 0]) == 2
    np.testing.assert_allclose(float(v[1, 0]), 512.0, rtol=1e-5)
    assert int(i[1, 1]) == 1
    np.testing.assert_allclose(float(v[1, 1]), 256.0, rtol=1e-5)


@pytest.mark.slow
def test_fused_search_matches_split():
    rng = np.random.default_rng(3)
    nnz, n_docs, t = 20_000, 500, 200
    lens = rng.multinomial(nnz, np.ones(t) / t)
    offs = np.zeros(t + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    docs = np.concatenate([np.sort(rng.integers(0, n_docs, l)) for l in lens]).astype(np.int32)
    imps = (rng.random(nnz, dtype=np.float32) + 0.01)
    qterms = rng.integers(0, t, (16, 8)).astype(np.int32)
    qmask = rng.random((16, 8)) < 0.8
    kw = dict(pad=2048, sentinel_doc=n_docs, k=5)
    a = bm25_search_padded(
        jnp.asarray(offs.astype(np.int32)), jnp.asarray(docs), jnp.asarray(imps),
        jnp.asarray(qterms), jnp.asarray(qmask), **kw,
    )
    b = bm25_search_padded_fused(
        jnp.asarray(offs.astype(np.int32)), jnp.asarray(docs), jnp.asarray(imps),
        jnp.asarray(qterms), jnp.asarray(qmask), interpret=INTERPRET, **kw,
    )
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-4, atol=1e-5)


def test_postings_gather_pallas_alternated_blocks():
    """E/O parity-selected DMA gather (the over-cap fallback's pass-skip
    enabler): every store-block of the produced rows must come out sorted —
    ascending at even row-local block index, descending at odd — with the
    same content as the terms' aligned regions."""
    from probing_rag_tpu.ops.pallas_sparse import postings_gather_pallas
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    block = 128
    rng = np.random.default_rng(21)
    docs = [
        [f"t{t}" for t in rng.zipf(1.2, rng.integers(3, 30)) % 300]
        for _ in range(3000)
    ]
    idx = BM25Index.build_tokenized(
        docs, BM25Config(stem=False, remove_stopwords=False)
    )
    st = idx.bitonic_csr(min_len=64, block=block)
    big = np.nonzero(st.aligned_len > 0)[0]
    assert len(big) >= 4
    q_terms = [big[:3], big[1:4]]
    tq = 4
    starts = np.zeros((2, tq), np.int32)
    lens = np.zeros((2, tq), np.int32)
    for r, ids in enumerate(q_terms):
        starts[r, : len(ids)] = st.aligned_start[ids]
        lens[r, : len(ids)] = st.aligned_len[ids]
    totals = lens.sum(axis=1)
    pad = max(int(2 ** np.ceil(np.log2(totals.max()))), 4 * block)
    doc, imp = postings_gather_pallas(
        jnp.asarray(st.doc_e), jnp.asarray(st.imp_e),
        jnp.asarray(starts), jnp.asarray(lens),
        pad=pad, sentinel=idx.n_docs, chunk=block, interpret=True,
        postings_doc_o=jnp.asarray(st.doc_o),
        postings_impact_o=jnp.asarray(st.imp_o),
        block=block,
    )
    doc = np.asarray(doc)
    for r in range(2):
        blocks = doc[r][: totals[r]].reshape(-1, block).astype(np.int64)
        for b in range(len(blocks)):
            d = np.diff(blocks[b])
            assert (d >= 0).all() if b % 2 == 0 else (d <= 0).all(), (r, b)
        want = np.sort(
            np.concatenate(
                [
                    st.doc_e[
                        st.aligned_start[t] : st.aligned_start[t]
                        + st.aligned_len[t]
                    ]
                    for t in q_terms[r]
                ]
            )
        )
        assert np.array_equal(np.sort(doc[r][: totals[r]]), want)


@pytest.mark.parametrize("row_tile", [1, 4, 8])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.slow
def test_postings_assemble_matches_xla_gather(weighted, row_tile):
    """Compact VMEM-assembly short-term gather vs ops.sparse.postings_gather
    (same slot order, same sentinel tail, weights pre-applied), single-row
    and sublane-packed kernels."""
    from probing_rag_tpu.ops.pallas_sparse import postings_assemble_pallas
    from probing_rag_tpu.ops.sparse import postings_gather

    rng = np.random.default_rng(31)
    t, n_docs = 60, 5000
    lens = rng.integers(1, 200, t)  # all short (< 1024)
    offs = np.zeros(t + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    nnz = int(offs[-1])
    docs = np.concatenate(
        [np.sort(rng.integers(0, n_docs, l)) for l in lens]
    ).astype(np.int32)
    imps = rng.random(nnz, dtype=np.float32) + 0.01
    # guarded compact copies, (1, N) layout as in the bitonic store
    guard_d = np.full(2048, n_docs, np.int32)
    doc_c = np.concatenate([docs, guard_d])[None, :]
    imp_c = np.concatenate([imps, np.zeros(2048, np.float32)])[None, :]

    q, tq = 8, 8
    qt = rng.integers(0, t, (q, tq)).astype(np.int32)
    qm = rng.random((q, tq)) < 0.8
    qm[3] = False  # an empty row
    src = np.where(qm, offs[qt], 0).astype(np.int32)
    rlen = np.where(qm, lens[qt], 0).astype(np.int32)
    pad = 2048
    assert rlen.sum(axis=1).max() <= pad

    wt = None
    wt_bits = None
    if weighted:
        wt = (rng.integers(1, 4, (q, tq))).astype(np.float32)
        wt_bits = jnp.asarray(wt.view(np.int32))

    d_ref, i_ref = postings_gather(
        jnp.asarray(offs.astype(np.int32)), jnp.asarray(docs),
        jnp.asarray(imps), jnp.asarray(qt), jnp.asarray(qm),
        pad, n_docs, qweights=jnp.asarray(wt) if weighted else None,
    )
    d_out, i_out = postings_assemble_pallas(
        jnp.asarray(doc_c), jnp.asarray(imp_c),
        jnp.asarray(src), jnp.asarray(rlen), wt_bits,
        pad=pad, sentinel=n_docs, row_tile=row_tile, interpret=True,
    )
    assert np.array_equal(np.asarray(d_out), np.asarray(d_ref))
    np.testing.assert_allclose(
        np.asarray(i_out), np.asarray(i_ref), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("row_tile", [1, 3, 6])
@pytest.mark.slow
def test_postings_assemble_block_boundary_lens(row_tile):
    """Kernel contract edges: term lengths at/near the 1024 per-term bound
    and fills landing exactly on block boundaries (flush-path corners the
    random-length test can't reliably hit)."""
    from probing_rag_tpu.ops.pallas_sparse import postings_assemble_pallas
    from probing_rag_tpu.ops.sparse import postings_gather

    n_docs = 100_000
    # rows exercising: exact-block fill (1024 = 1+1023), max-len chains,
    # single max-len term, alternating tiny/huge, all-empty row
    rows = [
        [1, 1023, 512, 512, 1023],
        [1023, 1023, 1023, 1023],
        [1023],
        [1, 1023, 1, 1023, 1, 1023, 1],
        [],
        [1024 - 1, 1, 1024],  # a 1024 run is NOT allowed per-term; use 512+512
    ]
    rows[5] = [511, 513, 1024 // 2, 512]  # keep all < 1024
    lens_all = sorted({l for r in rows for l in r})
    lens = np.asarray(lens_all, np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    nnz = int(offs[-1])
    rng = np.random.default_rng(7)
    docs = np.concatenate(
        [np.sort(rng.integers(0, n_docs, l)) for l in lens]
    ).astype(np.int32)
    imps = rng.random(nnz, dtype=np.float32) + 0.01
    doc_c = np.concatenate([docs, np.full(2048, n_docs, np.int32)])[None, :]
    imp_c = np.concatenate([imps, np.zeros(2048, np.float32)])[None, :]

    len_to_tid = {int(l): i for i, l in enumerate(lens)}
    tq = max(len(r) for r in rows)
    q = len(rows)
    qt = np.zeros((q, tq), np.int32)
    qm = np.zeros((q, tq), bool)
    for r_, terms in enumerate(rows):
        for c, l in enumerate(terms):
            qt[r_, c] = len_to_tid[l]
            qm[r_, c] = True
    src = np.where(qm, offs[qt], 0).astype(np.int32)
    rlen = np.where(qm, lens[qt], 0).astype(np.int32)
    pad = 8192
    assert rlen.sum(axis=1).max() <= pad

    d_ref, i_ref = postings_gather(
        jnp.asarray(offs.astype(np.int32)), jnp.asarray(docs),
        jnp.asarray(imps), jnp.asarray(qt), jnp.asarray(qm),
        pad, n_docs,
    )
    d_out, i_out = postings_assemble_pallas(
        jnp.asarray(doc_c), jnp.asarray(imp_c),
        jnp.asarray(src), jnp.asarray(rlen), None,
        pad=pad, sentinel=n_docs, row_tile=row_tile, interpret=True,
    )
    assert np.array_equal(np.asarray(d_out), np.asarray(d_ref))
    np.testing.assert_allclose(
        np.asarray(i_out), np.asarray(i_ref), rtol=1e-6, atol=1e-7
    )
