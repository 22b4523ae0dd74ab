"""IVF dense index tests: k-means quantizer, cell-sorted block layout,
probed Pallas search vs the union-probe numpy oracle, full-probe equality
with flat brute force, and the int8 (SQ8) store.

faiss-IVF parity target: make_indexer.py:446-457 builds flat faiss stores;
IVF is the documented scaling step (SURVEY.md §2.3 "flat, optionally IVF").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.retrieval.ivf import (
    IVFDenseIndex,
    IVFEngine,
    assign_cells,
    kmeans,
)


def _clustered(rng, n_clusters=8, per=64, d=32, spread=0.05):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3.0
    pts = (
        centers[:, None, :]
        + spread * rng.normal(size=(n_clusters, per, d)).astype(np.float32)
    ).reshape(-1, d)
    return pts, centers


def test_kmeans_recovers_separable_clusters():
    rng = np.random.default_rng(0)
    pts, centers = _clustered(rng)
    cent = kmeans(pts, 8, iters=15, seed=1)
    # every learned centroid sits near exactly one true center
    d2 = ((cent[:, None, :] - centers[None]) ** 2).sum(-1)
    nearest = d2.min(axis=1)
    assert (nearest < 0.1).all()
    assert len(set(d2.argmin(axis=1))) == 8  # bijection, no collapsed cells


def test_build_layout_partitions_docs():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    ix = IVFDenseIndex.build(emb, nlist=8, block=32, metric="l2", seed=0)
    ids = ix.ids_blocked
    real = ids[ids >= 0]
    # every doc stored exactly once, pad rows id -1 and zero vectors
    assert sorted(real.tolist()) == list(range(300))
    assert (ix.emb_blocked[ids < 0] == 0).all()
    np.testing.assert_allclose(ix.emb_blocked[ids >= 0], emb[real])
    # each stored row sits inside its assigned cell's block range
    cells = assign_cells(emb, ix.centroids)
    rows = np.nonzero(ids >= 0)[0]
    blk = rows // ix.block
    for r, b in zip(rows, blk):
        c = cells[ids[r]]
        assert ix.list_block_start[c] <= b < ix.list_block_start[c] + ix.list_nblocks[c]
    # trailing pad block is all-pad
    assert (ids[ix.pad_block * ix.block :] == -1).all()


def _union_oracle(engine, q, k):
    """Exact reference over the same per-tile union probe plan."""
    ix = engine.index
    desc = engine.plan(engine.probe_cells(q))
    vals, idxs = [], []
    for qi in range(len(q)):
        blocks = [b for b in desc[qi // 8] if b != ix.pad_block]
        rows = np.concatenate(
            [np.arange(b * ix.block, (b + 1) * ix.block) for b in blocks]
        )
        rows = rows[ix.ids_blocked[rows] >= 0]
        if ix.metric == "l2":
            s = ((q[qi][None] - ix.emb_blocked[rows]) ** 2).sum(-1)
            order = np.argsort(s, kind="stable")[:k]
        else:
            s = ix.emb_blocked[rows] @ q[qi]
            order = np.argsort(-s, kind="stable")[:k]
        vals.append(s[order])
        idxs.append(ix.ids_blocked[rows][order])
    return np.stack(vals), np.stack(idxs)


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("force_kernel", [False, True])
def test_probed_search_matches_union_oracle(metric, force_kernel):
    """Both implementations (XLA gather+einsum, the off-TPU production
    path; interpret-mode Pallas kernel) against the same oracle."""
    rng = np.random.default_rng(2)
    pts, _ = _clustered(rng, n_clusters=16, per=40, d=24)
    ix = IVFDenseIndex.build(pts, nlist=16, block=32, metric=metric, seed=0)
    eng = IVFEngine(ix, nprobe=3, store_dtype=jnp.float32,
                    force_kernel=force_kernel)
    q = rng.normal(size=(13, 24)).astype(np.float32) * 2.0  # non-multiple of 8
    res = eng.search_embeddings(q, k=5)
    ov, oi = _union_oracle(eng, q, 5)
    np.testing.assert_allclose(res.scores, ov, rtol=1e-4, atol=1e-4)
    # ids must score identically to the oracle's (tie order may differ)
    for i in range(len(q)):
        if metric == "l2":
            got = ((q[i][None] - pts[res.doc_indices[i]]) ** 2).sum(-1)
        else:
            got = pts[res.doc_indices[i]] @ q[i]
        np.testing.assert_allclose(got, ov[i], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_full_probe_equals_flat_bruteforce(metric):
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(257, 16)).astype(np.float32)
    ix = IVFDenseIndex.build(emb, nlist=8, block=32, metric=metric, seed=0)
    eng = IVFEngine(ix, nprobe=8, store_dtype=jnp.float32)  # probe everything
    q = rng.normal(size=(4, 16)).astype(np.float32)
    res = eng.search_embeddings(q, k=7)
    if metric == "l2":
        d = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
        expect = np.sort(d, axis=1)[:, :7]
    else:
        d = q @ emb.T
        expect = -np.sort(-d, axis=1)[:, :7]
    np.testing.assert_allclose(res.scores, expect, rtol=1e-4, atol=1e-4)
    got = np.take_along_axis(d, res.doc_indices, axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_int8_store_matches_quantized_oracle():
    rng = np.random.default_rng(4)
    pts, _ = _clustered(rng, n_clusters=8, per=48, d=16)
    ix = IVFDenseIndex.build(pts, nlist=8, block=32, metric="l2", seed=0)
    eng = IVFEngine(ix, nprobe=8, store_dtype=jnp.int8)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    res = eng.search_embeddings(q, k=5)
    # oracle over the quantized store (ranking IS the SQ8 store's)
    absmax = np.abs(ix.emb_blocked).max(-1)
    s = np.where(absmax > 0, absmax / 127.0, 1.0)
    deq = np.clip(np.round(ix.emb_blocked / s[:, None]), -127, 127) * s[:, None]
    real = ix.ids_blocked >= 0
    store = np.zeros_like(pts)
    store[ix.ids_blocked[real]] = deq[real]
    d = ((q[:, None, :] - store[None]) ** 2).sum(-1)
    expect = np.sort(d, axis=1)[:, :5]
    # bf16 matmul in-kernel: compare at bf16-rank tolerance
    got = np.take_along_axis(d, res.doc_indices, axis=1)
    np.testing.assert_allclose(got, expect, rtol=0.02, atol=0.05)


def test_probe_recall_on_clustered_data():
    rng = np.random.default_rng(5)
    pts, centers = _clustered(rng, n_clusters=32, per=32, d=24)
    ix = IVFDenseIndex.build(pts, nlist=32, block=32, metric="l2", seed=0)
    eng = IVFEngine(ix, nprobe=4, store_dtype=jnp.float32)
    # queries near data points: nearest neighbor lives in the probed cells
    qids = rng.choice(len(pts), 16, replace=False)
    q = pts[qids] + 0.01 * rng.normal(size=(16, 24)).astype(np.float32)
    res = eng.search_embeddings(q, k=1)
    assert (res.doc_indices[:, 0] == qids).mean() >= 0.9


@pytest.mark.slow
def test_cli_index_build_dense_ivf(tmp_path):
    """--dense --dense-ivf must leave a loadable IVF store next to the flat
    one, covering every doc the flat index covers."""
    from probing_rag_tpu.cli.main import main
    from probing_rag_tpu.retrieval.dense import DenseIndex

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "\n".join(f"document number {i} about topic {i % 7}" for i in range(40))
    )
    out = tmp_path / "index"
    main([
        "index-build", "--dataset", "fixture", "--fixture", str(corpus),
        "--out", str(out), "--dense", "--dense-ivf", "--platform", "cpu",
    ])
    ix = IVFDenseIndex.load(out / "ivf")
    flat = DenseIndex.load(out / "dense")
    assert ix.n_docs == flat.n_docs == 40
    real = ix.ids_blocked[ix.ids_blocked >= 0]
    assert sorted(real.tolist()) == list(range(40))
    eng = IVFEngine(ix, nprobe=ix.nlist, store_dtype=jnp.float32)
    res = eng.search_embeddings(flat.embeddings[:3], k=1)
    assert (res.doc_indices[:, 0] == np.arange(3)).all()


@pytest.mark.slow
def test_serving_scale_probed_topk_matches_oracle():
    """Scale-regression net for the IVF path (the round-3 lesson: the BM25
    segment stage passed every small-scale exactness test and corrupted
    scores at 600k+ docs — scale exercises are correctness tools). 400k
    docs, 1024 cells, multi-block cells: probed top-k must match the exact
    union-probe oracle, and the build's vectorized dest-index arithmetic
    must place every doc exactly once."""
    rng = np.random.default_rng(10)
    n, d = 400_000, 64
    centers = rng.normal(size=(512, d)).astype(np.float32) * 2.0
    emb = (centers[rng.integers(0, 512, size=n)]
           + 0.2 * rng.normal(size=(n, d)).astype(np.float32))
    ix = IVFDenseIndex.build(emb, nlist=1024, block=256, metric="ip",
                             seed=0, iters=5)
    real = ix.ids_blocked[ix.ids_blocked >= 0]
    assert real.size == n and np.unique(real).size == n
    eng = IVFEngine(ix, nprobe=16, store_dtype=jnp.float32)
    q = rng.normal(size=(8, d)).astype(np.float32)
    res = eng.search_embeddings(q, k=10)
    ov, _ = _union_oracle(eng, q, 10)
    np.testing.assert_allclose(res.scores, ov, rtol=1e-4, atol=1e-3)


def test_kernel_all_hole_tile_and_short_candidates():
    """Kernel contract pins: a tile whose descriptors are ALL holes returns
    id -1 / -inf rows (callers must handle empty probes), and a probe set
    with fewer real candidates than k fills the tail with -1."""
    import jax

    from probing_rag_tpu.ops.pallas_ivf import ivf_topk_pallas

    rng = np.random.default_rng(12)
    block = 32
    # store: 1 real block (3 real rows) + trailing pad block
    emb = np.zeros((2 * block, 8), np.float32)
    emb[:3] = rng.normal(size=(3, 8))
    ids = np.full((2 * block,), -1, np.int32)
    ids[:3] = [7, 8, 9]
    q = rng.normal(size=(16, 8)).astype(np.float32)  # 2 tiles
    # tile 0 probes the real block; tile 1 probes only the pad block
    desc = np.array([[0, 1], [1, 1]], np.int32)
    with jax.disable_jit(False):
        vals, got = ivf_topk_pallas(
            jnp.asarray(q), jnp.asarray(desc), jnp.asarray(emb),
            jnp.asarray(np.broadcast_to(ids[None, :], (8, 2 * block)).copy()),
            k=5, metric="ip", block=block, interpret=True,
        )
    vals, got = np.asarray(vals), np.asarray(got)
    # tile 0: 3 real candidates, then -1 tail
    assert set(got[0, :3].tolist()) == {7, 8, 9}
    assert (got[:8, 3:] == -1).all()
    assert np.isneginf(vals[:8, 3:]).all()
    # tile 1 (all holes): nothing inserted anywhere
    assert (got[8:] == -1).all()
    # the XLA path obeys the same contract
    from probing_rag_tpu.ops.pallas_ivf import ivf_topk_xla

    xv, xi = ivf_topk_xla(
        jnp.asarray(q), jnp.asarray(desc), jnp.asarray(emb),
        jnp.asarray(np.broadcast_to(ids[None, :], (8, 2 * block)).copy()),
        k=5, metric="ip", block=block,
    )
    xv, xi = np.asarray(xv), np.asarray(xi)
    assert set(xi[0, :3].tolist()) == {7, 8, 9}
    assert (xi[:8, 3:] == -1).all() and (xi[8:] == -1).all()
    np.testing.assert_allclose(np.sort(xv[:, :3], -1), np.sort(vals[:, :3], -1),
                               rtol=1e-5, atol=1e-6)


def test_imbalance_factor_sane():
    rng = np.random.default_rng(11)
    pts, _ = _clustered(rng, n_clusters=8, per=64, d=16)
    ix = IVFDenseIndex.build(pts, nlist=8, block=32, metric="l2", seed=0)
    f = ix.imbalance_factor()
    # separable equal-size clusters: near-perfect balance; and the factor
    # is >= 1 by Cauchy-Schwarz
    assert 1.0 <= f < 1.3


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    ix = IVFDenseIndex.build(emb, nlist=8, block=32, metric="ip", seed=0)
    ix.save(tmp_path / "ivf")
    loaded = IVFDenseIndex.load(tmp_path / "ivf")
    q = rng.normal(size=(8, 16)).astype(np.float32)
    a = IVFEngine(ix, nprobe=4, store_dtype=jnp.float32).search_embeddings(q, k=3)
    b = IVFEngine(loaded, nprobe=4, store_dtype=jnp.float32).search_embeddings(q, k=3)
    np.testing.assert_array_equal(a.doc_indices, b.doc_indices)
    np.testing.assert_allclose(a.scores, b.scores)
