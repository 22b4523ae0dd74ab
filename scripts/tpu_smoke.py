#!/usr/bin/env python
"""Real-TPU lowering smoke for every Pallas kernel config the benches hit.

Interpret-mode tests (the CPU suite) accept programs Mosaic rejects — the
round-3 headline bench crashed on a scalar `tpu.bitcast` that every
interpret-mode test passed (logs/measure_bm25.err), and `merge_segs` 4/8
failed only on hardware. This script compiles + runs each kernel at tiny
shapes on the real chip and oracle-checks the outputs, so a lowering
regression is caught in ~1 min instead of mid-measurement-session.

Run: python scripts/tpu_smoke.py   (needs the TPU tunnel; exits 1 on failure)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

FAILURES = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time() - t0:.1f}s)")
    except Exception as e:  # noqa: BLE001 — report and continue
        FAILURES.append(name)
        msg = str(e).splitlines()
        print(f"FAIL {name}: {msg[0] if msg else type(e).__name__}")


def smoke_assemble(weighted, row_tile):
    """postings_assemble_pallas — the r3/r4 headline-bench crash site
    (weighted=True exercises the in-kernel f32 bitcast)."""
    from probing_rag_tpu.ops.pallas_sparse import postings_assemble_pallas
    from probing_rag_tpu.ops.sparse import postings_gather

    rng = np.random.default_rng(31)
    t, n_docs = 24, 5000
    lens = rng.integers(1, 200, t)
    offs = np.zeros(t + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    nnz = int(offs[-1])
    docs = np.concatenate(
        [np.sort(rng.integers(0, n_docs, l)) for l in lens]
    ).astype(np.int32)
    imps = rng.random(nnz, dtype=np.float32) + 0.01
    doc_c = np.concatenate([docs, np.full(2048, n_docs, np.int32)])[None, :]
    imp_c = np.concatenate([imps, np.zeros(2048, np.float32)])[None, :]

    q, tq = 8, 6
    qt = rng.integers(0, t, (q, tq)).astype(np.int32)
    qm = rng.random((q, tq)) < 0.8
    src = np.where(qm, offs[qt], 0).astype(np.int32)
    rlen = np.where(qm, lens[qt], 0).astype(np.int32)
    pad = 2048

    wt = wt_bits = None
    if weighted:
        wt = rng.integers(1, 4, (q, tq)).astype(np.float32)
        wt_bits = jnp.asarray(wt.view(np.int32))

    d_ref, i_ref = postings_gather(
        jnp.asarray(offs.astype(np.int32)), jnp.asarray(docs),
        jnp.asarray(imps), jnp.asarray(qt), jnp.asarray(qm),
        pad, n_docs, qweights=jnp.asarray(wt) if weighted else None,
    )
    d_out, i_out = postings_assemble_pallas(
        jnp.asarray(doc_c), jnp.asarray(imp_c),
        jnp.asarray(src), jnp.asarray(rlen), wt_bits,
        pad=pad, sentinel=n_docs, row_tile=row_tile,
    )
    assert np.array_equal(np.asarray(d_out), np.asarray(d_ref))
    np.testing.assert_allclose(
        np.asarray(i_out), np.asarray(i_ref), rtol=1e-6, atol=1e-7
    )


def smoke_dense(merge_segs, int8, rerank=False):
    """dense_topk_pallas / dense_topk_rerank — merge_segs 4/8 crashed on
    TPU in r3 with only interpret-mode coverage."""
    from probing_rag_tpu.ops.pallas_dense import (
        dense_topk_pallas, dense_topk_rerank, prepare_dense_store,
    )

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(3000, 128)).astype(np.float32)
    q = rng.normal(size=(16, 128)).astype(np.float32)
    store, sqn, scl, n = prepare_dense_store(
        jnp.asarray(emb, np.float32 if int8 else jnp.bfloat16),
        tile_n=512, metric="ip", store_dtype=jnp.int8 if int8 else None,
    )
    if rerank:
        v, idx = dense_topk_rerank(
            jnp.asarray(q), store, jnp.asarray(emb, jnp.bfloat16), k=10,
            scales=scl, n_total=n, tile_n=512, k_pad=32,
            merge_segs=merge_segs,
        )
    else:
        v, idx = dense_topk_pallas(
            jnp.asarray(q), store, k=10, scales=scl, n_total=n,
            tile_n=512, merge_segs=merge_segs,
        )
    order = np.argsort(-(q @ emb.T), axis=-1)[:, :10]
    got = np.asarray(idx)
    # int8 sweep may rank-swap near-ties; demand high overlap not equality
    inter = np.mean(
        [len(set(got[r]) & set(order[r])) / 10 for r in range(len(q))]
    )
    assert inter >= (0.99 if (rerank or not int8) else 0.8), inter


def smoke_int4_decode():
    """decode_greedy with grouped-int4 weights at tiny geometry — the r4
    measurement-session crash site (native S4 host->jit args recursed in
    the TPU runtime, MEASURE_r4 decode_int4_b8; quantized params now cross
    the boundary nibble-packed as uint8, gemma._pack_int4)."""
    import dataclasses

    from probing_rag_tpu.models.decode import StopTables, decode_greedy
    from probing_rag_tpu.models.gemma import (
        CaptureSpec, GemmaConfig, init_params, quantize_lm_params,
    )

    cfg = dataclasses.replace(GemmaConfig.tiny(512), compute_dtype=jnp.bfloat16)
    params = quantize_lm_params(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16), bits=4)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 16)), jnp.int32)
    valid = jnp.ones((2, 16), bool)
    stop = StopTables.disabled(cfg.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    out = decode_greedy(
        params, tokens, valid, zeros, zeros, zeros, cfg=cfg,
        capture=CaptureSpec.for_probing(cfg), max_new_tokens=8, eos_id=-1,
        kv_int8=True,
    )
    toks = np.asarray(out[0])
    assert toks.shape == (2, 8) and np.all(toks >= 0)


def smoke_kv4_decode():
    """decode_greedy with the int4 KV cache at tiny geometry — S4 cache
    carry + merged [.., KV*G, S] scale layout through the TPU runtime's
    while_loop (the same runtime whose host-boundary S4 handling crashed
    r4's int4-weight rows; the cache stays jit-internal on the fused
    path, but the lowering itself is what this smoke pins)."""
    import dataclasses

    from probing_rag_tpu.models.decode import StopTables, decode_greedy
    from probing_rag_tpu.models.gemma import (
        CaptureSpec, GemmaConfig, init_params,
    )

    cfg = dataclasses.replace(GemmaConfig.tiny(512), compute_dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 16)), jnp.int32)
    valid = jnp.ones((2, 16), bool)
    stop = StopTables.disabled(cfg.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    out = decode_greedy(
        params, tokens, valid, zeros, zeros, zeros, cfg=cfg,
        capture=CaptureSpec.for_probing(cfg), max_new_tokens=8, eos_id=-1,
        kv_int4=True,
    )
    toks = np.asarray(out[0])
    assert toks.shape == (2, 8) and np.all(toks >= 0)


def smoke_w8a8_prefill():
    """decode_greedy with int8 weights and the w8a8 prefill path active
    (act_int8_rows below the prompt's row count): the s8 x s8 -> s32
    dot_general must lower and run on the chip, and the decode steps
    (rows = batch, below threshold) must keep producing valid tokens."""
    import dataclasses

    from probing_rag_tpu.models.decode import StopTables, decode_greedy
    from probing_rag_tpu.models.gemma import (
        CaptureSpec, GemmaConfig, init_params, quantize_lm_params,
    )

    cfg = dataclasses.replace(
        GemmaConfig.tiny(512), compute_dtype=jnp.bfloat16, act_int8_rows=8)
    params = quantize_lm_params(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16), bits=8)
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 16)), jnp.int32)
    valid = jnp.ones((2, 16), bool)
    stop = StopTables.disabled(cfg.vocab_size)
    zeros = jnp.asarray(stop.contains_dbl_nl)
    out = decode_greedy(
        params, tokens, valid, zeros, zeros, zeros, cfg=cfg,
        capture=CaptureSpec.for_probing(cfg), max_new_tokens=8, eos_id=-1,
        kv_int8=True,
    )
    toks = np.asarray(out[0])
    assert toks.shape == (2, 8) and np.all(toks >= 0)
    assert np.all(np.isfinite(np.asarray(out[2], np.float32)))


def smoke_bm25_fallback():
    """The composed over-cap fallback search path (hybrid gather incl. the
    assemble kernel + wide sort) on a skewed corpus, vs the exact XLA
    engine as oracle. max_pad=2048 forces the fallback on the hot queries
    — the path whose warmup killed the r3/r4 headline bench."""
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Index

    rng = np.random.default_rng(3)
    n_docs, vocab = 4000, 300
    texts = [
        " ".join(
            f"w{int(v)}" for v in
            np.minimum(rng.zipf(1.3, rng.integers(8, 30)), vocab)
        )
        for _ in range(n_docs)
    ]
    index = BM25Index.build(texts)
    queries = [" ".join(f"w{int(v)}" for v in np.minimum(
        rng.zipf(1.2, 12), vocab)) for _ in range(16)]
    eng = BM25Engine(index, mode="bitonic", max_pad=2048, interpret=False)
    got = eng.search(queries, k=5)
    assert eng.last_stats["n_fallback"] > 0, (
        "smoke corpus failed to trigger the over-cap fallback",
        eng.last_stats,
    )
    oracle = BM25Engine(index, mode="xla").search(queries, k=5)
    assert np.array_equal(got.doc_indices, oracle.doc_indices), (
        got.doc_indices[:2], oracle.doc_indices[:2])


def smoke_bm25_wide_sort_main_path():
    """The 32K->512K row-cap raise: rows over ``narrow_sort_max`` sort on
    the while_loop-form wide network INSIDE the main fused dispatch
    (ops/pallas_sparse.bm25_search_bitonic). Forced small via the test knob
    so the smoke compiles in seconds; vs the exact XLA engine as oracle.
    A production-width (65536) compile is exercised separately by
    smoke_bm25_wide_sort_64k when SMOKE_WIDE64K=1 (it costs ~1 min)."""
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Index

    rng = np.random.default_rng(3)
    n_docs, vocab = 4000, 300
    texts = [
        " ".join(
            f"w{int(v)}" for v in
            np.minimum(rng.zipf(1.3, rng.integers(8, 30)), vocab)
        )
        for _ in range(n_docs)
    ]
    index = BM25Index.build(texts)
    queries = [" ".join(f"w{int(v)}" for v in np.minimum(
        rng.zipf(1.2, 12), vocab)) for _ in range(16)]
    eng = BM25Engine(index, mode="bitonic", interpret=False,
                     narrow_sort_max=1024)
    got = eng.search(queries, k=5)
    assert eng.last_stats["n_fallback"] == 0, eng.last_stats
    oracle = BM25Engine(index, mode="xla").search(queries, k=5)
    assert np.array_equal(got.doc_indices, oracle.doc_indices), (
        got.doc_indices[:2], oracle.doc_indices[:2])


def smoke_bm25_wide_sort_64k():
    """Production-threshold wide-sort compile: one genuinely >32768-slot
    row through the main fused path at pad 65536 (the smallest width the
    raised cap adds). Compile is the point — a 65536-wide while_loop
    network + the [8, 8*65536] gather block must lower and run."""
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(17)
    n_docs = 40_000
    docs = [["hot", f"u{rng.integers(0, 2000)}"] for _ in range(n_docs)]
    index = BM25Index.build_tokenized(
        docs, BM25Config(stem=False, remove_stopwords=False))
    eng = BM25Engine(index, mode="bitonic", interpret=False)
    q = index.encode_query(["hot", "u7"])
    res = eng.search_term_ids([q], k=5)
    assert eng.last_stats["n_fallback"] == 0, eng.last_stats
    oracle = index.score_all(q)
    exp = np.sort(oracle)[::-1][:5]
    assert np.allclose(np.sort(res.scores[0])[::-1], exp, rtol=1e-4, atol=1e-3)


def smoke_ivf():
    from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, IVFEngine

    rng = np.random.default_rng(9)
    emb = rng.normal(size=(5000, 64)).astype(np.float32)
    index = IVFDenseIndex.build(emb, nlist=16, metric="ip", seed=0)
    eng = IVFEngine(index, nprobe=8)
    # probing 8/16 cells on gaussian data: demand strong oracle overlap
    qs = rng.normal(size=(8, 64)).astype(np.float32)
    res = eng.search_embeddings(qs, k=5)
    oracle = np.argsort(-(qs @ emb.T), axis=-1)[:, :5]
    inter = np.mean(
        [len(set(res.doc_indices[r]) & set(oracle[r])) / 5 for r in range(8)]
    )
    assert inter >= 0.8, inter


def main():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print(f"not a TPU ({dev}) — lowering smoke needs the real chip")
        sys.exit(1)
    print(f"device: {dev}")

    check("assemble row_tile=8 weighted", lambda: smoke_assemble(True, 8))
    check("assemble row_tile=8 unweighted", lambda: smoke_assemble(False, 8))
    check("assemble row_tile=1 weighted", lambda: smoke_assemble(True, 1))
    check("dense bf16 segs=1", lambda: smoke_dense(1, False))
    check("dense bf16 segs=4", lambda: smoke_dense(4, False))
    check("dense bf16 segs=8", lambda: smoke_dense(8, False))
    check("dense int8 segs=4", lambda: smoke_dense(4, True))
    check("dense int8 rerank", lambda: smoke_dense(1, True, rerank=True))
    check("bm25 over-cap fallback", smoke_bm25_fallback)
    check("bm25 wide-sort main path", smoke_bm25_wide_sort_main_path)
    if os.environ.get("SMOKE_WIDE64K") == "1":
        check("bm25 wide-sort 64k row", smoke_bm25_wide_sort_64k)
    check("ivf probed search", smoke_ivf)
    check("int4 decode boundary", smoke_int4_decode)
    check("int4 KV-cache decode", smoke_kv4_decode)
    check("w8a8 prefill boundary", smoke_w8a8_prefill)

    if FAILURES:
        print(f"\n{len(FAILURES)} FAILED: {FAILURES}")
        sys.exit(1)
    print("\nall lowering smokes green")


if __name__ == "__main__":
    main()
