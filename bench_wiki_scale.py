"""Wikipedia-scale sharded BM25 exercise (BASELINE.json config 5).

The reference's full-Wikipedia corpus is 21M passages (psgs_w100.tsv,
make_indexer.py:252-293). This script builds the largest synthetic corpus
host RAM allows (default 5M docs) and measures the host-side path the
serving claim rests on: vectorized CSR build -> doc-range sharding for an
8-shard mesh -> per-shard block-alternated bitonic store build -> vectorized
[S, N, TQ] query planning — then runs the sharded search on the virtual
8-device CPU mesh in "xla" mode (interpret-mode Pallas at this scale is not
meaningful; the compiled bitonic kernel path is measured on real hardware by
bench.py) and spot-checks sampled queries against the exact host oracle.

Prints one JSON line; run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_DOCS = int(os.environ.get("WIKI_DOCS", 5_000_000))
DOC_LEN = int(os.environ.get("WIKI_DOC_LEN", 24))
VOCAB = int(os.environ.get("WIKI_VOCAB", 200_000))
N_QUERIES = int(os.environ.get("WIKI_QUERIES", 8192))
N_SEARCH = int(os.environ.get("WIKI_SEARCH", 64))
N_SHARDS = 8


from bench_util import zipf_tokens as _zipf_tokens  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh

    from probing_rag_tpu.parallel.sharded_bm25 import ShardedBM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(0)
    t0 = time.time()
    token_ids = (_zipf_tokens(rng, N_DOCS * DOC_LEN) % VOCAB).astype(np.int64)
    synth_s = time.time() - t0

    t0 = time.time()
    index = BM25Index.build_tokenized_ids(
        token_ids, np.full(N_DOCS, DOC_LEN, np.int64),
        BM25Config(stem=False, remove_stopwords=False),
    )
    del token_ids
    build_s = time.time() - t0

    devices = jax.devices()[:N_SHARDS]
    assert len(devices) == N_SHARDS, "run with xla_force_host_platform_device_count=8"
    mesh = Mesh(np.asarray(devices), ("shard",))

    # shard + bitonic store build (timed inside engine init)
    t0 = time.time()
    engine = ShardedBM25Engine(index, mesh, mode="bitonic", interpret=True)
    shard_build_s = time.time() - t0

    # planning microbench: 8 shards x 8k queries, vectorized [S, N, TQ]
    qz = _zipf_tokens(rng, N_QUERIES * 4).reshape(N_QUERIES, 4)
    qids = [(row % VOCAB).astype(np.int32) for row in qz]
    t0 = time.time()
    src, srcr, slot, rlen, big, totals, _wt = engine._plan_bitonic_shards(qids)
    plan_s = time.time() - t0

    # sharded search at scale on the virtual mesh ("xla" per-shard path;
    # compiled-Pallas numbers come from bench.py on hardware)
    xla_engine = ShardedBM25Engine(index, mesh, mode="xla")
    sample = [qids[i] for i in rng.choice(N_QUERIES, N_SEARCH, replace=False)]
    queries = [" ".join(f"t{t}" for t in ids) for ids in sample]
    t0 = time.time()
    res = xla_engine.search(queries, k=10)
    search_s = time.time() - t0

    # exact-oracle spot check on a few sampled queries
    ok = 0
    for i in range(8):
        oracle = index.score_all(sample[i])
        got = res.scores[i][res.doc_indices[i] >= 0]
        exp = np.sort(oracle)[::-1][: len(got)]
        ok += int(np.allclose(np.sort(got)[::-1], exp, rtol=1e-4, atol=1e-3))

    store_bytes = sum(
        a.nbytes for st in engine._stores
        for a in (st.doc_e, st.imp_e, st.doc_o, st.imp_o,
                  st.doc_c, st.imp_c, st.doc_r, st.imp_r)
    )
    print(
        json.dumps(
            {
                "metric": "wiki_scale_sharded_bm25_exercise",
                "value": N_DOCS,
                "unit": "docs",
                "vs_baseline": round(N_DOCS / 21_000_000, 3),
                "detail": {
                    "n_docs": N_DOCS,
                    "nnz": index.nnz,
                    "n_terms": index.n_terms,
                    "n_shards": N_SHARDS,
                    "synth_s": round(synth_s, 1),
                    "csr_build_s": round(build_s, 1),
                    "shard_and_bitonic_store_build_s": round(shard_build_s, 1),
                    "bitonic_store_bytes": store_bytes,
                    "plan_8k_queries_s": round(plan_s, 2),
                    "plan_us_per_query": round(plan_s / N_QUERIES * 1e6, 1),
                    "overcap_fraction": round(float((totals > engine.max_pad).mean()), 4),
                    "xla_mesh_search_s_per_64q": round(search_s, 1),
                    "oracle_spot_checks_passed": f"{ok}/8",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
