"""Benchmark: BM25 queries/sec/chip on the device JAX sees (real TPU under
the driver; CPU when forced). Prints ONE JSON line.

Target (BASELINE.json): >=10k BM25 queries/sec/chip on v5e at recall parity.
The reference has no published throughput (SURVEY.md §6); vs_baseline is
measured against the 10k q/s/chip target.

Corpus: synthetic Zipf-distributed corpus sized like the per-dataset eval
indexes (100k docs, ~60 tokens/doc). Queries: 4-term, drawn from the same
distribution. Scoring runs the production path: host term-id encode ->
bucketed padded tiles -> jitted gather/sort/segment-sum/top-k on device.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_DOCS = int(os.environ.get("BENCH_DOCS", 100_000))
DOC_LEN = int(os.environ.get("BENCH_DOC_LEN", 60))
VOCAB = int(os.environ.get("BENCH_VOCAB", 50_000))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 4096))
BATCH = int(os.environ.get("BENCH_BATCH", 2048))
K = 5
TARGET_QPS = 10_000.0


def main():
    import jax

    # persistent compilation cache: compiles over the TPU tunnel are slow
    # (~30-60s/program); cached executables make bench reruns near-instant
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from probing_rag_tpu.ops.sparse import bm25_search_padded
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(0)
    # Zipf term distribution with the head ranks dropped — mimicking the
    # analyzer's stopword removal, which is what bounds posting lengths on
    # real corpora (retrieval/text.py)
    zipf = rng.zipf(1.3, size=N_DOCS * DOC_LEN * 2)
    zipf = zipf[zipf >= 30][: N_DOCS * DOC_LEN]
    term_ids = (zipf % VOCAB).astype(np.int64)
    docs_tokens = [
        [f"t{t}" for t in term_ids[i * DOC_LEN : (i + 1) * DOC_LEN]]
        for i in range(N_DOCS)
    ]
    t0 = time.time()
    index = BM25Index.build_tokenized(
        docs_tokens, BM25Config(stem=False, remove_stopwords=False)
    )
    build_s = time.time() - t0

    engine = BM25Engine(index, max_pad=1 << 17)
    # 4x the queries: 1/4 warm the compile variants, 3/4 are the DISTINCT
    # timed stream (identical repeated dispatches can be memoized by remote
    # runtimes, which would time cache hits)
    n_total = N_QUERIES * 4
    qz = rng.zipf(1.3, size=n_total * 16)
    qz = qz[qz >= 30][: n_total * 4].reshape(n_total, 4)
    q_terms = (qz % VOCAB).astype(np.int64)
    query_ids = [
        index.encode_query([f"t{t}" for t in row]) for row in q_terms
    ]

    batches = [
        query_ids[i : i + BATCH] for i in range(0, n_total, BATCH)
    ]
    warm, timed = batches[:2], batches[2:]  # 2 batches hit every pad bucket

    # Measurement protocol for this environment: the tunnel backend treats
    # block_until_ready as submission-complete, and ONLY a device->host
    # fetch truly synchronizes with execution — but any fetch costs tens of
    # seconds of fixed tunnel latency. So: calibrate the fetch cost on a
    # trivial computation, submit a long DISTINCT query stream, fold the
    # stream's results into one scalar, fetch it once, and subtract the
    # calibrated fetch cost. On a normal TPU host none of this is needed.
    def fetch_scalar(x) -> float:
        return float(np.asarray(x))

    t0 = time.time()
    for batch in warm:
        engine.search_term_ids(batch, k=K, as_numpy=False)
    fetch_scalar(jnp.zeros(()))  # drains the warmup queue too
    warmup_s = time.time() - t0

    t0 = time.time()
    fetch_baseline = 0.0
    fetch_scalar(jnp.sum(jnp.zeros((8, 128))))
    fetch_baseline = time.time() - t0

    t0 = time.time()
    n_done = 0
    acc = jnp.zeros((), jnp.float32)
    for batch in timed:
        res = engine.search_term_ids(batch, k=K, as_numpy=False)
        for part_scores, _ in res.parts or [(res.scores, None)]:
            acc = acc + jnp.sum(part_scores)
        n_done += len(batch)
    fetch_scalar(acc)
    raw_elapsed = time.time() - t0
    # the fetch baseline is noisy on this tunnel; if subtraction undershoots,
    # fall back to the raw total (a strict lower bound on throughput)
    elapsed = raw_elapsed - fetch_baseline
    if elapsed <= 0.05 * raw_elapsed:
        elapsed = raw_elapsed
    qps = n_done / elapsed

    print(
        json.dumps(
            {
                "metric": "bm25_queries_per_sec_per_chip",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / TARGET_QPS, 3),
                "detail": {
                    "n_docs": N_DOCS,
                    "nnz": index.nnz,
                    "n_queries": n_done,
                    "batch": BATCH,
                    "k": K,
                    "index_build_s": round(build_s, 1),
                    "warmup_compile_s": round(warmup_s, 1),
                    "raw_elapsed_s": round(raw_elapsed, 1),
                    "fetch_baseline_s": round(fetch_baseline, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
