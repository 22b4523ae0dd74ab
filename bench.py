"""Benchmark: BM25 queries/sec/chip on the device JAX sees (real TPU under
the driver; CPU when forced). Prints ONE JSON line.

Target (BASELINE.json): >=10k BM25 queries/sec/chip on v5e at recall parity.
The reference has no published throughput (SURVEY.md §6); vs_baseline is
measured against the 10k q/s/chip target.

Corpus: synthetic Zipf-distributed corpus sized like the per-dataset eval
indexes (100k docs, ~60 tokens/doc). Queries: 4-term, drawn from the same
distribution with the stopword-like head ranks dropped. Scoring runs the
production stream path (`BM25Engine(mode="bitonic")` on TPU): host term-id
encode -> vectorized [N, TQ] descriptor planning -> pow2 (pad, Qb) row-width
buckets -> one fused Pallas dispatch per bucket chunk (block-alternated
DMA/roll gather -> pass-skipping in-VMEM bitonic sort -> run-reduction +
top-k), ~8 dispatches per 8k-query pass. Queries whose row exceeds the
32768-slot cap run the exact XLA fallback over the compact copy (counted in
`overcap_fallback`; `overcap_trimmed` counts queries term-trimmed beyond the
1M-posting fallback tile — recall is exact for everything else, verified by
the `recall_at_10_vs_oracle` field on a sampled subset).
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
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 8192))
# synthesize the corpus as raw token-id arrays instead of Python token
# strings: at wiki scale (5M docs x 24 tokens) the string form alone would
# cost >10 GB of host RAM; with ids the term ids ARE the index vocab ids
# (BM25Index.build_tokenized_ids), matching bench_wiki_scale.py
SYNTH_IDS = os.environ.get("BENCH_SYNTH_IDS", "0") == "1"
# headline-metric suffix for scale variants (e.g. "_5m"): scale rows must
# never share a metric key with the 100k-doc headline
SUFFIX = os.environ.get("BENCH_METRIC_SUFFIX", "")
MAX_PAD = int(os.environ.get("BENCH_MAX_PAD", 1 << 17))
K = 5
TARGET_QPS = 10_000.0


from bench_util import zipf_tokens as _zipf_tokens  # noqa: E402


def main():
    from bench_util import require_live_device

    require_live_device()

    import jax

    # persistent compilation cache: compiles over the TPU tunnel are slow
    # (~30-60s/program); cached executables make bench reruns near-instant
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(0)
    # Zipf term distribution with the head ranks dropped — mimicking the
    # analyzer's stopword removal (retrieval/text.py strips the 179-entry
    # English stopword list, which is exactly the Zipf head), which is what
    # bounds posting lengths on real corpora. Even so, the heaviest kept
    # terms match ~10% of all docs — a heavy workload relative to real
    # natural-language queries.
    term_ids = (_zipf_tokens(rng, N_DOCS * DOC_LEN) % VOCAB).astype(np.int64)
    t0 = time.time()
    if SYNTH_IDS:
        index = BM25Index.build_tokenized_ids(
            term_ids, np.full(N_DOCS, DOC_LEN, np.int64),
            BM25Config(stem=False, remove_stopwords=False),
        )
        del term_ids
    else:
        docs_tokens = [
            [f"t{t}" for t in term_ids[i * DOC_LEN : (i + 1) * DOC_LEN]]
            for i in range(N_DOCS)
        ]
        index = BM25Index.build_tokenized(
            docs_tokens, BM25Config(stem=False, remove_stopwords=False)
        )
    build_s = time.time() - t0

    engine = BM25Engine(index, max_pad=MAX_PAD)
    q_terms = (_zipf_tokens(rng, N_QUERIES * 4).reshape(N_QUERIES, 4) % VOCAB).astype(np.int64)
    if SYNTH_IDS:
        query_ids = [row.astype(np.int32) for row in q_terms]
    else:
        query_ids = [
            index.encode_query([f"t{t}" for t in row]) for row in q_terms
        ]

    # Measurement protocol for this environment: the tunnel backend treats
    # block_until_ready as submission-complete, and ONLY a device->host
    # fetch truly synchronizes with execution — but any fetch costs tunnel
    # latency. So: calibrate the fetch cost on a trivial computation, submit
    # the stream, fold the results into one scalar ON DEVICE with a jitted
    # reducer, fetch once, subtract the calibrated fetch cost. On a normal
    # TPU host none of this is needed.
    def fetch_scalar(x) -> float:
        return float(np.asarray(x))

    @jax.jit
    def fold(parts):
        return sum(jnp.sum(s) for s, _ in parts)

    # warm pass: same multiset of queries in submission order — identical
    # bucket shapes compile every (pad, n_tiles) variant the timed pass hits
    t0 = time.time()
    warm = engine.search_stream(query_ids, k=K, as_numpy=False)
    fetch_scalar(fold(warm.parts))
    warmup_s = time.time() - t0

    t0 = time.time()
    fetch_scalar(jnp.sum(jnp.zeros((8, 128))))
    fetch_baseline = time.time() - t0

    # settling pass (untimed): the FIRST post-warmup timed block measures
    # ~0.9-1.3 s slower than every later one, engine-independent — an A/B/BA
    # experiment showed the stall follows position, not code (the trivial
    # fetch right before it alone takes ~0.9 s vs 0.06 s once settled). One
    # throwaway shuffled pass absorbs it so the timed region measures
    # steady-state serving throughput.
    t0 = time.time()
    perm = rng.permutation(N_QUERIES)
    fetch_scalar(fold(engine.search_stream(
        [query_ids[i] for i in perm], k=K, as_numpy=False
    ).parts))
    settle_s = time.time() - t0

    # timed passes: the same queries shuffled — same shapes (no compiles),
    # distinct tile contents (no remote dispatch memoization). Six passes
    # share ONE final fetch, so the tunnel's noisy fetch latency (measured
    # 0.03-1.3 s) is amortized instead of polluting a ~0.3 s measurement.
    # The shuffled query lists are built BEFORE the timed region: the
    # shuffle exists only to defeat memoization, and timing numpy
    # permutation + Python list assembly on this 1-core VM measured as
    # ~35% of the whole block (MEASURE_r5 bm25_rep4/5 pass_qps_samples:
    # individually-synced passes with prep outside the clock reach
    # 38-50.6k q/s vs the 25-33k block headline — which is also where
    # BENCH_r04's 52,264-vs-31,606 discrepancy lived).
    n_passes = 6
    shuffles = []
    for p in range(n_passes):
        perm = rng.permutation(N_QUERIES)
        shuffles.append([query_ids[i] for i in perm])
    t0 = time.time()
    accs = []
    n_disp = 0
    for shuffled in shuffles:
        res = engine.search_stream(shuffled, k=K, as_numpy=False)
        accs.append(fold(res.parts))
        n_disp = len(res.parts)
    total = sum(accs)
    fetch_scalar(total)
    raw_elapsed = time.time() - t0
    # fetch a FRESH trivial scalar right after: measures the current fetch
    # latency under the same connection state (re-fetching `total` would be
    # served from jax's host-side cache without an RPC). Subtract the
    # SMALLER of the two fetch estimates (conservative: under-subtracting
    # lowers qps), and fall back to the raw total if it undershoots.
    t0 = time.time()
    fetch_scalar(jnp.sum(jnp.ones((8, 128))))
    fetch_after = time.time() - t0
    # fetch_baseline can be compile-polluted (first tiny-program build);
    # fetch_after is the same-state estimate — still take the min to stay
    # conservative
    elapsed = raw_elapsed - min(fetch_baseline, fetch_after)
    if elapsed <= 0.05 * raw_elapsed:
        elapsed = raw_elapsed
    qps = n_passes * N_QUERIES / elapsed
    stats = dict(engine.last_stats)  # over-cap routing counts for one pass

    # per-pass samples (ADDITIVE — the headline protocol above is
    # unchanged): four more single passes, each individually fetch-synced,
    # to expose the within-run spread the shared-fetch block hides. The
    # MIN pass approximates the least-tunnel-contended device capability;
    # the spread across these is the within-run noise floor the r4
    # 52,264-vs-31,606 headline discrepancy must be judged against.
    pass_qps = []
    for _ in range(4):
        perm = rng.permutation(N_QUERIES)
        shuffled = [query_ids[i] for i in perm]
        t0 = time.time()
        fetch_scalar(fold(engine.search_stream(
            shuffled, k=K, as_numpy=False).parts))
        dt = time.time() - t0
        adj = dt - min(fetch_baseline, fetch_after)
        pass_qps.append(round(N_QUERIES / (adj if adj > 0.05 * dt else dt), 1))

    # recall@10 vs the exact host oracle on a sampled subset (untimed):
    # score-threshold recall so ties at the k-th score don't penalize
    rk = 10
    sample = rng.choice(N_QUERIES, size=64, replace=False)
    res = engine.search_term_ids([query_ids[i] for i in sample], k=rk)
    recalls = []
    for row, qi in enumerate(sample):
        oracle = index.score_all(query_ids[qi])
        n_pos = int((oracle > 0).sum())
        denom = min(rk, n_pos)
        if denom == 0:
            continue
        thresh = np.partition(oracle, -denom)[-denom]
        d = res.doc_indices[row]
        hits = int((oracle[d[d >= 0]] >= thresh - 1e-3).sum())
        recalls.append(min(hits, denom) / denom)
    recall_at_10 = float(np.mean(recalls)) if recalls else 1.0

    print(
        json.dumps(
            {
                "metric": "bm25_queries_per_sec_per_chip" + SUFFIX,
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / TARGET_QPS, 3),
                "detail": {
                    "n_docs": N_DOCS,
                    "nnz": index.nnz,
                    "n_queries": N_QUERIES,
                    "k": K,
                    "n_dispatches_per_pass": n_disp + 1,
                    "recall_at_10_vs_oracle": round(recall_at_10, 4),
                    "overcap_fallback": stats.get("n_fallback", 0),
                    "overcap_trimmed": stats.get("n_trimmed", 0),
                    "index_build_s": round(build_s, 1),
                    "warmup_compile_s": round(warmup_s, 1),
                    "settle_pass_s": round(settle_s, 2),
                    "raw_elapsed_s": round(raw_elapsed, 2),
                    "pass_qps_samples": pass_qps,
                    "fetch_baseline_s": round(fetch_baseline, 2),
                    "fetch_after_s": round(fetch_after, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
