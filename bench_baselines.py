"""Baseline-method benchmark: DRAGIN / FLARE / fix-length at Gemma-2B scale
on the real chip, with the retrieval-call and token accounting the poster's
efficiency table reports (13,570 DRAGIN retrieval calls vs Probing-RAG's
1,988 over 2,500 queries — BASELINE.md). The reference never measures its
baselines' wall-clock; this bench records both the per-method q/s on this
framework AND the measured retrieval-calls/tokens-per-query analogue so the
efficiency comparison has a hardware artifact (VERDICT r4 next-steps #7).

Setup mirrors bench_e2e.py: full-size Gemma-2B random weights (method
accounting and latency don't need checkpoints), 100k-doc Zipf corpus behind
the bitonic BM25 engine, hash-word tokenizer whose decoded tokens are corpus
terms. Baselines are sequential per-query loops (the reference's design,
utils.py:786-923) — the measured q/s is honestly batch-1.

Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_DOCS = int(os.environ.get("BENCH_BASE_DOCS", 100_000))
DOC_LEN = 60
VOCAB_TERMS = 50_000
N_QUERIES = int(os.environ.get("BENCH_BASE_QUERIES", 32))
MAX_NEW = int(os.environ.get("BENCH_BASE_NEW", 64))
METHOD = os.environ.get("BENCH_BASE_METHOD", "dragin")  # dragin|flare|fix-length
TINY = os.environ.get("BENCH_BASE_TINY", "0") == "1"

from bench_e2e import HashWordTokenizer  # noqa: E402
from bench_util import zipf_tokens as _zipf_tokens  # noqa: E402


def main():
    from bench_util import require_live_device

    require_live_device()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from probing_rag_tpu.data.corpus import DocStore
    from probing_rag_tpu.models.gemma import GemmaConfig, init_params
    from probing_rag_tpu.pipeline.baselines import (
        BaselineConfig, DraginRAG, FixLengthRAG, FlareRAG,
    )
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(0)
    term_ids = (_zipf_tokens(rng, N_DOCS * DOC_LEN) % VOCAB_TERMS).astype(np.int64)
    docs_tokens = [
        [f"t{t}" for t in term_ids[i * DOC_LEN : (i + 1) * DOC_LEN]]
        for i in range(N_DOCS)
    ]
    texts = [" ".join(toks) for toks in docs_tokens]
    store = DocStore.from_texts(texts)
    t0 = time.time()
    index = BM25Index.build_tokenized(
        docs_tokens, BM25Config(stem=False, remove_stopwords=False)
    )
    engine = BM25Engine(index)
    build_s = time.time() - t0

    if TINY:  # CPU smoke of the harness
        import dataclasses

        cfg = dataclasses.replace(GemmaConfig.tiny(4096), compute_dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg = GemmaConfig.gemma_2b()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tok = HashWordTokenizer(cfg.vocab_size)

    bc = BaselineConfig(generate_max_length=MAX_NEW)
    cls = {"dragin": DraginRAG, "flare": FlareRAG, "fix-length": FixLengthRAG}[METHOD]

    qz = _zipf_tokens(rng, N_QUERIES * 4).reshape(N_QUERIES, 4)
    questions = [" ".join(f"t{t % VOCAB_TERMS}" for t in row) for row in qz]
    demo = "Question: t1 t2?\nAnswer: t3.\n\n"

    def run(qs):
        rag = cls(params, cfg, tok, engine, store, bc)
        for q in qs:
            rag.inference(q, demo, f"Question: {q}\nAnswer:")
        return rag.counter

    # warmup: compiles the batch-1 decode + pow2-bucketed trace forwards
    t0 = time.time()
    run(questions[:2])
    warmup_s = time.time() - t0

    # settling pass (see bench.py): the first timed block after warmup pays
    # a position-dependent tunnel stall; run 2 queries untimed first
    run(questions[2:4])
    t0 = time.time()
    counter = run(questions)
    total_s = time.time() - t0

    print(
        json.dumps(
            {
                "metric": f"baseline_{METHOD}_queries_per_sec_per_chip"
                # smoke runs must never share a metric key with real ones
                + ("_tiny" if TINY else ""),
                "value": round(N_QUERIES / total_s, 3),
                "unit": "queries/s",
                "vs_baseline": None,
                "detail": {
                    "model": "tiny (smoke)" if TINY else "gemma-2b (random bf16)",
                    "method": METHOD,
                    "n_queries": N_QUERIES,
                    "max_new_tokens": MAX_NEW,
                    "batch": 1,
                    "total_s": round(total_s, 1),
                    # the poster-table analogues, per query
                    "retrieval_calls": counter.retrieve,
                    "retrieval_calls_per_query": round(
                        counter.retrieve / N_QUERIES, 2),
                    "generate_calls": counter.generate,
                    "tokens_generated": counter.token,
                    "sentences": counter.sentence,
                    "hallucination_triggers": counter.hallucinated,
                    "index": {"n_docs": N_DOCS, "nnz": index.nnz,
                              "build_s": round(build_s, 1)},
                    "warmup_compile_s": round(warmup_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
