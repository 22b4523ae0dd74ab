"""Benchmark: prober-dataset construction throughput (pipeline phase 2).

The reference's ``--extracting_cot_qa`` mode (exp_rag.py:476-531 +
make_dataset.sh) runs the ``none`` and ``simple`` pipelines over train
splits one query at a time and labels each generation. Here both run as
batched device generation (pipeline/dataset_builder.py); the bench reports
labeled examples/sec across the two methods at Gemma-2B scale with the
phase split (generate / retrieval / labeling).

Setup mirrors bench_e2e: full-size random bf16 Gemma-2B, 100k-doc Zipf
corpus behind the bitonic BM25 engine, hash-word tokenizer whose decoded
tokens are corpus terms. Prints ONE JSON line.

Smoke: BENCH_DATASET_TINY=1 BENCH_PLATFORM=cpu runs a tiny config off-TPU.
"""

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_DOCS = int(os.environ.get("BENCH_DATASET_DOCS", 100_000))
DOC_LEN = 60
VOCAB_TERMS = 50_000
N_QUERIES = int(os.environ.get("BENCH_DATASET_QUERIES", 64))
BATCH = int(os.environ.get("BENCH_DATASET_BATCH", 32))
MAX_NEW = int(os.environ.get("BENCH_DATASET_NEW", 150))
TINY = os.environ.get("BENCH_DATASET_TINY", "0") == "1"

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
    from probing_rag_tpu.pipeline.dataset_builder import extract_cot_dataset
    from probing_rag_tpu.pipeline.rag import AdaptiveRAGPipeline, RAGConfig
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(0)
    term_ids = (_zipf_tokens(rng, N_DOCS * DOC_LEN) % VOCAB_TERMS).astype(np.int64)
    docs_tokens = [
        [f"t{t}" for t in term_ids[i * DOC_LEN : (i + 1) * DOC_LEN]]
        for i in range(N_DOCS)
    ]
    store = DocStore.from_texts([" ".join(toks) for toks in docs_tokens])
    t0 = time.time()
    index = BM25Index.build_tokenized(
        docs_tokens, BM25Config(stem=False, remove_stopwords=False)
    )
    engine = BM25Engine(index)
    build_s = time.time() - t0

    if TINY:
        import dataclasses

        cfg = dataclasses.replace(GemmaConfig.tiny(4096), compute_dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg = GemmaConfig.gemma_2b()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # serving-stack variant: int8 weights (+ w8a8 prefill threshold) — the
    # dataset-construction phase is generation-dominated, so the e2e
    # serving levers apply to the training pipeline too
    if os.environ.get("BENCH_DATASET_INT8", "0") == "1":
        import dataclasses

        from probing_rag_tpu.models.gemma import quantize_lm_params

        params = quantize_lm_params(params, bits=8)
        act8 = int(os.environ.get("BENCH_DATASET_ACT8", "0"))
        if act8:
            cfg = dataclasses.replace(cfg, act_int8_rows=act8)
    tok = HashWordTokenizer(cfg.vocab_size)

    qz = _zipf_tokens(rng, N_QUERIES * 4).reshape(N_QUERIES, 4)
    questions = [" ".join(f"t{t % VOCAB_TERMS}" for t in row) for row in qz]
    # answers drawn from corpus vocabulary: some generations will substring-
    # match (acc=1), most won't — the labeling path runs both branches
    answers = [[f"t{t % VOCAB_TERMS}"] for t in qz[:, 0]]

    phase = defaultdict(float)

    class TimedPipeline(AdaptiveRAGPipeline):
        def _generate(self, prompt_texts, with_capture):
            t = time.time()
            out = super()._generate(prompt_texts, with_capture)
            phase["generate"] += time.time() - t
            return out

        def _retrieve_evidences(self, queries):
            t = time.time()
            out = super()._retrieve_evidences(queries)
            phase["retrieval"] += time.time() - t
            return out

    def build(method):
        return TimedPipeline(
            params, cfg, tok, engine, store, None,
            RAGConfig(retr_method=method, batch_size=BATCH,
                      max_new_tokens=MAX_NEW),
        )

    # warmup: compile the no-retrieval and retrieval-prompt decode variants
    t0 = time.time()
    extract_cot_dataset(build("none"), questions[:2], answers[:2], "nq")
    extract_cot_dataset(build("simple"), questions[:2], answers[:2], "nq")
    warmup_s = time.time() - t0
    phase.clear()

    # settling pass (untimed): absorb the post-warmup tunnel stall AND
    # compile every BM25 posting-tile bucket the timed pass will hit — the
    # batch-2 warmup above compiles the decode variants but NOT the
    # batch-32 retrieval buckets (the r4 session measured 93.6s of
    # "retrieval" that was really two ~46s bucket compiles; e2e-bench
    # steady state for the same engine/shape is ~0.4s/call)
    extract_cot_dataset(build("simple"), questions, answers, "nq")
    phase.clear()

    rows = 0
    t0 = time.time()
    for method in ("none", "simple"):
        t1 = time.time()
        out = extract_cot_dataset(build(method), questions, answers, "nq")
        phase[f"{method}_total"] = time.time() - t1
        rows += len(out)
    total_s = time.time() - t0
    label_s = total_s - phase["generate"] - phase["retrieval"]

    print(
        json.dumps(
            {
                "metric": "dataset_build_examples_per_sec_per_chip"
                + ("_int8" if os.environ.get("BENCH_DATASET_INT8") == "1" else "")
                + ("_a8" if os.environ.get("BENCH_DATASET_INT8") == "1"
                   and os.environ.get("BENCH_DATASET_ACT8", "0") != "0" else "")
                + ("_tiny" if TINY else ""),
                "value": round(rows / total_s, 3),
                "unit": "examples/s",
                "vs_baseline": None,
                "detail": {
                    "model": ("tiny (smoke)" if TINY
                              else "gemma-2b (random "
                              + ("int8 + w8a8 prefill)"
                                 if os.environ.get("BENCH_DATASET_INT8") == "1"
                                 and os.environ.get("BENCH_DATASET_ACT8", "0") != "0"
                                 else "int8)"
                                 if os.environ.get("BENCH_DATASET_INT8") == "1"
                                 else "bf16)")),
                    "methods": ["none", "simple"],
                    "n_queries_per_method": N_QUERIES,
                    "labeled_rows": rows,
                    "batch": BATCH,
                    "max_new_tokens": MAX_NEW,
                    "total_s": round(total_s, 1),
                    "phase_s": {
                        "generate": round(phase["generate"], 2),
                        "retrieval": round(phase["retrieval"], 2),
                        "labeling_and_host": round(label_s, 2),
                        "none_total": round(phase["none_total"], 2),
                        "simple_total": round(phase["simple_total"], 2),
                    },
                    "tokens_per_sec": round(
                        2 * N_QUERIES * MAX_NEW / phase["generate"], 1
                    ),
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
