"""End-to-end adaptive-RAG benchmark at Gemma-2B scale on the real chip.

This is the reference's actual entry point (exp_rag.py:394-474) as ONE
composed serving graph: batched CoT prefill -> while_loop decode with fused
prober capture -> jitted ensemble gate -> BM25 retrieval (bitonic engine)
-> host re-prompt -> regenerate, up to the 4-round cap. Every subsystem has
its own bench (bench.py, bench_decode.py); this one measures the
COMPOSITION — compile behavior, HBM with the gate resident next to the 2B
LM, and the per-round latency split.

Setup mirrors the paper config at full scale with random weights (quality
needs checkpoints; latency doesn't): full-size Gemma-2B bf16, a 100k-doc
Zipf corpus behind the bitonic BM25 engine, 6 random probers, and a
hash-word tokenizer over the full 256k vocab whose decoded tokens are
corpus terms — so round>=1 retrieval queries (the reference queries BM25
with the ENTIRE prompt+generation string, exp_rag.py:425-428) hit real
posting lists. threshold=+1e6 forces the gate's worst case: every query
runs all 4 retrieval rounds (5 generations). threshold=-1e6 measures the
no-retrieval floor. Real traffic lands between the two (the paper's gate
retrieves on ~43% of queries, BASELINE.md).

Prints one JSON line.
"""

import json
import os
import sys
import time
import zlib
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_DOCS = int(os.environ.get("BENCH_E2E_DOCS", 100_000))
DOC_LEN = 60
VOCAB_TERMS = 50_000
N_QUERIES = int(os.environ.get("BENCH_E2E_QUERIES", 64))
BATCH = int(os.environ.get("BENCH_E2E_BATCH", 32))
MAX_NEW = int(os.environ.get("BENCH_E2E_NEW", 150))
# speculative decode inside the composed loop: verify SPEC prompt-lookup
# drafts per forward (greedy-exact; models/speculative.py). With random
# weights the drafter has nothing systematic to copy, so this measures the
# acceptance~0 FLOOR of speculating inside the full pipeline — the oracle
# CEILING is measured by bench_decode.py's spec rows; real RAG workloads
# (generations quoting retrieved passages) land between.
SPEC = int(os.environ.get("BENCH_E2E_SPEC", "0"))
# gate mode: "forced" (default — the +/-1e6 worst-case/floor pair) or
# "mid": threshold 0.0 with the random prober stack, whose ensemble scores
# are ~symmetric per query, so ~half of each round's active set retrieves —
# the mixed shrinking-active-set regime real traffic runs in (the paper's
# 57/20/22 no/single/multi step distribution, BASELINE.md). Reports the
# measured step distribution alongside q/s.
GATE = os.environ.get("BENCH_E2E_GATE", "forced")


class HashWordTokenizer:
    """Whitespace-word tokenizer over the full Gemma vocab: encode hashes
    words into [3, V); decode maps ids onto the synthetic corpus vocabulary
    (``t{i}``), so generated text re-enters retrieval as real query terms."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size
        self.bos_id = 1
        self.eos_id = 2
        self.pad_id = 2  # parity: pad = eos (exp_rag.py:304)

    def encode(self, text: str, add_bos: bool = False):
        ids = [
            3 + zlib.crc32(w.encode()) % (self.vocab_size - 3)
            for w in text.split()
        ]
        return ([self.bos_id] + ids) if add_bos else ids

    def decode(self, ids):
        return " ".join(f"t{(i - 3) % VOCAB_TERMS}" for i in ids if i >= 3)

    def token_strings(self):
        # no token contains a newline: the paragraph stop never fires and
        # every generation runs the full MAX_NEW tokens (worst case)
        return [""] * self.vocab_size


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
    from probing_rag_tpu.pipeline.rag import AdaptiveRAGPipeline, RAGConfig
    from probing_rag_tpu.prober.train import ProberTrainConfig, init_prober_stack
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    rng = np.random.default_rng(0)
    retr = os.environ.get("BENCH_E2E_RETR", "bm25")  # bm25 | dense | ivf
    term_ids = (_zipf_tokens(rng, N_DOCS * DOC_LEN) % VOCAB_TERMS).astype(np.int64)
    docs_tokens = [
        [f"t{t}" for t in term_ids[i * DOC_LEN : (i + 1) * DOC_LEN]]
        for i in range(N_DOCS)
    ]
    texts = [" ".join(toks) for toks in docs_tokens]
    store = DocStore.from_texts(texts)
    index = None
    t0 = time.time()
    if retr == "bm25":
        index = BM25Index.build_tokenized(
            docs_tokens, BM25Config(stem=False, remove_stopwords=False)
        )
        engine = BM25Engine(index)
        index_detail = {"n_docs": N_DOCS, "nnz": index.nnz}
    else:
        # dense serving composition: mixture-of-Gaussians doc embeddings
        # (encoder quality needs checkpoints; latency doesn't) + the REAL
        # contriever-size query encoder random-init — rounds >=1 encode the
        # full prompt+generation string (truncated at the encoder's 512
        # positions), so the retrieval phase carries the honest encoder
        # forward + flat-or-probed sweep cost
        from probing_rag_tpu.models.encoder import (
            EncoderConfig, encoder_forward, init_encoder_params,
        )

        ecfg = (EncoderConfig.tiny()
                if os.environ.get("BENCH_E2E_TINY") == "1"
                else EncoderConfig.contriever())
        d_emb = ecfg.d_model  # store dim must match the query encoder's
        centers = rng.normal(size=(4096, d_emb)).astype(np.float32)
        emb = (centers[rng.integers(0, 4096, size=N_DOCS)]
               + 0.3 * rng.normal(size=(N_DOCS, d_emb))).astype(np.float32)
        eparams = init_encoder_params(ecfg, jax.random.PRNGKey(3))
        efwd = jax.jit(lambda p, t, m: encoder_forward(p, t, m, ecfg))
        word_tok = HashWordTokenizer(ecfg.vocab_size)

        def encode(batch_texts):
            # pow2-bucket BOTH dims: the adaptive loop's shrinking active
            # set would otherwise compile one encoder variant per distinct
            # (batch, seq) shape
            ids = [word_tok.encode(t)[: ecfg.max_positions] for t in batch_texts]
            # true next-pow2 (n stays n when already a power of two —
            # 1<<n.bit_length() would double an exact-pow2 batch/seq and
            # inflate the measured encoder cost 2x)
            np2 = lambda n: 1 << max(n - 1, 1).bit_length() if n > 1 else 1
            ml = min(np2(max((len(i) for i in ids), default=1)),
                     ecfg.max_positions)
            bp = np2(len(ids))
            arr = np.zeros((bp, ml), np.int32)
            mask = np.zeros((bp, ml), bool)
            for i, row in enumerate(ids):
                row = row[:ml]
                arr[i, : len(row)] = row
                mask[i, : len(row)] = True
            mask[len(ids):, 0] = True  # pad rows: avoid 0/0 in mean pooling
            out = np.asarray(efwd(eparams, jnp.asarray(arr), jnp.asarray(mask)))
            return out[: len(ids)]

        if retr == "ivf":
            from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, IVFEngine

            ivf_ix = IVFDenseIndex.build(emb, metric="ip", seed=0)
            engine = IVFEngine(ivf_ix, nprobe=32, encode_fn=encode,
                               store_dtype=jnp.bfloat16)
            index_detail = {"n_docs": N_DOCS, "dim": d_emb,
                            "nlist": ivf_ix.nlist, "nprobe": engine.nprobe}
        else:
            from probing_rag_tpu.retrieval.dense import DenseEngine, DenseIndex

            engine = DenseEngine(DenseIndex(emb, metric="ip"), encode,
                                 store_dtype=jnp.bfloat16)
            index_detail = {"n_docs": N_DOCS, "dim": d_emb}
    build_s = time.time() - t0
    index_detail["build_s"] = round(build_s, 1)

    if os.environ.get("BENCH_E2E_TINY") == "1":  # CPU smoke of the harness
        import dataclasses

        cfg = dataclasses.replace(GemmaConfig.tiny(4096), compute_dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg = GemmaConfig.gemma_2b()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    int8 = os.environ.get("BENCH_E2E_INT8", "") == "1"
    int4 = os.environ.get("BENCH_E2E_INT4", "") == "1"  # grouped w4a16
    if int8 and int4:
        sys.exit("set only one of BENCH_E2E_INT8 / BENCH_E2E_INT4")
    # grouped (default) | rank1 — rank1 factorizes the int4 scale matrix
    # so the decode matmul is one fused-convert dot with true int4 HBM reads
    int4_scheme = os.environ.get("BENCH_E2E_INT4_SCHEME", "grouped")
    # int4 KV cache for the composed loop (an HBM-capacity knob — see
    # RUNBOOK "Serving-quantization recipes"); overrides the default
    # int8 cache the quantized configs serve with
    kv4 = os.environ.get("BENCH_E2E_KV4", "") == "1"
    if int8 or int4:
        from probing_rag_tpu.models.gemma import quantize_lm_params

        params = quantize_lm_params(
            params, bits=4 if int4 else 8, int4_scheme=int4_scheme)
    # w8a8 / w4a8 prefill: per-channel int8 or rank-1 int4 weights (grouped
    # int4 keeps the batched w4a16 form). 512 rows = far above any decode
    # step (rows = batch <= 64) and far below the smallest prefill
    # (batch 32 x 1024 tokens = 32768 rows).
    act8 = int(os.environ.get("BENCH_E2E_ACT8", "0"))
    act8_on = act8 and (int8 or (int4 and int4_scheme == "rank1"))
    if act8_on:
        import dataclasses

        cfg = dataclasses.replace(cfg, act_int8_rows=act8)
    tok = HashWordTokenizer(cfg.vocab_size)
    tc = ProberTrainConfig(layers=cfg.probe_layers, positions=("resid_post",))
    probers = init_prober_stack(tc, cfg.d_model, jax.random.PRNGKey(1))

    qz = _zipf_tokens(rng, N_QUERIES * 4).reshape(N_QUERIES, 4)
    questions = [" ".join(f"t{t % VOCAB_TERMS}" for t in row) for row in qz]

    phase = defaultdict(float)
    calls = defaultdict(int)

    class TimedPipeline(AdaptiveRAGPipeline):
        def _generate(self, prompt_texts, with_capture):
            t = time.time()
            out = super()._generate(prompt_texts, with_capture)
            phase["generate"] += time.time() - t
            calls["generations"] += len(prompt_texts)
            return out

        def _gate(self, pooled):
            t = time.time()
            out = super()._gate(pooled)
            phase["gate"] += time.time() - t
            return out

        def _retrieve_evidences(self, queries):
            t = time.time()
            out = super()._retrieve_evidences(queries)
            phase["retrieval"] += time.time() - t
            calls["retrievals"] += len(queries)
            return out

    def build(threshold):
        return TimedPipeline(
            params, cfg, tok, engine, store, probers,
            RAGConfig(retr_method="probing", threshold=threshold,
                      batch_size=BATCH, max_new_tokens=MAX_NEW,
                      kv_int8=(int8 or int4) and not kv4, kv_int4=kv4,
                      spec_k=SPEC),
        )

    # warmup at 2 queries: _generate pads every chunk to BATCH, so this
    # compiles the exact executables (round-0 + retrieval-round decode,
    # gate, retrieval buckets) the timed run reuses
    t0 = time.time()
    build(1e6).run(questions[:2])
    warmup_s = time.time() - t0
    phase.clear()
    calls.clear()

    floor_s = None
    floor_phase = {}
    step_dist = None
    if GATE == "mid":
        # mixed regime exercising the shrinking-active-set rebatching
        # (rag.py) in the regime real traffic runs in. threshold 0.0 does
        # NOT split a random prober stack (MEASURE_r5 e2e_midgate measured
        # 100% no-retrieval: the untrained ensemble's S1-S0 margins all
        # land on one side of 0) — so CALIBRATE: one floor pass records
        # every query's round-0 gate scores, and theta is set to the
        # median margin S1-S0, which by construction sends ~half of round
        # 0 down the retrieval path (gate.py: retrieve iff theta >=
        # S1-S0). Two timed-side passes: the first compiles the
        # partial-batch bucket variants the forced warmup cannot reach,
        # the second is the number of record. The gate is deterministic
        # (same probers, same pooled captures), so both passes take
        # identical retrieval paths.
        calib = build(-1e6).run(questions)
        margins = [float(s[1] - s[0]) for s in calib.gate_scores
                   if s is not None]
        theta_mid = float(np.median(np.asarray(margins)))
        phase.clear()
        calls.clear()
        t0 = time.time()
        mid_ref = build(theta_mid).run(questions)
        cold_s = time.time() - t0
        phase.clear()
        calls.clear()
        t0 = time.time()
        out = build(theta_mid).run(questions)
        total_s = time.time() - t0
        assert out.retr_count_list == mid_ref.retr_count_list
        counts = out.retr_count_list
        n = len(counts)
        step_dist = {
            "theta_mid": round(theta_mid, 6),
            "round0_margin_spread": [round(min(margins), 6),
                                     round(max(margins), 6)],
            "no_retrieval_pct": round(100 * sum(c == 0 for c in counts) / n, 1),
            "single_pct": round(100 * sum(c == 1 for c in counts) / n, 1),
            "multi_pct": round(100 * sum(c >= 2 for c in counts) / n, 1),
            "total_retrieval_calls": int(sum(counts)),
            "retr_count_histogram": {
                str(v): int(sum(c == v for c in counts)) for v in range(4)
            },
        }
    else:
        # no-retrieval floor: gate fires round 0 only. Run twice like the
        # worst case: the first post-warmup pass absorbs the ~1-10 s
        # position-dependent tunnel settling stall (one run recorded a
        # 10.4 s gate phase on the first pass vs 0.33 s steady), the second
        # is the number of record.
        build(-1e6).run(questions)
        phase.clear()
        calls.clear()
        t0 = time.time()
        floor = build(-1e6).run(questions)
        floor_s = time.time() - t0
        assert all(c == 0 for c in floor.retr_count_list)
        floor_phase = {k: round(v, 2) for k, v in phase.items()}
        phase.clear()
        calls.clear()

        # forced worst case: every query runs all 4 retrieval rounds.
        # Run twice: the first pass still compiles the full-batch (Qb=64)
        # retrieval variants the 2-query warmup cannot reach; the second is
        # the steady-state serving number.
        t0 = time.time()
        build(1e6).run(questions)
        cold_s = time.time() - t0
        phase.clear()
        calls.clear()
        t0 = time.time()
        out = build(1e6).run(questions)
        total_s = time.time() - t0
        assert all(c == 3 for c in out.retr_count_list)

    other = total_s - sum(phase.values())
    print(
        json.dumps(
            {
                "metric": "adaptive_rag_e2e_queries_per_sec_per_chip"
                + ("_kv4" if kv4 else "")
                + ("_midgate" if GATE == "mid" else "")
                + (f"_specpl{SPEC}" if SPEC else "")
                # smoke runs must never share a metric key with real ones
                + ("_tiny" if os.environ.get("BENCH_E2E_TINY") == "1" else ""),
                "value": round(N_QUERIES / total_s, 3),
                "unit": "queries/s",
                "vs_baseline": None,
                "detail": {
                    "model": ("tiny (smoke)" if os.environ.get("BENCH_E2E_TINY") == "1"
                              else "gemma-2b (random "
                              + ((("rank-1 int4" if int4_scheme == "rank1"
                                   else "int4") + " weights + int8 KV"
                                  + (" + w4a8 prefill)" if act8_on else ")"))
                                 if int4
                                 else "int8 weights + int8 KV"
                                 + (" + w8a8 prefill)" if act8_on else ")")
                                 if int8 else "bf16)")),
                    "retriever": retr,
                    "n_queries": N_QUERIES,
                    "batch": BATCH,
                    "max_new_tokens": MAX_NEW,
                    "gate_mode": GATE,
                    "speculative_k": SPEC or None,
                    "step_distribution": step_dist,
                    "rounds_per_query": 5 if GATE != "mid" else None,
                    "generations": calls["generations"],
                    "retrieval_calls": calls["retrievals"],
                    "total_s": round(total_s, 1),
                    "phase_s": {k: round(v, 2) for k, v in phase.items()},
                    "host_other_s": round(other, 2),
                    "tokens_per_sec": round(calls["generations"] * MAX_NEW / phase["generate"], 1),
                    "no_retrieval_floor_qps": (
                        round(N_QUERIES / floor_s, 3) if floor_s else None),
                    "floor_phase_s": floor_phase or None,
                    "cold_pass_s": round(cold_s, 1),
                    "warmup_compile_s": round(warmup_s, 1),
                    "index": index_detail,
                    "bm25_stats": (dict(engine.last_stats)
                                   if retr == "bm25" else None),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
