#!/usr/bin/env python
"""Resumable serial TPU measurement harness.

Round 3's shell harness (`measure_round3.sh`) lost the round: every bench's
stderr went to one /tmp file that the next bench overwrote, and a tunnel flap
forced a full re-run (repeating ~8-minute index builds), so the session died
with most rows missing and the crashes undiagnosable. This replaces it:

- **Resume**: rows already captured with a "result" in the output JSONL are
  skipped on re-run. Error rows are retried by default (pass --skip-errors to
  keep them).
- **Evidence**: each bench's full stderr is persisted to
  ``logs/measure_<name>.err`` and the last ~15 lines are embedded in the
  JSONL error row, so a crash is diagnosable from the committed artifact.
- **Serial**: benches run one at a time — two TPU processes over the axon
  tunnel corrupt each other.

Usage: python scripts/measure.py [--out MEASURE_r4.jsonl] [--only name,...]
       [--skip-errors] [--list]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, env overrides, argv, timeout_s) — ordered by judge-criticality so a
# mid-session tunnel death still leaves the headline + flagship rows on disk.
#
# ROUND 5 PLAN (the r4 plan lives in git history; MEASURE_r4.jsonl is the
# session of record for those rows). Goals, from VERDICT r4 "next round":
#  #1 speculative-decode hardware evidence (3 decode rows + an e2e row)
#  #2 close the two failed r4 rows (7B w8a8 b64 OOM -> mlp_t_chunk fix;
#     decode_int4r1a8_b32 died to the tunnel) + the 2 rows the session
#     never reached
#  #3 BM25 headline variance: bm25_rep1..rep5 run the identical bench.py
#     at five different SESSION POSITIONS (the r4 52,264-vs-31,606 spread
#     is tunnel/session state, not protocol — both artifacts ran the same
#     script), so the spread itself gets measured
#  #4 bm25_5m: the first chip-served BM25 number beyond 100k docs (5M-doc
#     store ~3.8 GB in HBM, ids-mode synthesis)
#  #5 e2e_midgate: the composed loop at a ~50% mixed gate (threshold 0,
#     random probers) with the measured step distribution
#  #7 baseline_dragin / baseline_flare: hardware rows with the poster
#     table's retrieval-call accounting
PLAN_R5 = [
    # headline + variance position 1
    ("bm25_rep1", {}, ["python", "bench.py"], 3600),
    # the failed w4a8 decode row (r4 rc=2: tunnel died mid-session)
    ("decode_int4r1a8_b32", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # speculative decode: oracle ceiling / prompt floor on the flagship
    # serving config, + the small-batch int4r1 point (VERDICT r4 #1)
    ("decode_int8a8_spec4_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "oracle"}, ["python", "bench_decode.py"], 3600),
    ("decode_int8a8_specpl4_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "prompt"}, ["python", "bench_decode.py"], 3600),
    ("decode_int4r1_spec4_b8", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "8", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "oracle"}, ["python", "bench_decode.py"], 3600),
    # variance position 2
    ("bm25_rep2", {}, ["python", "bench.py"], 3600),
    # composed-loop speculation (prompt drafter floor; random weights give
    # the drafter nothing systematic to copy — oracle ceiling is the
    # decode rows' job) + the mixed-gate regime row
    ("e2e_int8a8_specpl4", {"BENCH_E2E_INT8": "1", "BENCH_E2E_ACT8": "512", "BENCH_E2E_SPEC": "4"}, ["python", "bench_e2e.py"], 3600),
    ("e2e_midgate", {"BENCH_E2E_INT8": "1", "BENCH_E2E_ACT8": "512", "BENCH_E2E_GATE": "mid"}, ["python", "bench_e2e.py"], 3600),
    # variance position 3
    ("bm25_rep3", {}, ["python", "bench.py"], 3600),
    # the failed 7B w8a8 b64 OOM row: after unstacked weights + chunked
    # MLP/attention still OOMed on compressed-remat cache copies, the fix
    # is the two-program split serving path (decode_greedy_split) — the
    # donated cache hand-off guarantees <=1 cache copy per program
    ("decode_mistral7b_int8a8_b64", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "64", "BENCH_DECODE_SPLIT": "1"}, ["python", "bench_decode.py"], 5400),
    # the two rows the r4 session never reached
    ("e2e_int4r1_a8", {"BENCH_E2E_INT4": "1", "BENCH_E2E_INT4_SCHEME": "rank1", "BENCH_E2E_ACT8": "512"}, ["python", "bench_e2e.py"], 3600),
    ("decode_mistral7b_int4r1a8_b32", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 5400),
    # baseline methods on chip (poster efficiency-table analogue)
    ("baseline_dragin", {"BENCH_BASE_METHOD": "dragin"}, ["python", "bench_baselines.py"], 5400),
    ("baseline_flare", {"BENCH_BASE_METHOD": "flare"}, ["python", "bench_baselines.py"], 5400),
    # variance position 4
    ("bm25_rep4", {}, ["python", "bench.py"], 3600),
    # 5M-doc wiki-scale store served on the real chip (ids-mode synthesis;
    # host build ~10 min + ~3.8 GB device_put over the tunnel)
    ("bm25_5m", {"BENCH_DOCS": "5000000", "BENCH_DOC_LEN": "24", "BENCH_VOCAB": "200000", "BENCH_QUERIES": "2048", "BENCH_SYNTH_IDS": "1", "BENCH_METRIC_SUFFIX": "_5m", "BENCH_MAX_PAD": "524288"}, ["python", "bench.py"], 10800),
    # variance position 5 (end of session)
    ("bm25_rep5", {}, ["python", "bench.py"], 3600),
    # --- follow-ups added mid-session (resume skips everything above) ---
    # the spec oracle-ceiling rows re-measured with the FIXPOINT oracle:
    # the first pass seeded the oracle from the sequential greedy recorder,
    # whose bf16 logits differ from the k+1-token verify forward's in the
    # low bits — one argmax near-tie flip on random weights derailed the
    # oracle permanently (decode_int8a8_spec4_b32 measured
    # tokens_per_forward 1.0). bench_decode now iterates o<-committed(o)
    # to the spec path's own greedy fixpoint (acceptance=1 by definition).
    ("decode_int8a8_spec4fix_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "oracle"}, ["python", "bench_decode.py"], 3600),
    ("decode_int4r1_spec4fix_b8", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "8", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "oracle"}, ["python", "bench_decode.py"], 3600),
    # (the two decode_mistral7b_* error rows retry automatically on resume,
    # now in the UNSTACKED per-layer serving format — the stacked tree's
    # hoisted slice temps were the OOM; see gemma.unstack_layer_params)
    # mixed-gate e2e, CALIBRATED: the first e2e_midgate row's theta=0.0
    # sent 0/64 queries down the retrieval path (random-prober margins all
    # one-sided) — this one sets theta to the measured median round-0
    # margin so ~half of round 0 retrieves (the regime VERDICT #5 asked
    # for). The original row stays as the no-retrieval-bias datapoint.
    ("e2e_midgate_cal", {"BENCH_E2E_INT8": "1", "BENCH_E2E_ACT8": "512", "BENCH_E2E_GATE": "mid"}, ["python", "bench_e2e.py"], 3600),
    # the split path's dispatch/aliasing overhead at 2B, priced against
    # the fused decode_int8a8_b32 ladder row (identical config otherwise):
    # quantifies what the default fused path saves when HBM is NOT tight
    ("decode_int8a8_split_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32", "BENCH_DECODE_SPLIT": "1"}, ["python", "bench_decode.py"], 3600),
    # the fused ladder top re-pinned after the attention-native cache
    # layout change ([L,B,KV,S,hd] + singleton-free scales): same config
    # as the r4 decode_int8a8_b32 row (3,893 tok/s) — regression check
    ("decode_int8a8_b32_kvnative", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # second sample of the same config (kvnative measured 3,658 vs r4's
    # 3,893 — one sample can't separate a layout regression from session
    # noise; BM25 reps spread 32% across positions)
    ("decode_int8a8_b32_kvnative2", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # 7B batch-64 serving answer: w8a8 b64 is structurally ~0.4 GB over
    # one v5e's HBM (args 11.49 G + XLA's one while_loop cache copy
    # 4.66 G = 16.15 G > 15.75 G — probe_auto_layout.py 'unstacked'),
    # so the b64 recipe is w4a8: rank-1 int4 weights (3.44 G) + a8 + KV8
    ("decode_mistral7b_int4r1a8_b64", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "64", "BENCH_DECODE_SPLIT": "1"}, ["python", "bench_decode.py"], 5400),
    # --- int4 KV cache (gemma._quant_kv4) rows ---
    # the w8a8 b64 single-chip answer, revised: quartering the cache to
    # int4 clears the 16.15 G > 15.75 G budget the int8 cache missed
    # (args 6.75 weights + ~2.6 cache/scales + one while_loop cache copy
    # ~2.6 = ~12 G); fused program, no split needed if the budget holds
    ("decode_mistral7b_int8a8_kv4_b64", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT4": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "64"}, ["python", "bench_decode.py"], 5400),
    # 2B ladder context for the int4 cache: at 2B decode is weight-bound,
    # so the int4 dequant VPU work costs throughput (first sample 2,757
    # vs int8-KV's 3,893 tok/s) — kv4 is the big-model HBM knob, not a
    # 2B speed knob; this row pins that honestly with the shipped layout
    ("decode_int8a8_kv4_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT4": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
]
PLAN = PLAN_R5
PLAN_R4 = [
    # 1. headline BM25 (the BENCH_r04 number)
    ("bm25", {}, ["python", "bench.py"], 3600),
    # 2. composed adaptive-RAG loop at Gemma-2B scale
    ("e2e_bf16", {}, ["python", "bench_e2e.py"], 3600),
    # 3. dense merge design space (segs=4/8 crashed in r3 — diagnose first)
    ("dense_bf16_segs1", {"BENCH_DENSE_SEGS": "1"}, ["python", "bench_dense.py"], 1800),
    ("dense_bf16_segs4", {"BENCH_DENSE_SEGS": "4"}, ["python", "bench_dense.py"], 1800),
    ("dense_bf16_segs8", {"BENCH_DENSE_SEGS": "8"}, ["python", "bench_dense.py"], 1800),
    # 3b. bandwidth-bound regime: at q=64 the insert merge thins ~4x and
    #     the sweep should sit near the HBM read bound (q=256 is
    #     MXU-compute + merge bound; pct_of_hbm_bound undersells it there)
    ("dense_bf16_q64", {"BENCH_DENSE_Q": "64"}, ["python", "bench_dense.py"], 1800),
    # 4. int8 (SQ8) store — after the merge fix it should finally pay
    ("dense_int8_segs1", {"BENCH_DENSE_INT8": "1", "BENCH_DENSE_SEGS": "1"}, ["python", "bench_dense.py"], 1800),
    ("dense_int8_segs4", {"BENCH_DENSE_INT8": "1", "BENCH_DENSE_SEGS": "4"}, ["python", "bench_dense.py"], 1800),
    # 4b. int8 + exact bf16 rerank (faiss IndexRefineFlat design): the raw
    #     SQ8 sweep measured recall 0.95 — this is the recall-recovery row
    ("dense_int8_rerank", {"BENCH_DENSE_INT8": "1", "BENCH_DENSE_RERANK": "1", "BENCH_DENSE_SEGS": "1"}, ["python", "bench_dense.py"], 1800),
    # 5. decode quantization ladder: bf16 / int8 / int8+kv8 / int4+kv8 at
    #    b8 and b32 — the PARITY.md decode claims previously had no
    #    artifact of record at all (they were builder-observed)
    ("decode_bf16_b32", {"BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("decode_int8_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("decode_int8kv8_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # 5b. w8a8 prefill: int8 x int8 MXU matmuls above the activation-row
    #     threshold (prefill only; decode steps keep the exact w8a16 form)
    ("decode_int8a8_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("decode_int4_b8", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_KV_INT8": "1"}, ["python", "bench_decode.py"], 3600),
    ("decode_int4_b32", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # 6. e2e quantized variants
    ("e2e_int8", {"BENCH_E2E_INT8": "1"}, ["python", "bench_e2e.py"], 3600),
    ("e2e_int8a8", {"BENCH_E2E_INT8": "1", "BENCH_E2E_ACT8": "512"}, ["python", "bench_e2e.py"], 3600),
    ("e2e_int4", {"BENCH_E2E_INT4": "1"}, ["python", "bench_e2e.py"], 3600),
    ("e2e_dense", {"BENCH_E2E_RETR": "dense"}, ["python", "bench_e2e.py"], 3600),
    # 7. IVF small-batch serving — the regime IVF exists for (q=8, q=1),
    #    plus the q=64 clustered row with the new kernel/XLA profile and
    #    the honest uniform-corpus recall curve (VERDICT r3 #3/#6)
    ("ivf_q8", {"BENCH_IVF_Q": "8"}, ["python", "bench_ivf.py"], 3600),
    ("ivf_q1", {"BENCH_IVF_Q": "1"}, ["python", "bench_ivf.py"], 3600),
    ("ivf_q64", {}, ["python", "bench_ivf.py"], 3600),
    ("ivf_uniform", {"BENCH_IVF_CORPUS": "uniform"}, ["python", "bench_ivf.py"], 3600),
    # 8. training-pipeline phases 2-3 at Gemma-2B scale
    ("dataset_build", {}, ["python", "bench_dataset.py"], 3600),
    ("prober_train", {}, ["python", "bench_train.py"], 3600),
    # 9. serving stack applied to the training pipeline (w8a8 option) and
    #    the larger-batch decode ladder point
    ("dataset_build_int8a8", {"BENCH_DATASET_INT8": "1", "BENCH_DATASET_ACT8": "512"}, ["python", "bench_dataset.py"], 3600),
    ("prober_train_int8a8", {"BENCH_TRAIN_INT8": "1", "BENCH_TRAIN_ACT8": "512"}, ["python", "bench_train.py"], 3600),
    ("decode_int8a8_b64", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "64"}, ["python", "bench_decode.py"], 3600),
    # 10. the reference's optional second model family at serving scale:
    #     Mistral-7B int8 decode on ONE chip (leafwise quantized init —
    #     the bf16 tree alone would overflow HBM)
    ("decode_mistral7b_int8_b32", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("decode_mistral7b_int8a8_b32", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # 11. rank-1 int4 (one fused-convert dot, true int4 HBM reads in the
    #     decode loop) — the scheme built to fix grouped int4 measuring
    #     SLOWER than int8 (ROUND4_NOTES §4)
    ("decode_int4r1_b32", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("decode_int4r1_b8", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1"}, ["python", "bench_decode.py"], 3600),
    ("decode_mistral7b_int4r1_b32", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("e2e_int4r1", {"BENCH_E2E_INT4": "1", "BENCH_E2E_INT4_SCHEME": "rank1"}, ["python", "bench_e2e.py"], 3600),
    # 12. batch-scaling rows: decode b64 measured +24% tokens/s over b32
    #     (decode_int8a8_b64), so the flagship e2e and the 7B ladder get
    #     their b64 points too
    ("e2e_int8a8_b64", {"BENCH_E2E_INT8": "1", "BENCH_E2E_ACT8": "512", "BENCH_E2E_BATCH": "64", "BENCH_E2E_QUERIES": "128"}, ["python", "bench_e2e.py"], 3600),
    ("decode_mistral7b_int8a8_b64", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "64"}, ["python", "bench_decode.py"], 3600),
    # 13. rank-1 int4 + w4a8 prefill: e2e_int4r1 already measured 4.187 q/s
    #     WITHOUT the prefill lever — with it this may be the new flagship
    ("decode_int4r1a8_b32", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    ("e2e_int4r1_a8", {"BENCH_E2E_INT4": "1", "BENCH_E2E_INT4_SCHEME": "rank1", "BENCH_E2E_ACT8": "512"}, ["python", "bench_e2e.py"], 3600),
    ("decode_mistral7b_int4r1a8_b32", {"BENCH_DECODE_MODEL": "mistral7b", "BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32"}, ["python", "bench_decode.py"], 3600),
    # 14. speculative decode on the flagship serving config: oracle mode
    #     measures the acceptance=1 CEILING (drafts = recorded greedy
    #     output), prompt mode the acceptance~0 FLOOR (random weights give
    #     the prompt-lookup drafter nothing to copy) — real-workload
    #     acceptance lies between; exactness is pinned by tests
    ("decode_int8a8_spec4_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "oracle"}, ["python", "bench_decode.py"], 3600),
    ("decode_int8a8_specpl4_b32", {"BENCH_DECODE_INT8": "1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_ACT8": "512", "BENCH_DECODE_BATCH": "32", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "prompt"}, ["python", "bench_decode.py"], 3600),
    ("decode_int4r1_spec4_b8", {"BENCH_DECODE_INT4": "1", "BENCH_DECODE_INT4_SCHEME": "rank1", "BENCH_DECODE_KV_INT8": "1", "BENCH_DECODE_BATCH": "8", "BENCH_DECODE_SPEC": "4", "BENCH_DECODE_SPEC_MODE": "oracle"}, ["python", "bench_decode.py"], 3600),
]


def load_done(out_path):
    done_ok, done_err = set(), set()
    if not os.path.exists(out_path):
        return done_ok, done_err
    with open(out_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "result" in row:
                done_ok.add(row["bench"])
            elif "error" in row:
                done_err.add(row["bench"])
    return done_ok, done_err


def rewrite_without(out_path, names):
    """Drop stale rows for benches about to be retried (keep one row/bench)."""
    if not os.path.exists(out_path) or not names:
        return
    kept = []
    with open(out_path) as f:
        for line in f:
            try:
                if json.loads(line).get("bench") in names:
                    continue
            except (json.JSONDecodeError, AttributeError):
                pass
            kept.append(line)
    with open(out_path, "w") as f:
        f.writelines(kept)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MEASURE_r5.jsonl")
    ap.add_argument("--only", default="", help="comma-separated bench names")
    ap.add_argument("--skip-errors", action="store_true",
                    help="do not retry benches that previously errored")
    ap.add_argument("--force", action="store_true",
                    help="re-run --only benches even if already captured "
                         "(replaces their rows)")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    os.chdir(REPO)
    os.makedirs("logs", exist_ok=True)
    if args.list:
        for name, env, argv, t in PLAN:
            print(f"{name:22s} {' '.join(f'{k}={v}' for k, v in env.items())} {' '.join(argv)}")
        return 0

    only = {s for s in args.only.split(",") if s}
    done_ok, done_err = load_done(args.out)
    retry = set()
    plan = []
    for name, env, argv, t in PLAN:
        if only and name not in only:
            continue
        if name in done_ok:
            if args.force and only:
                retry.add(name)
            else:
                print(f"[measure] skip {name} (already captured)", file=sys.stderr)
                continue
        if name in done_err and args.skip_errors:
            print(f"[measure] skip {name} (previous error, --skip-errors)", file=sys.stderr)
            continue
        if name in done_err:
            retry.add(name)
        plan.append((name, env, argv, t))
    rewrite_without(args.out, retry)

    n_fail = 0
    for name, env, argv, timeout_s in plan:
        if not os.path.exists(argv[-1]):
            print(f"[measure] skip {name}: {argv[-1]} missing", file=sys.stderr)
            continue
        print(f"=== {name} ({time.strftime('%H:%M:%S')}) ===", file=sys.stderr)
        errpath = os.path.join("logs", f"measure_{name}.err")
        full_env = dict(os.environ, **env)
        t0 = time.time()
        try:
            with open(errpath, "w") as errf:
                proc = subprocess.run(
                    argv, env=full_env, stdout=subprocess.PIPE, stderr=errf,
                    timeout=timeout_s, text=True,
                )
            rc = proc.returncode
            stdout = proc.stdout
        except subprocess.TimeoutExpired:
            rc, stdout = 124, ""
        wall = round(time.time() - t0, 1)
        lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
        last = lines[-1] if lines else ""
        parsed = None
        if rc == 0 and last:
            try:
                parsed = json.loads(last)
            except json.JSONDecodeError:
                rc = rc or 3
        with open(args.out, "a") as out:
            if rc == 0 and parsed is not None:
                out.write(json.dumps({"bench": name, "wall_s": wall, "result": parsed}) + "\n")
                print(last, file=sys.stderr)
            else:
                tail = ""
                if os.path.exists(errpath):
                    with open(errpath, errors="replace") as ef:
                        tail = "".join(ef.readlines()[-15:])[-2000:]
                out.write(json.dumps({
                    "bench": name, "error": rc, "wall_s": wall,
                    "stderr_tail": tail, "stderr_log": errpath,
                }) + "\n")
                print(f"FAILED rc={rc}; stderr tail:\n{tail}", file=sys.stderr)
                n_fail += 1
                if rc == 2:
                    # watchdog: tunnel is dead — later benches will all fail
                    # too; stop here so resume can pick up cleanly
                    print("[measure] tunnel down (rc=2) — stopping session; "
                          "re-run to resume", file=sys.stderr)
                    return 2
    print(f"[measure] session complete -> {args.out} ({n_fail} failures)", file=sys.stderr)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
