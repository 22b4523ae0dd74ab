"""Command-line workflow: the replacement for the reference's shell scripts
(L7, SURVEY.md §1): ``index build -> dataset make -> prober train -> rag run
-> analyze``.

Usage (mirrors README.md:35-66 of the reference):

    python -m probing_rag_tpu.cli index-build --dataset nq --raw-dir raw_data --out artifacts/nq
    python -m probing_rag_tpu.cli dataset-make --retr-method simple --dataset nq ...
    python -m probing_rag_tpu.cli prober-train --data dataset/extracted_*.csv --out artifacts/probers
    python -m probing_rag_tpu.cli rag-run --retr-method probing --dataset nq ...
    python -m probing_rag_tpu.cli param-audit
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np


def _force_platform(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)


def _load_model(args):
    """LM params + tokenizer: HF checkpoint when provided, random-init tiny
    model (ByteTokenizer) otherwise — the zero-checkpoint smoke path."""
    import jax
    import jax.numpy as jnp

    from probing_rag_tpu.models.gemma import GemmaConfig, init_params
    from probing_rag_tpu.models.tokenizer import ByteTokenizer, SentencePieceTokenizer

    if args.checkpoint:
        from probing_rag_tpu.models.hf_loader import load_gemma_params

        cfg = (
            GemmaConfig.mistral_7b()
            if "mistral" in args.model_id.lower()
            else GemmaConfig.gemma_2b()
        )
        cfg = _apply_act8(cfg, args)
        params = load_gemma_params(Path(args.checkpoint), cfg)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        if args.tokenizer:
            tok = SentencePieceTokenizer(args.tokenizer)
        else:
            from transformers import AutoTokenizer

            tok = SentencePieceTokenizer(
                AutoTokenizer.from_pretrained(args.checkpoint)
            )
        return _maybe_quantize(params, args), cfg, tok

    print(
        "[probing-rag-tpu] no --checkpoint: using random-init tiny model "
        "(smoke-test mode; outputs are not meaningful)",
        file=sys.stderr,
    )
    cfg = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)
    cfg = _apply_act8(cfg, args)
    params = init_params(cfg, jax.random.PRNGKey(args.seed))
    return _maybe_quantize(params, args), cfg, ByteTokenizer(cfg.vocab_size)


def _apply_act8(cfg, args):
    """w8a8 / w4a8 prefill threshold: meaningful with --quantize int8
    (s8 x s8 MXU path) or --quantize int4 --int4-scheme rank1 (s8 x s4 —
    the rank-1 group scale folds into the activations before they are
    row-quantized, so the factorization stays exact up to activation
    rounding). Grouped int4 keeps the batched w4a16 form."""
    rows = int(getattr(args, "act_int8_rows", 0) or 0)
    mode = getattr(args, "quantize", "none")
    rank1 = getattr(args, "int4_scheme", "grouped") == "rank1"
    if rows and (mode == "int8" or (mode == "int4" and rank1)):
        return dataclasses.replace(cfg, act_int8_rows=rows)
    return cfg


def _maybe_quantize(params, args):
    mode = getattr(args, "quantize", "none") or "none"
    if mode == "none":
        return params
    from probing_rag_tpu.models.gemma import quantize_lm_params

    return quantize_lm_params(
        params,
        bits=4 if mode == "int4" else 8,
        int4_scheme=getattr(args, "int4_scheme", "grouped") or "grouped",
    )


def cmd_index_build(args):
    _force_platform(args)
    from probing_rag_tpu.data.corpus import DocStore, make_documents
    from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

    if args.fixture:
        texts = [line for line in Path(args.fixture).read_text().splitlines() if line.strip()]
        ids = [str(i) for i in range(len(texts))]
    else:
        texts, ids = make_documents(args.dataset, Path(args.raw_dir))
    out = Path(args.out)
    DocStore.from_texts(texts, ids).save(out / "docstore.json")
    if args.dense:
        from probing_rag_tpu.retrieval.dense import DenseIndex

        encode = _dense_encoder(args)
        dense = DenseIndex.build(texts, encode)
        dense.save(out / "dense")
        if getattr(args, "dense_ivf", False):
            from probing_rag_tpu.retrieval.ivf import IVFDenseIndex

            t0 = time.time()
            IVFDenseIndex.build(
                dense.embeddings, metric=dense.metric, seed=args.seed,
                nlist=args.ivf_nlist,
            ).save(out / "ivf")
            print(f"built IVF quantizer+store in {time.time()-t0:.1f}s")
    else:
        t0 = time.time()
        BM25Index.build(texts, BM25Config()).save(out / "bm25")
        print(f"built sparse index over {len(texts)} docs in {time.time()-t0:.1f}s")
    print(f"index written to {out}")


def _dense_encoder(args):
    """Contriever encoder closure (random-init without a checkpoint)."""
    import jax
    import jax.numpy as jnp

    from probing_rag_tpu.models.encoder import (
        EncoderConfig,
        encoder_forward,
        init_encoder_params,
    )
    from probing_rag_tpu.models.tokenizer import ByteTokenizer

    cfg = EncoderConfig.tiny() if not args.checkpoint else EncoderConfig.contriever()
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(max(cfg.vocab_size, 259))
    fwd = jax.jit(lambda p, t, m: encoder_forward(p, t, m, cfg))

    def encode(texts):
        ids = [tok.encode(t)[: cfg.max_positions] for t in texts]
        ml = max(max((len(i) for i in ids), default=1), 1)
        arr = np.zeros((len(ids), ml), np.int32)
        mask = np.zeros((len(ids), ml), bool)
        for i, row in enumerate(ids):
            arr[i, : len(row)] = [min(t, cfg.vocab_size - 1) for t in row]
            mask[i, : len(row)] = True
        return np.asarray(fwd(params, jnp.asarray(arr), jnp.asarray(mask)))

    return encode


def _build_pipeline(args, retr_method: str):
    from probing_rag_tpu.data.corpus import DocStore
    from probing_rag_tpu.pipeline.rag import AdaptiveRAGPipeline, RAGConfig
    from probing_rag_tpu.retrieval.bm25 import BM25Engine
    from probing_rag_tpu.retrieval.bm25_index import BM25Index

    params, cfg, tok = _load_model(args)
    index_dir = Path(args.index)
    store = DocStore.load(index_dir / "docstore.json")
    if args.dense:
        import jax.numpy as jnp

        store_dtype = jnp.int8 if args.dense_int8 else jnp.bfloat16
        if getattr(args, "dense_ivf", False):
            from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, IVFEngine

            engine = IVFEngine(
                IVFDenseIndex.load(index_dir / "ivf"),
                nprobe=args.ivf_nprobe, encode_fn=_dense_encoder(args),
                store_dtype=store_dtype,
            )
        else:
            from probing_rag_tpu.retrieval.dense import DenseEngine, DenseIndex

            engine = DenseEngine(
                DenseIndex.load(index_dir / "dense"), _dense_encoder(args),
                store_dtype=store_dtype,
            )
    else:
        engine = BM25Engine(BM25Index.load(index_dir / "bm25"))

    probers = None
    if retr_method == "probing":
        from probing_rag_tpu.prober.train import ProberTrainConfig, init_prober_stack
        from probing_rag_tpu.utils.checkpoint import load_pytree

        tc = ProberTrainConfig(layers=cfg.probe_layers, positions=(args.position,))
        template = init_prober_stack(tc, cfg.d_model, __import__("jax").random.PRNGKey(0))
        if args.probers:
            # checkpoints trained over both positions carry 2x the gate's
            # sites (the reference trains resid_mid+resid_post but gates on
            # resid_post only, exp_rag.py:311): select the gate's site rows
            # by the manifest's site order
            import jax

            probers, meta = load_pytree(Path(args.probers))
            saved_sites = [tuple(s) for s in meta.get("sites", [])]
            want = [list(s) for s in tc.sites]
            if saved_sites and [list(s) for s in saved_sites] != want:
                try:
                    rows = [saved_sites.index((l, p)) for l, p in tc.sites]
                except ValueError:
                    raise SystemExit(
                        f"--probers checkpoint sites {saved_sites} do not "
                        f"cover the gate's sites {tc.sites}"
                    )
                idx = np.asarray(rows)
                probers = jax.tree.map(lambda a: a[idx], probers)
            # validate against the gate's expected structure AFTER the site
            # selection (the raw checkpoint may legitimately carry 2x sites,
            # so load_pytree(like=...) can't check it directly): a d_model /
            # hidden-size mismatch must fail here with named shapes, not as
            # an opaque shape error inside the jitted gate
            t_leaves = jax.tree.leaves(template)
            p_leaves = jax.tree.leaves(probers)
            if len(t_leaves) != len(p_leaves) or any(
                t.shape != p.shape for t, p in zip(t_leaves, p_leaves)
            ):
                raise SystemExit(
                    "--probers checkpoint does not match the gate's prober "
                    f"stack: got {[tuple(p.shape) for p in p_leaves]}, "
                    f"expected {[tuple(t.shape) for t in t_leaves]} "
                    f"(d_model={cfg.d_model}, sites={tc.sites})"
                )
        else:
            print("[probing-rag-tpu] no --probers: random gate (smoke only)", file=sys.stderr)
            probers = template

    rag = RAGConfig(
        retr_method=retr_method,
        threshold=args.threshold,
        ablation=args.ablation,
        top_k=args.top_k,
        max_new_tokens=args.max_new_tokens,
        batch_size=args.batch_size,
        position=args.position,
        kv_int8=getattr(args, "kv_int8", False),
        kv_int4=getattr(args, "kv_int4", False),
        spec_k=getattr(args, "spec_k", 0) or 0,
        spec_drafter=getattr(args, "spec_drafter", "prompt"),
        split_prefill=getattr(args, "split_prefill", False),
    )
    return AdaptiveRAGPipeline(params, cfg, tok, engine, store, probers, rag), cfg


def _load_questions(args):
    from probing_rag_tpu.data.qa import load_qa_dataset

    if args.fixture_qa:
        import json

        data = json.loads(Path(args.fixture_qa).read_text())
        return [d["question"] for d in data], [d["answers"] for d in data]
    examples = load_qa_dataset(Path(args.raw_dir), args.dataset, args.split)
    examples = examples[: args.steps_limit + 1]
    return [e.question for e in examples], [e.answers for e in examples]


def cmd_rag_run(args):
    _force_platform(args)
    from probing_rag_tpu.eval.evaluator import evaluate_predictions
    from probing_rag_tpu.eval.metrics import EmF1Metric, SupportEmF1Metric
    from probing_rag_tpu.eval.results import RunRecord, result_filename, save_run

    pipeline, cfg = _build_pipeline(args, args.retr_method)
    questions, answers = _load_questions(args)
    t0 = time.time()
    result = pipeline.run(questions)
    elapsed = time.time() - t0
    multihop = args.dataset in ("hotpotqa", "2wikimultihopqa", "musique", "iirc")
    metric = SupportEmF1Metric() if multihop else EmF1Metric()
    acc, metric, _ = evaluate_predictions(
        result.pred_list, answers, metric,
        dataset_name=args.dataset, retr_method=args.retr_method,
    )
    record = RunRecord(
        retr_method=args.retr_method,
        dataset_name=args.dataset,
        elapsed_s=elapsed,
        acc=acc,
        metric_out=metric.get_metric(),
        retr_count_list=result.retr_count_list if args.retr_method == "probing" else None,
        config={k: v for k, v in vars(args).items() if k != "fn"},
    )
    fname = result_filename(
        args.ablation, "tpu", "dense" if args.dense else "sparse", args.dataset,
        args.threshold, args.retr_method, "cot", args.split, args.steps_limit,
    )
    path = save_run(record, Path(args.results_dir), fname)
    em, f1 = record.em_f1()
    print(f"acc={record.accuracy:.4f} em={em} f1={f1} time={elapsed:.1f}s -> {path}")


def cmd_dataset_make(args):
    _force_platform(args)
    from probing_rag_tpu.pipeline.dataset_builder import extract_cot_dataset, save_rows

    pipeline, _ = _build_pipeline(args, args.retr_method)
    questions, answers = _load_questions(args)
    rows = extract_cot_dataset(pipeline, questions, answers, args.dataset)
    out = Path(args.out)
    save_rows(rows, out)
    print(f"{len(rows)} rows -> {out}")


def cmd_prober_train(args):
    _force_platform(args)
    import jax

    from probing_rag_tpu.pipeline.dataset_builder import balance_and_merge, load_rows
    from probing_rag_tpu.prober.train import ProberTrainConfig, train_probers
    from probing_rag_tpu.utils.checkpoint import save_pytree
    from probing_rag_tpu.utils.logging import JsonlWriter

    params, cfg, tok = _load_model(args)
    row_sets = [load_rows(Path(p)) for p in args.data]
    examples = balance_and_merge(row_sets, pos_ratio=args.pos_ratio, seed=args.seed)
    split = max(1, int(len(examples) * 0.9))
    tc = ProberTrainConfig(
        layers=cfg.probe_layers,
        positions=tuple(args.positions.split(",")),
        method=args.method,
        lr=args.lr,
        batch_size=args.batch_size,
        epochs=args.epochs,
        max_len=args.max_len,
        seed=args.seed,
    )
    writer = JsonlWriter(Path(args.out) / "train_log.jsonl")
    stacked, history = train_probers(
        params, cfg, tok, examples[:split], examples[split:], tc, log=writer.write
    )
    save_pytree(
        Path(args.out) / "probers",
        stacked,
        meta={"sites": [list(s) for s in tc.sites], "method": tc.method,
              "model_id": args.model_id},
    )
    print(f"trained {len(tc.sites)} probers on {split} examples -> {args.out}")


def cmd_prober_eval(args):
    """Offline layer-wise prober classification accuracy over a held-out
    generation CSV (exp_evaluation_probing.py equivalent), with an optional
    per-layer logit dump for KDE analysis."""
    _force_platform(args)
    import jax
    import numpy as np

    from probing_rag_tpu.eval.analysis import prober_offline_eval
    from probing_rag_tpu.pipeline.dataset_builder import balance_and_merge, load_rows
    from probing_rag_tpu.prober.train import ProberTrainConfig, init_prober_stack
    from probing_rag_tpu.utils.checkpoint import load_pytree

    params, cfg, tok = _load_model(args)
    examples = balance_and_merge([load_rows(Path(p)) for p in args.data], seed=args.seed)
    tc = ProberTrainConfig(
        layers=cfg.probe_layers,
        positions=tuple(args.positions.split(",")),
        max_len=args.max_len,
    )
    template = init_prober_stack(tc, cfg.d_model, jax.random.PRNGKey(0))
    probers, meta = load_pytree(Path(args.probers), like=template)
    result = prober_offline_eval(
        params, cfg, tok, examples, probers, tc,
        collect_logits=bool(args.kde_out),
    )
    print(f"{'layer':>6} {'position':>12} {'accuracy':>9}")
    for (layer, pos), acc in zip(tc.sites, result.site_accuracy):
        print(f"{layer:>6} {pos:>12} {acc:>9.4f}")
    if args.kde_out:
        np.save(args.kde_out, result.logits)
        print(f"logits for KDE -> {args.kde_out}")


def cmd_rag_sweep(args):
    """Threshold / prober-ablation sweeps (the reference's published
    ablations, exp_clf_performance.py:525-567): reruns the probing pipeline
    across a grid and tabulates accuracy/EM/F1 per setting."""
    _force_platform(args)
    import dataclasses

    from probing_rag_tpu.eval.evaluator import evaluate_predictions
    from probing_rag_tpu.eval.metrics import EmF1Metric, SupportEmF1Metric

    pipeline, _ = _build_pipeline(args, "probing")
    questions, answers = _load_questions(args)
    multihop = args.dataset in ("hotpotqa", "2wikimultihopqa", "musique", "iirc")
    thresholds = [float(t) for t in args.thresholds.split(",")]
    ablations = [int(a) for a in args.ablations.split(",")]
    print(f"{'thr':>6} {'abl':>4} {'acc':>8} {'em':>7} {'f1':>7} {'avg_steps':>9}")
    for thr in thresholds:
        for abl in ablations:
            pipeline.rag = dataclasses.replace(
                pipeline.rag, threshold=thr, ablation=abl
            )
            result = pipeline.run(questions)
            metric = SupportEmF1Metric() if multihop else EmF1Metric()
            acc, metric, _ = evaluate_predictions(
                result.pred_list, answers, metric, dataset_name=args.dataset,
            )
            m = metric.get_metric()
            em, f1 = (m["title_em"], m["title_f1"]) if multihop else (m["em"], m["f1"])
            avg_steps = sum(result.retr_count_list) / max(len(result.retr_count_list), 1)
            scored = [a for a in acc if a is not None]  # None = metric-skipped
            accuracy = sum(scored) / max(len(scored), 1)
            print(f"{thr:>6} {abl:>4} {accuracy:>8.4f} {em:>7} {f1:>7} {avg_steps:>9.2f}")


def cmd_analyze(args):
    """Offline analysis report over persisted runs (exp_clf_performance
    equivalents): retrieval-step distribution, comparison against the
    published tables, inverse-weighted averages."""
    import json

    from probing_rag_tpu.eval.analysis import (
        PUBLISHED,
        PUBLISHED_RETRIEVAL_CALLS,
        inverse_weighted_average,
        retrieval_step_distribution,
    )

    runs = []
    for line in Path(args.runs).read_text().splitlines():
        if line.strip():
            runs.append(json.loads(line))
    if not runs:
        print("no runs found")
        return
    print(f"{len(runs)} runs from {args.runs}\n")
    for run in runs:
        em = run.get("em"); f1 = run.get("f1")
        print(f"- {run['retr_method']:10s} {run['dataset']:16s} "
              f"acc={run['accuracy']:.4f} em={em} f1={f1} time={run['elapsed_s']:.0f}s")
        if run.get("retr_counts"):
            dist = retrieval_step_distribution(run["retr_counts"])
            print(f"    steps: no={dist['no_retrieval_pct']:.1f}% single={dist['single_pct']:.1f}% "
                  f"multi={dist['multi_pct']:.1f}% calls={dist['total_calls']} "
                  f"(published Probing-RAG: 57.46/20.19/22.35)")
    print("\npublished EM targets (BASELINE.md):")
    datasets = ("hotpotqa", "nq", "trivia", "musique", "2wikimultihopqa", "iirc")
    for method, row in PUBLISHED["em"].items():
        print(f"  {method:14s} " + " ".join(f"{d}={v}" for d, v in zip(datasets, row)))
    print("\ninverse-weighted accuracy averages (published):")
    for m, v in inverse_weighted_average(PUBLISHED["accuracy"]).items():
        print(f"  {m:14s} {v:.2f}")
    print("\npublished total retrieval calls (2500 queries):", PUBLISHED_RETRIEVAL_CALLS)

    if getattr(args, "report", None):
        import numpy as np

        from probing_rag_tpu.eval.figures import assemble_report

        kde = np.load(args.kde_logits) if args.kde_logits else None
        site_acc = (
            json.loads(Path(args.site_accuracy).read_text())
            if args.site_accuracy
            else None
        )
        layers = [int(x) for x in args.layers.split(",")]
        report = assemble_report(
            runs, Path(args.report), kde_logits=kde,
            site_accuracy=site_acc, layers=layers,
        )
        print(f"\nreport -> {report}")


def _parity_preflight(args, datasets):
    """Print exactly which parity artifacts are present/missing (VERDICT r4
    #8: 'a sharper one-command drill for the day weights arrive'). Never
    aborts — the drill falls back to the synthetic fixture path — but the
    checklist makes 'which file is still needed' a zero-thought read."""
    from probing_rag_tpu.data.qa import dataset_path

    rows = []

    def check(label, ok, hint):
        rows.append((label, ok, hint))

    ckpt = Path(args.checkpoint) if args.checkpoint else None
    if ckpt is None:
        check("checkpoint", False,
              "--checkpoint DIR with google/gemma-2b safetensors "
              "(RUNBOOK.md §0); without it the drill runs the synthetic "
              "fixture chain")
    else:
        has_st = bool(list(ckpt.glob("*.safetensors"))) if ckpt.is_dir() else False
        check(f"checkpoint safetensors ({ckpt})", has_st,
              "download google/gemma-2b and point --checkpoint at it")
        sp = (Path(args.tokenizer) if args.tokenizer
              else ckpt / "tokenizer.model")
        check(f"sentencepiece model ({sp})", sp.exists(),
              "tokenizer.model from the same checkpoint (pad=eos parity, "
              "exp_rag.py:304); or pass --tokenizer PATH")
    raw = Path(args.raw_dir)
    for ds in datasets:
        for split in ("train", "dev"):
            try:
                p = dataset_path(raw, ds, split)
            except ValueError:
                check(f"dataset {ds}/{split}", False, "unknown dataset name")
                continue
            check(f"dataset {ds}/{split} ({p})", p.exists(),
                  "scripts/download_data.sh fetches the reference layout")
    missing = [r for r in rows if not r[1]]
    print("[parity preflight] artifact checklist:")
    for label, ok, hint in rows:
        mark = "ok " if ok else "MISSING"
        print(f"  [{mark:7s}] {label}" + ("" if ok else f" -> {hint}"))
    if missing:
        print(f"[parity preflight] {len(missing)} artifact(s) missing — "
              "running the synthetic-fixture drill; the published-number "
              "reproduction needs every row green (RUNBOOK.md).")
    else:
        print("[parity preflight] all artifacts present — this run "
              "reproduces the BASELINE.md protocol.")


def cmd_parity(args):
    """One-command parity drill: the reference's full five-step workflow
    (README.md:35-66 — index build -> prober-dataset make (simple + none) ->
    prober train -> probing RAG eval per dataset -> analyze vs the published
    tables) chained end-to-end through the same CLI surface as the manual
    RUNBOOK.md steps.

    With ``--checkpoint`` pointing at a real google/gemma-2b HF checkpoint
    dir and ``--raw-dir`` holding the downloaded datasets
    (scripts/download_data.sh), this reproduces every BASELINE.md table;
    expected runtime at the paper config (500 dev questions x 5 datasets,
    150-token CoT decoding at ~2.4k tok/s/chip measured in PARITY.md) is
    roughly 1-2 h/dataset on one v5e chip plus 2-3 h for prober-dataset
    generation + training. Without a checkpoint it runs the identical chain
    on a synthetic fixture corpus with the random-init tiny model (~2 min
    CPU; tests/test_cli_parity.py) — checkpoint availability is the only
    variable left between this command and the published numbers."""
    import json

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    datasets = args.datasets.split(",")
    _parity_preflight(args, datasets)
    base = ["--platform", args.platform] if args.platform else []
    if args.checkpoint:
        base += ["--checkpoint", args.checkpoint]
        if args.tokenizer:
            base += ["--tokenizer", args.tokenizer]

    if args.checkpoint and not args.fixture_scale:
        corpus_args = lambda ds: ["--dataset", ds, "--raw-dir", args.raw_dir]
        qa_args = lambda ds, split: [
            "--dataset", ds, "--split", split, "--raw-dir", args.raw_dir,
        ]
    else:
        # synthetic fixture path: one shared corpus + per-dataset QA files
        rng = np.random.default_rng(args.seed)
        topics = ["paris france capital", "nile africa river", "gemma language model",
                  "tpu google accelerator", "everest tallest mountain"]
        corpus_path = work / "corpus.txt"
        corpus_path.write_text("\n".join(
            f"{t} fact {i} " + " ".join(rng.choice(list("abcdefgh"), 3))
            for i, t in enumerate(topics * 8)
        ))
        qa = [
            {"question": "What is the capital of France?", "answers": ["paris"]},
            {"question": "Which river is in Africa?", "answers": ["nile"]},
            {"question": "What is the tallest mountain?", "answers": ["everest"]},
            {"question": "Who makes TPUs?", "answers": ["google"]},
        ]
        qa_path = work / "qa.json"
        qa_path.write_text(json.dumps(qa))
        corpus_args = lambda ds: ["--dataset", ds, "--fixture", str(corpus_path)]
        qa_args = lambda ds, split: [
            "--dataset", ds, "--split", split, "--fixture-qa", str(qa_path),
        ]

    results_dir = work / "result"
    steps = ["--steps-limit", str(args.steps_limit),
             "--max-new-tokens", str(args.max_new_tokens),
             "--batch-size", str(args.batch_size),
             "--results-dir", str(results_dir)]

    print(f"[parity 1/5] index build -> {work}/index_*")
    for ds in datasets:
        main(base + ["index-build", *corpus_args(ds), "--out", str(work / f"index_{ds}")])

    print("[parity 2/5] prober-dataset make (simple + none, train split)")
    ds0 = datasets[0]
    row_files = []
    for method in ("simple", "none"):
        out = work / f"rows_{method}.csv"
        main(base + ["dataset-make", *qa_args(ds0, "train"),
                     "--retr-method", method,
                     "--index", str(work / f"index_{ds0}"),
                     "--out", str(out), *steps])
        row_files.append(str(out))

    print("[parity 3/5] prober training")
    main(base + ["prober-train", "--data", *row_files,
                 "--out", str(work / "probers"),
                 "--epochs", str(args.epochs),
                 "--batch-size", str(args.batch_size)])

    print("[parity 4/5] probing RAG eval per dataset")
    for ds in datasets:
        main(base + ["rag-run", *qa_args(ds, "dev"),
                     "--retr-method", "probing",
                     "--index", str(work / f"index_{ds}"),
                     "--probers", str(work / "probers" / "probers"), *steps])

    print("[parity 5/5] analysis vs published tables")
    main(["analyze", "--runs", str(results_dir / "runs.jsonl"),
          "--report", str(work / "report")])
    print(f"parity drill complete -> {work}")


def cmd_param_audit(args):
    """Prober-vs-classifier parameter audit (exp_parameter_check.py)."""
    import jax

    from probing_rag_tpu.prober.model import init_improved_probe, probe_param_count

    probe = init_improved_probe(jax.random.PRNGKey(0), args.d_model)
    n = probe_param_count(probe)
    t5_large = 737_668_096  # Adaptive-RAG's T5-large classifier (exp_parameter_check.py:48-54)
    print(f"prober params:            {n:>13,} ({n * 4 / 2**20:.2f} MB fp32)")
    print(f"adaptive-rag T5 classifier:{t5_large:>13,} ({t5_large * 4 / 2**20:.2f} MB fp32)")
    print(f"ratio: {t5_large / n:.0f}x")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="probing-rag-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--platform", default=None, help="force jax platform (cpu)")
        sp.add_argument("--model-id", default="google/gemma-2b")
        sp.add_argument("--checkpoint", default=None, help="HF checkpoint dir")
        sp.add_argument("--tokenizer", default=None, help="sentencepiece model path")
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--quantize", default="none",
                        choices=["none", "int8", "int4"],
                        help="LM weight quantization for serving: int8 "
                        "(per-channel) halves decode HBM traffic; int4 "
                        "(grouped w4a16, embeddings stay int8) halves the "
                        "layer weights again")
        sp.add_argument("--int4-scheme", default="grouped",
                        dest="int4_scheme", choices=["grouped", "rank1"],
                        help="with --quantize int4: 'grouped' keeps the "
                        "full per-(group,channel) scale matrix (highest "
                        "quality; decode measures slower than int8 on "
                        "v5e), 'rank1' factorizes it as rs[k]*s[f] so the "
                        "decode matmul is one fused-convert dot with true "
                        "int4 HBM reads (the int4 speed scheme)")
        sp.add_argument("--act-int8-rows", type=int, default=0,
                        dest="act_int8_rows",
                        help="with --quantize int8: activation-row "
                        "threshold above which matmuls run w8a8 on the "
                        "MXU (prefill; decode steps stay w8a16). 512 is "
                        "the measured serving setting (+26%% decode "
                        "ladder, +15%% e2e; MEASURE_r4 decode_int8a8_b32)")
        sp.add_argument("--kv-int8", action="store_true", dest="kv_int8",
                        help="int8 KV cache (per-token-per-head scales, "
                        "dequant fused into the attention read): halves "
                        "cache HBM traffic; part of the recommended "
                        "serving config with --quantize int8")
        sp.add_argument("--kv-int4", action="store_true", dest="kv_int4",
                        help="int4 KV cache (sub-channel group scales, "
                        "32 lanes per scale): quarters cache HBM traffic "
                        "and footprint — the batch-64 7B single-chip "
                        "serving enabler (ROUND5_NOTES §10); mutually "
                        "exclusive with --kv-int8")
        sp.add_argument("--spec-k", type=int, default=0, dest="spec_k",
                        help="speculative decode: verify this many "
                        "prompt-lookup draft tokens per forward "
                        "(greedy-exact — committed output is identical to "
                        "sequential greedy; models/speculative.py). RAG "
                        "generations quote retrieved passages, the "
                        "prompt-lookup drafter's best case. 0 = off")
        sp.add_argument("--spec-drafter", default="prompt",
                        dest="spec_drafter", choices=["prompt"],
                        help="speculative draft source (serving exposes "
                        "the self-drafting prompt-lookup drafter; the "
                        "oracle drafter is a bench/test harness)")
        sp.add_argument("--split-prefill", action="store_true",
                        dest="split_prefill",
                        help="serve generation as two programs (prefill "
                        "jit -> donated-cache decode jit) instead of one "
                        "fused program: identical output, lower peak HBM "
                        "— required for 7B at batch 64 "
                        "(models/decode.py::decode_greedy_split)")
        sp.add_argument("--dense", action="store_true", help="dense retrieval")
        sp.add_argument("--dense-int8", action="store_true",
                        help="int8 (SQ8) dense store: half the HBM bytes "
                        "on the bandwidth-bound sweep")
        sp.add_argument("--dense-ivf", action="store_true",
                        help="IVF dense index (k-means cells, probed "
                        "search): reads nprobe/nlist of the store per "
                        "query instead of all of it — the small-batch / "
                        "huge-corpus serving mode")
        sp.add_argument("--ivf-nprobe", type=int, default=32,
                        help="IVF cells probed per query (recall knob)")
        sp.add_argument("--ivf-nlist", type=int, default=None,
                        help="IVF cell count (default ~2*sqrt(n_docs), pow2)")

    sp = sub.add_parser("index-build")
    common(sp)
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--raw-dir", default="raw_data")
    sp.add_argument("--out", required=True)
    sp.add_argument("--fixture", default=None, help="plain-text corpus file (one doc/line)")
    sp.set_defaults(fn=cmd_index_build)

    def rag_common(sp):
        common(sp)
        sp.add_argument("--dataset", required=True)
        sp.add_argument("--split", default="dev")
        sp.add_argument("--raw-dir", default="raw_data")
        sp.add_argument("--fixture-qa", default=None, help="JSON [{question, answers}]")
        sp.add_argument("--index", required=True)
        sp.add_argument("--probers", default=None)
        sp.add_argument("--threshold", type=float, default=0.0)
        sp.add_argument("--ablation", type=int, default=0)
        sp.add_argument("--top-k", type=int, default=5)
        sp.add_argument("--max-new-tokens", type=int, default=150)
        sp.add_argument("--batch-size", type=int, default=8)
        sp.add_argument("--position", default="resid_post")
        sp.add_argument("--steps-limit", type=int, default=500)
        sp.add_argument("--results-dir", default="result")

    sp = sub.add_parser("rag-run")
    rag_common(sp)
    sp.add_argument("--retr-method", default="probing",
                    choices=["probing", "none", "simple"])
    sp.set_defaults(fn=cmd_rag_run)

    sp = sub.add_parser("dataset-make")
    rag_common(sp)
    sp.add_argument("--retr-method", default="simple", choices=["none", "simple"])
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_dataset_make)

    sp = sub.add_parser("prober-train")
    common(sp)
    sp.add_argument("--data", nargs="+", required=True, help="extracted CSV(s)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--method", default="tokens_mean",
                    choices=["tokens_mean", "last_token", "each_token"])
    sp.add_argument("--positions", default="resid_mid,resid_post")
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--epochs", type=int, default=2)
    sp.add_argument("--max-len", type=int, default=1536)
    sp.add_argument("--pos-ratio", type=float, default=0.5)
    sp.set_defaults(fn=cmd_prober_train)

    sp = sub.add_parser("prober-eval")
    common(sp)
    sp.add_argument("--data", nargs="+", required=True, help="extracted CSV(s)")
    sp.add_argument("--probers", required=True)
    sp.add_argument("--positions", default="resid_post")
    sp.add_argument("--max-len", type=int, default=1536)
    sp.add_argument("--kde-out", default=None, help="npy path for logit dump")
    sp.set_defaults(fn=cmd_prober_eval)

    sp = sub.add_parser("rag-sweep")
    rag_common(sp)
    sp.add_argument("--thresholds", default="-2,-1,0,1,2")
    sp.add_argument("--ablations", default="0")
    sp.set_defaults(fn=cmd_rag_sweep)

    sp = sub.add_parser("analyze")
    sp.add_argument("--runs", default="result/runs.jsonl")
    sp.add_argument("--report", default=None,
                    help="dir for report.md + figures (KDE, layer heatmap)")
    sp.add_argument("--kde-logits", default=None,
                    help="npy logit dump from prober-eval --kde-out")
    sp.add_argument("--site-accuracy", default=None,
                    help="json {position: [per-layer acc]} for the heatmap")
    sp.add_argument("--layers", default="6,8,10,12,14,16")
    sp.set_defaults(fn=cmd_analyze)

    sp = sub.add_parser("parity")
    common(sp)
    sp.add_argument("--workdir", required=True)
    sp.add_argument("--raw-dir", default="raw_data")
    sp.add_argument("--datasets", default="nq,trivia,hotpotqa,2wikimultihopqa,musique")
    sp.add_argument("--steps-limit", type=int, default=500)
    sp.add_argument("--max-new-tokens", type=int, default=150)
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--epochs", type=int, default=2)
    sp.add_argument("--fixture-scale", action="store_true",
                    help="synthetic fixture corpus even with a checkpoint")
    sp.set_defaults(fn=cmd_parity)

    sp = sub.add_parser("param-audit")
    sp.add_argument("--d-model", type=int, default=2048)
    sp.set_defaults(fn=cmd_param_audit)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
