"""The one-command parity drill must run the reference's full five-step
workflow (index build -> dataset make -> prober train -> probing eval ->
analyze report) end-to-end on the CPU fixture path — so that with a real
checkpoint dir the same command reproduces the BASELINE.md tables
(reference workflow README.md:35-66)."""

import json
from pathlib import Path

import pytest


@pytest.mark.slow
def test_rag_run_quantize_int4_smoke(tmp_path):
    """`rag-run --quantize int4` must work on the smoke path: the CLI
    quantizes the (tiny random) LM with a group size clamped to d_model and
    the whole retrieve->generate loop runs on grouped-int4 weights."""
    import json

    from probing_rag_tpu.cli.main import main

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(
        f"doc {i} about topic{i % 5} with words words words" for i in range(24)
    ))
    qa = tmp_path / "qa.json"
    qa.write_text(json.dumps(
        [{"question": "what about topic1?", "answers": ["doc"]}]
    ))
    main(["index-build", "--dataset", "nq", "--fixture", str(corpus),
          "--out", str(tmp_path / "index")])
    main(["rag-run", "--dataset", "nq", "--split", "dev",
          "--fixture-qa", str(qa), "--retr-method", "simple",
          "--index", str(tmp_path / "index"), "--quantize", "int4",
          "--steps-limit", "1", "--max-new-tokens", "4",
          "--batch-size", "1", "--results-dir", str(tmp_path / "result")])
    runs = (tmp_path / "result" / "runs.jsonl").read_text().splitlines()
    rec = json.loads(runs[-1])
    assert rec["config"]["quantize"] == "int4"


@pytest.mark.slow
def test_parity_drill_smoke(tmp_path):
    from probing_rag_tpu.cli.main import main

    work = tmp_path / "parity"
    main([
        "parity",
        "--workdir", str(work),
        "--datasets", "nq,trivia",
        "--steps-limit", "4",
        "--max-new-tokens", "8",
        "--batch-size", "2",
        "--epochs", "1",
    ])
    # every stage left its artifact
    assert (work / "index_nq" / "bm25" / "manifest.json").exists()
    assert (work / "index_trivia" / "docstore.json").exists()
    assert (work / "rows_simple.csv").exists()
    assert (work / "rows_none.csv").exists()
    assert (work / "probers" / "probers").exists() or any(
        (work / "probers").glob("probers*")
    )
    runs = (work / "result" / "runs.jsonl").read_text().splitlines()
    recs = [json.loads(l) for l in runs if l.strip()]
    assert {r["dataset"] for r in recs} == {"nq", "trivia"}
    assert all(r["retr_method"] == "probing" for r in recs)
    assert (work / "report" / "report.md").exists()
