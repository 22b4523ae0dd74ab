"""The one-command parity drill must run the reference's full five-step
workflow (index build -> dataset make -> prober train -> probing eval ->
analyze report) end-to-end on the CPU fixture path — so that with a real
checkpoint dir the same command reproduces the BASELINE.md tables
(reference workflow README.md:35-66)."""

import json
from pathlib import Path

import pytest


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
