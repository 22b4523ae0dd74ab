"""Corpus readers, QA loaders, docstore, result persistence, config presets."""

import bz2
import json

import numpy as np

from probing_rag_tpu.config import RunConfig, preset
from probing_rag_tpu.data.corpus import (
    DocStore,
    hash_object,
    make_2wikimultihopqa_documents,
    make_dpr_documents,
    make_hotpotqa_documents,
    make_iirc_documents,
    make_musique_documents,
    make_wiki_documents,
)
from probing_rag_tpu.data.qa import (
    QAExample,
    dataset_path,
    load_qa_dataset,
    preprocess_multihop_answers,
)
from probing_rag_tpu.eval.results import RunRecord, result_filename, save_run


def test_hash_object_deterministic():
    assert hash_object("abc") == hash_object("abc")
    assert hash_object("abc") != hash_object("abd")
    assert hash_object(("t", "x")) != hash_object(("t", "y"))


def test_docstore_roundtrip(tmp_path):
    store = DocStore.from_texts(["alpha", "beta"], ["a", "b"])
    store.save(tmp_path / "ds.json")
    loaded = DocStore.load(tmp_path / "ds.json")
    assert loaded.texts([1, 0]) == ["beta", "alpha"]
    assert loaded.doc_ids() == ["a", "b"]


def test_hotpotqa_reader(tmp_path):
    shard_dir = tmp_path / "hotpotqa" / "enwiki-20171001-pages-meta-current-withlinks-abstracts" / "AA"
    shard_dir.mkdir(parents=True)
    rows = [
        {"id": "1", "text": ["Sentence one. ", "Sentence two."]},
        {"id": "2", "text": ["Duplicate."]},
        {"id": "3", "text": ["Duplicate."]},  # dedup
    ]
    with bz2.open(shard_dir / "wiki_00.bz2", "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    texts, ids = make_hotpotqa_documents(tmp_path / "hotpotqa")
    assert texts == ["Sentence one. Sentence two.", "Duplicate."]
    assert len(ids) == 2


def test_iirc_reader(tmp_path):
    d = tmp_path / "iirc"
    d.mkdir()
    (d / "context_articles.json").write_text(
        json.dumps({"Title": "<p>Hello <b>world</b></p>", "Empty": "<br/>"})
    )
    texts, _ = make_iirc_documents(d)
    assert texts == ["Hello world"]


def test_2wiki_reader(tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    (d / "train.json").write_text(
        json.dumps([{"context": [["T", ["s1", "s2"]], ["U", ["s3"]]]}])
    )
    texts, _ = make_2wikimultihopqa_documents(d)
    assert texts == ["s1 s2", "s3"]


def test_musique_reader(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    row = {"paragraphs": [{"title": "t", "paragraph_text": "para text"}]}
    (d / "musique_full_v1.0_train.jsonl").write_text(json.dumps(row) + "\n")
    texts, _ = make_musique_documents(d)
    assert texts == ["para text"]


def test_wiki_reader(tmp_path):
    d = tmp_path / "wiki"
    d.mkdir()
    (d / "psgs_w100.tsv").write_text('id\ttext\ttitle\n1\t"passage one"\tT1\n2\tpassage two\tT2\n')
    texts, ids = make_wiki_documents(d)
    assert texts == ["passage one", "passage two"]
    assert ids == ["1", "2"]


def test_dpr_reader(tmp_path):
    d = tmp_path / "nq"
    d.mkdir()
    row = {
        "positive_ctxs": [{"text": "pos"}],
        "negative_ctxs": [{"text": "neg"}],
        "hard_negative_ctxs": [{"text": "hneg"}, {"text": "pos"}],  # dup
    }
    (d / "biencoder-nq-train.json").write_text(json.dumps([row]))
    texts, _ = make_dpr_documents(d, "nq")
    assert sorted(texts) == ["hneg", "neg", "pos"]


def test_qa_dataset_paths():
    from pathlib import Path

    assert dataset_path(Path("r"), "hotpotqa", "dev").name == "hotpot_dev_distractor_v1.json"
    assert dataset_path(Path("r"), "nq", "train").name == "biencoder-nq-train.json"
    assert dataset_path(Path("r"), "musique", "dev").suffix == ".jsonl"


def test_qa_loader_iirc(tmp_path):
    d = tmp_path / "iirc"
    d.mkdir()
    data = [
        {
            "questions": [
                {"qid": "q1", "question": "Q1?", "answer": {"type": "none"}},
                {"qid": "q2", "question": "Q2?", "answer": {"type": "value", "answer_value": "42"}},
                {
                    "qid": "q3",
                    "question": "Q3?",
                    "answer": {"type": "span", "answer_spans": [{"text": " x "}]},
                },
            ]
        }
    ]
    (d / "dev.json").write_text(json.dumps(data))
    examples = load_qa_dataset(tmp_path, "iirc", "dev")
    assert [e.qid for e in examples] == ["q2", "q3"]
    assert examples[0].answers == ["42"]
    assert examples[1].answers == ["x"]


def test_multihop_answer_cleanup():
    exs = [QAExample("q", ["['a' 'b c']"])]
    out = preprocess_multihop_answers(exs, "hotpotqa")
    assert out[0].answers == ["a", "b c"]
    # untouched for non-multihop
    assert preprocess_multihop_answers(exs, "nq")[0].answers == ["['a' 'b c']"]


def test_result_filename_and_save(tmp_path):
    fname = result_filename(0, "tpu", "sparse", "nq", 0.0, "probing", "cot", "dev", 500)
    assert fname == "0_tpu_sparse_nq_0.0_probing_cot_dev_500.csv"
    rec = RunRecord(
        retr_method="probing",
        dataset_name="nq",
        elapsed_s=1.5,
        acc=[1, 0],
        metric_out={"em": 0.5, "f1": 0.6},
        retr_count_list=[0, 2],
    )
    path = save_run(rec, tmp_path, fname)
    content = path.read_text()
    assert "clf_pred" in content and "[0, 2]" in content
    runs = (tmp_path / "runs.jsonl").read_text().splitlines()
    assert json.loads(runs[0])["em"] == 0.5


def test_result_record_multihop_uses_title_metrics():
    rec = RunRecord(
        retr_method="simple", dataset_name="hotpotqa", elapsed_s=1.0, acc=[1],
        metric_out={"title_em": 0.7, "title_f1": 0.8, "em": 0.1, "f1": 0.1},
    )
    assert rec.em_f1() == (0.7, 0.8)


def test_config_presets():
    cfg = preset("rag-sparse-cot")
    assert isinstance(cfg, RunConfig)
    assert cfg.eval.steps_limit == 500
    assert preset("dataset-simple").rag.retr_method == "simple"
    assert preset("rag-dense-cot").retrieval.kind == "dense"
    import pytest

    with pytest.raises(KeyError):
        preset("nope")
