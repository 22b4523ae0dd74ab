"""Integration: generate -> probe -> retrieve loop on a fixture corpus with a
deterministic tiny LM (SURVEY.md §4 'integration')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.data.corpus import DocStore
from probing_rag_tpu.models.gemma import GemmaConfig, init_params
from probing_rag_tpu.models.tokenizer import ByteTokenizer
from probing_rag_tpu.pipeline.rag import AdaptiveRAGPipeline, RAGConfig
from probing_rag_tpu.prober.train import ProberTrainConfig, init_prober_stack
from probing_rag_tpu.retrieval.bm25 import BM25Engine
from probing_rag_tpu.retrieval.bm25_index import BM25Config, BM25Index

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)

CORPUS = [
    "paris is the capital of france",
    "berlin is the capital of germany",
    "the mitochondria is the powerhouse of the cell",
    "george washington was the first president",
]


@pytest.fixture(scope="module")
def setup():
    lm = init_params(CFG, jax.random.PRNGKey(0))
    tok = ByteTokenizer(CFG.vocab_size)
    index = BM25Index.build(CORPUS, BM25Config(stem=False, remove_stopwords=False))
    engine = BM25Engine(index)
    store = DocStore.from_texts(CORPUS)
    tc = ProberTrainConfig(layers=CFG.probe_layers, positions=("resid_post",))
    probers = init_prober_stack(tc, CFG.d_model, jax.random.PRNGKey(7))
    return lm, tok, engine, store, probers


def _pipeline(setup, **kw):
    lm, tok, engine, store, probers = setup
    rag = RAGConfig(batch_size=2, max_new_tokens=6, **kw)
    return AdaptiveRAGPipeline(lm, CFG, tok, engine, store, probers, rag)


@pytest.mark.slow
def test_none_method(setup):
    pipe = _pipeline(setup, retr_method="none")
    res = pipe.run(["who is the president?", "what is the capital of france?"])
    assert len(res.pred_list) == 2
    assert res.retr_count_list == [0, 0]
    for q, p in zip(["who is the president?", "what is the capital of france?"], res.pred_list):
        assert q in p  # prediction text includes the prompt (reference shape)


@pytest.mark.slow
def test_simple_method(setup):
    pipe = _pipeline(setup, retr_method="simple")
    res = pipe.run(["capital of france"])
    assert res.retr_count_list == [1]
    assert "passage 1:" in res.pred_list[0]


@pytest.mark.slow
def test_probing_method_forced_stop(setup):
    # threshold -> -inf forces the gate to stop immediately: no retrieval
    pipe = _pipeline(setup, retr_method="probing", threshold=-1e6)
    res = pipe.run(["capital of france", "first president"])
    assert res.retr_count_list == [0, 0]
    assert all(s is not None for s in res.gate_scores)


@pytest.mark.slow
def test_probing_method_kv_int8(setup):
    """RAGConfig(kv_int8=True) threads the int8 KV cache through the
    pipeline's generate calls; the loop semantics must be unchanged."""
    pipe = _pipeline(setup, retr_method="probing", threshold=-1e6,
                     kv_int8=True)
    res = pipe.run(["capital of france"])
    assert res.retr_count_list == [0]
    assert "capital of france" in res.pred_list[0]


@pytest.mark.slow
def test_probing_method_kv_int4(setup):
    """RAGConfig(kv_int4=True) threads the int4 KV cache (sub-channel group
    scales) through the pipeline's generate calls; loop semantics must be
    unchanged."""
    pipe = _pipeline(setup, retr_method="probing", threshold=-1e6,
                     kv_int4=True)
    res = pipe.run(["capital of france"])
    assert res.retr_count_list == [0]
    assert "capital of france" in res.pred_list[0]


@pytest.mark.slow
def test_probing_method_speculative_is_greedy_exact(setup):
    """RAGConfig(spec_k=...) threads the prompt-lookup speculative decoder
    through every pipeline generate call; by the speculative exactness
    contract the full adaptive loop — predictions, retrieval counts AND
    gate scores (pooled captures feed the gate) — must equal the
    sequential-greedy run bit for bit."""
    questions = ["capital of france", "first president", "powerhouse"]
    ref = _pipeline(setup, retr_method="probing", threshold=0.0).run(questions)
    for k in (2, 4):
        got = _pipeline(setup, retr_method="probing", threshold=0.0,
                        spec_k=k).run(questions)
        assert got.pred_list == ref.pred_list
        assert got.retr_count_list == ref.retr_count_list
        for gs, rs in zip(got.gate_scores, ref.gate_scores):
            np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_probing_method_split_prefill_is_exact(setup):
    """RAGConfig(split_prefill=True) serves every generate call as two
    programs (prefill jit -> donated-cache decode jit, the 7B batch-64 OOM
    fix); same graphs, so the full adaptive loop must match the fused run
    bit for bit."""
    questions = ["capital of france", "first president", "powerhouse"]
    ref = _pipeline(setup, retr_method="probing", threshold=0.0).run(questions)
    got = _pipeline(setup, retr_method="probing", threshold=0.0,
                    split_prefill=True).run(questions)
    assert got.pred_list == ref.pred_list
    assert got.retr_count_list == ref.retr_count_list
    for gs, rs in zip(got.gate_scores, ref.gate_scores):
        np.testing.assert_array_equal(gs, rs)


@pytest.mark.slow
def test_probing_method_forced_retrieve(setup):
    # threshold -> +inf forces retrieval every round: hard cap applies
    pipe = _pipeline(setup, retr_method="probing", threshold=1e6)
    res = pipe.run(["capital of france"])
    # retr_count caps at 3 with a forced 4th round (exp_rag.py:462-465)
    assert res.retr_count_list == [3]
    assert "passage 1:" in res.pred_list[0]


@pytest.mark.slow
def test_probing_batch_sizes_dont_change_results(setup):
    lm, tok, engine, store, probers = setup
    questions = ["capital of france", "first president", "powerhouse"]
    res1 = AdaptiveRAGPipeline(
        lm, CFG, tok, engine, store, probers,
        RAGConfig(batch_size=1, max_new_tokens=6, threshold=0.0),
    ).run(questions)
    res3 = AdaptiveRAGPipeline(
        lm, CFG, tok, engine, store, probers,
        RAGConfig(batch_size=4, max_new_tokens=6, threshold=0.0),
    ).run(questions)
    assert res1.pred_list == res3.pred_list
    assert res1.retr_count_list == res3.retr_count_list


@pytest.mark.slow
def test_run_resumable_skips_completed_chunks(setup, tmp_path):
    pipe = _pipeline(setup, retr_method="none")
    qs = [f"question {i}?" for i in range(5)]
    manifest = tmp_path / "manifest.jsonl"
    r1 = pipe.run_resumable(qs, manifest, chunk_size=2)
    n_records = len(manifest.read_text().splitlines())
    assert n_records == 5
    # truncate to simulate preemption mid-run
    lines = manifest.read_text().splitlines()
    manifest.write_text("\n".join(lines[:2]) + "\n")
    r2 = pipe.run_resumable(qs, manifest, chunk_size=2)
    assert r2.pred_list == r1.pred_list
    assert r2.retr_count_list == r1.retr_count_list
    # full rerun adds no duplicate records beyond the recomputed chunks
    r3 = pipe.run_resumable(qs, manifest, chunk_size=2)
    assert r3.pred_list == r1.pred_list


@pytest.mark.slow
def test_pipeline_with_dense_retriever(setup):
    """The dense engine drops into the same pipeline slot as BM25
    (exp_rag.py's --is_sparse toggle)."""
    import numpy as np

    from probing_rag_tpu.retrieval.dense import DenseEngine, DenseIndex

    lm, tok, _, store, probers = setup
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(len(CORPUS), 16)).astype(np.float32)

    def encode(texts):
        # deterministic fake encoder: hash text into the embedding space
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            out[i, hash(t) % 16] = 1.0
        return out

    engine = DenseEngine(DenseIndex(emb, metric="l2"), encode, store_dtype=jnp.float32)
    pipe = AdaptiveRAGPipeline(
        lm, CFG, tok, engine, store, probers,
        RAGConfig(retr_method="simple", batch_size=2, max_new_tokens=6),
    )
    res = pipe.run(["what is the capital?"])
    assert res.retr_count_list == [1]
    assert "passage 1:" in res.pred_list[0]


@pytest.mark.slow
def test_pipeline_with_ivf_retriever(setup):
    """The IVF engine satisfies the same retriever contract (search(texts,
    k) -> .doc_indices) as BM25/flat dense — probed search composes with
    the adaptive loop."""
    import numpy as np

    from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, IVFEngine

    lm, tok, _, store, probers = setup
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(len(CORPUS), 16)).astype(np.float32)

    def encode(texts):
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            out[i, hash(t) % 16] = 1.0
        return out

    ix = IVFDenseIndex.build(emb, nlist=2, block=8, metric="l2", seed=0)
    engine = IVFEngine(ix, nprobe=2, encode_fn=encode, store_dtype=jnp.float32)
    pipe = AdaptiveRAGPipeline(
        lm, CFG, tok, engine, store, probers,
        RAGConfig(retr_method="simple", batch_size=2, max_new_tokens=6),
    )
    res = pipe.run(["what is the capital?"])
    assert res.retr_count_list == [1]
    assert "passage 1:" in res.pred_list[0]


@pytest.mark.slow
def test_run_resumable_persists_gate_scores(setup, tmp_path):
    """A resumed probing eval must reproduce the gate diagnostics the
    analysis suite consumes (VERDICT r1: run_resumable dropped them)."""
    pipe = _pipeline(setup, retr_method="probing", threshold=-1e6)
    qs = ["capital of france", "first president", "powerhouse"]
    manifest = tmp_path / "m.jsonl"
    r1 = pipe.run_resumable(qs, manifest, chunk_size=2)
    assert all(s is not None for s in r1.gate_scores)
    # resume from the manifest alone: scores come back from disk
    r2 = pipe.run_resumable(qs, manifest, chunk_size=2)
    for a, b in zip(r1.gate_scores, r2.gate_scores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
