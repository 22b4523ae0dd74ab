"""The paper's core mechanism end-to-end: probers trained on labeled
generations steer the retrieval gate — 'answerable' queries score higher
than 'unanswerable' ones on fresh inputs (SURVEY.md §4 'integration').

The tiny random LM can't answer anything, so answerability is synthesized:
the label correlates with a lexical marker in the question, which the probers
learn to read out of the residual stream (generated-token activations are
question-conditioned through attention). Prompts are short so train-time
teacher-forced capture and decode-time capture see the same position range —
the same consistency the reference gets by padding to the full prompt length
(train.py:86 vs exp_rag.py hooks).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.data.corpus import DocStore
from probing_rag_tpu.models.decode import StopTables, generate
from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig, init_params
from probing_rag_tpu.models.tokenizer import ByteTokenizer
from probing_rag_tpu.prober.gate import gate_decision
from probing_rag_tpu.prober.train import ProberExample, ProberTrainConfig, train_probers

CFG = dataclasses.replace(GemmaConfig.tiny(), compute_dtype=jnp.float32)


def _prompt(q: str) -> str:
    return f"Q: {q}\nA:"


@pytest.mark.slow
def test_trained_gate_separates_learned_classes():
    lm = init_params(CFG, jax.random.PRNGKey(0))
    tok = ByteTokenizer(CFG.vocab_size)
    capture = CaptureSpec.for_probing(CFG)
    stop = StopTables.disabled(tok.vocab_size)

    rng = np.random.default_rng(0)
    markers = ["EASYFACT" if i % 2 == 0 else "HARDFACT" for i in range(32)]
    questions = [f"what is {m} number {rng.integers(100)}?" for m in markers]
    prompts_ = [_prompt(q) for q in questions]
    texts, _ = generate(
        lm, CFG, tok, prompts_, max_new_tokens=8, capture=CaptureSpec(),
        stop_tables=stop,
    )
    examples = [
        ProberExample(p, t[len(p):] or "x", int(m == "EASYFACT"))
        for p, t, m in zip(prompts_, texts, markers)
    ]

    tc = ProberTrainConfig(
        layers=CFG.probe_layers, positions=("resid_post",), epochs=6,
        batch_size=8, max_len=96, lr=3e-3,
    )
    probers, _ = train_probers(lm, CFG, tok, examples, (), tc)

    # fresh queries (unseen numbers) through the REAL decode+capture path;
    # the gate's class-1 ('answered correctly') mass must be higher for the
    # learned-answerable class
    def gate_scores(queries):
        _, result = generate(
            lm, CFG, tok, [_prompt(q) for q in queries],
            max_new_tokens=8, capture=capture, stop_tables=stop,
        )
        _, scores = gate_decision(probers, jnp.asarray(result.pooled_captures))
        return np.asarray(scores)

    s_easy = gate_scores([f"what is EASYFACT number {900 + i}?" for i in range(8)])
    s_hard = gate_scores([f"what is HARDFACT number {900 + i}?" for i in range(8)])
    margin_easy = (s_easy[:, 1] - s_easy[:, 0]).mean()
    margin_hard = (s_hard[:, 1] - s_hard[:, 0]).mean()
    assert margin_easy > margin_hard, (
        f"trained gate did not separate the classes: easy margin "
        f"{margin_easy:.4f} <= hard margin {margin_hard:.4f}"
    )
