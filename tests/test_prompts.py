"""Prompt render parity: byte-exact against the reference templates when the
reference checkout is present (it is read-only and imported only as a test
oracle, like the CPU BM25 oracle in SURVEY.md §4)."""

import importlib.util
import os

import pytest

from probing_rag_tpu.data import prompts

REF_PROMPTS = "/root/reference/prompts.py"


def _load_reference_prompts():
    spec = importlib.util.spec_from_file_location("ref_prompts", REF_PROMPTS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_PROMPTS), reason="reference checkout not available"
)


@needs_ref
@pytest.mark.parametrize(
    "ours,theirs,args",
    [
        (prompts.cot_prompt, "cot_prompt", ("What is the capital of Freedonia?",)),
        (prompts.retr_qa_cot2, "retr_qa_cot2", ("Who?", "passage 1: text a\npassage 2: text b")),
        (prompts.retr_qa_cot, "retr_qa_cot", ("Who?", "passage 1: text a\npassage 2: text b")),
        (prompts.inst_prompt, "inst_prompt", ("Who?",)),
        (prompts.icl_prompt, "icl_prompt", ("Who?",)),
        (prompts.retr_qa, "retr_qa", ("Who?", "passage 1: text")),
        (prompts.dummy_prompt, "dummy_prompt", ("Who?",)),
        (
            prompts.flare_query_reformulation_prompt,
            "flare_query_reformulation_prompt",
            ("query", "masked ____ text"),
        ),
        (
            prompts.flare_for_new_sent_prompt,
            "flare_for_new_sent_prompt",
            ("a low conf sentence", "passage 1: x"),
        ),
        (prompts.llm_based_clf_prompt, "llm_based_clf_prompt", ("Can you answer?",)),
    ],
)
def test_render_parity(ours, theirs, args):
    ref = _load_reference_prompts()
    assert ours(*args) == getattr(ref, theirs)(*args)


def test_cot_prompt_structure():
    # The answer extractor and the decode paragraph-stop rely on exactly 4
    # exemplar paragraphs before the live question (SURVEY.md §7 parity traps).
    p = prompts.cot_prompt("live question?")
    paragraphs = p.split("\n\n")
    assert len(paragraphs) == 5
    assert paragraphs[4].startswith("Question: live question?\nRationale:")


def test_format_evidences():
    out = prompts.format_evidences(["alpha", "beta"])
    assert out == "passage 1: alpha\npassage 2: beta"


def test_format_evidences_sanitizes_paragraph_breaks():
    """A passage containing "\n\n" must not add a paragraph to the prompt:
    the reference's stop heuristic re-splits the full decoded text on
    "\n\n" and would halt after the FIRST generated token on such a
    passage (exp_rag.py:190-193) — a degenerate empty answer. We collapse
    runs of newlines inside evidence text instead (deliberate divergence,
    documented at data/prompts.py::format_evidences)."""
    dirty = "first para.\n\nsecond para.\n\n\nthird."
    out = prompts.format_evidences([dirty, "clean"])
    assert "\n\n" not in out
    assert out == (
        "passage 1: first para.\nsecond para.\nthird.\npassage 2: clean"
    )
    # the rendered retrieval prompt keeps exactly 5 paragraphs (the stop
    # contract the decode loop relies on)
    p = prompts.retr_qa_cot2("why?", prompts.format_evidences([dirty]))
    assert len(p.split("\n\n")) == 5


def test_retr_qa_cot_matches_committed_fixture():
    """Offline byte-parity pin for the full 5-passage-demo prompt
    (reference prompts.py:117-167), via the committed render fixture."""
    import pathlib

    fixture = pathlib.Path(__file__).parent / "fixtures" / "retr_qa_cot.txt"
    assert prompts.retr_qa_cot("{Q}", "{D}") == fixture.read_text()
