"""Comparison baselines: DRAGIN, FLARE, fix-length / fix-sentence RAG.

Behavioral spec: /root/reference/utils.py:454-924 (BasicGenerator,
AttnWeightRAG = DRAGIN, FixLengthRAG) and prompts.py:172-194 (FLARE).

TPU re-architecture: the reference decodes with HF ``generate`` then
re-forwards the generated tokens for last-layer attention
(utils.py:539-545). Here generation runs through the framework's batched
device decode, and ONE extra jitted forward over the generated ids returns
last-layer attention probs + per-step entropies/logprobs
(``traced_generate``); everything downstream (sentencization, word merging,
hallucination scoring, query reformulation) is host-side text work, as in
the reference.

spaCy parity note: the reference uses en_core_web_sm for sentence splits and
POS-based "real word" filtering (utils.py:458, 691-694). spaCy models need a
download, so a regex sentencizer and a stopword/shape-based content-word
filter stand in when spaCy is unavailable; the spaCy path is used when
importable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probing_rag_tpu.models.decode import StopTables, generate
from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig, forward
from probing_rag_tpu.retrieval.text import ENGLISH_STOPWORDS

# ------------------------------------------------------------ text utils

_SENT_RE = re.compile(r"[^.!?]*[.!?]+(?:\s|$)|[^.!?]+$")


def _spacy_nlp():
    try:  # pragma: no cover - environment-dependent
        import spacy

        return spacy.load("en_core_web_sm")
    except Exception:
        return None


_NLP = None


def sentencize(text: str) -> List[str]:
    global _NLP
    if _NLP is None:
        _NLP = _spacy_nlp() or False
    if _NLP:
        return [s.text.strip() for s in _NLP(text).sents if s.text.strip()]
    return [m.group().strip() for m in _SENT_RE.finditer(text) if m.group().strip()]


# Closed-class words the stopword list misses but spaCy's POS filter drops:
# conjunct/degree/manner adverbs (ADV), a few prepositions/pronouns (ADP/
# PRON). A finite explicit list rather than an "-ly" suffix rule — the
# suffix rule would wrongly drop -ly NOUNs/PROPNs (Italy, family, assembly,
# July, supply), and a dropped content term is unrecoverable for retrieval
# while a kept adverb only adds one low-value query term. Divergence vs a
# UD-convention golden set is PINNED (precision/recall/F1) by
# tests/test_baselines.py::test_content_words_fallback_divergence_pinned.
_FALLBACK_NONCONTENT = frozenset("""
however therefore thus hence moreover furthermore meanwhile instead
otherwise almost always never often sometimes seldom soon already still
yet again twice once perhaps maybe indeed also quite rather somewhat
despite near none well anyway anywhere everywhere somewhere nowhere
together apart aside else ever even away less least enough ago
quickly slowly carefully easily really actually finally usually normally
generally typically especially particularly specifically recently
currently previously originally eventually ultimately approximately
nearly mostly mainly largely highly widely commonly frequently rarely
hardly barely simply merely exactly directly immediately quietly loudly
badly strongly completely entirely totally fully partly partially
significantly slightly extremely incredibly surprisingly interestingly
importantly notably honestly sadly unfortunately fortunately certainly
probably possibly clearly obviously apparently suddenly gradually
rapidly steadily constantly continuously regularly occasionally
officially formally initially subsequently similarly
""".split())


def content_words(text: str) -> set:
    """NOUN/ADJ/VERB/PROPN/NUM filter (utils.py:691-694); heuristic fallback:
    non-stopword alphanumeric words of length > 2 outside the closed-class
    adverb/conjunct list above, and numbers. Measured against the
    UD-convention golden fixture (tests/fixtures/pos_content_golden.json):
    precision 0.99 / recall 0.98 / F1 0.99 on the binary content-word
    decision (the heuristic's residual misses are two-letter verbs like
    "go"/"do" and auxiliary-shaped main verbs like "has")."""
    global _NLP
    if _NLP is None:
        _NLP = _spacy_nlp() or False
    if _NLP:
        return {
            t.text
            for t in _NLP(text)
            if t.pos_ in ("NOUN", "ADJ", "VERB", "PROPN", "NUM")
        }
    words = re.findall(r"\w+", text)
    return {
        w
        for w in words
        if w.isdigit()
        or (
            w.lower() not in ENGLISH_STOPWORDS
            and w.lower() not in _FALLBACK_NONCONTENT
            and len(w) > 2
        )
    }


# ------------------------------------------------------- traced generation


@dataclass
class GenerationTrace:
    text: str  # generated text (no prompt)
    words: List[str]  # merged word-level units
    word_attn: List[float]  # attention received per word (last layer)
    word_entropy: List[float]  # mean next-token entropy per word
    word_logprob: List[float]  # mean chosen-token logprob per word


def _merge_tokens_to_words(token_texts: List[str]) -> List[Tuple[int, int]]:
    """Group consecutive token strings into word ranges: a new word starts on
    a leading space/newline or after one (the reference's space_token logic,
    utils.py:530-536)."""
    ranges: List[Tuple[int, int]] = []
    prev_ends_space = True
    for i, t in enumerate(token_texts):
        starts_new = t.startswith(" ") or t.startswith("\n") or prev_ends_space
        if i == 0 or starts_new:
            ranges.append((i, i))
        else:
            ranges[-1] = (ranges[-1][0], i)
        prev_ends_space = t.endswith(" ") or t.endswith("\n")
    return ranges


def traced_generate(
    lm_params,
    cfg: GemmaConfig,
    tokenizer,
    prompt: str,
    max_new_tokens: int,
    attn_solver: str = "max",
) -> GenerationTrace:
    """Generate greedily, then trace the generated ids with one forward that
    returns last-layer attention + logits (utils.py:517-595 equivalent)."""
    texts, result = generate(
        lm_params, cfg, tokenizer, [prompt],
        max_new_tokens=max_new_tokens, capture=CaptureSpec(),
        stop_tables=StopTables.disabled(tokenizer.vocab_size),
    )
    n = int(result.n_generated[0])
    gen_ids = [int(t) for t in result.tokens[0, :n]]
    if not gen_ids:
        return GenerationTrace("", [], [], [], [])

    # pow2-bucket the trace forward: generation lengths vary per query, and
    # an exact-length [1, n] forward would compile one 2B executable per
    # distinct n. Pad slots are masked invalid (attn_valid), so real tokens
    # never attend to them, and the pad query rows are sliced off — the
    # traced attention/entropy values are exactly the unpadded ones
    # (pinned by test_traced_generate_bucketing_is_exact).
    np2 = 1 << max(len(gen_ids) - 1, 3).bit_length()
    pad = np2 - len(gen_ids)
    ids = jnp.asarray([gen_ids + [0] * pad], jnp.int32)
    valid = jnp.asarray([[True] * len(gen_ids) + [False] * pad])
    logits, _, _, probs = forward_with_attn(lm_params, ids, valid, cfg)
    probs = np.asarray(probs[0, :, : len(gen_ids), : len(gen_ids)], np.float32)
    logits = np.asarray(logits[0, : len(gen_ids)], np.float32)  # [T, V]

    # attention received per token: max over query positions, mean over heads
    if attn_solver == "max":
        received = probs.max(axis=1).mean(axis=0)  # [T]
    else:
        received = probs.sum(axis=1).mean(axis=0)
        received /= np.maximum(len(gen_ids) - np.arange(len(gen_ids)), 1)

    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    p = np.exp(np.asarray(logp))
    entropy = -(p * np.asarray(logp)).sum(-1)  # [T] next-token entropies
    # chosen-token logprob: token t+1's logprob comes from position t
    chosen = np.zeros(len(gen_ids), np.float32)
    for t in range(1, len(gen_ids)):
        chosen[t] = float(logp[t - 1, gen_ids[t]])

    token_texts = [tokenizer.decode([i]) for i in gen_ids]
    ranges = _merge_tokens_to_words(token_texts)
    words, w_at, w_en, w_lp = [], [], [], []
    for lo, hi in ranges:
        words.append("".join(token_texts[lo : hi + 1]).strip())
        w_at.append(float(received[lo : hi + 1].sum()))
        w_en.append(float(entropy[lo : hi + 1].mean()))
        w_lp.append(float(chosen[lo : hi + 1].mean()))
    keep = [i for i, w in enumerate(words) if w]
    return GenerationTrace(
        texts[0][len(prompt):],
        [words[i] for i in keep],
        [w_at[i] for i in keep],
        [w_en[i] for i in keep],
        [w_lp[i] for i in keep],
    )


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward_with_attn(lm_params, ids: jnp.ndarray, valid, cfg: GemmaConfig):
    """Jitted forward that also returns the LAST layer's attention probs
    (the reference reads ``.attentions[-1]``, utils.py:539). ``valid``
    masks right-padding so bucketed trace forwards stay exact."""
    return forward(lm_params, ids, cfg, attn_valid=valid, attn_probs_layer=-1)


# ------------------------------------------------------------- baselines


@dataclass
class BaselineCounter:
    """Retrieval/generation accounting (utils.py:597-619)."""

    retrieve: int = 0
    generate: int = 0
    hallucinated: int = 0
    token: int = 0
    sentence: int = 0


@dataclass
class BaselineConfig:
    generate_max_length: int = 150
    hallucination_threshold: float = 1.2
    query_formulation: str = "real_words"  # DRAGIN default
    retrieve_keep_top_k: int = 25
    check_real_words: bool = True
    flare_threshold: float = 0.4  # low-confidence sentence trigger
    top_k: int = 5
    max_rounds: int = 8  # safety cap on the while loops


class BaselineRAG:
    """Shared plumbing: retriever + docstore + traced generator."""

    def __init__(self, lm_params, cfg, tokenizer, retriever, docstore,
                 bc: Optional[BaselineConfig] = None):
        self.lm_params = lm_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.retriever = retriever
        self.docstore = docstore
        self.bc = bc or BaselineConfig()
        self.counter = BaselineCounter()

    def _retrieve(self, query: str) -> List[str]:
        self.counter.retrieve += 1
        res = self.retriever.search([query], k=self.bc.top_k)
        return self.docstore.texts([int(d) for d in res.doc_indices[0] if d >= 0])

    def _gen(self, prompt: str, trace: bool = False) -> GenerationTrace:
        self.counter.generate += 1
        if trace:
            out = traced_generate(
                self.lm_params, self.cfg, self.tokenizer, prompt,
                self.bc.generate_max_length,
            )
        else:
            texts, _ = generate(
                self.lm_params, self.cfg, self.tokenizer, [prompt],
                max_new_tokens=self.bc.generate_max_length,
                capture=CaptureSpec(),
                stop_tables=StopTables.disabled(self.tokenizer.vocab_size),
            )
            out = GenerationTrace(texts[0][len(prompt):], [], [], [], [])
        self.counter.token += len(self.tokenizer.encode(out.text))
        self.counter.sentence += len(sentencize(out.text))
        return out

    def _context_prompt(self, demo: str, docs: Sequence[str], case: str) -> str:
        """The DRAGIN-family regeneration prompt (utils.py:865-872)."""
        ctx = "".join(f"[{i + 1}] {d}\n" for i, d in enumerate(docs))
        return f"{demo}Context:\n{ctx}Answer in the same format as before.\n{case}"


class DraginRAG(BaselineRAG):
    """DRAGIN (AttnWeightRAG, utils.py:664-879): sentence-level hallucination
    detection via attention x entropy, attention-guided query reformulation,
    retrieve-and-regenerate."""

    def modifier(self, trace: GenerationTrace):
        """Find the first hallucinated sentence (utils.py:668-704).
        Returns (hallucinated, prev_text, curr_words, hit_flags)."""
        sentences = sentencize(trace.text)
        n = len(trace.words)
        # Reference span semantics (utils.py:670-683): scan forward until
        # the joined word window CONTAINS the sentence text; the last
        # sentence takes every remaining word. Word-count walking is NOT
        # equivalent — punctuation-merged words or multi-space sentences
        # leave it permanently skewed, while the substring scan resyncs
        # (an unmatched sentence yields an empty span and is skipped).
        spans = []
        tid = 0
        for sid, sent in enumerate(sentences):
            tl, tr = tid, tid
            if sid == len(sentences) - 1:
                tl, tr = tid, n
            else:
                for i in range(tid + 1, n):
                    if sent in " ".join(trace.words[tl:i]):
                        tr = i
                        break
                tid = tr
            spans.append((tl, tr))
        for (tl, tr), sent in zip(spans, sentences):
            if tr <= tl:
                continue
            attns = np.asarray(trace.word_attn[tl:tr], np.float64)
            total = attns.sum() or 1.0
            attns = attns / total
            weight = np.asarray(trace.word_entropy[tl:tr], np.float64)
            value = attns * weight * (tr - tl)
            hits = (value > self.bc.hallucination_threshold).astype(int)
            if hits.any():
                if self.bc.check_real_words:
                    real = content_words(sent)
                    for i in range(len(hits)):
                        if not any(wd in trace.words[tl + i] for wd in real):
                            hits[i] = 0
                sid = sentences.index(sent)
                prev = "" if sid == 0 else " ".join(sentences[:sid])
                return True, prev, trace.words[tl:tr], hits.tolist()
        return False, trace.text, None, None

    def keep_real_words(self, prev_text: str, curr_words: List[str], hits: List[int]) -> str:
        """Attention-weighted content-word query (utils.py:706-784): score
        each prior word by the attention the hallucinated words pay to it,
        keep the top-k content words in document order."""
        all_text = prev_text + " " + " ".join(curr_words)
        ids = self.tokenizer.encode(all_text)
        if not ids:
            return prev_text
        # pow2-bucket like traced_generate: one compiled executable per
        # bucket instead of per text length; pad slots masked invalid
        np2 = 1 << max(len(ids) - 1, 3).bit_length()
        padded = ids + [0] * (np2 - len(ids))
        valid = jnp.asarray([[True] * len(ids) + [False] * (np2 - len(ids))])
        _, _, _, probs = forward_with_attn(
            self.lm_params, jnp.asarray([padded], jnp.int32), valid, self.cfg
        )
        probs = np.asarray(
            probs[0, :, : len(ids), : len(ids)]
        ).mean(axis=0)  # [T, T] mean over heads
        token_texts = [self.tokenizer.decode([i]) for i in ids]
        ranges = _merge_tokens_to_words(token_texts)
        words = ["".join(token_texts[lo:hi + 1]).strip() for lo, hi in ranges]
        curr_st = len(words) - len(curr_words)

        # attention received by each word FROM the hallucinated words
        scores = np.zeros(len(words))
        hit_cnt = 0
        for i, h in enumerate(hits):
            if not h or curr_st + i >= len(ranges):
                continue
            lo, hi = ranges[curr_st + i]
            row = probs[lo:hi + 1, :].mean(axis=0)  # [T]
            scores += np.asarray([row[l:h2 + 1].sum() for l, h2 in ranges])
            hit_cnt += 1
        if hit_cnt:
            scores /= hit_cnt

        real = content_words(all_text)
        pairs = [
            (scores[i], words[i], i)
            for i in range(len(words))
            if words[i]
            and not (i >= curr_st and curr_st >= 0 and i - curr_st < len(hits) and hits[i - curr_st])
            and any(wd in words[i] for wd in real)
        ]
        pairs.sort(key=lambda x: x[0], reverse=True)
        pairs = sorted(pairs[: self.bc.retrieve_keep_top_k], key=lambda x: x[2])
        return " ".join(p[1] for p in pairs)

    def inference(self, question: str, demo: str, case: str) -> str:
        text = ""
        for _ in range(self.bc.max_rounds):
            old_len = len(text)
            prompt = demo + " ".join(s for s in (case, text) if s)
            trace = self._gen(prompt, trace=True)
            hallucinated, ptext, curr_words, hits = self.modifier(trace)
            if not hallucinated:
                text = (text.strip() + " " + trace.text.strip()).strip()
            else:
                self.counter.hallucinated += 1
                forward_all = " ".join(s for s in (question, text, ptext) if s)
                if self.bc.query_formulation == "real_words":
                    query = self.keep_real_words(
                        question + " " + text + " " + ptext, curr_words, hits
                    )
                elif self.bc.query_formulation == "current":
                    query = " ".join(curr_words)
                elif self.bc.query_formulation == "forward_all":
                    query = forward_all
                else:
                    query = forward_all
                docs = self._retrieve(query)
                case_text = " ".join(s for s in (case, text, ptext.strip()) if s)
                regen = self._gen(self._context_prompt(demo, docs, case_text))
                sents = sentencize(regen.text)
                first = sents[0] if sents else ""
                text = " ".join(s for s in (text.strip(), ptext.strip(), first) if s)
            n_tok = len(self.tokenizer.encode(text))
            if (
                n_tok > self.bc.generate_max_length
                or len(text) <= old_len
                or "the answer is" in text
            ):
                break
        return text


class FixLengthRAG(BaselineRAG):
    """fix-length-retrieval / fix-sentence (utils.py:881-923): retrieve every
    generation chunk (full chunk vs first sentence)."""

    def __init__(self, *args, method: str = "fix-length-retrieval", **kw):
        super().__init__(*args, **kw)
        self.method = method

    def inference(self, question: str, demo: str, case: str) -> str:
        text = ""
        query = question
        for _ in range(self.bc.max_rounds):
            old_len = len(text)
            docs = self._retrieve(query)
            prompt = self._context_prompt(demo, docs, case + " " + text)
            out = self._gen(prompt)
            new_text = out.text.strip()
            if self.method == "fix-length-retrieval":
                text = (text.strip() + " " + new_text).strip()
                query = new_text
            else:  # fix-sentence
                sents = sentencize(new_text)
                if not sents:
                    break
                text = (text.strip() + " " + sents[0]).strip()
                query = sents[0]
            n_tok = len(self.tokenizer.encode(text))
            if (
                n_tok > self.bc.generate_max_length
                or len(text) <= old_len
                or "the answer is" in text
            ):
                break
        return text


class FlareRAG(BaselineRAG):
    """FLARE: regenerate low-confidence sentences with retrieved passages
    (prompts.py:172-194; confidence stop in utils.py:97-120)."""

    def inference(self, question: str, demo: str, case: str) -> str:
        from probing_rag_tpu.data.prompts import (
            flare_for_new_sent_prompt,
            flare_query_reformulation_prompt,
            format_evidences,
        )

        text = ""
        for _ in range(self.bc.max_rounds):
            old_len = len(text)
            prompt = demo + " ".join(s for s in (case, text) if s)
            trace = self._gen(prompt, trace=True)
            sents = sentencize(trace.text)
            if not sents:
                break
            # confidence of the first sentence = min word prob
            first = sents[0]
            n_words = len(first.split())
            word_probs = np.exp(np.asarray(trace.word_logprob[:n_words] or [0.0]))
            if word_probs.size and word_probs.min() < self.bc.flare_threshold:
                # mask low-confidence words, reformulate, retrieve, regenerate
                masked = " ".join(
                    "____" if i < len(word_probs) and word_probs[i] < self.bc.flare_threshold
                    else w
                    for i, w in enumerate(first.split())
                )
                query_prompt = flare_query_reformulation_prompt(question, masked)
                q_out = self._gen(query_prompt)
                query = sentencize(q_out.text)[0] if sentencize(q_out.text) else masked
                docs = self._retrieve(query)
                regen = self._gen(
                    flare_for_new_sent_prompt(first, format_evidences(docs))
                )
                regen_sents = sentencize(regen.text)
                first = regen_sents[0] if regen_sents else first
            text = (text.strip() + " " + first).strip()
            n_tok = len(self.tokenizer.encode(text))
            if (
                n_tok > self.bc.generate_max_length
                or len(text) <= old_len
                or "the answer is" in text
            ):
                break
        return text


class LLMClassifierGate:
    """LLM-as-retrieval-classifier baseline: few-shot prompt the LM itself to
    say whether it can answer without retrieval (prompts.py:196-212;
    'LLM-based' row of the poster's retrieval-call table)."""

    def __init__(self, lm_params, cfg, tokenizer, max_new_tokens: int = 4):
        self.lm_params = lm_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens

    def needs_retrieval(self, questions: Sequence[str]) -> List[bool]:
        from probing_rag_tpu.data.prompts import llm_based_clf_prompt

        prompts_ = [llm_based_clf_prompt(q) for q in questions]
        texts, _ = generate(
            self.lm_params, self.cfg, self.tokenizer, prompts_,
            max_new_tokens=self.max_new_tokens, capture=CaptureSpec(),
            stop_tables=StopTables.disabled(self.tokenizer.vocab_size),
        )
        out = []
        for p, t in zip(prompts_, texts):
            gen = t[len(p):]
            # "1" == can answer -> no retrieval; anything else retrieves
            out.append("1" not in gen.split("\n")[0])
        return out
