"""The adaptive probe -> retrieve -> regenerate loop.

Behavioral spec: exp_rag.py:394-531 (probing / none / simple branches).
Control flow parity:

- round 0: CoT generation with no retrieval; the prober gate decides whether
  any retrieval happens (exp_rag.py:401-414).
- retrieval rounds: the search query is the original question on round 0 and
  the *full previous generation text* afterwards (exp_rag.py:425-428); top-5
  passages are formatted as the ``passage i:`` block into ``retr_qa_cot2``;
  the model regenerates; the gate re-decides. ``retr_count`` increments at
  most to 3 and a 4th retrieval round runs before the hard break
  (exp_rag.py:462-465).
- the recorded prediction is the initial generation when the gate never fired
  and the *last* regeneration otherwise (exp_rag.py:430-466).

TPU-native re-architecture: the reference processes one query at a time with
per-token host hops; here queries run in fixed-size device batches — decode,
capture pooling and the gate are jitted (models/decode.py, prober/gate.py),
and only the shrinking active set crosses rounds. Batches are padded to the
configured batch size so every round reuses the same compiled executable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from probing_rag_tpu.data import prompts
from probing_rag_tpu.models.decode import StopTables, generate
from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig
from probing_rag_tpu.prober.gate import gate_decision
from probing_rag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass(frozen=True)
class RAGConfig:
    retr_method: str = "probing"  # probing | none | simple
    threshold: float = 0.0
    ablation: int = 0
    top_k: int = 5
    max_new_tokens: int = 150  # CoT setting, exp_rag.py:234
    max_extra_rounds: int = 3  # retr_count cap (exp_rag.py:462-465): 4 rounds total
    batch_size: int = 8
    position: str = "resid_post"
    kv_int8: bool = False  # quantize the KV cache (serve with
    # quantize_lm_params for the full int8 configuration)
    kv_int4: bool = False  # int4 KV cache (sub-channel group scales):
    # quarters cache HBM; the batch-64 7B single-chip enabler
    # Speculative decode (greedy-exact, models/speculative.py): verify
    # spec_k prompt-lookup drafts per forward. RAG generations quote
    # retrieved passages, which is exactly when the prompt-lookup drafter's
    # acceptance is high; committed output equals greedy decode token for
    # token, so quality parity is unconditional. 0 = off.
    spec_k: int = 0
    spec_drafter: str = "prompt"
    # Two-program serving (prefill jit -> donated-cache decode jit,
    # models/decode.py::decode_greedy_split): identical results, lower peak
    # HBM — required for 7B at batch 64 where the fused program OOMs on
    # XLA compressed-remat copies of the KV cache. Ignored when spec_k is
    # set (the speculative decoder has its own program structure).
    split_prefill: bool = False


@dataclass
class RAGResult:
    pred_list: List[str]
    retr_count_list: List[int]
    gate_scores: List[Optional[np.ndarray]] = field(default_factory=list)


class AdaptiveRAGPipeline:
    def __init__(
        self,
        lm_params,
        cfg: GemmaConfig,
        tokenizer,
        retriever,  # .search(queries, k) -> result with .doc_indices
        docstore,  # .texts(indices) -> List[str]
        prober_stack=None,  # stacked prober params (probing method)
        rag: RAGConfig = RAGConfig(),
    ):
        self.lm_params = lm_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.retriever = retriever
        self.docstore = docstore
        self.prober_stack = prober_stack
        self.rag = rag
        self.capture = CaptureSpec(
            tuple((l, rag.position) for l in cfg.probe_layers)
        )
        self.stop_tables = StopTables.from_token_strings(tokenizer.token_strings())
        self.spec = None
        if rag.spec_k:
            from probing_rag_tpu.models.speculative import SpecConfig

            self.spec = SpecConfig(k=rag.spec_k, drafter=rag.spec_drafter)

    # ------------------------------------------------------------ helpers
    def _generate(self, prompt_texts: Sequence[str], with_capture: bool):
        """Batched generation padded to the configured batch size so the
        decode executable is reused across shrinking active sets."""
        n = len(prompt_texts)
        bs = self.rag.batch_size
        texts_out: List[str] = []
        pooled_out: List[np.ndarray] = []
        capture = self.capture if with_capture else CaptureSpec()
        for start in range(0, n, bs):
            chunk = list(prompt_texts[start : start + bs])
            pad_n = bs - len(chunk)
            padded = chunk + [chunk[-1]] * pad_n
            texts, result = generate(
                self.lm_params,
                self.cfg,
                self.tokenizer,
                padded,
                max_new_tokens=self.rag.max_new_tokens,
                capture=capture,
                stop_tables=self.stop_tables,
                kv_int8=self.rag.kv_int8,
                kv_int4=self.rag.kv_int4,
                split_prefill=self.rag.split_prefill,
                spec=self.spec,
            )
            texts_out.extend(texts[: len(chunk)])
            if with_capture:
                pooled_out.append(result.pooled_captures[:, : len(chunk), :])
        pooled = np.concatenate(pooled_out, axis=1) if pooled_out else None
        return texts_out, pooled

    def _gate(self, pooled: np.ndarray):
        retrieve, scores = gate_decision(
            self.prober_stack,
            pooled,
            threshold=self.rag.threshold,
            ablation=self.rag.ablation,
        )
        return np.asarray(retrieve), np.asarray(scores)

    def _retrieve_evidences(self, queries: Sequence[str]) -> List[str]:
        result = self.retriever.search(list(queries), k=self.rag.top_k)
        out = []
        for row in result.doc_indices:
            passages = self.docstore.texts([int(d) for d in row if d >= 0])
            out.append(prompts.format_evidences(passages))
        return out

    # -------------------------------------------------------------- modes
    def run(self, questions: Sequence[str]) -> RAGResult:
        method = self.rag.retr_method
        if method == "none":
            return self._run_none(questions)
        if method == "simple":
            return self._run_simple(questions)
        if method == "probing":
            return self._run_probing(questions)
        raise ValueError(f"unknown retr_method {method!r}")

    def _run_none(self, questions: Sequence[str]) -> RAGResult:
        texts, _ = self._generate([prompts.cot_prompt(q) for q in questions], False)
        return RAGResult(texts, [0] * len(texts))

    def _run_simple(self, questions: Sequence[str]) -> RAGResult:
        evidences = self._retrieve_evidences(questions)
        prompt_texts = [
            prompts.retr_qa_cot2(q, ev) for q, ev in zip(questions, evidences)
        ]
        texts, _ = self._generate(prompt_texts, False)
        return RAGResult(texts, [1] * len(texts))

    def _run_probing(self, questions: Sequence[str]) -> RAGResult:
        if self.prober_stack is None:
            raise ValueError("probing method needs a trained prober stack")
        n = len(questions)
        preds: List[Optional[str]] = [None] * n
        retr_counts = [0] * n
        gate_scores: List[Optional[np.ndarray]] = [None] * n

        # round 0: no-retrieval CoT + gate
        texts, pooled = self._generate(
            [prompts.cot_prompt(q) for q in questions], True
        )
        retrieve, scores = self._gate(pooled)
        for i in range(n):
            gate_scores[i] = scores[i]
            if not retrieve[i]:
                preds[i] = texts[i]
        active = [i for i in range(n) if retrieve[i]]
        last_gen = {i: texts[i] for i in active}
        logger.info("gate round 0: %d/%d queries retrieve", len(active), n)

        # retrieval rounds: a 4th round runs, then the loop hard-breaks
        # (exp_rag.py:462-465) — retr_count is capped at max_extra_rounds.
        for round_idx in range(self.rag.max_extra_rounds + 1):
            if not active:
                break
            search_queries = [
                questions[i] if round_idx == 0 else last_gen[i] for i in active
            ]
            evidences = self._retrieve_evidences(search_queries)
            prompt_texts = [
                prompts.retr_qa_cot2(questions[i], ev)
                for i, ev in zip(active, evidences)
            ]
            texts, pooled = self._generate(prompt_texts, True)
            retrieve, scores = self._gate(pooled)

            next_active = []
            for j, i in enumerate(active):
                last_gen[i] = texts[j]
                gate_scores[i] = scores[j]
                if round_idx < self.rag.max_extra_rounds:
                    retr_counts[i] += 1
                if retrieve[j] and round_idx < self.rag.max_extra_rounds:
                    next_active.append(i)
                else:
                    preds[i] = texts[j]
            active = next_active
            logger.info(
                "gate round %d: %d queries still retrieving", round_idx + 1, len(active)
            )

        assert all(p is not None for p in preds)
        return RAGResult(list(preds), retr_counts, gate_scores)

    # --------------------------------------------------------- resumability
    def run_resumable(
        self,
        questions: Sequence[str],
        manifest_path,
        chunk_size: int = 64,
    ) -> RAGResult:
        """Deterministic resumable eval (SURVEY.md §5.3 — the TPU-native
        replacement for the reference's ``--extract_sep`` manual offset
        slicing, exp_rag.py:333-335): questions run in fixed chunks, each
        chunk's results append to a JSONL manifest keyed by query index, and
        a rerun (e.g. after preemption) skips completed chunks."""
        import json
        from pathlib import Path

        manifest_path = Path(manifest_path)
        manifest_path.parent.mkdir(parents=True, exist_ok=True)
        done: dict = {}
        if manifest_path.exists():
            for line in manifest_path.read_text().splitlines():
                if line.strip():
                    rec = json.loads(line)
                    done[rec["i"]] = rec

        preds: List[Optional[str]] = [None] * len(questions)
        counts = [0] * len(questions)
        scores: List[Optional[np.ndarray]] = [None] * len(questions)
        with manifest_path.open("a") as f:
            for start in range(0, len(questions), chunk_size):
                idxs = list(range(start, min(start + chunk_size, len(questions))))
                if all(i in done for i in idxs):
                    for i in idxs:
                        preds[i] = done[i]["pred"]
                        counts[i] = done[i]["retr_count"]
                        gs = done[i].get("gate_scores")
                        scores[i] = None if gs is None else np.asarray(gs)
                    continue
                chunk_result = self.run([questions[i] for i in idxs])
                for j, i in enumerate(idxs):
                    preds[i] = chunk_result.pred_list[j]
                    counts[i] = chunk_result.retr_count_list[j]
                    gs = (
                        chunk_result.gate_scores[j]
                        if j < len(chunk_result.gate_scores)
                        else None
                    )
                    scores[i] = gs
                    f.write(
                        json.dumps(
                            {
                                "i": i,
                                "pred": preds[i],
                                "retr_count": counts[i],
                                # keep the gate diagnostics a resumed eval
                                # needs for the analysis suite
                                "gate_scores": None if gs is None else np.asarray(gs).tolist(),
                            }
                        )
                        + "\n"
                    )
                f.flush()
        return RAGResult(list(preds), counts, scores)
