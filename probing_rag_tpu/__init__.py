"""probing-rag-tpu: a TPU-native adaptive retrieval-augmented generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Probing-RAG
(NAACL 2025 Findings): lightweight MLP probers read intermediate
residual-stream activations of a frozen LM and gate multi-step document
retrieval. Every layer is TPU-first:

- ``retrieval/``: from-scratch BM25 inverted index (CSR postings in HBM,
  Pallas sparse score + top-k kernel) and dense flat index (Pallas tiled
  matmul + running top-k) — replacing llama-index BM25 / faiss.
- ``models/``: Gemma-architecture LM in pure JAX with *functional* activation
  capture (the replacement for transformer_lens hooks) and a jitted
  ``lax.while_loop`` decode with a preallocated KV cache.
- ``prober/``: the layer-wise MLP probers, trained for all probed layers in
  one vmapped jitted step, plus the ensemble retrieval gate.
- ``pipeline/``: the adaptive probe -> retrieve -> regenerate loop.
- ``parallel/``: ``jax.sharding.Mesh`` layouts (DP over queries/batch, TP over
  LM weights, index rows sharded over chips with collective top-k merge).
- ``eval/`` + ``data/``: the metric/prompt/answer-extraction parity contract.

Reference behavior spec: /root/reference (baekingeol/Probing-RAG); see
SURVEY.md at the repo root for the layer map and file:line citations.
"""

__version__ = "0.1.0"
