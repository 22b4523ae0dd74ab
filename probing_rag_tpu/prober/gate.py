"""The prober ensemble retrieval gate.

Behavioral spec: exp_rag.py:381-414. Per probed layer the decode loop's
sum-pooled generated-token activations (sum, not mean — the train/inference
pooling asymmetry is load-bearing, SURVEY.md §7) are scored by that layer's
prober; the ensemble sums class probabilities over probers ``ablation:`` and
retrieval fires unless ``S[stop] + threshold < S[retrieve_not_needed]``:

    S = sum_i softmax(logits_i)            # exp_rag.py:406-410
    stop generating iff S[0] + theta < S[1]  # exp_rag.py:414

Class convention (train.py labels): class 1 = the no-retrieval generation was
*correct* (acc label), class 0 = incorrect -> needs retrieval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def prober_ensemble_logits(stacked_probe_params, pooled: jnp.ndarray) -> jnp.ndarray:
    """pooled: [n_probers, B, D] sum-pooled activations; params stacked along
    a leading prober axis. Returns logits [n_probers, B, 2]."""
    from probing_rag_tpu.prober.model import improved_probe_forward

    return jax.vmap(improved_probe_forward)(stacked_probe_params, pooled)


@functools.partial(jax.jit, static_argnames=("ablation",))
def gate_decision(
    stacked_probe_params,
    pooled: jnp.ndarray,  # [n_probers, B, D]
    threshold: float = 0.0,
    ablation: int = 0,
):
    """Returns (retrieve [B] bool, scores [B, 2]).

    ``retrieve[b]`` is True when the ensemble says another retrieval round is
    needed (the reference's ``prediction_do_more_retriever == 1``).
    ``ablation`` drops the first N probers from the sum (exp_rag.py:408).
    """
    logits = prober_ensemble_logits(stacked_probe_params, pooled)
    probs = jax.nn.softmax(logits, axis=-1)  # [n_probers, B, 2]
    scores = jnp.sum(probs[ablation:], axis=0)  # [B, 2]
    stop = scores[:, 0] + threshold < scores[:, 1]
    return ~stop, scores
