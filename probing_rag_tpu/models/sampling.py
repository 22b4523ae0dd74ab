"""Token selection for the decode loop: greedy / temperature / top-k /
top-p / frequency penalty.

Parity surface: the reference's ``generate`` accepts ``do_sample``, ``top_k``,
``top_p``, ``temperature``, ``freq_penalty`` (exp_rag.py:50-58 via
transformer_lens ``utils.sample_logits``); the main experiment path is greedy
(``do_sample=False``, exp_rag.py:401). All selectors are jit-safe (static
config, no data-dependent shapes) so they drop into the ``lax.while_loop``
decode — the freq-penalty token-count carry lives in the decode state and is
a 1-wide dummy when the penalty is off (``SamplingConfig.needs_counts``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingConfig:
    do_sample: bool = False  # greedy when False (the reference's main path)
    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # transformer_lens sample_logits order: the penalty applies BEFORE
    # temperature/top-k/top-p (exp_rag.py:58; logits -= p * count(token)
    # over the whole sequence so far, prompt included)
    freq_penalty: float = 0.0

    @property
    def needs_counts(self) -> bool:
        return self.do_sample and self.freq_penalty != 0.0


def select_token(
    logits: jnp.ndarray,  # [B, V]
    config: SamplingConfig,
    key: Optional[jax.Array] = None,
    token_counts: Optional[jnp.ndarray] = None,  # [B, V] int32
) -> jnp.ndarray:
    """Returns [B] int32 token ids."""
    if not config.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if config.needs_counts:
        assert token_counts is not None, "freq_penalty needs token counts"
        logits = logits - config.freq_penalty * token_counts.astype(logits.dtype)

    logits = logits / jnp.maximum(config.temperature, 1e-6)

    if config.top_k is not None:
        kth = jax.lax.top_k(logits, config.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if config.top_p is not None:
        # nucleus: keep the smallest prefix of the sorted distribution whose
        # mass reaches top_p (always keeping the argmax)
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = cum - probs < config.top_p  # first token always kept
        # threshold logit: smallest kept logit per row
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thresh, -jnp.inf, logits)

    assert key is not None, "sampling needs a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
