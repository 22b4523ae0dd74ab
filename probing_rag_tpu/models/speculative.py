"""Speculative greedy decode: verify k draft tokens per forward.

The sequential decode step is measured at the HBM weight-read bound
(PARITY.md decode forensics: 7.06 ms/step vs the 7.0 ms weights+KV bound at
batch 32), so a forward over ``k+1`` tokens per row costs almost the same
HBM traffic as a 1-token step while emitting up to ``k+1`` committed tokens
— the classic speculative-decoding lever, here in its *self-drafting* forms
that need no second model:

- **prompt-lookup drafter** (``drafter="prompt"``): the draft continuation
  is copied from the last occurrence of the current token in the prompt
  (bigram match preferred over unigram). RAG generations quote retrieved
  passages heavily, which is exactly when this drafter's acceptance is
  high. No reference analogue — the reference decodes strictly
  token-by-token (exp_rag.py:129-200).
- **oracle drafter** (``drafter="oracle"``): drafts come from a caller
  -provided token array. Used by the benchmark to measure the acceptance
  =1 ceiling honestly (drafts = a recorded greedy output of the same
  model, which greedy verification then accepts in full) and by tests to
  force arbitrary acceptance patterns.

Exactness contract: **the committed output equals greedy decode** —
verification accepts draft ``d_j`` only when it equals the argmax of the
verify forward's logits at the previous position, and every rejected
position is re-derived from the model's own argmax. Stop handling
(EOS + the paragraph stop tables), the ``max_new_tokens`` cap, and the
prober-gate pooled-capture semantics reproduce ``decode.decode_greedy``
token for token (pinned by tests/test_speculative.py against the
sequential loop, drafts adversarial and helpful alike).

Cache discipline: all rows write their ``k+1`` fed tokens at a SHARED
physical cursor (the cache dynamic_update_slice writes every batch row at
one sequence offset); per-row divergence in accepted length is handled by
the per-row ``attn_valid`` slot mask — rejected slots are never marked
valid, and the round's last committed token is deliberately left invalid
and re-fed as the next round's anchor so exactly one valid copy of every
committed token exists. The physical cache is therefore over-allocated to
``prompt + max_new * (k+1)`` slots (worst case: one committed token per
round); masked-out slots cost attention-read bandwidth but never
correctness. This trades HBM capacity for the multi-token step — the
right trade on a 16 GB v5e chip for Gemma-2B-class models (MQA cache;
for 7B-class GQA models prefer small ``k``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dataclasses import dataclass

from probing_rag_tpu.models.gemma import (
    CaptureSpec,
    GemmaConfig,
    Params,
    forward,
    init_kv_cache,
    unpack_int4_params,
)


@dataclass(frozen=True)
class SpecConfig:
    """Speculation knobs for ``decode.generate(spec=...)``. Greedy only —
    the verification rule is argmax equality."""

    k: int = 4  # drafts verified per forward (block = k + 1 tokens)
    drafter: str = "prompt"  # "prompt" | "oracle"


def _prompt_lookup_drafts(
    prompt_tokens: jnp.ndarray,  # [B, T] int32
    prompt_valid: jnp.ndarray,  # [B, T] bool
    prev: jnp.ndarray,  # [B] the token before cur (bigram context)
    cur: jnp.ndarray,  # [B] the anchor token the drafts must follow
    k: int,
    eos_id: int,
) -> jnp.ndarray:
    """[B, k] drafts: tokens following cur's last prompt occurrence.

    Prefers the last (prev, cur) bigram match; falls back to the last
    unigram cur match; rows with no match draft EOS (verification then
    rejects them, costing nothing — every round still commits >= 1 token).
    """
    b, t = prompt_tokens.shape
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    m1 = (prompt_tokens == cur[:, None]) & prompt_valid
    prev_tok = jnp.concatenate(
        [jnp.full((b, 1), -1, prompt_tokens.dtype), prompt_tokens[:, :-1]], axis=1
    )
    m2 = m1 & (prev_tok == prev[:, None])
    any1 = jnp.any(m1, axis=1)
    any2 = jnp.any(m2, axis=1)
    last1 = jnp.max(jnp.where(m1, pos, -1), axis=1)
    last2 = jnp.max(jnp.where(m2, pos, -1), axis=1)
    start = jnp.where(any2, last2, last1) + 1  # [B] first draft position
    idx = start[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    ok = any1[:, None] & (idx < t)
    idx = jnp.clip(idx, 0, t - 1)
    drafts = jnp.take_along_axis(prompt_tokens, idx, axis=1)
    return jnp.where(ok, drafts, eos_id)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "capture", "max_new_tokens", "eos_id", "k", "drafter",
        "kv_int8", "kv_int4",
    ),
)
def decode_speculative(
    params: Params,
    prompt_tokens: jnp.ndarray,  # [B, T] int32, left-padded
    prompt_valid: jnp.ndarray,  # [B, T] bool
    stop_contains: jnp.ndarray,  # [V] bool
    stop_ends: jnp.ndarray,  # [V] bool
    stop_starts: jnp.ndarray,  # [V] bool
    oracle: Optional[jnp.ndarray] = None,  # [B, >=max_new] drafter="oracle"
    *,
    cfg: GemmaConfig,
    capture: CaptureSpec,
    max_new_tokens: int,
    eos_id: int,
    k: int = 4,
    drafter: str = "prompt",
    kv_int8: bool = False,
    kv_int4: bool = False,
):
    """Greedy decode with k-token speculation. Returns
    ``decode.decode_greedy``'s tuple (gen_buf, valid_buf, pooled, n_pooled,
    n_generated) — by the exactness contract, the same values — plus a
    ``stats`` dict: ``rounds`` (verify forwards run) and ``n_generated``
    summed give the measured tokens-per-forward = 1 + k * acceptance."""
    if drafter not in ("prompt", "oracle"):
        raise ValueError(f"drafter must be 'prompt' or 'oracle', got {drafter!r}")
    if drafter == "oracle" and oracle is None:
        raise ValueError("drafter='oracle' needs an oracle token array")
    params = unpack_int4_params(params)
    b, t = prompt_tokens.shape
    blk = k + 1
    # worst case: one committed token per round, <= max_new rounds
    s_phys = t + max_new_tokens * blk
    from probing_rag_tpu.models.decode import _kv_dtype

    kv = init_kv_cache(cfg, b, s_phys, dtype=_kv_dtype(cfg, kv_int8, kv_int4))

    # slot validity is per-row state now: prompt slots from the pad mask,
    # generation slots become valid only when a round commits them
    slot_valid0 = jnp.concatenate(
        [prompt_valid, jnp.zeros((b, s_phys - t), bool)], axis=-1
    )
    rope_prompt = jnp.maximum(
        jnp.cumsum(prompt_valid.astype(jnp.int32), axis=-1) - 1, 0
    )
    prompt_len = jnp.sum(prompt_valid.astype(jnp.int32), axis=-1)  # [B]

    logits, kv, _ = forward(
        params,
        prompt_tokens,
        cfg,
        capture=CaptureSpec(),  # prompt forward excluded from the gate
        kv_cache=kv,
        positions=rope_prompt,
        attn_valid=slot_valid0,
        logits_last_only=True,
    )
    g1 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    last_prompt_tok = prompt_tokens[:, -1]

    def is_stop(cur: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
        return (
            (cur == eos_id)
            | stop_contains[cur]
            | (stop_ends[prev] & stop_starts[cur])
        )

    finished0 = is_stop(g1, last_prompt_tok)

    gen_buf = jnp.full((b, max_new_tokens), eos_id, jnp.int32).at[:, 0].set(g1)
    pooled = jnp.zeros((capture.n_sites, b, cfg.d_model), jnp.float32)
    n_pooled = jnp.zeros((b,), jnp.int32)
    n_committed = jnp.ones((b,), jnp.int32)  # g1
    # cur = last committed token, not yet fed; prev_of_cur feeds the bigram
    # drafter and the first stop-pair of the next block
    rows = jnp.arange(b, dtype=jnp.int32)
    j_axis = jnp.arange(blk, dtype=jnp.int32)

    def cond(state):
        _, _, _, finished, n_committed, *_ = state
        active = ~finished & (n_committed < max_new_tokens)
        return jnp.any(active)

    def body(state):
        (pos_phys, cur, prev_of_cur, finished, n_committed, kv, slot_valid,
         gen_buf, pooled, n_pooled) = state
        active = ~finished & (n_committed < max_new_tokens)

        if drafter == "oracle":
            # oracle[row, m] = the m-th generated token of a recorded run;
            # cur is generated token n_committed-1, so drafts follow it
            oid = n_committed[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
            ok = oid < oracle.shape[1]
            drafts = jnp.where(
                ok, jnp.take_along_axis(
                    oracle, jnp.clip(oid, 0, oracle.shape[1] - 1), axis=1),
                eos_id,
            )
        else:
            drafts = _prompt_lookup_drafts(
                prompt_tokens, prompt_valid, prev_of_cur, cur, k, eos_id
            )
        block = jnp.concatenate([cur[:, None], drafts], axis=1)  # [B, blk]

        # feed the block; RoPE positions are LOGICAL (cur is generated
        # token n_committed-1 => fed-index n_committed-1), buffer slots are
        # the shared physical cursor
        rope = (prompt_len + n_committed - 1)[:, None] + j_axis[None, :]
        valid_call = jax.lax.dynamic_update_slice(
            slot_valid, jnp.ones((b, blk), bool), (0, pos_phys)
        )
        kv_in = dict(kv, pos=pos_phys)
        logits, kv2, caps = forward(
            params,
            block,
            cfg,
            capture=capture,
            kv_cache=kv_in,
            positions=rope,
            attn_valid=valid_call,
        )
        targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, blk]

        # accepted prefix: drafts matching the model's own argmax chain
        match = drafts == targets[:, :-1]  # [B, k]
        acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)

        # committed candidates cand_j (j=1..blk): accepted drafts then the
        # bonus token targets[acc] (the model's next token after them)
        bonus = jnp.take_along_axis(targets, acc[:, None], axis=1)[:, 0]
        jj = j_axis[None, 1:]  # [1, k] candidate index 1..k
        cand_tail = jnp.where(jj <= acc[:, None], drafts, eos_id)
        cand = jnp.concatenate([cand_tail, jnp.full((b, 1), eos_id)], axis=1)
        cand = cand.at[rows, acc].set(bonus)  # cand[:, j-1] = cand_j
        cprev = jnp.concatenate([cur[:, None], cand[:, :-1]], axis=1)
        in_cand = j_axis[None, :] <= acc[:, None]  # j-1 index <= acc
        stop_here = is_stop(cand, cprev) & in_cand
        # first stop position (1-based candidate index), blk+1 when none
        first_stop = jnp.min(
            jnp.where(stop_here, j_axis[None, :] + 1, blk + 1), axis=1
        )
        c = jnp.minimum(acc + 1, first_stop)
        c = jnp.minimum(c, max_new_tokens - n_committed)
        c = jnp.where(active, c, 0)

        # commit candidates into gen_buf at logical indices
        lidx = n_committed[:, None] + j_axis[None, :]
        take = j_axis[None, :] < c[:, None]
        gen_buf = gen_buf.at[
            rows[:, None], jnp.where(take, lidx, max_new_tokens)
        ].set(cand, mode="drop")

        # captures + slot validity share one rule (see module docstring):
        # block position j is a sequentially-fed committed token iff j < c;
        # the round's last committed token is re-fed next round as cur
        fed = j_axis[None, :] < c[:, None]  # [B, blk]
        if capture.n_sites:
            pooled = pooled + jnp.einsum(
                "sbjd,bj->sbd", caps.astype(jnp.float32), fed.astype(jnp.float32)
            )
        n_pooled = n_pooled + jnp.sum(fed, axis=1, dtype=jnp.int32)
        slot_valid = jax.lax.dynamic_update_slice(
            slot_valid, fed, (0, pos_phys)
        )

        n_committed2 = n_committed + c
        stopped = first_stop <= c
        finished = finished | (active & stopped)
        # next round's anchor: the last committed token (cand_c); rows that
        # committed nothing keep their anchor
        has = c > 0
        new_cur = jnp.where(
            has, jnp.take_along_axis(
                cand, jnp.clip(c - 1, 0, blk - 1)[:, None], axis=1)[:, 0],
            cur,
        )
        new_prev = jnp.where(
            c > 1, jnp.take_along_axis(
                cand, jnp.clip(c - 2, 0, blk - 1)[:, None], axis=1)[:, 0],
            jnp.where(c == 1, cur, prev_of_cur),
        )
        kv2 = {kk: vv for kk, vv in kv2.items() if kk != "pos"}
        return (pos_phys + blk, new_cur, new_prev, finished, n_committed2,
                kv2, slot_valid, gen_buf, pooled, n_pooled)

    kv0 = {kk: vv for kk, vv in kv.items() if kk != "pos"}
    state = (
        jnp.asarray(t, jnp.int32), g1, last_prompt_tok, finished0,
        n_committed, kv0, slot_valid0, gen_buf, pooled, n_pooled,
    )
    state = jax.lax.while_loop(cond, body, state)
    (pos_final, _, _, _, n_committed, _, _, gen_buf, pooled, n_pooled) = state
    valid_buf = (
        jnp.arange(max_new_tokens, dtype=jnp.int32)[None, :]
        < n_committed[:, None]
    )
    stats = {"rounds": (pos_final - t) // blk}
    return gen_buf, valid_buf, pooled, n_pooled, n_committed, stats
