"""Batched greedy decode as a jitted ``lax.while_loop`` with on-device stop
detection and fused prober-capture pooling.

Replaces ``CustomHookedTransformer.generate`` (exp_rag.py:38-211): the
reference decodes token-by-token in Python, firing 6 hooks per forward with a
device->host copy each (SURVEY.md §3.4 hot loop). Here the whole decode runs
on device; the loop exits early once every row has stopped, and the
per-generated-token residual activations are *accumulated into the gate's
pooled sum* inside the loop (the gate only ever uses the sum over generated
tokens — exp_rag.py:385-386) instead of being shipped to the host.

Stop conditions (parity with exp_rag.py:173-200):
- EOS sampled (per row; finished rows keep appending EOS padding),
- the paragraph stop: generation halts once the decoded text gains a new
  "\\n\\n" paragraph break. The reference re-decodes the full string every
  token to count paragraphs; here it is detected on device from three
  precomputed vocab tables (token contains "\\n\\n" / ends with "\\n" /
  starts with "\\n") — ``StopTables``.
- ``max_new_tokens`` appended (150 for CoT, exp_rag.py:234).

Pooling parity (SURVEY.md §7 'hard parts'): the reference's gate pools
``cache[name][1:]`` — activations of every generated token processed before
the first stop trigger; the trigger token itself and the prompt forward are
excluded. ``cap_mask`` in the loop reproduces that exactly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probing_rag_tpu.models.gemma import (
    CaptureSpec,
    GemmaConfig,
    Params,
    forward,
    init_kv_cache,
    unpack_int4_params,
)
from probing_rag_tpu.models.sampling import SamplingConfig, select_token


@dataclass(frozen=True)
class StopTables:
    """Vocab-indexed tables for on-device paragraph-stop detection."""

    contains_dbl_nl: np.ndarray  # [V] bool: token string contains "\n\n"
    ends_nl: np.ndarray  # [V] bool
    starts_nl: np.ndarray  # [V] bool

    @classmethod
    def from_token_strings(cls, token_strings: Sequence[str]) -> "StopTables":
        v = len(token_strings)
        contains = np.zeros(v, bool)
        ends = np.zeros(v, bool)
        starts = np.zeros(v, bool)
        for i, s in enumerate(token_strings):
            if not s:
                continue
            contains[i] = "\n\n" in s
            ends[i] = s.endswith("\n")
            starts[i] = s.startswith("\n")
        return cls(contains, ends, starts)

    @classmethod
    def disabled(cls, vocab_size: int) -> "StopTables":
        z = np.zeros(vocab_size, bool)
        return cls(z, z, z)


@dataclass
class DecodeResult:
    tokens: np.ndarray  # [B, max_new] int32 — generated tokens (EOS-padded)
    token_valid: np.ndarray  # [B, max_new] bool — token was really generated
    pooled_captures: np.ndarray  # [n_sites, B, D] f32 — gate-parity summed acts
    n_pooled: np.ndarray  # [B] int32 — tokens in the pooled sum
    n_generated: np.ndarray  # [B] int32


def _pad_batch(
    prompt_ids: Sequence[Sequence[int]], pad_id: int, bucket: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad prompts to a bucketed common length (left padding keeps the
    last prompt token at a fixed position for the prefill logit read)."""
    max_len = max(len(p) for p in prompt_ids)
    padded_len = ((max_len + bucket - 1) // bucket) * bucket
    b = len(prompt_ids)
    tokens = np.full((b, padded_len), pad_id, dtype=np.int32)
    valid = np.zeros((b, padded_len), dtype=bool)
    for i, p in enumerate(prompt_ids):
        tokens[i, padded_len - len(p):] = p
        valid[i, padded_len - len(p):] = True
    return tokens, valid


def _kv_dtype(cfg: GemmaConfig, kv_int8: bool, kv_int4: bool = False):
    """Cache element type for the (kv_int8, kv_int4) knob pair. int4
    (quarter-width cache + sub-channel scales — gemma._quant_kv4) is the
    big-batch 7B enabler: the int8 cache misses the batch-64 w8a8 HBM
    budget by ~2.5% even on the split + per-layer path (ROUND5_NOTES §10);
    int4 halves both the cache and XLA's one-copy while-loop floor."""
    if kv_int8 and kv_int4:
        raise ValueError("kv_int8 and kv_int4 are mutually exclusive")
    if kv_int4:
        return jnp.int4
    return jnp.int8 if kv_int8 else cfg.compute_dtype


def _is_stop(cur, prev, stop_contains, stop_ends, stop_starts, eos_id):
    return (
        (cur == eos_id)
        | stop_contains[cur]
        | (stop_ends[prev] & stop_starts[cur])
    )


def _prefill_impl(
    params: Params,
    prompt_tokens: jnp.ndarray,  # [B, T] int32, left-padded
    prompt_valid: jnp.ndarray,  # [B, T] bool
    stop_contains: jnp.ndarray,  # [V] bool
    stop_ends: jnp.ndarray,  # [V] bool
    stop_starts: jnp.ndarray,  # [V] bool
    rng: Optional[jnp.ndarray],
    *,
    cfg: GemmaConfig,
    max_new_tokens: int,
    eos_id: int,
    sampling: SamplingConfig,
    kv_int8: bool,
    kv_int4: bool = False,
):
    """Prompt forward: builds the KV cache, selects the first token.

    Returns ``(kv, g1, finished0, counts, rng)`` — the hand-off state the
    decode loop consumes (either fused in one program, or across the
    two-program split boundary)."""
    # Unpack boundary-format int4 weights ONCE, outside the while_loop: the
    # loop closes over the unpacked S4 arrays, so every decode step reads
    # int4-width HBM while the host boundary only ever carries uint8
    # (native S4 jit args crash the TPU runtime here — gemma._pack_int4).
    params = unpack_int4_params(params)
    b, t = prompt_tokens.shape
    total = t + max_new_tokens
    kv = init_kv_cache(cfg, b, total, dtype=_kv_dtype(cfg, kv_int8, kv_int4))

    # Cache-slot validity: prompt pad slots never attendable; generated slots
    # become attendable as the causal buffer index advances.
    slot_valid = jnp.concatenate(
        [prompt_valid, jnp.ones((b, max_new_tokens), bool)], axis=-1
    )
    rope_prompt = jnp.maximum(jnp.cumsum(prompt_valid.astype(jnp.int32), axis=-1) - 1, 0)

    logits, kv, _ = forward(
        params,
        prompt_tokens,
        cfg,
        capture=CaptureSpec(),  # prompt-forward captures are excluded from the gate
        kv_cache=kv,
        positions=rope_prompt,
        attn_valid=slot_valid,
        logits_last_only=True,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng, k1 = jax.random.split(rng)
    # freq_penalty parity (exp_rag.py:58 via transformer_lens sample_logits):
    # the penalty counts every token of the sequence so far, prompt included
    # (pad slots excluded); finished rows keep counting their EOS padding,
    # matching the reference's penalty over the padded running sequence.
    if sampling.needs_counts:
        counts = jnp.zeros((b, cfg.vocab_size), jnp.int32).at[
            jnp.arange(b)[:, None], prompt_tokens
        ].add(prompt_valid.astype(jnp.int32))
    else:  # dummy carry: static shape, never read
        counts = jnp.zeros((b, 1), jnp.int32)
    g1 = select_token(logits[:, -1], sampling, k1, counts)
    if sampling.needs_counts:
        counts = counts.at[jnp.arange(b), g1].add(1)

    finished0 = _is_stop(
        g1, prompt_tokens[:, -1], stop_contains, stop_ends, stop_starts, eos_id
    )
    return kv, g1, finished0, counts, rng


def _decode_loop_impl(
    params: Params,
    kv,  # KV cache from _prefill_impl (donated in the split path)
    g1: jnp.ndarray,  # [B] first generated token
    finished0: jnp.ndarray,  # [B] bool
    counts: jnp.ndarray,  # freq-penalty carry from prefill
    prompt_valid: jnp.ndarray,  # [B, T] bool
    stop_contains: jnp.ndarray,
    stop_ends: jnp.ndarray,
    stop_starts: jnp.ndarray,
    rng: jnp.ndarray,
    *,
    cfg: GemmaConfig,
    capture: CaptureSpec,
    max_new_tokens: int,
    eos_id: int,
    sampling: SamplingConfig,
):
    """The decode while_loop over a prefilled cache."""
    params = unpack_int4_params(params)
    b = g1.shape[0]
    slot_valid = jnp.concatenate(
        [prompt_valid, jnp.ones((b, max_new_tokens), bool)], axis=-1
    )
    prompt_len = jnp.sum(prompt_valid.astype(jnp.int32), axis=-1)  # [B]

    gen_buf = jnp.full((b, max_new_tokens), eos_id, jnp.int32).at[:, 0].set(g1)
    valid_buf = jnp.zeros((b, max_new_tokens), bool).at[:, 0].set(True)
    pooled = jnp.zeros((capture.n_sites, b, cfg.d_model), jnp.float32)
    n_pooled = jnp.zeros((b,), jnp.int32)

    def cond(state):
        step, _, _, _, finished, *_ = state
        return (step < max_new_tokens - 1) & ~jnp.all(finished)

    def body(state):
        (step, rng, prev, kv, finished, gen_buf, valid_buf, pooled,
         n_pooled, counts) = state
        rope_pos = (prompt_len + step)[:, None]  # prev token's RoPE position
        logits, kv, caps = forward(
            params,
            prev[:, None],
            cfg,
            capture=capture,
            kv_cache=kv,
            positions=rope_pos,
            attn_valid=slot_valid,
        )
        cap_ok = ~finished  # parity: tokens processed before the stop trigger
        if capture.n_sites:
            pooled = pooled + caps[:, :, 0, :] * cap_ok[None, :, None]
        n_pooled = n_pooled + cap_ok.astype(jnp.int32)

        rng2, step_key = jax.random.split(rng)
        nxt = select_token(logits[:, -1], sampling, step_key, counts)
        nxt = jnp.where(finished, eos_id, nxt)
        if sampling.needs_counts:
            counts = counts.at[jnp.arange(b), nxt].add(1)
        valid_buf = valid_buf.at[:, step + 1].set(~finished)
        gen_buf = gen_buf.at[:, step + 1].set(nxt)
        finished = finished | _is_stop(
            nxt, prev, stop_contains, stop_ends, stop_starts, eos_id
        )
        return (step + 1, rng2, nxt, kv, finished, gen_buf, valid_buf,
                pooled, n_pooled, counts)

    state = (jnp.asarray(0, jnp.int32), rng, g1, kv, finished0, gen_buf,
             valid_buf, pooled, n_pooled, counts)
    state = jax.lax.while_loop(cond, body, state)
    (step, _, _, kv, _, gen_buf, valid_buf, pooled, n_pooled, _) = state
    n_generated = jnp.sum(valid_buf.astype(jnp.int32), axis=-1)
    # kv is returned so the SPLIT path's donated cache argument has an
    # output to alias with — without input->output aliasing XLA keeps the
    # donated input read-only and allocates a second cache for the loop
    # carry, which is exactly the copy the split exists to avoid. The
    # fused decode_greedy discards it (dead at its program boundary).
    return gen_buf, valid_buf, pooled, n_pooled, n_generated, kv


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capture", "max_new_tokens", "eos_id", "sampling",
                     "kv_int8", "kv_int4"),
)
def decode_greedy(
    params: Params,
    prompt_tokens: jnp.ndarray,  # [B, T] int32, left-padded
    prompt_valid: jnp.ndarray,  # [B, T] bool
    stop_contains: jnp.ndarray,  # [V] bool
    stop_ends: jnp.ndarray,  # [V] bool
    stop_starts: jnp.ndarray,  # [V] bool
    rng: Optional[jnp.ndarray] = None,  # PRNG key, only used when sampling
    *,
    cfg: GemmaConfig,
    capture: CaptureSpec,
    max_new_tokens: int,
    eos_id: int,
    sampling: SamplingConfig = SamplingConfig(),
    kv_int8: bool = False,
    kv_int4: bool = False,
):
    kv, g1, finished0, counts, rng = _prefill_impl(
        params, prompt_tokens, prompt_valid,
        stop_contains, stop_ends, stop_starts, rng,
        cfg=cfg, max_new_tokens=max_new_tokens, eos_id=eos_id,
        sampling=sampling, kv_int8=kv_int8, kv_int4=kv_int4,
    )
    return _decode_loop_impl(
        params, kv, g1, finished0, counts, prompt_valid,
        stop_contains, stop_ends, stop_starts, rng,
        cfg=cfg, capture=capture, max_new_tokens=max_new_tokens,
        eos_id=eos_id, sampling=sampling,
    )[:5]


# Two-program split serving path. In the fused ``decode_greedy`` program the
# KV cache's live range crosses the prefill->while_loop boundary inside ONE
# executable, and at 7B batch-64 geometry XLA's compressed-remat pass holds
# compressed + uncompressed relayout copies of the 2.3 GB int8 K and V caches
# simultaneously — 17.01 G > 15.75 G HBM (MEASURE_r5
# decode_mistral7b_int8a8_b64, logs/measure_decode_mistral7b_int8a8_b64.err).
# Splitting at exactly that boundary makes the cache a program OUTPUT of
# prefill and a DONATED argument of the decode loop: buffer donation lets the
# loop update the cache in place, so each program holds at most one copy.
# Same math, same results; two dispatches instead of one per generate call.
_prefill_jit = jax.jit(
    _prefill_impl,
    static_argnames=("cfg", "max_new_tokens", "eos_id", "sampling",
                     "kv_int8", "kv_int4"),
)
_decode_loop_jit = jax.jit(
    _decode_loop_impl,
    static_argnames=("cfg", "capture", "max_new_tokens", "eos_id", "sampling"),
    donate_argnames=("kv",),
)


def decode_greedy_split(
    params: Params,
    prompt_tokens: jnp.ndarray,
    prompt_valid: jnp.ndarray,
    stop_contains: jnp.ndarray,
    stop_ends: jnp.ndarray,
    stop_starts: jnp.ndarray,
    rng: Optional[jnp.ndarray] = None,
    *,
    cfg: GemmaConfig,
    capture: CaptureSpec,
    max_new_tokens: int,
    eos_id: int,
    sampling: SamplingConfig = SamplingConfig(),
    kv_int8: bool = False,
    kv_int4: bool = False,
):
    """``decode_greedy`` as two programs with a donated cache hand-off —
    identical results, lower peak HBM at 7B big batch.

    Runtime caveat: with ``kv_int4`` the cache crosses the program
    boundary as device-resident S4 arrays. That is exact and tested on
    the CPU backend, but the axon TPU runtime's S4 argument handling has
    a history of recursing (gemma._pack_int4's note; an eager S4
    dispatch reproduces it) — on that runtime prefer the FUSED
    ``decode_greedy`` for int4-KV serving (the int4 cache's budget fits
    fused at 7B b64: ROUND5_NOTES §11), or int8-KV with the split."""
    kv, g1, finished0, counts, rng = _prefill_jit(
        params, prompt_tokens, prompt_valid,
        stop_contains, stop_ends, stop_starts, rng,
        cfg=cfg, max_new_tokens=max_new_tokens, eos_id=eos_id,
        sampling=sampling, kv_int8=kv_int8, kv_int4=kv_int4,
    )
    out = _decode_loop_jit(
        params, kv, g1, finished0, counts, prompt_valid,
        stop_contains, stop_ends, stop_starts, rng,
        cfg=cfg, capture=capture, max_new_tokens=max_new_tokens,
        eos_id=eos_id, sampling=sampling,
    )
    return out[:5]  # the final cache only exists to receive the donation


def generate(
    params: Params,
    cfg: GemmaConfig,
    tokenizer,
    prompts: Sequence[str],
    *,
    max_new_tokens: int = 150,
    capture: Optional[CaptureSpec] = None,
    stop_tables: Optional[StopTables] = None,
    paragraph_stop: bool = True,
    sampling: SamplingConfig = SamplingConfig(),
    seed: int = 0,
    kv_int8: bool = False,
    kv_int4: bool = False,
    split_prefill: bool = False,  # two-program serving path (see decode_greedy_split)
    spec=None,  # Optional[speculative.SpecConfig] — greedy-exact speculation
    spec_oracle: Optional[jnp.ndarray] = None,  # [B, >=max_new] drafts
) -> Tuple[List[str], DecodeResult]:
    """End-to-end batched generation: tokenize, decode on device, detokenize.

    Returns (full_texts, DecodeResult) where ``full_texts[i]`` is
    prompt + generation — the shape ``model.to_string(output)[0]`` has in the
    reference, which the answer extractor expects.
    """
    capture = capture if capture is not None else CaptureSpec.for_probing(cfg)
    if stop_tables is None:
        stop_tables = (
            StopTables.from_token_strings(tokenizer.token_strings())
            if paragraph_stop
            else StopTables.disabled(tokenizer.vocab_size)
        )
    prompt_ids = [tokenizer.encode(p, add_bos=True) for p in prompts]
    tokens, valid = _pad_batch(prompt_ids, tokenizer.pad_id)

    if spec is not None:
        if sampling.do_sample:
            raise ValueError("speculative decode is greedy-exact only; "
                             "disable sampling or speculation")
        from probing_rag_tpu.models.speculative import decode_speculative

        gen, gen_valid, pooled, n_pooled, n_gen, _ = decode_speculative(
            params,
            jnp.asarray(tokens),
            jnp.asarray(valid),
            jnp.asarray(stop_tables.contains_dbl_nl),
            jnp.asarray(stop_tables.ends_nl),
            jnp.asarray(stop_tables.starts_nl),
            spec_oracle,
            cfg=cfg,
            capture=capture,
            max_new_tokens=max_new_tokens,
            eos_id=tokenizer.eos_id,
            k=spec.k,
            drafter=spec.drafter,
            kv_int8=kv_int8,
            kv_int4=kv_int4,
        )
    else:
        decode_fn = decode_greedy_split if split_prefill else decode_greedy
        gen, gen_valid, pooled, n_pooled, n_gen = decode_fn(
            params,
            jnp.asarray(tokens),
            jnp.asarray(valid),
            jnp.asarray(stop_tables.contains_dbl_nl),
            jnp.asarray(stop_tables.ends_nl),
            jnp.asarray(stop_tables.starts_nl),
            jax.random.PRNGKey(seed),
            cfg=cfg,
            capture=capture,
            max_new_tokens=max_new_tokens,
            eos_id=tokenizer.eos_id,
            sampling=sampling,
            kv_int8=kv_int8,
            kv_int4=kv_int4,
        )
    gen = np.asarray(gen)
    gen_valid = np.asarray(gen_valid)
    n_gen = np.asarray(n_gen)

    texts = []
    for i, prompt in enumerate(prompts):
        ids = gen[i, : n_gen[i]][gen_valid[i, : n_gen[i]]]
        texts.append(prompt + tokenizer.decode([int(x) for x in ids]))
    result = DecodeResult(
        tokens=gen,
        token_valid=gen_valid,
        pooled_captures=np.asarray(pooled),
        n_pooled=np.asarray(n_pooled),
        n_generated=n_gen,
    )
    return texts, result
