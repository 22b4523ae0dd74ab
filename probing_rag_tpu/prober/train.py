"""Prober training: all probed (layer, site) pairs in one vmapped jitted step.

Behavioral spec: /root/reference/train.py (main loop :23-350) and
utils.py:122-226 (pooling methods + loss). The reference runs one script per
layer and trains the resid_mid/resid_post probers with two separate
optimizers; here a single frozen-LM forward captures every probed site and a
``jax.vmap``-ed AdamW step updates the whole prober stack at once — the
frozen 2B forward dominates cost (SURVEY.md §3.3), so capturing 12 sites in
one pass is a ~12x win over the reference's per-layer runs.

Parity notes:
- loss = CrossEntropy applied AFTER a softmax (the reference's double-softmax
  quirk, utils.py:130-131) — reproduced by default, standard CE behind a flag.
- pooling method_2 ``tokens_mean``: mean over the last ``pred_len`` (answer)
  token activations (utils.py:181-204); method_1 ``each_token`` scores every
  answer token; method_3 ``last_token`` takes the final position.
- optimizer: AdamW(lr=1e-4) + per-step exponential decay 0.995, batch 8
  (train.py:126-137).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig, forward
from probing_rag_tpu.prober.model import improved_probe_forward, init_improved_probe


# ------------------------------------------------------------------- loss


def probe_loss(
    logits: jnp.ndarray,  # [B, C]
    labels: jnp.ndarray,  # [B] int
    double_softmax: bool = True,
    weights: Optional[jnp.ndarray] = None,  # [B] 0/1 mask
) -> jnp.ndarray:
    """CE loss; ``double_softmax=True`` reproduces utils.py:130-131 (softmax
    output fed to CrossEntropyLoss, which applies log_softmax again). A
    1-logit probe takes the reference's BCE branch instead (utils.py:132-137:
    sigmoid + BCELoss on float labels)."""
    if logits.shape[-1] == 1:
        p = jax.nn.sigmoid(logits[..., 0])
        y = labels.astype(jnp.float32)
        eps = 1e-7  # torch BCELoss clamps log terms; same guard
        nll = -(y * jnp.log(p + eps) + (1.0 - y) * jnp.log(1.0 - p + eps))
        if weights is None:
            return jnp.mean(nll)
        return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1)
    x = jax.nn.softmax(logits, axis=-1) if double_softmax else logits
    logp = jax.nn.log_softmax(x, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is None:
        return jnp.mean(nll)
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1)


# ---------------------------------------------------------------- pooling


def pool_mean_answer_tokens(
    acts: jnp.ndarray, pred_lens: jnp.ndarray
) -> jnp.ndarray:
    """method_2 ``tokens_mean``: mean over the trailing pred_len positions of
    each row. acts: [B, T, D], pred_lens: [B] -> [B, D]."""
    b, t, _ = acts.shape
    pos = jnp.arange(t)[None, :]
    mask = pos >= (t - pred_lens[:, None])  # [B, T]
    summed = jnp.sum(acts * mask[:, :, None], axis=1)
    return summed / jnp.maximum(pred_lens[:, None], 1)


def pool_last_token(acts: jnp.ndarray, pred_lens: jnp.ndarray) -> jnp.ndarray:
    return acts[:, -1, :]


def pool_sum_answer_tokens(acts: jnp.ndarray, pred_lens: jnp.ndarray) -> jnp.ndarray:
    """Inference-side pooling: SUM over generated tokens (exp_rag.py:385-386).
    Kept distinct from the train-side mean — the asymmetry is load-bearing."""
    b, t, _ = acts.shape
    pos = jnp.arange(t)[None, :]
    mask = pos >= (t - pred_lens[:, None])
    return jnp.sum(acts * mask[:, :, None], axis=1)


POOLERS: Dict[str, Callable] = {
    "tokens_mean": pool_mean_answer_tokens,
    "last_token": pool_last_token,
    "tokens_sum": pool_sum_answer_tokens,
}


# ------------------------------------------------------------- train step


@dataclass(frozen=True)
class ProberTrainConfig:
    layers: Tuple[int, ...] = (6, 8, 10, 12, 14, 16)
    positions: Tuple[str, ...] = ("resid_mid", "resid_post")
    method: str = "tokens_mean"
    lr: float = 1e-4
    lr_decay: float = 0.995
    batch_size: int = 8
    epochs: int = 2
    max_len: int = 1536  # train.py:86
    double_softmax: bool = True
    seed: int = 42

    @property
    def sites(self) -> Tuple[Tuple[int, str], ...]:
        return tuple((l, p) for l in self.layers for p in self.positions)


def make_optimizer(tc: ProberTrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=tc.lr, transition_steps=1, decay_rate=tc.lr_decay
    )
    return optax.adamw(schedule)


def init_prober_stack(tc: ProberTrainConfig, d_model: int, key: jax.Array):
    """Stacked params for all (layer, position) sites: leaves [n_sites, ...]."""
    keys = jax.random.split(key, len(tc.sites))
    per_site = [init_improved_probe(k, d_model) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_site)


def _one_prober_loss(probe_params, acts, labels, pred_lens, rng, tc: ProberTrainConfig):
    if tc.method == "each_token":
        # method_1: score every answer token with the per-example label
        logits = improved_probe_forward(probe_params, acts, dropout_rng=rng)  # [B,T,C]
        b, t, c = logits.shape
        pos = jnp.arange(t)[None, :]
        mask = (pos >= (t - pred_lens[:, None])).astype(jnp.float32)
        lab = jnp.broadcast_to(labels[:, None], (b, t))
        return probe_loss(
            logits.reshape(b * t, c),
            lab.reshape(b * t),
            tc.double_softmax,
            weights=mask.reshape(b * t),
        )
    pooled = POOLERS[tc.method](acts, pred_lens)  # [B, D]
    logits = improved_probe_forward(probe_params, pooled, dropout_rng=rng)
    return probe_loss(logits, labels, tc.double_softmax)


@functools.partial(jax.jit, static_argnames=("tc", "optimizer"))
def prober_train_step(
    stacked_params,
    opt_state,
    captures: jnp.ndarray,  # [n_sites, B, T, D] from the frozen LM
    labels: jnp.ndarray,  # [B]
    pred_lens: jnp.ndarray,  # [B]
    rng: jax.Array,
    *,
    tc: ProberTrainConfig,
    optimizer: optax.GradientTransformation,
):
    rngs = jax.random.split(rng, captures.shape[0])

    def site_loss(params, acts, site_rng):
        return _one_prober_loss(params, acts, labels, pred_lens, site_rng, tc)

    losses, grads = jax.vmap(jax.value_and_grad(site_loss))(
        stacked_params, captures, rngs
    )
    updates, opt_state = optimizer.update(grads, opt_state, stacked_params)
    stacked_params = optax.apply_updates(stacked_params, updates)
    return stacked_params, opt_state, losses


@functools.partial(jax.jit, static_argnames=("tc",))
def prober_eval_step(
    stacked_params,
    captures: jnp.ndarray,
    labels: jnp.ndarray,
    pred_lens: jnp.ndarray,
    *,
    tc: ProberTrainConfig,
):
    """Per-site (correct_count, loss) on one batch, eval pooling = train's."""

    def site_eval(params, acts):
        pooled = (
            POOLERS[tc.method](acts, pred_lens)
            if tc.method != "each_token"
            else pool_last_token(acts, pred_lens)
        )
        logits = improved_probe_forward(params, pooled)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return correct, probe_loss(logits, labels, tc.double_softmax)

    return jax.vmap(site_eval)(stacked_params, captures)


# ------------------------------------------------------------ data + loop


@dataclass
class ProberExample:
    """One training row from the extracted CoT dataset (train.py:85-109):
    ``text`` is the prompt+question, ``pred`` the model generation, ``label``
    the correctness flag."""

    text: str
    pred: str
    label: int


def tensorize_examples(
    examples: Sequence[ProberExample],
    tokenizer,
    max_len: int,
    is_cot: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Left-pad tokenized text+pred to ``max_len`` and compute ``pred_len`` =
    #generation tokens (utils.py:59-95). Returns (tokens, labels, pred_lens)."""
    b = len(examples)
    tokens = np.full((b, max_len), 0, dtype=np.int32)
    labels = np.zeros((b,), np.int32)
    pred_lens = np.zeros((b,), np.int32)
    pad = tokenizer.pad_id
    tokens[:] = pad
    for i, ex in enumerate(examples):
        joined = f"{ex.text}\n{ex.pred}" if is_cot else f"{ex.text} {ex.pred}"
        ids_full = tokenizer.encode(joined, add_bos=True)
        ids_text = tokenizer.encode(ex.text, add_bos=True)
        ids_full = ids_full[-max_len:]
        tokens[i, max_len - len(ids_full):] = ids_full
        labels[i] = ex.label
        pred_lens[i] = max(len(ids_full) - len(ids_text), 1)
    return tokens, labels, pred_lens


def capture_activations(
    lm_params, cfg: GemmaConfig, tokens: np.ndarray, sites, pad_id: int
) -> jnp.ndarray:
    """One frozen-LM forward returning [n_sites, B, T, D] activations — the
    functional replacement for run_with_cache (train.py:260-266)."""
    capture = CaptureSpec(tuple(sites))
    arr = jnp.asarray(tokens)
    valid = arr != pad_id
    positions = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
    _, _, caps = forward(
        lm_params, arr, cfg, capture=capture, positions=positions, attn_valid=valid
    )
    return caps


def train_probers(
    lm_params,
    cfg: GemmaConfig,
    tokenizer,
    train_examples: Sequence[ProberExample],
    dev_examples: Sequence[ProberExample] = (),
    tc: ProberTrainConfig = ProberTrainConfig(),
    log: Optional[Callable[[Dict[str, Any]], None]] = None,
):
    """Full training loop. Returns (stacked_params, history)."""
    optimizer = make_optimizer(tc)
    key = jax.random.PRNGKey(tc.seed)
    key, init_key = jax.random.split(key)
    stacked = init_prober_stack(tc, cfg.d_model, init_key)
    opt_state = optimizer.init(stacked)
    history: List[Dict[str, Any]] = []

    n = len(train_examples)
    for epoch in range(tc.epochs):
        perm = np.random.default_rng(tc.seed + epoch).permutation(n)
        for start in range(0, n - n % tc.batch_size, tc.batch_size):
            batch = [train_examples[i] for i in perm[start : start + tc.batch_size]]
            tokens, labels, pred_lens = tensorize_examples(
                batch, tokenizer, tc.max_len
            )
            caps = capture_activations(
                lm_params, cfg, tokens, tc.sites, tokenizer.pad_id
            )
            key, step_key = jax.random.split(key)
            stacked, opt_state, losses = prober_train_step(
                stacked,
                opt_state,
                caps,
                jnp.asarray(labels),
                jnp.asarray(pred_lens),
                step_key,
                tc=tc,
                optimizer=optimizer,
            )
            rec = {
                "epoch": epoch,
                "step": start // tc.batch_size,
                "losses": np.asarray(losses).tolist(),
            }
            history.append(rec)
            if log:
                log(rec)

        if dev_examples:
            acc = evaluate_probers(lm_params, cfg, tokenizer, dev_examples, stacked, tc)
            rec = {"epoch": epoch, "dev_acc": acc.tolist()}
            history.append(rec)
            if log:
                log(rec)
    return stacked, history


def evaluate_probers(
    lm_params, cfg, tokenizer, examples, stacked_params, tc: ProberTrainConfig,
    max_batches: int = 500,  # dev eval cap, train.py:301-333
) -> np.ndarray:
    correct = np.zeros(len(tc.sites), np.int64)
    total = 0
    n = len(examples)
    for bi, start in enumerate(range(0, n - n % tc.batch_size, tc.batch_size)):
        if bi >= max_batches:
            break
        batch = examples[start : start + tc.batch_size]
        tokens, labels, pred_lens = tensorize_examples(batch, tokenizer, tc.max_len)
        caps = capture_activations(lm_params, cfg, tokens, tc.sites, tokenizer.pad_id)
        c, _ = prober_eval_step(
            stacked_params, caps, jnp.asarray(labels), jnp.asarray(pred_lens), tc=tc
        )
        correct += np.asarray(c)
        total += len(batch)
    return correct / max(total, 1)
