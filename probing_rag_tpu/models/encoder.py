"""Dense-retrieval text encoder (Contriever/BERT architecture) in pure JAX.

Replaces ``SentenceTransformer('facebook/contriever-msmarco')``
(exp_rag.py:246-248, make_indexer.py:446-457): a BERT-base post-LN encoder
with mean pooling over the attention mask — Contriever's published pooling.
Weights load from a HF checkpoint when available (models/hf_loader.py);
random init covers tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30_522  # bert-base-uncased
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    max_positions: int = 512
    n_token_types: int = 2
    norm_eps: float = 1e-12
    compute_dtype: Any = jnp.bfloat16

    @classmethod
    def contriever(cls) -> "EncoderConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "EncoderConfig":
        return cls(vocab_size=256, d_model=32, n_layers=2, n_heads=2, d_ff=64, max_positions=64)


def init_encoder_params(cfg: EncoderConfig, key: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)
    d, f, L = cfg.d_model, cfg.d_ff, cfg.n_layers

    def dense(key, *shape):
        return jax.random.normal(key, shape, jnp.float32) * 0.02

    def ln(dim):
        return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}

    def ln_stack(n, dim):
        return {
            "w": jnp.ones((n, dim), jnp.float32),
            "b": jnp.zeros((n, dim), jnp.float32),
        }

    return {
        "tok_embed": dense(ks[0], cfg.vocab_size, d),
        "pos_embed": dense(ks[1], cfg.max_positions, d),
        "type_embed": dense(ks[2], cfg.n_token_types, d),
        "embed_ln": ln(d),
        "layers": {
            "wq": dense(ks[3], L, d, d),
            "bq": jnp.zeros((L, d)),
            "wk": dense(ks[4], L, d, d),
            "bk": jnp.zeros((L, d)),
            "wv": dense(ks[5], L, d, d),
            "bv": jnp.zeros((L, d)),
            "wo": dense(ks[6], L, d, d),
            "bo": jnp.zeros((L, d)),
            "attn_ln": ln_stack(L, d),
            "w1": dense(ks[7], L, d, f),
            "b1": jnp.zeros((L, f)),
            "w2": dense(ks[8], L, f, d),
            "b2": jnp.zeros((L, d)),
            "mlp_ln": ln_stack(L, d),
        },
    }


def _ln(x, w, b, eps):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def encoder_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,  # [B, T] int32
    mask: jnp.ndarray,  # [B, T] bool
    cfg: EncoderConfig,
) -> jnp.ndarray:
    """Returns mean-pooled sentence embeddings [B, D] (f32)."""
    b, t = tokens.shape
    dt = cfg.compute_dtype
    pos = jnp.arange(t)
    x = (
        params["tok_embed"][tokens]
        + params["pos_embed"][pos][None]
        + params["type_embed"][0][None, None]
    )
    x = _ln(x, params["embed_ln"]["w"], params["embed_ln"]["b"], cfg.norm_eps)

    attn_mask = (mask[:, None, None, :]).astype(jnp.float32)  # [B,1,1,T]
    neg = jnp.float32(-1e30)
    lp = params["layers"]
    head_dim = cfg.d_model // cfg.n_heads
    for l in range(cfg.n_layers):
        xin = x.astype(dt)
        q = (xin @ lp["wq"][l].astype(dt) + lp["bq"][l].astype(dt)).reshape(
            b, t, cfg.n_heads, head_dim
        )
        k = (xin @ lp["wk"][l].astype(dt) + lp["bk"][l].astype(dt)).reshape(
            b, t, cfg.n_heads, head_dim
        )
        v = (xin @ lp["wv"][l].astype(dt) + lp["bv"][l].astype(dt)).reshape(
            b, t, cfg.n_heads, head_dim
        )
        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(head_dim) + (1.0 - attn_mask) * neg
        probs = jax.nn.softmax(scores, -1).astype(dt)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.reshape(b, t, cfg.d_model).astype(dt)
        attn = attn @ lp["wo"][l].astype(dt) + lp["bo"][l].astype(dt)
        x = _ln(
            x + attn.astype(jnp.float32),
            lp["attn_ln"]["w"][l],
            lp["attn_ln"]["b"][l],
            cfg.norm_eps,
        )
        xin = x.astype(dt)
        h = jax.nn.gelu(xin @ lp["w1"][l].astype(dt) + lp["b1"][l].astype(dt), approximate=False)
        h = h @ lp["w2"][l].astype(dt) + lp["b2"][l].astype(dt)
        x = _ln(
            x + h.astype(jnp.float32),
            lp["mlp_ln"]["w"][l],
            lp["mlp_ln"]["b"][l],
            cfg.norm_eps,
        )

    m = mask.astype(jnp.float32)[:, :, None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
