"""Prober models: small MLPs over one residual-stream vector.

Behavioral spec: /root/reference/utils.py:19-57 (= train.py:45-83).
``ImprovedProbe`` (the paper's prober): LN -> Linear(d,512) -> SiLU -> LN ->
Dropout(0.1) -> Linear(512,512) -> SiLU -> LN -> Dropout -> Linear(512,2);
1,318,914 params at d=2048 (exp_parameter_check.py:48-54). ``Probe`` is the
linear-probe ablation.

Plain-pytree functional modules (no framework state): probers are trained for
all probed (layer, site) pairs in ONE vmapped jitted step (SURVEY.md §7 step
4), so params stack along a leading prober axis and the forward is vmap-able.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

ProbeParams = Dict[str, Any]

HIDDEN_SIZE = 512
NUM_CLASSES = 2
LN_EPS = 1e-5  # torch.nn.LayerNorm default


def _linear_init(key, fan_in: int, fan_out: int):
    # torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    # weight and bias.
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _ln_init(dim: int):
    return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def _layer_norm(x: jnp.ndarray, p: ProbeParams) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["w"] + p["b"]


def init_improved_probe(
    key: jax.Array, input_size: int, output_size: int = NUM_CLASSES, hidden_size: int = HIDDEN_SIZE
) -> ProbeParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln_in": _ln_init(input_size),
        "fc1": _linear_init(k1, input_size, hidden_size),
        "ln1": _ln_init(hidden_size),
        "fc2": _linear_init(k2, hidden_size, hidden_size),
        "ln2": _ln_init(hidden_size),
        "fc3": _linear_init(k3, hidden_size, output_size),
    }


def improved_probe_forward(
    params: ProbeParams,
    x: jnp.ndarray,  # [..., input_size]
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
) -> jnp.ndarray:
    """Forward pass; pass ``dropout_rng`` only during training."""
    x = _layer_norm(x, params["ln_in"])

    x = x @ params["fc1"]["w"] + params["fc1"]["b"]
    x = jax.nn.silu(x)
    x = _layer_norm(x, params["ln1"])
    if dropout_rng is not None:
        k1, dropout_rng = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(k1, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)

    x = x @ params["fc2"]["w"] + params["fc2"]["b"]
    x = jax.nn.silu(x)
    x = _layer_norm(x, params["ln2"])
    if dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)

    return x @ params["fc3"]["w"] + params["fc3"]["b"]


def init_linear_probe(key: jax.Array, input_size: int, output_size: int = NUM_CLASSES) -> ProbeParams:
    return {"ln": _ln_init(input_size), "fc": _linear_init(key, input_size, output_size)}


def linear_probe_forward(params: ProbeParams, x: jnp.ndarray) -> jnp.ndarray:
    return _layer_norm(x, params["ln"]) @ params["fc"]["w"] + params["fc"]["b"]


def probe_param_count(params: ProbeParams) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
