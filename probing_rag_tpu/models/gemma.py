"""Gemma-architecture LM in pure JAX with functional activation capture.

This replaces the reference's transformer_lens ``HookedTransformer`` stack
(exp_rag.py:302, train.py:34): instead of mutable forward hooks appending to a
Python dict (exp_rag.py:315-329), the forward *returns* the residual-stream
activations at the requested (layer, site) pairs as part of its output pytree
— jit-friendly, donation-friendly, and shardable.

Architecture (Gemma 1, google/gemma-2b):
- embeddings scaled by sqrt(d_model); tied LM head
- RMSNorm with (1 + w) scaling, pre-norm blocks
- rotary position embeddings on q/k, theta 10000
- multi-query attention (1 kv head for the 2B config), head_dim 256
- GeGLU MLP (gelu(gate) * up)

Capture sites follow transformer_lens naming (SURVEY.md C3/C7):
``resid_mid``  = residual stream after the attention branch is added,
``resid_post`` = after the MLP branch is added.

Params are a nested dict pytree with layer-stacked leaves (``[L, ...]``); the
layer loop is unrolled so that only the probed layers' activations are ever
materialized. Matmuls run in bfloat16 on the MXU with f32 accumulation; the
residual stream and norms stay f32 for parity-grade numerics.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class GemmaConfig:
    vocab_size: int = 256_000
    d_model: int = 2048
    n_layers: int = 18
    n_heads: int = 8
    n_kv_heads: int = 1
    head_dim: int = 256
    d_ff: int = 16_384
    rope_theta: float = 10_000.0
    norm_eps: float = 1e-6
    # probers read these layers (range(6, 17, 2) for gemma-2b, exp_rag.py:311)
    probe_layers: Tuple[int, ...] = (6, 8, 10, 12, 14, 16)
    compute_dtype: Any = jnp.bfloat16
    # residual-stream dtype: f32 default for parity-grade prober inputs;
    # bf16 halves activation memory for long-context prefill (decode is
    # weight-bandwidth-bound, so it does not speed the loop — measured)
    resid_dtype: Any = jnp.float32
    # ---- family semantics (Gemma defaults; Mistral/Llama flip all four) ----
    norm_plus_one: bool = True  # RMSNorm scale (1 + w) vs plain w
    mlp_activation: str = "gelu"  # GeGLU "gelu" vs SwiGLU "silu"
    scale_embeddings: bool = True  # sqrt(d_model) input-embedding scaling
    tied_head: bool = True  # LM head == embed.T vs separate params["lm_head"]
    # w8a8 prefill: when >0 and the weight is per-channel int8, matmuls whose
    # activation row count (prod of leading dims) reaches this threshold run
    # int8 x int8 on the MXU (per-row activation scales applied outside the
    # dot) — v5e doubles the MAC rate for s8 x s8, and prefill is MXU-bound
    # (PARITY.md decode forensics: ~164 TFLOP at batch 32 x 1024 tokens vs a
    # decode step already at the HBM weight-read bound). Decode (rows =
    # batch) stays below any sane threshold and keeps the exact w8a16 path.
    # With rank-1 int4 weights the same gate runs the s8 x s4 analogue
    # (w4a8 prefill): the group factor folds into the activations BEFORE
    # row quantization, so the factorization stays exact up to activation
    # rounding. 0 = disabled (default: quality-parity serving).
    act_int8_rows: int = 0
    # Chunked prefill attention: when >0 and the query length is a larger
    # multiple of it, the attention maps over query chunks of this size so
    # the f32 score/prob temporaries are bounded at [B, KV, G, chunk, S]
    # instead of [B, KV, G, T, S]. At Mistral-7B prefill shape
    # [32, 8, 4, 1024, 1174] the unchunked temporaries are 2 x 4.59 GB and
    # OOM a 16 GB chip once w8a8 perturbs XLA's remat choices (measured:
    # logs/measure_decode_mistral7b_int8a8_b32.err). Each chunk still sees
    # the FULL key row, so the softmax is mathematically identical — this
    # is memory chunking, not an online-softmax approximation. Decode
    # steps (T=1) never chunk. 0 = off.
    attn_q_chunk: int = 0
    # Chunked prefill MLP: when >0 and the token length is a larger multiple
    # of it, the block's MLP maps over token chunks of this size so the
    # [B, T, d_ff] gate/up temporaries are bounded at [B, chunk, d_ff].
    # At Mistral-7B batch-64 prefill the unchunked w8a8 MLP temporaries are
    # bf16[64,1024,14336] + f32[64,1024,4096] + s8[64,1024,14336] = 3.65 GB
    # of HLO temp next to the 4.6 GB int8 KV cache and 6.75 GB weights —
    # the measured OOM of MEASURE_r4 decode_mistral7b_int8a8_b64
    # (logs/measure_decode_mistral7b_int8a8_b64.err). Each chunk runs the
    # identical three matmuls over a token slice, so the result is
    # mathematically identical; the only cost is re-reading the MLP weights
    # once per chunk, negligible while prefill is MXU-bound. Decode steps
    # (T=1) never chunk. 0 = off.
    mlp_t_chunk: int = 0
    # Per-layer (unstacked) KV cache: the cache is a tuple of 32 per-layer
    # {"k","v",scales} dicts instead of one stacked [L, ...] tensor pair.
    # At 7B batch 64 the stacked 2.3 GB K/V carries defeat XLA's in-place
    # while_loop buffer reuse — it keeps compressed-remat DUS copies of
    # the FULL cache at peak (~4.6-6.9 GB of temps, the
    # decode_mistral7b_int8a8_b64 OOM; probed to persist under AUTO
    # layouts too — scripts/probe_auto_layout.py). Per-layer 73 MB leaves
    # bound any copy XLA makes at one layer's cache. Mirrors the
    # unstacked-weights treatment (unstack_layer_params) that fixed the
    # stacked-weight slice temps at the same scale. Semantics identical.
    kv_unstacked: bool = False

    @classmethod
    def gemma_2b(cls) -> "GemmaConfig":
        return cls()

    @classmethod
    def mistral_7b(cls) -> "GemmaConfig":
        # The reference's optional second model family (utils.py:295-297):
        # probers on layers {12,14,16,18,20,22}. Mistral semantics: plain
        # RMSNorm weights, SwiGLU (silu), unscaled embeddings, untied head.
        # v0.1's 4096-token sliding-window attention never binds at this
        # pipeline's <=2k contexts (SURVEY.md §5.7), so full causal is exact.
        return cls(
            vocab_size=32_000,
            d_model=4096,
            n_layers=32,
            n_heads=32,
            n_kv_heads=8,
            head_dim=128,
            d_ff=14_336,
            probe_layers=(12, 14, 16, 18, 20, 22),
            norm_plus_one=False,
            mlp_activation="silu",
            scale_embeddings=False,
            tied_head=False,
        )

    @classmethod
    def tiny_mistral(cls, vocab_size: int = 512) -> "GemmaConfig":
        """Scaled-down Mistral semantics (GQA, silu, untied head) for tests."""
        return cls(
            vocab_size=vocab_size,
            d_model=64,
            n_layers=4,
            n_heads=4,
            n_kv_heads=2,
            head_dim=16,
            d_ff=128,
            probe_layers=(1, 2),
            norm_plus_one=False,
            mlp_activation="silu",
            scale_embeddings=False,
            tied_head=False,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "GemmaConfig":
        """A scaled-down config with the full code path, for tests."""
        return cls(
            vocab_size=vocab_size,
            d_model=64,
            n_layers=4,
            n_heads=2,
            n_kv_heads=1,
            head_dim=32,
            d_ff=128,
            probe_layers=(1, 2),
        )


@dataclass(frozen=True)
class CaptureSpec:
    """Which residual-stream activations the forward returns.

    ``sites`` is an ordered tuple of (layer, site) pairs; the forward output's
    ``captures`` array is stacked in this order: [n_sites, batch, seq, d_model].
    """

    sites: Tuple[Tuple[int, str], ...] = ()

    @classmethod
    def for_probing(cls, cfg: GemmaConfig, position: str = "resid_post") -> "CaptureSpec":
        return cls(tuple((l, position) for l in cfg.probe_layers))

    @property
    def n_sites(self) -> int:
        return len(self.sites)


# ------------------------------------------------------------------ params


def init_params(cfg: GemmaConfig, key: jax.Array, dtype: Any = jnp.float32) -> Params:
    keys = jax.random.split(key, 9)
    d, h, kv, hd, f = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_ff
    L = cfg.n_layers

    def norm_init(*shape):
        # (1 + w) scaling: zero == identity; plain scaling: one == identity
        return (jnp.zeros if cfg.norm_plus_one else jnp.ones)(shape, dtype)

    def dense_init(key, *shape):
        fan_in = shape[-2] if len(shape) >= 2 else shape[0]
        return (jax.random.normal(key, shape, dtype) / np.sqrt(fan_in)).astype(dtype)

    params = {
        "embed": dense_init(keys[0], cfg.vocab_size, d),
        "final_norm": norm_init(d),
        "layers": {
            "attn_norm": norm_init(L, d),
            "wq": dense_init(keys[1], L, d, h * hd),
            "wk": dense_init(keys[2], L, d, kv * hd),
            "wv": dense_init(keys[3], L, d, kv * hd),
            "wo": dense_init(keys[4], L, h * hd, d),
            "mlp_norm": norm_init(L, d),
            "w_gate": dense_init(keys[5], L, d, f),
            "w_up": dense_init(keys[6], L, d, f),
            "w_down": dense_init(keys[7], L, f, d),
        },
    }
    if not cfg.tied_head:
        params["lm_head"] = dense_init(keys[8], d, cfg.vocab_size)
    return params


def init_quantized_lm_params(
    cfg: GemmaConfig,
    key: jax.Array,
    bits: int = 8,
    group_size: Optional[int] = None,
    int4_scheme: str = "grouped",
    unstacked: bool = False,
) -> Params:
    """Random init directly into the quantized serving format (int8
    per-channel, or int4 grouped / rank-1 — see ``quantize_lm_params``),
    one weight family at a time: each bf16 leaf is materialized, quantized
    (identically to ``quantize_lm_params``: same keys, same shapes, same
    rounding) and dropped before the next is built, so the peak HBM
    footprint is the quantized tree plus ONE bf16 leaf. A bf16 Mistral-7B
    tree alone (14.5 GB) overflows a single v5e chip's HBM — this is how
    the 7B decode bench gets random quantized weights on-device without a
    host round trip or a 2x-resident quantize pass."""
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if int4_scheme not in ("grouped", "rank1"):
        raise ValueError(f"int4_scheme must be 'grouped' or 'rank1', "
                         f"got {int4_scheme!r}")
    keys = jax.random.split(key, 9)
    d, h, kv, hd, f = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_ff
    L = cfg.n_layers
    dtype = jnp.bfloat16

    def norm_init(*shape):
        return (jnp.zeros if cfg.norm_plus_one else jnp.ones)(shape, dtype)

    def dense_init(key, *shape):
        fan_in = shape[-2] if len(shape) >= 2 else shape[0]
        return (jax.random.normal(key, shape, dtype) / np.sqrt(fan_in)).astype(dtype)

    @partial(jax.jit, static_argnames=("axis",))
    def quant(w, axis):  # matches quantize_lm_params.quant at nbits=8
        w32 = w.astype(jnp.float32)
        s = jnp.max(jnp.abs(w32), axis=axis, keepdims=True) / 127.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s}

    if bits == 4 and group_size is None:
        # mirror _default_group_size on the cfg geometry (same dim set)
        import math

        gcd = math.gcd(cfg.d_model, cfg.n_heads * cfg.head_dim, cfg.d_ff)
        group_size = min(128, gcd)
        while gcd % group_size:
            group_size -= 1

    def dense_quant(key, axis, *shape):
        w = dense_init(key, *shape)
        if bits == 4 and axis == -2:  # layer matmuls + untied head; the
            # embedding (axis=-1) stays per-row int8 (quantize_lm_params'
            # embed_bits default — it is quantization-sensitive)
            if shape[-2] % group_size:
                raise ValueError(f"group_size {group_size} must divide "
                                 f"reduction dim {shape[-2]}")
            out = (_quant_rank1_jit(w, group_size) if int4_scheme == "rank1"
                   else _quant_grouped_jit(w, group_size))
            jax.block_until_ready(out["qp"])
        else:
            out = quant(w, axis)
            jax.block_until_ready(out["q"])  # free the bf16 leaf first
        return out

    if unstacked:
        # per-layer trees (see unstack_layer_params): same peak-HBM
        # discipline — one bf16 leaf live at a time — with per-layer keys
        def one_layer(i: int) -> Params:
            lk = [jax.random.fold_in(keys[j], i) for j in range(8)]
            return {
                "attn_norm": norm_init(d),
                "wq": dense_quant(lk[1], -2, d, h * hd),
                "wk": dense_quant(lk[2], -2, d, kv * hd),
                "wv": dense_quant(lk[3], -2, d, kv * hd),
                "wo": dense_quant(lk[4], -2, h * hd, d),
                "mlp_norm": norm_init(d),
                "w_gate": dense_quant(lk[5], -2, d, f),
                "w_up": dense_quant(lk[6], -2, d, f),
                "w_down": dense_quant(lk[7], -2, f, d),
            }

        layers: Any = tuple(one_layer(i) for i in range(L))
    else:
        layers = {
            "attn_norm": norm_init(L, d),
            "wq": dense_quant(keys[1], -2, L, d, h * hd),
            "wk": dense_quant(keys[2], -2, L, d, kv * hd),
            "wv": dense_quant(keys[3], -2, L, d, kv * hd),
            "wo": dense_quant(keys[4], -2, L, h * hd, d),
            "mlp_norm": norm_init(L, d),
            "w_gate": dense_quant(keys[5], -2, L, d, f),
            "w_up": dense_quant(keys[6], -2, L, d, f),
            "w_down": dense_quant(keys[7], -2, L, f, d),
        }
    params: Params = {
        "embed": dense_quant(keys[0], -1, cfg.vocab_size, d),
        "final_norm": norm_init(d),
        "layers": layers,
    }
    if not cfg.tied_head:
        params["lm_head"] = dense_quant(keys[8], -2, d, cfg.vocab_size)
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# ----------------------------------------------------------------- modules


def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float, plus_one: bool = True
) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    w32 = weight.astype(jnp.float32)
    return (normed * ((1.0 + w32) if plus_one else w32)).astype(x.dtype)


# -------------------------------------------------- int8/int4 quantization

# Above this many activation rows (prod of leading dims), the grouped-int4
# matmul dequantizes the weight to a transient compute-dtype copy instead of
# running the per-group batched dot: the [rows, K, F] partial tensor would
# dominate HBM at prefill widths, while a one-off [D, F] bf16 copy is ~64 MB
# and prefill is MXU-bound anyway. Decode (rows = batch) stays far below it.
_INT4_DEQUANT_ROWS = 1024


def _pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Nibble-pack int8 values in [-8, 7] into uint8 pairs along the last
    axis: byte j holds columns (2j, 2j+1) as (lo, hi) nibbles biased by +8.

    Why packed at all: native ``jnp.int4`` arrays crash at every host->jit
    boundary on the TPU runtime in this environment — the runtime reports
    ``sub_byte_element_size_in_bits=0`` on S4 buffers while jit expects 4,
    so argument relayout recurses until a ``RecursionError: Recursively
    calling jit`` (reproduced: MEASURE_r4.jsonl decode_int4_b8 row). S4 is
    fine *inside* a compiled program, so quantized params cross the
    boundary as uint8 and are unpacked to S4 once per jitted call
    (hoisted out of the decode while_loop: the per-step HBM read stays at
    int4 width)."""
    if q.shape[-1] % 2:
        raise ValueError(f"int4 pack needs an even last dim, got {q.shape}")
    u = (q.astype(jnp.int8) + 8).astype(jnp.uint8)
    return u[..., 0::2] | (u[..., 1::2] << 4)


def _unpack_int4(qp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_pack_int4`: uint8 [..., F/2] -> int4 [..., F]."""
    lo = (qp & jnp.uint8(0xF)).astype(jnp.int8) - 8
    hi = (qp >> 4).astype(jnp.int8) - 8
    q = jnp.stack([lo, hi], axis=-1).reshape(qp.shape[:-1] + (qp.shape[-1] * 2,))
    return q.astype(jnp.int4)


def unpack_int4_params(params: Params) -> Params:
    """Rewrite boundary-format int4 leaves ``{"qp": uint8, ...}`` to the
    compute format ``{"q": int4, ...}``. Idempotent (leaves without "qp"
    pass through), cheap relative to decode (one elementwise pass over the
    weights per jitted call, loop-invariant inside ``decode_greedy``)."""

    def fix(w):
        if isinstance(w, dict) and "qp" in w:
            w = dict(w)
            w["q"] = _unpack_int4(w.pop("qp"))
        return w

    out = dict(params)
    out["embed"] = fix(out["embed"])
    if "lm_head" in out:
        out["lm_head"] = fix(out["lm_head"])
    if isinstance(out.get("layers"), dict):
        out["layers"] = {k: fix(v) for k, v in out["layers"].items()}
    elif isinstance(out.get("layers"), (list, tuple)):  # unstacked format
        out["layers"] = tuple(
            {k: fix(v) for k, v in lp.items()} for lp in out["layers"]
        )
    return out


def unstack_layer_params(params: Params) -> Params:
    """Convert the stacked layer tree (every leaf ``[L, ...]``) to the
    UNSTACKED serving format: ``params["layers"]`` becomes a tuple of L
    per-layer trees. Mathematically identical — :func:`forward`'s layer
    loop is Python-unrolled either way — but the memory behavior under jit
    differs decisively at 7B scale: with stacked weights every unrolled
    layer holds ``lax.squeeze(w[layer])`` slice temporaries that XLA hoists
    out of the decode ``while_loop`` and keeps live SIMULTANEOUSLY — a full
    extra copy of the layer weights as HLO temp (~6 GB for int8 Mistral-7B,
    and 8x worse per slice for packed-layout s4: the MEASURE_r5
    decode_mistral7b_int8a8_b64 / _int4r1a8_b32 OOMs). Unstacked, each
    layer's weights are plain jit ARGUMENTS referenced in place: zero
    slice temps. Conversion peaks at 2x the tree's bytes (old stacked +
    new slices both live) — init directly unstacked at 7B scale instead
    (``init_quantized_lm_params(..., unstacked=True)``).

    TP sharding specs and checkpoints keep the stacked layout; unstack at
    serving time.
    """
    layers = params.get("layers")
    if not isinstance(layers, dict):
        return params  # already unstacked (or no layer stack)
    n = None
    for leaf in jax.tree.leaves(layers):
        n = leaf.shape[0]
        break
    out = dict(params)
    out["layers"] = tuple(
        jax.tree.map(lambda a: a[i], layers) for i in range(n)
    )
    return out


def _layer_mapped(core, w: jnp.ndarray, group_size: int) -> Params:
    """Run a 2-D quantizer over any leading (layer-stack) dims ONE slice at
    a time. Casting a stacked 7B weight family to f32 wholesale OOMs the
    chip at quantization time (f32[32, 4096, 14336] = 7 GB HLO temp, twice
    — the MEASURE_r4 decode_mistral7b_int4r1 OOM,
    logs/measure_decode_mistral7b_int4r1_b32.err); per-layer slices are
    ~224 MB. ``lax.map`` keeps one slice's temporaries live at a time."""
    *lead, d, f = w.shape
    if not lead:
        return core(w, group_size)
    out = jax.lax.map(lambda x: core(x, group_size), w.reshape((-1, d, f)))
    return jax.tree.map(lambda a: a.reshape(tuple(lead) + a.shape[1:]), out)


def _quant_grouped_2d(w: jnp.ndarray, group_size: int) -> Params:
    w32 = w.astype(jnp.float32)
    d, f = w32.shape
    wg = w32.reshape(d // group_size, group_size, f)
    s = jnp.max(jnp.abs(wg), axis=-2, keepdims=True) / 7.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8)
    return {"qp": _pack_int4(q.reshape(d, f)), "gs": s[..., 0, :]}


@partial(jax.jit, static_argnames=("group_size",))
def _quant_grouped_jit(w: jnp.ndarray, group_size: int) -> Params:
    """Sub-channel grouped int4: one f32 scale per (``group_size`` slice of
    the reduction dim, output channel). Boundary format
    ``{"qp": uint8 [.., D, F/2], "gs": f32 [.., D/group, F]}``."""
    return _layer_mapped(_quant_grouped_2d, w, group_size)


@partial(jax.jit, static_argnames=("group_size",))
def _quant_rank1_jit(w: jnp.ndarray, group_size: int) -> Params:
    """Rank-1-factorized sub-channel int4 (the *serving-speed* int4 scheme).

    The grouped scheme's per-(group, channel) scale matrix forces the
    forward to batch the dot over groups, materializing a ``[rows, K, F]``
    partial tensor per matmul — measured to make int4 decode SLOWER than
    int8 on v5e (MEASURE_r4 decode_int4_b32 2,404 vs int8's 3,038 tok/s;
    the down-proj partials alone roughly double the int4 weight traffic).
    Here the scale matrix is constrained to rank 1: ``scale[k, f] =
    rs[k] * s[f]``. The group factor ``rs`` folds into the ACTIVATIONS
    (``x_k *= rs[k]``, a [rows, D] elementwise multiply — trivial next to
    weight traffic) and the channel factor ``s`` applies to the output,
    leaving ONE ordinary dot with the int4->dt convert fused into the
    weight load: HBM weight reads stay int4 in the decode loop, with the
    exact execution shape of the int8 path.

    Fit: max-plus alternating minimization of the per-(group, channel)
    max-abs matrix ``m`` — ``s[f] = max_k m[k,f]/rs[k]`` then ``rs[k] =
    max_f m[k,f]/s[f]``, 3 rounds. After the final ``rs`` update,
    ``rs[k]*s[f] >= m[k,f]`` everywhere, so no weight is clipped (the RTN
    half-step bound holds elementwise). Quality sits between per-channel
    int4 (rank-1 with rs == 1) and full grouped int4: per-channel outlier
    structure — the dominant structure in real LLM weights — is captured
    exactly; only independent per-(group, channel) variation is lost.

    Boundary format ``{"qp": uint8 [.., D, F/2], "rs": f32 [.., K, 1],
    "s": f32 [.., 1, F]}``.
    """
    return _layer_mapped(_quant_rank1_2d, w, group_size)


def _quant_rank1_2d(w: jnp.ndarray, group_size: int) -> Params:
    w32 = w.astype(jnp.float32)
    d, f = w32.shape
    k = d // group_size
    wg = w32.reshape(k, group_size, f)
    m = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-12)  # [K, F]
    rs = jnp.ones((k, 1), jnp.float32)
    for _ in range(3):
        s = jnp.max(m / rs, axis=-2, keepdims=True)  # [1, F]
        rs = jnp.max(m / s, axis=-1, keepdims=True)  # [K, 1]
    scale4 = rs[..., None] * s[..., None, :, :]  # [K, 1, F] >= m
    q = jnp.clip(jnp.round(wg / scale4), -7, 7).astype(jnp.int8)
    return {"qp": _pack_int4(q.reshape(d, f)), "rs": rs, "s": s}


def _default_group_size(params: Params, cap: int = 128) -> int:
    """Largest group <= ``cap`` dividing EVERY grouped reduction dim: d_model
    (wq/w_gate/w_up and a tied or untied head), n_heads*head_dim (wo), and
    d_ff (w_down). Tiny test configs (d_model 64) and odd head counts get a
    valid group automatically instead of a trace-time divisibility error."""
    import math

    dims = [params["layers"][n].shape[-2] for n in ("wq", "wo", "w_down")]
    if "lm_head" in params:
        dims.append(params["lm_head"].shape[-2])
    gcd = math.gcd(*dims)
    g = min(cap, gcd)
    while gcd % g:  # a divisor of the gcd divides every dim
        g -= 1
    return g


def quantize_lm_params(
    params: Params,
    bits: int = 8,
    group_size: Optional[int] = None,
    embed_bits: Optional[int] = None,
    int4_scheme: str = "grouped",
) -> Params:
    """Symmetric quantization of the seven matmul weight families plus the
    embedding table (the HBM-bandwidth payload of the decode loop).

    ``bits=8`` (default): per-output-channel int8. Each quantized leaf
    becomes ``{"q": int8, "s": f32}`` with the scale on the *output
    channel*, so the forward computes ``(x @ q) * s`` — exactly
    ``x @ (q * s)`` — and the dequant is a unary convert XLA fuses into the
    matmul's weight load: HBM reads stay int8. The embedding scale is per
    vocab row, which serves both the lookup (row dequant) and the tied head
    (per-logit column scale).

    ``bits=4``: the layer matmul families switch to *sub-channel* int4 —
    boundary format ``{"qp": uint8 [D, F/2] nibble-packed, "gs": f32
    [D/group_size, F]}`` (unpacked to ``{"q": int4 [D, F]}`` inside each
    jitted call by :func:`unpack_int4_params`; native S4 host->jit args
    crash this environment's TPU runtime — see :func:`_pack_int4`) with
    one scale per
    ``group_size`` slice of the reduction dim (the standard w4a16 recipe;
    per-channel int4 is too coarse for real weights). The forward keeps the
    scales OUTSIDE the dot by splitting the reduction into a batched dot
    over groups (``sum_k gs[k] * (x_k @ q_k)``), so HBM weight reads stay
    int4 inside the decode loop (no hoistable dequantized copy exists —
    the failure mode PARITY.md documents for pre-``logits_last_only``
    int8). The embedding table defaults to per-ROW int8 (it is
    quantization-sensitive, and the tied-head trick needs a channel-wise
    scale, not sub-channel groups); pass ``embed_bits=4`` to push it to
    per-row int4 for the full bandwidth win. An untied ``lm_head`` is
    grouped int4 like the layer weights. Scale overhead at group 128 is
    ~6% of the int4 payload.

    ``int4_scheme`` (bits=4 only): ``"grouped"`` (default — the full
    per-(group, channel) scale matrix; highest quality, but the decode
    matmul must batch over groups and measures SLOWER than int8 on v5e)
    or ``"rank1"`` (``scale[k,f] = rs[k]*s[f]`` with the group factor
    folded into the activations — ONE fused-convert dot, true int4 HBM
    reads in the decode loop; see :func:`_quant_rank1_jit`).

    ``group_size=None`` (default) picks the largest group <= 128 that
    divides every grouped reduction dim of THIS param tree (tiny test
    configs get a valid group automatically).
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if int4_scheme not in ("grouped", "rank1"):
        raise ValueError(f"int4_scheme must be 'grouped' or 'rank1', "
                         f"got {int4_scheme!r}")
    embed_bits = 8 if embed_bits is None else embed_bits
    if bits == 8 and embed_bits != 8:
        raise ValueError("embed_bits only applies to bits=4")
    if embed_bits not in (8, 4):
        raise ValueError(f"embed_bits must be 8 or 4, got {embed_bits}")
    if group_size is None:
        group_size = _default_group_size(params)

    def quant(w, axis, nbits):
        # device-side (jnp) so a 2.5B-param model quantizes without a
        # host round trip; jitted per unique shape
        qmax = (1 << (nbits - 1)) - 1
        qdt = jnp.int8 if nbits == 8 else jnp.int4

        @jax.jit
        def _q(w):
            w32 = w.astype(jnp.float32)
            s = jnp.max(jnp.abs(w32), axis=axis, keepdims=True) / qmax
            s = jnp.where(s == 0.0, 1.0, s)
            q = jnp.clip(jnp.round(w32 / s), -qmax, qmax).astype(jnp.int8)
            if nbits == 4:  # boundary format: nibble-packed (see _pack_int4)
                return {"qp": _pack_int4(q), "s": s}
            return {"q": q.astype(qdt), "s": s}

        return _q(jnp.asarray(w))

    def quant_grouped(w):
        # [.., D, F] with sub-channel scales along axis -2: the full
        # per-(group, channel) matrix or its rank-1 factorization
        w = jnp.asarray(w)
        if w.shape[-2] % group_size:
            raise ValueError(
                f"group_size {group_size} must divide reduction dim "
                f"{w.shape[-2]}")
        if int4_scheme == "rank1":
            return _quant_rank1_jit(w, group_size)
        return _quant_grouped_jit(w, group_size)

    out = dict(params)
    # [V, D], scale [V, 1]: per-row serves lookup AND tied head
    out["embed"] = quant(params["embed"], -1, embed_bits)
    if "lm_head" in params:
        if bits == 4:
            out["lm_head"] = quant_grouped(params["lm_head"])  # [D, V]
        else:
            out["lm_head"] = quant(params["lm_head"], -2, 8)  # scale [1, V]
    out["layers"] = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        if bits == 4:
            out["layers"][name] = quant_grouped(params["layers"][name])
        else:
            out["layers"][name] = quant(params["layers"][name], -2, 8)
    return out


def _quant_acts(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 activation quantization: [..., D] ->
    (int8 values, f32 scales [..., 1]). The row max is computed in f32 so a
    bf16 activation spike does not overflow the scale."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _mm(x: jnp.ndarray, w, dt, act8_rows: int = 0) -> jnp.ndarray:
    """x @ w with transparent int8 support: the int8->compute-dtype convert
    is fused into the matmul's weight load; the per-output-column scale is a
    cheap elementwise multiply on the (much smaller) activation output.

    ``act8_rows`` (from ``GemmaConfig.act_int8_rows``): above this many
    activation rows a per-channel-int8 weight runs the w8a8 path — the
    activations are quantized per row and the dot runs s8 x s8 -> s32 on
    the MXU at 2x the bf16 MAC rate; both scales (per-row activation,
    per-output-channel weight) are rank-1 and applied outside the dot, so
    the factorization is exact up to the activation rounding. Prefill
    (rows = B*T) crosses the threshold; decode (rows = B) never does, so
    the weight-bandwidth-bound loop keeps the drift-free w8a16 form.

    (A Pallas variant lives in ops/pallas_matmul.py; measured 2-10x off the
    weight-bandwidth bound at decode shapes on v5e, so the fused-convert XLA
    form stays the production path. The batch-32 int8 HBM blow-up is solved
    by ``logits_last_only`` instead — see forward.)

    Grouped-int4 leaves ({"q", "gs"}) keep the per-group scales outside the
    dot by batching over groups: ``out = sum_k gs[k] * (x[.., k, :] @
    q[k])``. The int4->dt convert fuses into each group dot's weight load,
    and no full dequantized weight tensor exists for XLA to hoist out of
    the decode while_loop. Past ``_INT4_DEQUANT_ROWS`` activation rows
    (prefill / training capture — MXU-bound, not weight-bound) the [rows,
    K, F] partials would outweigh a transient [D, F] copy, so the weight is
    dequantized in compute dtype instead."""
    if isinstance(w, dict):
        if "rs" in w:  # rank-1 int4: q [D, F], rs [K, 1], s [1, F]
            # the group scale folds into the activations (rows x D
            # elementwise — trivial next to weight traffic) and the
            # channel scale into the output, so this is ONE dot with the
            # int4->dt convert fused into the weight load: HBM weight
            # reads stay int4 at every row count, decode and prefill
            # alike (no [rows, K, F] partials, nothing to hoist).
            q, rs, s = w["q"], w["rs"], w["s"]
            d, f = q.shape
            k = rs.shape[0]
            g = d // k
            xs32 = (
                x.astype(jnp.float32).reshape(x.shape[:-1] + (k, g)) * rs
            ).reshape(x.shape)
            rows = int(np.prod(x.shape[:-1]))
            if act8_rows and rows >= act8_rows:
                # w4a8 prefill: per-row int8 activations x int4 weights on
                # the MXU (s8 x s4 -> s32), both rank-1 scale factors
                # outside the dot — the rank-1 analogue of the w8a8 path
                # below; decode steps (rows = batch) never cross the gate
                xq, xsc = _quant_acts(xs32)
                out = jax.lax.dot_general(
                    xq, q,
                    (((xq.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return (
                    out.astype(jnp.float32) * xsc * s.astype(jnp.float32)
                ).astype(dt)
            return (xs32.astype(dt) @ q.astype(dt)) * s.astype(dt)
        if "gs" in w:  # grouped int4: q [D, F], gs [K, F], K = D / group
            q, gs = w["q"], w["gs"]
            d, f = q.shape
            k = gs.shape[0]
            g = d // k
            rows = int(np.prod(x.shape[:-1]))
            if rows > _INT4_DEQUANT_ROWS:
                wd = (q.reshape(k, g, f).astype(dt) * gs[:, None, :].astype(dt))
                return x @ wd.reshape(d, f)
            xg = x.reshape(x.shape[:-1] + (k, g))
            part = jnp.einsum("...kg,kgf->...kf", xg, q.reshape(k, g, f).astype(dt))
            return jnp.einsum(
                "...kf,kf->...f", part.astype(jnp.float32), gs).astype(dt)
        rows = int(np.prod(x.shape[:-1]))
        if act8_rows and rows >= act8_rows:
            xq, xs = _quant_acts(x)
            out = jax.lax.dot_general(
                xq, w["q"],
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                out.astype(jnp.float32) * xs * w["s"].astype(jnp.float32)
            ).astype(dt)
        return (x @ w["q"].astype(dt)) * w["s"].astype(dt)
    return x @ w.astype(dt)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding. x: [B, T, n, head_dim], positions: [B, T]."""
    hd = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, hd // 2, dtype=jnp.float32) / (hd // 2))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, hd/2]
    cos = jnp.cos(angles)[..., None, :]
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _attn_core(
    q: jnp.ndarray,  # [B, T, KV, G, hd]
    k: jnp.ndarray,  # [B, S, KV, hd] (kv_major=False) | [B, KV, S, hd] (True)
    v: jnp.ndarray,  # same layout as k
    mask: jnp.ndarray,  # [B, 1, T, S] bool (True = attend)
    return_probs: bool,
    kv_major: bool = False,
):
    """kv_major is the KV cache's attention-native layout ([B, KV, S, hd]):
    row-major order of that logical shape IS the layout XLA picks for the
    cache inside the decode while_loop, so feeding it end to end removes
    the 2.3 GB-per-tensor relayout copies XLA otherwise inserts at the
    loop boundary (the 7B batch-64 OOM —
    logs/measure_decode_mistral7b_int8a8_b64.err). The einsum subscripts
    absorb the layout difference; no physical transpose either way."""
    b, t, kv, groups, hd = q.shape
    k_sub = "bksh" if kv_major else "bskh"
    scores = jnp.einsum(
        f"btkgh,{k_sub}->bkgts", q, k, preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(hd)
    scores = jnp.where(mask[:, :, None], scores, -1e30)  # mask: [B,1,T,S]->[B,1,1,T,S]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        f"bkgts,{k_sub}->btkgh", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(b, t, kv * groups * hd)
    if return_probs:
        return out, probs.reshape(b, kv * groups, t, -1)  # [B, H, T, S]
    return out, None


def _attention(
    q: jnp.ndarray,  # [B, T, H, hd]
    k: jnp.ndarray,  # [B, S, KV, hd] (kv_major=False) | [B, KV, S, hd] (True)
    v: jnp.ndarray,  # same layout as k
    mask: jnp.ndarray,  # [B, 1, T, S] bool (True = attend)
    return_probs: bool = False,
    q_chunk: int = 0,
    kv_major: bool = False,
):
    b, t, h, hd = q.shape
    kv = k.shape[1] if kv_major else k.shape[2]
    groups = h // kv
    q = q.reshape(b, t, kv, groups, hd)
    if q_chunk and not return_probs and t > q_chunk and t % q_chunk == 0:
        # map over query chunks: bounds the f32 score/prob temporaries at
        # chunk/T of the full size (see GemmaConfig.attn_q_chunk). Every
        # chunk attends over the FULL key row — mathematically identical
        # to the unchunked softmax, not an online-softmax approximation.
        nc = t // q_chunk
        qc = jnp.moveaxis(q.reshape(b, nc, q_chunk, kv, groups, hd), 1, 0)
        mc = jnp.moveaxis(mask.reshape(b, 1, nc, q_chunk, -1), 2, 0)

        def one(args):
            qq, mm = args
            return _attn_core(qq, k, v, mm, False, kv_major)[0]  # [B, q_chunk, H*hd]

        out = jax.lax.map(one, (qc, mc))
        return jnp.moveaxis(out, 0, 1).reshape(b, t, h * hd), None
    return _attn_core(q, k, v, mask, return_probs, kv_major)


def _block(
    lp: Params,  # this layer's params (leaves without the L axis)
    x: jnp.ndarray,  # [B, T, D] f32 residual stream
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: GemmaConfig,
    cache: Optional[Tuple],  # (ck [L,B,KV,S,hd], cv, ks, vs, layer, pos) | None
    return_attn_probs: bool = False,
):
    """One transformer block. Returns (resid_mid, resid_post, (ck, cv), probs).

    With ``cache``, the new tokens' K/V are written into the layer's slice of
    the STACKED cache arrays via a tiny dynamic_update_slice (aliasable
    in-place inside the decode loop) and attention reads the updated slice.
    The previous design DUS'd a per-layer copy and ``jnp.stack``-ed 18 layers
    back together every step — two full-cache copies per token, which
    dominated batch-32 decode (measured: 1,690 -> see PARITY.md)."""
    b, t, d = x.shape
    dt = cfg.compute_dtype
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    a8 = cfg.act_int8_rows
    attn_in = rms_norm(x, lp["attn_norm"], cfg.norm_eps, cfg.norm_plus_one).astype(dt)
    q = _mm(attn_in, lp["wq"], dt, a8).reshape(b, t, h, hd)
    k = _mm(attn_in, lp["wk"], dt, a8).reshape(b, t, kvh, hd)
    v = _mm(attn_in, lp["wv"], dt, a8).reshape(b, t, kvh, hd)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)

    ck = cv = ks = vs = None
    kv_major = cache is not None
    if cache is not None:
        # the cache is attention-native [L, B, KV, S, hd] (kv_major) —
        # or per-layer [B, KV, S, hd] when layer is None (kv_unstacked).
        # New tokens' K/V swap to [B, KV, T, hd] (T is 1 at decode; at
        # prefill the swap fuses into the quant/convert).
        ck, cv, ks, vs, layer, cache_pos = cache
        k_n = jnp.swapaxes(k, 1, 2)
        v_n = jnp.swapaxes(v, 1, 2)
        if layer is not None:  # stacked [L, ...] cache: index the L axis
            kv_at = (layer, 0, 0, cache_pos, 0)
            sc_at = (layer, 0, 0, cache_pos)
            sc4_at = (layer, 0, 0, cache_pos)  # int4 scales: [L,B,KV*G,S]
            expand = lambda u: u[None]
            read = lambda buf: buf[layer]
        else:  # per-layer cache: the arrays ARE this layer's slice
            kv_at = (0, 0, cache_pos, 0)
            sc_at = (0, 0, cache_pos)
            sc4_at = (0, 0, cache_pos)
            expand = lambda u: u
            read = lambda buf: buf
        if ck.dtype == jnp.int4:
            # int4 KV: sub-channel group scales (see _quant_kv4); the
            # unpack + scale multiply fuses into the attention einsum's
            # cache read, so HBM cache reads stay 4-bit
            qk, sk = _quant_kv4(k_n)  # sk [B, KV, T, G]
            qv, sv = _quant_kv4(v_n)
            ck = jax.lax.dynamic_update_slice(ck, expand(qk), kv_at)
            cv = jax.lax.dynamic_update_slice(cv, expand(qv), kv_at)

            def merge_kvg(u):  # [B, KV, T, G] -> [B, KV*G, T]
                bm, kvm, tm, gm = u.shape
                return jnp.swapaxes(u, -1, -2).reshape(bm, kvm * gm, tm)

            ks = jax.lax.dynamic_update_slice(ks, expand(merge_kvg(sk)), sc4_at)
            vs = jax.lax.dynamic_update_slice(vs, expand(merge_kvg(sv)), sc4_at)
            k = _dequant_kv4(read(ck), read(ks), dt)
            v = _dequant_kv4(read(cv), read(vs), dt)
        elif ck.dtype == jnp.int8:
            qk, sk = _quant_kv(k_n)  # scales [B, KV, T, 1]
            qv, sv = _quant_kv(v_n)
            ck = jax.lax.dynamic_update_slice(ck, expand(qk), kv_at)
            cv = jax.lax.dynamic_update_slice(cv, expand(qv), kv_at)
            # scales live without the trailing singleton: a minormost
            # size-1 dim costs 16x tile padding (1.07 GB of pad at 7B
            # b64, measured in the OOM dump)
            ks = jax.lax.dynamic_update_slice(ks, expand(sk[..., 0]), sc_at)
            vs = jax.lax.dynamic_update_slice(vs, expand(sv[..., 0]), sc_at)
            # dequant (convert + broadcast multiply) fuses into the
            # attention einsum's cache read: HBM reads stay int8
            k = read(ck).astype(dt) * read(ks)[..., None].astype(dt)
            v = read(cv).astype(dt) * read(vs)[..., None].astype(dt)
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, expand(k_n).astype(ck.dtype), kv_at)
            cv = jax.lax.dynamic_update_slice(
                cv, expand(v_n).astype(cv.dtype), kv_at)
            k = read(ck)
            v = read(cv)

    attn, probs = _attention(
        q, k.astype(dt), v.astype(dt), mask, return_attn_probs,
        q_chunk=cfg.attn_q_chunk, kv_major=kv_major)
    del k, v
    attn_out = _mm(attn.astype(dt), lp["wo"], dt, a8).astype(cfg.resid_dtype)
    resid_mid = x + attn_out

    act = (
        (lambda g: jax.nn.gelu(g, approximate=True))
        if cfg.mlp_activation == "gelu"
        else jax.nn.silu
    )

    def mlp(x_res):
        # the pre-MLP norm lives INSIDE the (possibly chunked) function:
        # rms_norm is per-token, so chunking it is exact, and keeping it
        # outside materializes full-size [B, T, D] f32+bf16 temps (1.5 GB
        # at 7B b64 — part of the MEASURE_r5 decode_mistral7b_int8a8_b64
        # OOM) that the chunked map exists to avoid.
        x_in = rms_norm(
            x_res, lp["mlp_norm"], cfg.norm_eps, cfg.norm_plus_one
        ).astype(dt)
        g = act(_mm(x_in, lp["w_gate"], dt, a8))
        u = _mm(x_in, lp["w_up"], dt, a8)
        return _mm(g * u, lp["w_down"], dt, a8)

    mc = cfg.mlp_t_chunk
    if mc and t > mc and t % mc == 0:
        # map over token chunks: bounds the [B, T, d_ff] gate/up
        # temporaries at chunk/T of the full size (see
        # GemmaConfig.mlp_t_chunk). Chunks of B*mc rows stay far above any
        # act_int8_rows threshold, so the w8a8/w4a8 prefill gating is
        # unchanged.
        nc = t // mc
        chunks = jnp.moveaxis(resid_mid.reshape(b, nc, mc, d), 1, 0)
        mlp_out = jnp.moveaxis(jax.lax.map(mlp, chunks), 0, 1)
        mlp_out = mlp_out.reshape(b, t, d).astype(cfg.resid_dtype)
    else:
        mlp_out = mlp(resid_mid).astype(cfg.resid_dtype)
    resid_post = resid_mid + mlp_out
    return resid_mid, resid_post, (ck, cv, ks, vs), probs


def forward(
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32
    cfg: GemmaConfig,
    *,
    capture: CaptureSpec = CaptureSpec(),
    kv_cache: Optional[Params] = None,  # {"k": [L,B,KV,S,hd], "v": ..., "pos": int32}
    positions: Optional[jnp.ndarray] = None,  # [B, T] RoPE positions
    attn_valid: Optional[jnp.ndarray] = None,  # no-cache: [B,T]; cache: [B,S] slot validity
    attn_probs_layer: Optional[int] = None,  # also return this layer's attn probs
    logits_last_only: bool = False,  # head only on the final position
):
    """LM forward. Returns (logits [B,T,V], new_kv_cache | None,
    captures [n_sites, B, T, D] f32 | None).

    With ``kv_cache``, ``tokens`` are the T new tokens appended at buffer
    offset ``kv_cache['pos']`` and attention spans the cache prefix plus the
    new tokens (causal within the new block). For left-padded prompts, pass
    per-row RoPE ``positions`` (pad slots excluded from the count) and mark
    pad slots invalid in ``attn_valid`` — masking always uses buffer indices,
    rotation uses ``positions``.
    """
    params = unpack_int4_params(params)  # no-op unless boundary-format int4
    b, t = tokens.shape
    emb = params["embed"]
    if isinstance(emb, dict):  # int8: row dequant at lookup (tiny)
        x = emb["q"][tokens].astype(cfg.resid_dtype) * emb["s"][tokens]
    else:
        x = emb[tokens].astype(cfg.resid_dtype)
    if cfg.scale_embeddings:
        x = x * np.sqrt(cfg.d_model)

    kv_unstacked = kv_cache is not None and "layers" in kv_cache
    if kv_cache is not None:
        base = kv_cache["pos"]
        s = (kv_cache["layers"][0]["k"].shape[2] if kv_unstacked
             else kv_cache["k"].shape[3])
        buf_idx = base + jnp.arange(t, dtype=jnp.int32)[None, :]  # [1, T]
        if positions is None:
            positions = jnp.broadcast_to(buf_idx, (b, t))
        key_pos = jnp.arange(s, dtype=jnp.int32)
        mask = key_pos[None, None, :] <= buf_idx[:, :, None]  # [B|1, T, S]
        mask = jnp.broadcast_to(mask, (b, t, s))
        if attn_valid is not None:
            mask = mask & attn_valid[:, None, :]
    else:
        positions = (
            jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
            if positions is None
            else positions
        )
        mask = positions[:, :, None] >= positions[:, None, :]  # causal
        if attn_valid is not None:
            mask = mask & attn_valid[:, None, :]
    mask = mask[:, None]  # [B, 1, T, S]

    want = {}
    for i, (layer, site) in enumerate(capture.sites):
        want.setdefault(layer, []).append((i, site))

    caps = [None] * capture.n_sites
    attn_probs = None
    if kv_unstacked:
        kv_layers = list(kv_cache["layers"])
        ck = cv = ks = vs = None
    else:
        ck = kv_cache["k"] if kv_cache is not None else None
        cv = kv_cache["v"] if kv_cache is not None else None
        ks = kv_cache.get("k_scale") if kv_cache is not None else None
        vs = kv_cache.get("v_scale") if kv_cache is not None else None
    lp_all = params["layers"]
    lp_unstacked = isinstance(lp_all, (list, tuple))
    for layer in range(cfg.n_layers):
        # unstacked trees index a per-layer subtree (plain jit arguments,
        # no temps); stacked trees slice every leaf — see
        # unstack_layer_params for why the distinction matters at 7B
        lp = (lp_all[layer] if lp_unstacked
              else jax.tree.map(lambda a: a[layer], lp_all))
        cache = None
        if kv_unstacked:
            lkv = kv_layers[layer]
            cache = (lkv["k"], lkv["v"], lkv.get("k_scale"),
                     lkv.get("v_scale"), None, kv_cache["pos"])
        elif kv_cache is not None:
            cache = (ck, cv, ks, vs, layer, kv_cache["pos"])
        resid_mid, resid_post, (ck2, cv2, ks2, vs2), probs = _block(
            lp, x, positions, mask, cfg, cache,
            return_attn_probs=(attn_probs_layer is not None
                               and layer == attn_probs_layer % cfg.n_layers),
        )
        if kv_unstacked:
            nl = {"k": ck2, "v": cv2}
            if ks2 is not None:
                nl["k_scale"] = ks2
                nl["v_scale"] = vs2
            kv_layers[layer] = nl
        elif kv_cache is not None:
            ck, cv, ks, vs = ck2, cv2, ks2, vs2
        if probs is not None:
            attn_probs = probs
        for i, site in want.get(layer, ()):
            caps[i] = resid_mid if site == "resid_mid" else resid_post
        x = resid_post

    if logits_last_only:
        # decode prefill only consumes logits[:, -1]: slicing the hidden
        # state BEFORE the head saves the [B, T, vocab] logits tensor
        # (15.6 GB at batch 32 for Gemma's 256k vocab — an HBM OOM on the
        # quantized path, and ~20% of prefill FLOPs on any path)
        x = x[:, -1:, :]
    x = rms_norm(x, params["final_norm"], cfg.norm_eps, cfg.norm_plus_one)
    dt = cfg.compute_dtype
    if cfg.tied_head:
        if isinstance(emb, dict):
            # per-row embed scale becomes a per-logit column scale
            logits = (x.astype(dt) @ emb["q"].astype(dt).T) * emb["s"].astype(dt).T
        else:
            logits = x.astype(dt) @ emb.astype(dt).T
    else:
        logits = _mm(x.astype(dt), params["lm_head"], dt, cfg.act_int8_rows)
    logits = logits.astype(jnp.float32)

    new_cache = None
    if kv_unstacked:
        new_cache = {"layers": tuple(kv_layers), "pos": kv_cache["pos"] + t}
    elif kv_cache is not None:
        new_cache = {"k": ck, "v": cv, "pos": kv_cache["pos"] + t}
        if ks is not None:
            new_cache["k_scale"] = ks
            new_cache["v_scale"] = vs
    captures = jnp.stack(caps) if caps else None
    if attn_probs_layer is not None:
        return logits, new_cache, captures, attn_probs
    return logits, new_cache, captures


def init_kv_cache(cfg: GemmaConfig, batch: int, max_len: int, dtype: Any = jnp.bfloat16) -> Params:
    """KV cache, attention-native layout [L, B, KV, S, hd]. Row-major order
    of this logical shape is the physical layout XLA chooses for the cache
    inside the decode while_loop (it relayouted the previous [L, B, S, KV,
    hd] shape into exactly this order and held compressed+uncompressed
    copies across the prefill boundary — the 7B batch-64 OOM,
    logs/measure_decode_mistral7b_int8a8_b64.err), so storing it this way
    end to end removes those copies on both the fused and split paths.

    ``dtype=jnp.int8`` stores K/V quantized per (token, kv-head) with f32
    scales alongside — halves the decode step's KV HBM traffic; the
    dequant (convert + broadcast multiply) fuses into the attention
    einsum's cache read so HBM reads stay int8. Scales are [L, B, KV, S]
    (no trailing singleton: a minormost size-1 dim costs 16x tile
    padding — 1.07 GB of pure pad per scale tensor at 7B b64).

    ``dtype=jnp.int4`` quarters the cache: per (token, kv-head,
    32-lane-group) sub-channel scales (``_quant_kv4``), stored
    [L, B, KV*G, S] — S minormost with the (KV, G) axes merged so the
    second-minor dim is 32 (Mistral GQA) / 8 (Gemma MQA): f32 (8, 128)
    tiles pad a lone G of 4 to 8 (2x, ~0.7 GB at 7B b64) and a minormost
    G 16-32x. The 7B batch-64 w8a8 recipe needs it:
    the int8 cache leaves 16.15 G > 15.75 G HBM even on the split +
    per-layer path (ROUND5_NOTES §10); int4 shrinks cache + XLA's
    one-copy while-loop floor by 2x together."""
    g = cfg.head_dim // _kv4_group(cfg.head_dim)

    def zeros_kv(shp):
        # int4 via an int8 convert: an eager S4 jnp.zeros trips a
        # RecursionError in this runtime's scalar-constant path (same
        # class of S4-boundary fragility as gemma._pack_int4's note)
        if dtype == jnp.int4:
            return jnp.zeros(shp, jnp.int8).astype(jnp.int4)
        return jnp.zeros(shp, dtype)

    if cfg.kv_unstacked:
        lshape = (batch, cfg.n_kv_heads, max_len, cfg.head_dim)

        def one_layer():
            d = {"k": zeros_kv(lshape), "v": zeros_kv(lshape)}
            if dtype == jnp.int8:
                d["k_scale"] = jnp.zeros(lshape[:-1], jnp.float32)
                d["v_scale"] = jnp.zeros(lshape[:-1], jnp.float32)
            elif dtype == jnp.int4:
                sshape = (batch, cfg.n_kv_heads * g, max_len)
                d["k_scale"] = jnp.zeros(sshape, jnp.float32)
                d["v_scale"] = jnp.zeros(sshape, jnp.float32)
            return d

        return {
            "layers": tuple(one_layer() for _ in range(cfg.n_layers)),
            "pos": jnp.asarray(0, jnp.int32),
        }
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, cfg.head_dim)
    cache = {
        "k": zeros_kv(shape),
        "v": zeros_kv(shape),
        "pos": jnp.asarray(0, jnp.int32),
    }
    if dtype == jnp.int8:
        cache["k_scale"] = jnp.zeros(shape[:-1], jnp.float32)
        cache["v_scale"] = jnp.zeros(shape[:-1], jnp.float32)
    elif dtype == jnp.int4:
        sshape = (cfg.n_layers, batch, cfg.n_kv_heads * g, max_len)
        cache["k_scale"] = jnp.zeros(sshape, jnp.float32)
        cache["v_scale"] = jnp.zeros(sshape, jnp.float32)
    return cache


def _quant_kv(x: jnp.ndarray):
    """[..., hd] -> (int8 values, f32 scales [..., 1]); scale per hd row."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


# Sub-channel group width for the int4 KV cache: one scale per 32 head-dim
# lanes (per token, per kv-head). 32 divides every production head_dim
# (Gemma 256, Mistral 128); smaller heads fall back to one group per head.
KV4_GROUP = 32


def _kv4_group(head_dim: int) -> int:
    return KV4_GROUP if head_dim % KV4_GROUP == 0 else head_dim


def _quant_kv4(x: jnp.ndarray):
    """[..., hd] -> (int4 values [..., hd], f32 scales [..., G]); one
    symmetric max-abs scale per ``_kv4_group`` slice of the head dim (the
    sub-channel scheme int4 weights use — a single per-head scale at 4 bits
    loses the small-magnitude lanes entirely)."""
    hd = x.shape[-1]
    g = _kv4_group(hd)
    xg = x.astype(jnp.float32).reshape(x.shape[:-1] + (hd // g, g))
    s = jnp.max(jnp.abs(xg), axis=-1) / 7.0  # [..., G]
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(xg / s[..., None]), -7, 7)
    return q.reshape(x.shape).astype(jnp.int4), s


def _dequant_kv4(q: jnp.ndarray, s_m: jnp.ndarray, dt) -> jnp.ndarray:
    """q [..., KV, S, hd] int4, s_m [..., KV*G, S] f32 -> [..., KV, S, hd]
    in dt. The scale store merges the (KV, G) axes so the second-minor dim
    is KV*G (32 at Mistral GQA, 8 at Gemma MQA) — an f32 (8, 128) tile
    pads a second-minor G of 4 to 8 (2x, ~0.7 GB at 7B b64) and a
    minormost G would pad 16-32x; merged, the store is tile-exact."""
    hd = q.shape[-1]
    g = _kv4_group(hd)
    ng = hd // g
    kv, s_len = q.shape[-3], q.shape[-2]
    s = s_m.reshape(s_m.shape[:-2] + (kv, ng, s_len))
    s = jnp.swapaxes(s, -1, -2)[..., None]  # [..., KV, S, G, 1]
    xg = q.reshape(q.shape[:-1] + (ng, g)).astype(dt) * s.astype(dt)
    return xg.reshape(q.shape)
