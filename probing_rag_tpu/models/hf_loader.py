"""HF checkpoint -> framework param pytree.

The reference pulls weights through transformer_lens/HF from the hub
(exp_rag.py:302); in a zero-egress deployment the checkpoint directory is
provided locally. This maps HF safetensors layouts onto the layer-stacked
pytrees of models/gemma.py (Gemma/Mistral decoder families) and
models/encoder.py (BERT/Contriever).

torch linear weights are stored [out, in] and are transposed; Gemma RMSNorm
stores w with scale = (1 + w) — the same convention as models/gemma.py, so
norms pass through unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from probing_rag_tpu.models.gemma import GemmaConfig, Params


def _read_safetensors(ckpt_dir: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    for shard in sorted(Path(ckpt_dir).glob("*.safetensors")):
        with safe_open(shard, framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    if not tensors:
        raise FileNotFoundError(f"no .safetensors files under {ckpt_dir}")
    return tensors


def load_gemma_params(
    ckpt_dir: Path, cfg: GemmaConfig, dtype=np.float32
) -> Params:
    """Load a HF Gemma/Mistral-style decoder checkpoint into the stacked
    param layout of models/gemma.py."""
    t = _read_safetensors(ckpt_dir)

    def get(name: str) -> np.ndarray:
        for prefix in ("model.", ""):
            if prefix + name in t:
                return t[prefix + name]
        raise KeyError(f"missing tensor {name}; have e.g. {list(t)[:5]}")

    L = cfg.n_layers

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        mats = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats).astype(dtype)

    params: Params = {
        "embed": get("embed_tokens.weight").astype(dtype),
        "final_norm": get("norm.weight").astype(dtype),
        "layers": {
            "attn_norm": stack("layers.{}.input_layernorm.weight", transpose=False),
            "wq": stack("layers.{}.self_attn.q_proj.weight"),
            "wk": stack("layers.{}.self_attn.k_proj.weight"),
            "wv": stack("layers.{}.self_attn.v_proj.weight"),
            "wo": stack("layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": stack("layers.{}.post_attention_layernorm.weight", transpose=False),
            "w_gate": stack("layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("layers.{}.mlp.up_proj.weight"),
            "w_down": stack("layers.{}.mlp.down_proj.weight"),
        },
    }
    if not cfg.tied_head:
        # Mistral-family: separate output head, stored [V, D] at the top
        # level (no "model." prefix)
        params["lm_head"] = get("lm_head.weight").T.astype(dtype)
    v, d = params["embed"].shape
    assert v == cfg.vocab_size and d == cfg.d_model, (
        f"checkpoint geometry ({v},{d}) != config ({cfg.vocab_size},{cfg.d_model})"
    )
    return params


def load_encoder_params(ckpt_dir: Path, cfg, dtype=np.float32):
    """Load a HF BERT/Contriever checkpoint into models/encoder.py layout."""
    t = _read_safetensors(ckpt_dir)

    def get(name: str) -> np.ndarray:
        for prefix in ("bert.", ""):
            if prefix + name in t:
                return t[prefix + name]
        raise KeyError(f"missing tensor {name}")

    L = cfg.n_layers

    def stack(fmt: str, transpose: bool) -> np.ndarray:
        mats = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats).astype(dtype)

    pre = "encoder.layer.{}."
    return {
        "tok_embed": get("embeddings.word_embeddings.weight").astype(dtype),
        "pos_embed": get("embeddings.position_embeddings.weight").astype(dtype),
        "type_embed": get("embeddings.token_type_embeddings.weight").astype(dtype),
        "embed_ln": {
            "w": get("embeddings.LayerNorm.weight").astype(dtype),
            "b": get("embeddings.LayerNorm.bias").astype(dtype),
        },
        "layers": {
            "wq": stack(pre + "attention.self.query.weight", True),
            "bq": stack(pre + "attention.self.query.bias", False),
            "wk": stack(pre + "attention.self.key.weight", True),
            "bk": stack(pre + "attention.self.key.bias", False),
            "wv": stack(pre + "attention.self.value.weight", True),
            "bv": stack(pre + "attention.self.value.bias", False),
            "wo": stack(pre + "attention.output.dense.weight", True),
            "bo": stack(pre + "attention.output.dense.bias", False),
            "attn_ln": {
                "w": stack(pre + "attention.output.LayerNorm.weight", False),
                "b": stack(pre + "attention.output.LayerNorm.bias", False),
            },
            "w1": stack(pre + "intermediate.dense.weight", True),
            "b1": stack(pre + "intermediate.dense.bias", False),
            "w2": stack(pre + "output.dense.weight", True),
            "b2": stack(pre + "output.dense.bias", False),
            "mlp_ln": {
                "w": stack(pre + "output.LayerNorm.weight", False),
                "b": stack(pre + "output.LayerNorm.bias", False),
            },
        },
    }
