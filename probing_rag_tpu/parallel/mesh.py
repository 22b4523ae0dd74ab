"""Device mesh + sharding layouts.

The reference is single-device (SURVEY.md §2.2: no torch.distributed, no
NCCL, no parallelism of any kind); this module is the TPU-native scaling
design it lacks (SURVEY.md §5.8):

- mesh axes: ``dp`` (queries / batch data-parallel) x ``tp`` (LM tensor
  parallel over ICI). Retrieval indexes shard their *row* dimension over the
  whole mesh (``dp`` x ``tp`` flattened) — k is tiny, so the merge is one
  small all_gather.
- LM TP layout: attention heads and MLP hidden dim sharded over ``tp``
  (Megatron-style column/row split: wq/wk/wv + w_gate/w_up column-sharded,
  wo + w_down row-sharded), embeddings vocab-sharded. XLA GSPMD inserts the
  psum at the block boundary.

No pipeline/expert parallelism: an 18-layer 2B dense decoder has nothing to
pipeline at these scales and no MoE layers (documented design decision).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probing_rag_tpu.models.gemma import GemmaConfig, Params


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        tp = 1
        while tp * 2 <= min(4, n // 2) and n % (tp * 2) == 0:
            tp *= 2
        shape = (n // tp, tp)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def lm_param_shardings(params: Params, mesh: Mesh) -> Params:
    """NamedSharding pytree for the Gemma param layout (models/gemma.py)."""
    rules = {
        "embed": P("tp", None),  # vocab-sharded; logits psum over tp? no —
        # embed is used twice: input lookup (gather over vocab rows) and
        # output head (contraction over d_model). Vocab-sharding keeps both
        # memory-flat; XLA re-shards as needed.
        "final_norm": P(),
        "attn_norm": P(),
        "mlp_norm": P(),
        "wq": P(None, None, "tp"),  # [L, D, H*hd] column split over heads
        # MQA k/v projections are a single head (tiny) — replicate rather
        # than splitting head_dim across tp.
        "wk": P(),
        "wv": P(),
        "wo": P(None, "tp", None),  # [L, H*hd, D] row split
        "w_gate": P(None, None, "tp"),  # [L, D, F]
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),  # [L, F, D]
        "lm_head": P(None, "tp"),  # [D, V] vocab-sharded (untied-head families)
    }

    def spec_for(path, leaf) -> P:
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("q", "qp", "s", "gs", "rs"):  # quantized leaf: inherit the weight's rule
            name = str(getattr(path[-2], "key", path[-2]))
        spec = rules.get(name, P())
        # scale tensors keep a size-1 axis where the weight has its input
        # dim; drop shardings that don't divide the actual leaf shape
        axes = tuple(
            a if a is None or leaf.shape[i] % mesh.shape[a] == 0 else None
            for i, a in enumerate(spec)
        ) if len(spec) == len(leaf.shape) else (None,) * len(leaf.shape)
        return P(*axes)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def shard_lm_params(params: Params, mesh: Mesh) -> Params:
    """Place LM params on the mesh with the TP layout."""
    shardings = lm_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def mqa_safe_tp(cfg: GemmaConfig, mesh: Mesh) -> bool:
    """MQA (1 kv head) replicates k/v under head-sharding; still correct —
    GSPMD replicates the kv projections — but flag it for layout review."""
    return cfg.n_kv_heads % mesh.shape["tp"] == 0 or cfg.n_kv_heads == 1
