"""Row-sharded dense flat index search over a mesh.

The embedding matrix shards its row (doc) dimension over all mesh axes; each
device runs the tiled matmul + running top-k (ops/dense_topk.py) over its
rows, then an all_gather of the k-per-shard candidates merges globally —
the faiss replacement at multi-chip scale (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from probing_rag_tpu.ops.dense_topk import matmul_topk


@functools.partial(jax.jit, static_argnames=("mesh", "k", "metric", "tile_n"))
def sharded_dense_topk(
    queries: jnp.ndarray,  # [Q, D] replicated
    embeddings: jnp.ndarray,  # [N, D] row-sharded over all mesh axes
    *,
    mesh: Mesh,
    k: int,
    metric: str = "ip",
    tile_n: int = 8192,
):
    axes = tuple(mesh.axis_names)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    n = embeddings.shape[0]
    rows_per_shard = -(-n // n_shards)

    def shard_fn(q, emb_local):
        shard_id = jax.lax.axis_index(axes)
        vals, idx = matmul_topk(q, emb_local, k=k, metric=metric, tile_n=tile_n)
        base = (shard_id * rows_per_shard).astype(jnp.int32)
        # drop hits landing in the even-split padding rows
        gidx = jnp.where((idx >= 0) & (idx + base < n), idx + base, -1)
        sign = -1.0 if metric == "l2" else 1.0  # merge keeps best-ranked
        all_vals = jax.lax.all_gather(vals * sign, axes, tiled=False)
        all_idx = jax.lax.all_gather(gidx, axes, tiled=False)
        s, qn, _ = all_vals.shape
        flat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, s * k)
        flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(qn, s * k)
        flat_v = jnp.where(flat_i >= 0, flat_v, -jnp.inf)
        top_v, pos = jax.lax.top_k(flat_v, k)
        top_i = jnp.take_along_axis(flat_i, pos, axis=-1)
        return top_v * sign, top_i

    # pad rows to an even shard split
    pad_rows = rows_per_shard * n_shards - n
    if pad_rows:
        fill = jnp.full((pad_rows, embeddings.shape[1]), jnp.inf if metric == "l2" else 0.0,
                        embeddings.dtype)
        embeddings = jnp.concatenate([embeddings, fill], axis=0)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axes, None)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated post-all_gather
    )(queries, embeddings)
