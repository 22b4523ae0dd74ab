"""Row-sharded dense flat index search over a mesh.

The embedding matrix shards its row (doc) dimension over all mesh axes; each
device ranks its rows (XLA tiled matmul + running top-k by default, or the
fused Pallas kernel with ``use_pallas=True`` — the single-chip flagship path,
including int8 SQ8 stores), then an all_gather of the k-per-shard candidates
merges globally — the faiss replacement at multi-chip scale (SURVEY.md §5.8).

Sharding layout: docs are split into per-shard contiguous ranges whose sizes
differ by at most one (remainder docs go one-each to the leading shards), so
every shard carries AT MOST ONE padding row. Each shard therefore ranks
k+1 candidates and the pad row is masked before the global merge — exact
even when every real score is negative. (The previous layout put ALL pad
rows in the last shard; for ``ip`` their 0.0 scores could locally evict real
candidates whenever real scores were negative.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "metric", "tile_n", "use_pallas", "interpret"),
)
def sharded_dense_topk(
    queries: jnp.ndarray,  # [Q, D] replicated
    embeddings: jnp.ndarray,  # [N, D] (int8 stores pass scales too)
    *,
    mesh: Mesh,
    k: int,
    metric: str = "ip",
    tile_n: int = 8192,
    use_pallas: bool = False,
    scales: jnp.ndarray | None = None,  # [8, N] f32, int8 stores only
    interpret: bool = False,
):
    axes = tuple(mesh.axis_names)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    n, d = embeddings.shape
    if embeddings.dtype == jnp.int8 and scales is None:
        raise ValueError(
            "int8 embeddings need per-vector scales (see "
            "ops.pallas_dense.prepare_dense_store)"
        )
    if embeddings.dtype == jnp.int8 and not use_pallas:
        raise ValueError("int8 sharded stores need use_pallas=True")

    # balanced split: shard s gets count_s in {n//S, n//S + 1} contiguous
    # docs; at most one pad row per shard
    base_rows = n // n_shards
    rem = n % n_shards
    rpp = base_rows + (1 if rem else 0)  # rows per shard incl. pad
    counts = np.full(n_shards, base_rows, np.int64)
    counts[:rem] += 1
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]  # [S]

    # target row t of the [S*rpp, D] sharded layout holds doc
    # offsets[t//rpp] + t%rpp when in range, else a pad row (zeros, scale 1)
    t = np.arange(n_shards * rpp, dtype=np.int64)
    doc_of_row = offsets[t // rpp] + (t % rpp)
    valid = (t % rpp) < counts[t // rpp]
    doc_of_row = np.where(valid, doc_of_row, 0)
    gather_idx = jnp.asarray(doc_of_row, jnp.int32)
    valid_d = jnp.asarray(valid)
    emb_sharded = jnp.where(
        valid_d[:, None], embeddings[gather_idx], jnp.zeros((), embeddings.dtype)
    )
    scl_sharded = None
    if scales is not None:
        scl_sharded = jnp.where(
            valid_d[None, :], scales[:, gather_idx], 1.0
        )

    offs_d = jnp.asarray(offsets, jnp.int32)
    counts_d = jnp.asarray(counts, jnp.int32)
    kq = min(k + (1 if rem else 0), rpp)  # the pad row can occupy one slot
    if use_pallas:
        from probing_rag_tpu.ops.pallas_dense import K_PAD

        assert kq <= K_PAD, f"k={k} exceeds the kernel buffer ({K_PAD})"

    def shard_fn(q, emb_local, scl_local):
        shard_id = jax.lax.axis_index(axes)
        if use_pallas:
            from probing_rag_tpu.ops.pallas_dense import dense_topk_pallas

            vals, idx = dense_topk_pallas(
                q, emb_local, k=kq, metric=metric,
                tile_n=min(4096, max(128, rpp)),
                scales=scl_local if scales is not None else None,
                interpret=interpret,
            )
        else:
            from probing_rag_tpu.ops.dense_topk import matmul_topk

            vals, idx = matmul_topk(
                q, emb_local, k=kq, metric=metric,
                tile_n=min(tile_n, max(256, rpp)),
            )
        base = offs_d[shard_id]
        count = counts_d[shard_id]
        # drop the pad row (local index >= this shard's real count)
        gidx = jnp.where((idx >= 0) & (idx < count), idx + base, -1)
        sign = -1.0 if metric == "l2" else 1.0  # merge keeps best-ranked
        all_vals = jax.lax.all_gather(vals * sign, axes, tiled=False)
        all_idx = jax.lax.all_gather(gidx, axes, tiled=False)
        s, qn, _ = all_vals.shape
        flat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, s * kq)
        flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(qn, s * kq)
        flat_v = jnp.where(flat_i >= 0, flat_v, -jnp.inf)
        top_v, pos = jax.lax.top_k(flat_v, k)
        top_i = jnp.take_along_axis(flat_i, pos, axis=-1)
        top_v = jnp.where(top_i >= 0, top_v, 0.0)
        return top_v * sign, top_i

    if scl_sharded is None:
        # dummy per-shard block so shard_fn has a uniform signature
        scl_sharded = jnp.ones((8, n_shards), jnp.float32)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axes, None), P(None, axes)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated post-all_gather
    )(queries, emb_sharded, scl_sharded)
