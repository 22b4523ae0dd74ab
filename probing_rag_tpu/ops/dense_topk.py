"""Dense flat-index search: tiled matmul + running top-k.

TPU-native replacement for ``faiss.IndexFlatL2.search`` (utils.py:374-380,
make_indexer.py:446-457). The embedding matrix is scanned in N-tiles; each
tile's [Q, TILE] score block comes off the MXU and is immediately folded into
a running per-query top-k, so the full [Q, N] score matrix never reaches HBM
— the op is bandwidth-bound on the embedding read alone (speed-of-light for
a flat index).

Metrics: ``ip`` (inner product) and ``l2`` (faiss-parity squared L2; top-k
smallest). Scores are computed in f32 off bf16/f32 inputs via
``preferred_element_type``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile_n"))
def matmul_topk(
    queries: jnp.ndarray,  # [Q, D]
    embeddings: jnp.ndarray,  # [N, D]
    *,
    k: int,
    metric: str = "ip",
    tile_n: int = 16384,
):
    """Returns (scores [Q, k], indices [Q, k]); for ``l2`` the scores are
    squared distances (ascending), for ``ip`` inner products (descending)."""
    q, d = queries.shape
    n = embeddings.shape[0]
    n_tiles = max(1, -(-n // tile_n))
    pad_n = n_tiles * tile_n
    if pad_n != n:
        embeddings = jnp.pad(embeddings, ((0, pad_n - n), (0, 0)))

    emb_tiles = embeddings.reshape(n_tiles, tile_n, d)
    if metric == "l2":
        sq_norms = jnp.sum(
            embeddings.astype(jnp.float32) ** 2, axis=-1
        ).reshape(n_tiles, tile_n)

    neg_inf = jnp.float32(-jnp.inf)
    init_vals = jnp.full((q, k), neg_inf)
    init_idx = jnp.full((q, k), -1, jnp.int32)

    def tile_step(carry, inputs):
        run_vals, run_idx = carry
        if metric == "l2":
            tile, tile_sq, start = inputs
        else:
            tile, start = inputs
        scores = jnp.dot(
            queries, tile.T, preferred_element_type=jnp.float32
        )  # [Q, TILE]
        if metric == "l2":
            # rank by -(||d||^2 - 2 q.d); ||q||^2 added back at the end
            scores = -(tile_sq[None, :] - 2.0 * scores)
        col = start + jnp.arange(tile_n, dtype=jnp.int32)
        valid = col < n
        scores = jnp.where(valid[None, :], scores, neg_inf)

        cat_vals = jnp.concatenate([run_vals, scores], axis=-1)
        cat_idx = jnp.concatenate(
            [run_idx, jnp.broadcast_to(col[None, :], scores.shape)], axis=-1
        )
        new_vals, pos = jax.lax.top_k(cat_vals, k)
        new_idx = jnp.take_along_axis(cat_idx, pos, axis=-1)
        return (new_vals, new_idx), None

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile_n
    xs = (emb_tiles, sq_norms, starts) if metric == "l2" else (emb_tiles, starts)
    (vals, idx), _ = jax.lax.scan(tile_step, (init_vals, init_idx), xs)

    if metric == "l2":
        q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        vals = -vals + q_sq  # actual squared distances, ascending with rank
    return vals, idx
