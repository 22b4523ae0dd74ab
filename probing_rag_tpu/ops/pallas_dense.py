"""Pallas TPU kernel: fused flat-index search (matmul + running top-k).

The faiss-replacement hot op (SURVEY.md §2.3) as a single kernel: the
embedding matrix streams through VMEM tile by tile, each tile's [Q_TILE, N_TILE]
score block comes off the MXU, and a per-query running top-k is maintained in
VMEM scratch across the whole sweep — scores never touch HBM, so the op runs
at the speed of the embedding read (the flat-search speed of light).

Grid: (query blocks, N tiles), N fastest-varying; scratch carries the running
(values, indices) for the current query block and resets when a new query
block starts. The k-extraction is k rounds of (masked max, insert) — k is
5-10 here, negligible against the matmul.

The public wrapper pads shapes to tile multiples and slices the [Q, k]
result; ``interpret=True`` is used on CPU (tests) via
``pltpu.force_tpu_interpret_mode``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD = 16  # scratch top-k width (>= requested k), aligned-ish


def topk_merge_tile(scores, idx_source, run_vals, run_idx, k):
    """Fold one [QB, TN] candidate tile into the running top-k ([QB, K_PAD]).

    ``idx_source[q, lane]`` is the id recorded for a candidate (a global
    column for dense search, a doc id for sparse run totals). -inf scores
    never insert (run_vals is seeded with -inf and insertion positions past
    the existing -inf tail are no-ops for ranking).
    """
    qb, tn = scores.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, tn), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qb, K_PAD), 1)

    def body(j, carry):
        scores, run_vals, run_idx = carry
        cur_max = jnp.max(scores, axis=-1, keepdims=True)  # [QB, 1]
        is_max = scores == cur_max
        cur_arg = jnp.min(jnp.where(is_max, lane, tn), axis=-1, keepdims=True)
        cur_id = jnp.sum(
            jnp.where(lane == cur_arg, idx_source, 0), axis=-1, keepdims=True
        )
        # mask the taken element
        scores = jnp.where(lane == cur_arg, -jnp.inf, scores)
        # insertion position among running values (descending order)
        pos = jnp.sum((run_vals > cur_max).astype(jnp.int32), axis=-1, keepdims=True)
        skip = ~jnp.isfinite(cur_max)  # nothing left to take in this tile
        insert = (kcol == pos) & ~skip
        shift_right = (kcol > pos) & ~skip
        prev_vals = jnp.concatenate(
            [jnp.full((qb, 1), -jnp.inf, run_vals.dtype), run_vals[:, :-1]], axis=-1
        )
        prev_idx = jnp.concatenate(
            [jnp.full((qb, 1), -1, run_idx.dtype), run_idx[:, :-1]], axis=-1
        )
        new_vals = jnp.where(insert, cur_max, jnp.where(shift_right, prev_vals, run_vals))
        new_idx = jnp.where(
            insert, cur_id, jnp.where(shift_right, prev_idx, run_idx)
        )
        return scores, new_vals, new_idx

    _, run_vals, run_idx = jax.lax.fori_loop(
        0, k, body, (scores, run_vals, run_idx)
    )
    return run_vals, run_idx


def _kernel(q_ref, emb_ref, sqn_ref, out_v_ref, out_i_ref, vals, idxs, *, k, metric, n_total, tile_n):
    ni = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(ni == 0)
    def _():
        vals[:] = jnp.full_like(vals, -jnp.inf)
        idxs[:] = jnp.full_like(idxs, -1)

    scores = jnp.dot(
        q_ref[:], emb_ref[:].T, preferred_element_type=jnp.float32
    )  # [QB, TN]
    if metric == "l2":
        # rank by -(||d||^2 - 2 q.d); caller re-adds ||q||^2
        scores = 2.0 * scores - sqn_ref[0:1, :]
    base = ni * tile_n
    col = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_total, scores, -jnp.inf)

    # block-level merge skip (the faiss trick): once the running top-k is
    # warm, a tile whose best score cannot beat ANY query's current k-th
    # value has nothing to insert — on unordered data that is almost every
    # tile, so the serial VPU merge (k rounds of masked-max) drops out of
    # the MXU/DMA pipeline's critical path.
    kth = jnp.min(vals[:, k - 1])
    @pl.when(jnp.max(scores) > kth)
    def _():
        new_vals, new_idx = topk_merge_tile(scores, col, vals[:], idxs[:], k)
        vals[:] = new_vals
        idxs[:] = new_idx

    @pl.when(ni == n_tiles - 1)
    def _():
        out_v_ref[:] = vals[:]
        out_i_ref[:] = idxs[:]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_n", "tile_q", "interpret")
)
def dense_topk_pallas(
    queries: jnp.ndarray,  # [Q, D]
    embeddings: jnp.ndarray,  # [N, D]
    *,
    k: int,
    metric: str = "ip",
    tile_n: int = 2048,
    tile_q: int = 0,
    interpret: bool = False,
):
    """Returns (scores [Q, k], indices [Q, k]); same contract as
    ops.dense_topk.matmul_topk.

    ``tile_q=0`` (default) picks the query-block size adaptively: the
    embedding matrix streams through VMEM once PER QUERY BLOCK, so covering
    the whole batch in one block (up to 512 queries; ~1.5 MB of VMEM at
    d=768) halves-or-better the HBM traffic whenever Q exceeds a block."""
    assert k <= K_PAD
    q, d = queries.shape
    n = embeddings.shape[0]
    if tile_q == 0:
        tile_q = 8
        while tile_q < min(q, 512):
            tile_q *= 2
    qp = -(-q // tile_q) * tile_q
    np_ = -(-n // tile_n) * tile_n
    if qp != q:
        queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    if np_ != n:
        embeddings = jnp.pad(embeddings, ((0, np_ - n), (0, 0)))
    # [8, N] with replicated sublanes: TPU block shapes need the second-to-
    # last dim divisible by 8 (a [1, tile_n] block is not lowerable)
    sq_norms = jnp.broadcast_to(
        jnp.sum(embeddings.astype(jnp.float32) ** 2, axis=-1)[None, :], (8, np_)
    )

    grid = (qp // tile_q, np_ // tile_n)
    kernel = functools.partial(
        _kernel, k=k, metric=metric, n_total=n, tile_n=tile_n
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qi, ni: (ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, K_PAD), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, K_PAD), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((qp, K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, K_PAD), jnp.float32),
            pltpu.VMEM((tile_q, K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(queries, embeddings, sq_norms)

    vals = out_v[:q, :k]
    idx = out_i[:q, :k]
    if metric == "l2":
        q_sq = jnp.sum(queries[:q].astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        vals = -vals + q_sq
    return vals, idx
