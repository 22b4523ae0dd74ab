"""Pallas TPU kernel: IVF (inverted-file) dense search — block-gathered
matmul + running top-k over only the probed coarse cells.

The flat kernel (ops/pallas_dense.py) is the right tool for large query
batches: it streams the WHOLE store once per <=512-query block, so its
per-query HBM traffic is ``store_bytes / batch``. The adaptive-RAG serving
loop, however, retrieves in small rounds (64 queries at exp_rag.py batch
sizes; 1 for interactive use), where the flat sweep pays the full store
read per tiny batch. This kernel reads only the probed inverted lists:
per-query traffic is ``store_bytes * nprobe / nlist`` regardless of batch,
which at Wikipedia scale (BASELINE config 5) is a 2-3 order-of-magnitude
latency cut for single-query serving (SURVEY.md §2.3 "flat, optionally
IVF"; faiss IndexIVFFlat parity — make_indexer.py:446-457 builds the flat
variant, IVF is the standard faiss scaling step this framework needed for
capability parity).

TPU-first layout (retrieval/ivf.py builds it): vectors are stored sorted
by coarse cell, each cell padded to a multiple of ``block`` rows (pad rows
carry id -1 and a zero vector), plus ONE trailing all-pad block that hole
descriptors point at. A probe plan is then just a list of *block indices*
— every grid step DMAs one aligned [block, D] tile picked by a prefetched
scalar descriptor, exactly the scalar-prefetch gather pattern of the BM25
bitonic kernel (ops/pallas_sparse.py), but with MXU scoring instead of a
sort.

Query tiling: queries ride in groups of 8 (one sublane tile). The 8
queries of a tile share the UNION of their probed cells — probing extra
cells only raises recall, and the union keeps every (query, block) pair's
scores useful instead of masking 7 of 8 rows. The planner dedups blocks
per tile, so the running top-k never sees the same candidate twice.

Grid: (query tiles, padded blocks-per-tile); scratch carries the running
[8, K_PAD] (values, ids) per tile and writes out on the tile's last block.
Pad rows (id < 0) score -inf and never insert. Reuses
``topk_merge_tile`` — the same adaptive gated merge as the flat kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probing_rag_tpu.ops.pallas_dense import K_PAD, topk_merge_tile

QT = 8  # queries per tile: one sublane group


def _kernel(desc_ref, q_ref, emb_ref, ids_ref, sqn_ref, scl_ref,
            out_v_ref, out_i_ref, vals, idxs, *, k, metric, int8_store,
            merge):
    bi = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        vals[:] = jnp.full_like(vals, -jnp.inf)
        idxs[:] = jnp.full_like(idxs, -1)

    emb = emb_ref[:]
    if int8_store:
        # HBM-read bound: the tile rides the bus as int8 and dequantizes
        # HERE in VMEM to bf16 for the MXU (same scheme as the flat kernel)
        emb = emb.astype(jnp.bfloat16)
    scores = jnp.dot(
        q_ref[:], emb.T, preferred_element_type=jnp.float32
    )  # [QT, block]
    if int8_store:
        scores = scores * scl_ref[0:1, :]
    if metric == "l2":
        # rank by -(||d||^2 - 2 q.d); caller re-adds ||q||^2
        scores = 2.0 * scores - sqn_ref[0:1, :]
    ids_row = ids_ref[0:1, :]  # [1, block] int32; -1 marks pad rows
    scores = jnp.where(ids_row >= 0, scores, -jnp.inf)

    # every probed block holds real candidates almost surely (cells are
    # ~full), so unlike the flat sweep the merge gate rarely skips — but it
    # still cheaply bounds the insert rounds per block
    row_max = jnp.max(scores, axis=-1)  # [QT]

    if merge:
        @pl.when(jnp.any(row_max > vals[:, k - 1]))
        def _():
            ids_b = jnp.broadcast_to(ids_row, scores.shape)
            new_vals, new_idx = topk_merge_tile(
                scores, ids_b, vals[:], idxs[:], k
            )
            vals[:] = new_vals
            idxs[:] = new_idx
    else:
        # profiling floor (merge=False): keep the DMA + matmul + row-max
        # critical path live by folding the block max into slot 0 — what
        # remains is the gather/score cost the merge rides on
        vals[:, 0] = jnp.maximum(vals[:, 0], row_max)

    @pl.when(bi == n_blocks - 1)
    def _():
        out_v_ref[:] = vals[:]
        out_i_ref[:] = idxs[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block"),
)
def ivf_topk_xla(
    queries: jnp.ndarray,  # [T*QT, D] tile-padded queries
    desc: jnp.ndarray,  # [T, PB] int32 block indices (holes -> pad block)
    embeddings: jnp.ndarray,  # [NB*block, D]
    ids: jnp.ndarray,  # [8, NB*block] int32 (-1 = pad row)
    *,
    k: int,
    metric: str = "ip",
    block: int = 256,
    sq_norms: jnp.ndarray | None = None,
    scales: jnp.ndarray | None = None,
):
    """Pure-XLA probed search with the same contract as
    :func:`ivf_topk_pallas` (same scores; top-k tie ORDER may differ).

    The non-TPU production path: block gather via ``take`` + one einsum +
    ``top_k`` per tile, sequenced with ``lax.map`` so peak memory is one
    tile's [PB, block, D] gather rather than the whole batch's. The Pallas
    kernel stays the TPU path (block DMAs never materialize the gather);
    interpret mode remains for kernel certification only — at serving
    widths it is minutes-per-batch slow (measured 19 min at [64 q x 2M
    docs] on the virtual mesh vs seconds here)."""
    int8_store = embeddings.dtype == jnp.int8
    if int8_store and scales is None:
        raise ValueError("int8 IVF store needs per-vector scales")
    tq, d = queries.shape
    assert tq % QT == 0
    t = tq // QT
    emb_b = embeddings.reshape(-1, block, d)
    ids_row = ids[0].reshape(-1, block)
    sqn_row = sq_norms[0].reshape(-1, block) if metric == "l2" else None
    scl_row = scales[0].reshape(-1, block) if int8_store else None
    qs = queries.reshape(t, QT, d)
    if embeddings.dtype == jnp.bfloat16 or int8_store:
        qs = qs.astype(jnp.bfloat16)

    def one_tile(args):
        qt, dt = args  # [QT, D], [PB]
        blocks = emb_b[dt]  # [PB, block, D]
        if int8_store:
            blocks = blocks.astype(jnp.bfloat16)
        s = jnp.einsum(
            "qd,pbd->qpb", qt, blocks, preferred_element_type=jnp.float32
        )
        if int8_store:
            s = s * scl_row[dt][None]
        if metric == "l2":
            s = 2.0 * s - sqn_row[dt][None]
        idr = ids_row[dt]  # [PB, block]
        s = jnp.where(idr[None] >= 0, s, -jnp.inf)
        pb = dt.shape[0]
        v, pos = jax.lax.top_k(s.reshape(QT, pb * block), k)
        gid = jnp.take(idr.reshape(-1), pos, axis=0)
        return v, jnp.where(jnp.isneginf(v), -1, gid)

    vals, gids = jax.lax.map(one_tile, (qs, desc))
    return vals.reshape(tq, k), gids.reshape(tq, k)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block", "interpret", "merge"),
)
def ivf_topk_pallas(
    queries: jnp.ndarray,  # [T*QT, D] tile-padded queries
    desc: jnp.ndarray,  # [T, PB] int32 global block indices (holes -> pad block)
    embeddings: jnp.ndarray,  # [NB*block, D] cell-sorted, block-padded store
    ids: jnp.ndarray,  # [8, NB*block] int32 original doc ids (-1 = pad row)
    *,
    k: int,
    metric: str = "ip",
    block: int = 256,
    sq_norms: jnp.ndarray | None = None,  # [8, NB*block] f32 (l2)
    scales: jnp.ndarray | None = None,  # [8, NB*block] f32 (int8 store)
    interpret: bool = False,
    merge: bool = True,  # False: profiling floor — gather + matmul +
    # row-max only (out_v slot 0 carries the running max; out_i stays -1)
):
    """Returns (scores [T*QT, k], ids [T*QT, k]) over the probed blocks.

    ``l2`` returns ``-(||d||^2 - 2 q.d)`` (descending); the engine re-adds
    ``||q||^2`` and flips sign to ascending squared distance, matching
    ``dense_topk_pallas``'s contract."""
    assert k <= K_PAD
    int8_store = embeddings.dtype == jnp.int8
    if int8_store and scales is None:
        raise ValueError("int8 IVF store needs per-vector scales")
    if embeddings.dtype == jnp.bfloat16 or int8_store:
        queries = queries.astype(jnp.bfloat16)
    tq, d = queries.shape
    assert tq % QT == 0, "queries must be tile-padded to a multiple of 8"
    t = tq // QT
    pb = desc.shape[1]
    assert desc.shape[0] == t

    if metric == "l2":
        sqn_spec = pl.BlockSpec(
            (8, block), lambda ti, bi, d_ref: (0, d_ref[ti, bi]),
            memory_space=pltpu.VMEM,
        )
    else:
        # ip never reads norms: constant dummy block, no extra HBM stream
        sq_norms = jnp.zeros((8, block), jnp.float32)
        sqn_spec = pl.BlockSpec(
            (8, block), lambda ti, bi, d_ref: (0, 0), memory_space=pltpu.VMEM
        )
    if int8_store:
        scl_spec = pl.BlockSpec(
            (8, block), lambda ti, bi, d_ref: (0, d_ref[ti, bi]),
            memory_space=pltpu.VMEM,
        )
    else:
        scales = jnp.ones((8, block), jnp.float32)
        scl_spec = pl.BlockSpec(
            (8, block), lambda ti, bi, d_ref: (0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t, pb),
        in_specs=[
            pl.BlockSpec((QT, d), lambda ti, bi, d_ref: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda ti, bi, d_ref: (d_ref[ti, bi], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda ti, bi, d_ref: (0, d_ref[ti, bi]),
                         memory_space=pltpu.VMEM),
            sqn_spec,
            scl_spec,
        ],
        out_specs=[
            pl.BlockSpec((QT, K_PAD), lambda ti, bi, d_ref: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, K_PAD), lambda ti, bi, d_ref: (ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((QT, K_PAD), jnp.float32),
            pltpu.VMEM((QT, K_PAD), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _kernel, k=k, metric=metric, int8_store=int8_store, merge=merge
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tq, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((tq, K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(desc, queries, embeddings, ids, sq_norms, scales)
    return out_v[:, :k], out_i[:, :k]
