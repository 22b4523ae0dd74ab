"""Pallas TPU kernels for the sparse BM25 scoring pipeline.

Two kernels replace the stages XLA handles badly (measured on v5e):

1. ``postings_gather_pallas`` — segmented posting gather as contiguous DMA
   copies. XLA lowers ``postings[idx]`` with 33M random indices to a scalar
   gather (~20s per [256, 128k] tile); the indices are really TQ contiguous
   runs per query, so chunked ``make_async_copy`` DMAs driven by
   scalar-prefetched offsets do the same work in milliseconds.
2. ``segment_topk_pallas`` — run reduction + top-k over the sorted postings
   in one pass (in-register Hillis-Steele scans + running top-k in scratch;
   ~3ms at [256, 128k] vs 6 full XLA passes). It also firewalls the XLA sort
   from the scan compositions that otherwise send the TPU compiler into a
   multi-hour compile (ops/sparse.py docstring).

``bm25_search_padded_fused`` chains gather -> XLA sort (fast: ~70ms at
[256, 128k]) -> segment+top-k as ONE dispatch.

Mosaic alignment contract: dynamic DMA slice offsets must be provably
aligned to the memref tiling (1024 elements for 32-bit types). The engine
stores an aligned CSR (bm25_index.aligned_csr: term starts and lengths
padded to 1024-multiples with inert sentinel entries) and the kernel adds
``pl.multiple_of`` hints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probing_rag_tpu.ops.pallas_dense import K_PAD, topk_merge_tile

_CARRY_INIT = -2  # matches no doc id and no sentinel
_ALIGN = 1024  # Mosaic HBM/VMEM memref tiling for 32-bit elements


def gather_chunk(pad: int) -> int:
    """DMA copy granularity for a given row tile width. 4096-element copies
    are ~3x cheaper per element but need a chunk of in-row slack (see
    postings_gather_pallas's capacity contract); _ALIGN-sized copies never
    overshoot (aligned term lengths are _ALIGN multiples), so small tiles
    keep full capacity."""
    return 4 * _ALIGN if pad >= 32 * _ALIGN else min(_ALIGN, pad)


def gather_capacity(pad: int) -> int:
    """Max posting total a [*, pad] row may carry on the compiled DMA path."""
    c = gather_chunk(pad)
    return pad - c if c > _ALIGN else pad


def _shift_right(x: jnp.ndarray, fill) -> jnp.ndarray:
    """[Q, T] -> same with lane 0 = fill, lane i = x[i-1]."""
    rolled = pltpu.roll(x, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _shift_left(x: jnp.ndarray, fill) -> jnp.ndarray:
    rolled = pltpu.roll(x, x.shape[1] - 1, axis=1)  # == roll(-1); shift >= 0 required
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == x.shape[1] - 1, fill, rolled)


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along lanes (Hillis-Steele, log2 T roll steps)."""
    t = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < t:
        rolled = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(lane >= s, rolled, 0.0)
        s *= 2
    return x


def _lane_maxscan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along lanes."""
    t = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < t:
        rolled = pltpu.roll(x, s, axis=1)
        x = jnp.maximum(x, jnp.where(lane >= s, rolled, -jnp.inf))
        s *= 2
    return x


# --------------------------------------------------- segment-sum + top-k


def _segment_kernel(doc_ref, imp_ref, out_v_ref, out_i_ref,
                    run_vals, run_idx, carry_doc, carry_sum, *, k, sentinel):
    pi = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(pi == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, -jnp.inf)
        run_idx[:] = jnp.full_like(run_idx, -1)
        carry_doc[:] = jnp.full_like(carry_doc, _CARRY_INIT)
        carry_sum[:] = jnp.zeros_like(carry_sum)

    d = doc_ref[:]  # [QT, TP] int32, sorted ascending per row
    v = imp_ref[:]  # [QT, TP] f32

    prev_d = _shift_right(d, carry_doc[:])
    head = d != prev_d  # run starts (incl. continuation break at lane 0)

    cs = _lane_cumsum(v)
    cs_before = cs - v
    base_scan = _lane_maxscan(jnp.where(head, cs_before, -jnp.inf))
    # positions before any in-tile head continue the carried run: their
    # base is -carry_sum so that cs - base = carry_sum + cs
    base = jnp.where(jnp.isfinite(base_scan), base_scan, -carry_sum[:])

    # the carried run ends iff this tile starts with a different doc
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    carry_ended = (d[:, :1] != carry_doc[:]) & (carry_doc[:] != _CARRY_INIT) \
        & (carry_doc[:] != sentinel)
    cand_vals = jnp.where((lane == 0) & carry_ended, carry_sum[:], -jnp.inf)
    cand_ids = jnp.broadcast_to(carry_doc[:], d.shape)
    nv, ni_ = topk_merge_tile(cand_vals, cand_ids, run_vals[:], run_idx[:], 1)

    # runs ending inside this tile (the tile's last lane is never an end —
    # it's finalized via the carry in the next tile / at the flush)
    next_d = _shift_left(d, d[:, -1:])
    is_end = (next_d != d) & (d != sentinel)
    totals = jnp.where(is_end, cs - base, -jnp.inf)
    nv, ni_ = topk_merge_tile(totals, d, nv, ni_, k)
    run_vals[:] = nv
    run_idx[:] = ni_

    carry_doc[:] = d[:, -1:]
    carry_sum[:] = jnp.where(
        d[:, -1:] == sentinel, 0.0, cs[:, -1:] - base[:, -1:]
    )

    @pl.when(pi == n_tiles - 1)
    def _():
        # flush the final carried run
        flush = (carry_doc[:] != _CARRY_INIT) & (carry_doc[:] != sentinel)
        fv = jnp.where((lane == 0) & flush, carry_sum[:], -jnp.inf)
        fi = jnp.broadcast_to(carry_doc[:], d.shape)
        nv2, ni2 = topk_merge_tile(fv, fi, run_vals[:], run_idx[:], 1)
        hit = jnp.isfinite(nv2)
        out_v_ref[:] = jnp.where(hit, nv2, 0.0)
        out_i_ref[:] = jnp.where(hit, ni2, -1)


@functools.partial(
    jax.jit, static_argnames=("k", "sentinel", "tile_q", "tile_p", "interpret")
)
def segment_topk_pallas(
    doc: jnp.ndarray,  # [Q, P] int32, sorted ascending per row
    impact: jnp.ndarray,  # [Q, P] f32
    *,
    k: int,
    sentinel: int,
    tile_q: int = 32,
    tile_p: int = 512,
    interpret: bool = False,
):
    """Fused run-reduction + top-k over presorted postings. Same contract as
    ops.sparse.sorted_segment_topk(presorted=True)."""
    assert k <= K_PAD
    q, p = doc.shape
    qp = -(-q // tile_q) * tile_q
    pp = -(-p // tile_p) * tile_p
    if qp != q or pp != p:
        doc = jnp.pad(doc, ((0, qp - q), (0, pp - p)), constant_values=sentinel)
        impact = jnp.pad(impact, ((0, qp - q), (0, pp - p)))

    grid = (qp // tile_q, pp // tile_p)
    out_v, out_i = pl.pallas_call(
        functools.partial(_segment_kernel, k=k, sentinel=sentinel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, tile_p), lambda qi, pi: (qi, pi), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, tile_p), lambda qi, pi: (qi, pi), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, K_PAD), lambda qi, pi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, K_PAD), lambda qi, pi: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((qp, K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, K_PAD), jnp.float32),
            pltpu.VMEM((tile_q, K_PAD), jnp.int32),
            pltpu.VMEM((tile_q, 1), jnp.int32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(doc, impact)
    return out_v[:q, :k], out_i[:q, :k]


# --------------------------------------------------- postings gather (DMA)


def _gather_kernel(starts_ref, lens_ref, cum_ref, doc_hbm, imp_hbm,
                   out_doc, out_imp, sems, *, chunk, tq, limit):
    """One grid step gathers one query row as flat 1-D DMA copies: per term,
    ``chunk``-sized contiguous copies, each waited before the next starts.

    Measured shape of the design space at [256, 65536] on v5e: 16 KB copies
    with wait-after-each run at ~0.7 us/DMA (2-6 ms/tile) — while a single
    256 KB copy at a 1024-aligned dynamic offset takes ~0.8 ms (35x slower)
    and a double-buffered stream with descriptor-reconstruction waits is
    ~40x slower still. Wait-each also buys ORDERING: a chunk that
    overshoots its term's aligned region into the next term's dst slice is
    deterministically overwritten by that term's own (later) copies, so
    uniform chunking is correct given a >= ``chunk`` src guard tail
    (aligned_csr appends 4096). Chunks that would cross ``limit`` (the row
    tile end on the compiled path) are skipped — callers keep each row's
    total at least one chunk below ``pad`` so no real posting lands there.
    1-D refs + multiple_of hints satisfy Mosaic's aligned-dynamic-slice
    requirement in both memory spaces. Tail masking of slots past the row
    total happens outside the kernel."""
    qi = pl.program_id(0)

    def copy_term(t, carry):
        n_chunks = pl.cdiv(lens_ref[qi, t], chunk)

        def copy_chunk(c, carry):
            off = c * chunk
            d_raw = cum_ref[qi, t] + off

            @pl.when(d_raw + chunk <= limit)
            def _():
                s_off = pl.multiple_of(starts_ref[qi, t] + off, _ALIGN)
                d_off = pl.multiple_of(d_raw, _ALIGN)
                d1 = pltpu.make_async_copy(
                    doc_hbm.at[pl.ds(s_off, chunk)],
                    out_doc.at[pl.ds(d_off, chunk)],
                    sems.at[0],
                )
                d2 = pltpu.make_async_copy(
                    imp_hbm.at[pl.ds(s_off, chunk)],
                    out_imp.at[pl.ds(d_off, chunk)],
                    sems.at[1],
                )
                d1.start()
                d2.start()
                d1.wait()
                d2.wait()

            return carry

        return jax.lax.fori_loop(0, n_chunks, copy_chunk, carry)

    jax.lax.fori_loop(0, tq, copy_term, 0)


@functools.partial(jax.jit, static_argnames=("pad", "sentinel", "chunk", "interpret"))
def postings_gather_pallas(
    postings_doc: jnp.ndarray,  # [NNZ_aligned + guard] int32 (aligned_csr)
    postings_impact: jnp.ndarray,  # same length f32
    starts: jnp.ndarray,  # [Q, TQ] int32: aligned term starts, 0 for masked
    lens: jnp.ndarray,  # [Q, TQ] int32: aligned lengths, 0 for masked
    *,
    pad: int,
    sentinel: int,
    chunk: int = 4 * _ALIGN,
    interpret: bool = False,
):
    """Segmented posting gather as contiguous DMA copies. Returns
    (doc [Q, pad], impact [Q, pad]) — the same contract as
    ops.sparse.postings_gather. Requires the aligned CSR layout (offsets and
    lengths in 1024-multiples, >= ``chunk`` guard tail) on the compiled TPU
    path; the sequential wait-each copy stream makes term-boundary chunk
    overshoot benign (see _gather_kernel).

    COMPILED-PATH CAPACITY CONTRACT: each row's posting total must be at
    most ``pad - chunk``. The row blocks are exactly ``pad`` wide — a guard
    column would make the per-row HBM block stride non-power-of-two, which
    puts the VMEM->HBM write-back on a pathologically slow DMA path
    (measured 2.4 ms -> 190 ms at [256, 65536]) — so the final chunk-window
    of each row is reserved as in-block slack and chunks crossing it are
    skipped. The engines reserve the slack when picking pad buckets."""
    q, tq = starts.shape
    chunk = min(chunk, pad)
    if not interpret and chunk % _ALIGN:
        raise ValueError(
            f"compiled DMA gather needs an {_ALIGN}-aligned chunk (got {chunk})"
        )
    cum = jnp.cumsum(lens, axis=-1) - lens  # exclusive prefix: dst offsets
    # truncate to the tile exactly like the XLA gather (first ``pad`` slots
    # of the concatenation): terms past the tile get length 0, the boundary
    # term is cut (still an _ALIGN multiple: pad and cum are)
    lens = jnp.clip(jnp.minimum(lens, pad - cum), 0)

    # interpret mode keeps a guard column instead of the capacity contract
    # (tiny-pad tests fill the full tile; block layout cost is irrelevant)
    padg = pad + chunk if interpret else pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((padg,), lambda qi, *_: (qi,), memory_space=pltpu.VMEM),
            pl.BlockSpec((padg,), lambda qi, *_: (qi,), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_gather_kernel, chunk=chunk, tq=tq, limit=padg)
    out_doc, out_imp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q * padg,), jnp.int32),
            jax.ShapeDtypeStruct((q * padg,), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, lens, cum, postings_doc, postings_impact)

    # tail fix in XLA: everything past each row's total (slots never
    # written by any DMA) becomes sentinel / 0
    out_doc = out_doc.reshape(q, padg)[:, :pad]
    out_imp = out_imp.reshape(q, padg)[:, :pad]
    total = (cum[:, -1] + lens[:, -1])[:, None]
    lane = jnp.arange(pad, dtype=jnp.int32)[None, :]
    valid = lane < total
    return (
        jnp.where(valid, out_doc, sentinel),
        jnp.where(valid, out_imp, 0.0),
    )


# ------------------------------------------------------------ fused search


@functools.partial(
    jax.jit,
    static_argnames=("pad", "sentinel_doc", "k", "interpret", "dma_gather", "guarded"),
)
def bm25_search_padded_fused(
    term_offsets, postings_doc, postings_impact, qterms, qmask,
    *, pad: int, sentinel_doc: int, k: int, interpret: bool = False,
    dma_gather: bool = True, guarded: bool = False,
):
    """Single-dispatch BM25 scoring, all three stages TPU-tuned:

    1. postings gather as contiguous chunked DMAs (Pallas);
    2. XLA's bitonic sort (fast: ~70ms at [256, 128k]);
    3. run reduction + top-k (Pallas) — also keeping the sort isolated from
       the XLA scan fusions that otherwise explode compile time.

    ``guarded=True`` asserts the caller passed aligned_csr arrays (aligned
    offsets + guard tail) — required for the compiled TPU DMA path.
    """
    lens = term_offsets[qterms + 1] - term_offsets[qterms]
    lens = jnp.where(qmask, lens, 0).astype(jnp.int32)
    starts = jnp.where(qmask, term_offsets[qterms], 0).astype(jnp.int32)
    if dma_gather:
        chunk = gather_chunk(pad)
        if guarded:
            # aligned_csr's guard tail covers the final term's src overshoot
            doc_pad, imp_pad = postings_doc, postings_impact
        else:
            doc_pad = jnp.pad(postings_doc, (0, chunk), constant_values=sentinel_doc)
            imp_pad = jnp.pad(postings_impact, (0, chunk))
        doc, imp = postings_gather_pallas(
            doc_pad, imp_pad, starts, lens,
            pad=pad, sentinel=sentinel_doc, chunk=chunk, interpret=interpret,
        )
    else:
        from probing_rag_tpu.ops.sparse import postings_gather

        doc, imp = postings_gather(
            term_offsets, postings_doc, postings_impact, qterms, qmask,
            pad, sentinel_doc,
        )
    doc, imp = jax.lax.sort_key_val(doc, imp, dimension=-1)
    return segment_topk_pallas(
        doc, imp, k=k, sentinel=sentinel_doc, interpret=interpret
    )
