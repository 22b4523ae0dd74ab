"""Pallas TPU kernels for the sparse BM25 scoring pipeline.

The production path is ``bm25_search_bitonic`` (single dispatch per query
tile, 26.7k q/s/chip end-to-end on v5e at the bench corpus — PARITY.md):

1. DMA/roll gather over the block-alternated postings store
   (bm25_index.BitonicStore) producing rows whose every 1024-block is
   already sorted (ascending at even block index, descending at odd);
2. the pass-skipping in-VMEM bitonic sort (ops/pallas_sort, starts at pass
   2048; 2.2-2.6 ns/element vs ~25 for XLA's sort);
3. ``segment_topk_pallas`` — run reduction + top-k over the sorted postings
   in one pass (in-register Hillis-Steele scans + running top-k in scratch;
   ~3ms at [256, 128k] vs 6 full XLA passes).

The legacy kernels are kept for the "dma" engine mode and as the measured
record of the design space:

- ``postings_gather_pallas`` — segmented posting gather as contiguous DMA
  copies. XLA lowers ``postings[idx]`` with 33M indices to an elementwise
  gather (~60-95 ns/element even on contiguous runs, ~677 on random); the
  indices are really TQ contiguous runs per query, so chunked
  ``make_async_copy`` DMAs driven by scalar-prefetched offsets do the same
  work in milliseconds.
- ``bm25_search_padded_fused`` chains gather -> XLA sort -> segment+top-k
  as ONE dispatch (XLA sort is its floor: ~25 ns/element).

Mosaic alignment contract: dynamic DMA slice offsets must be provably
aligned to the memref tiling (1024 elements for 32-bit types). Stores keep
term starts and lengths 1024-aligned (or copy 1024-floored windows and
rotate in VMEM) and the kernels add ``pl.multiple_of`` hints.
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probing_rag_tpu.ops.pallas_dense import K_PAD, topk_merge_tile

_CARRY_INIT = -2  # matches no doc id and no sentinel
_ALIGN = 1024  # Mosaic HBM/VMEM memref tiling for 32-bit elements


# main-path bitonic row caps: rows up to NARROW_SORT_MAX_PAD sort on the
# unrolled per-pass network (compile time grows with width — 74 s at 32K,
# measured); wider rows up to BITONIC_MAX_PAD sort on the while_loop-form
# wide network (compact compile — 512K in 69 s; 1M crashed the remote
# compile service, so the cap stays one notch under). Rows beyond
# BITONIC_MAX_PAD route to the exact over-cap fallback (retrieval/bm25.py).
NARROW_SORT_MAX_PAD = 1 << 15
BITONIC_MAX_PAD = 1 << 19


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


def _shift_left(x: jnp.ndarray, fill) -> jnp.ndarray:
    rolled = pltpu.roll(x, x.shape[1] - 1, axis=1)  # == roll(-1); shift >= 0 required
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == x.shape[1] - 1, fill, rolled)


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

    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    # fold the carried partial sum into lane 0 when the run continues, then
    # let the segmented scan propagate it down the run
    v = jnp.where(
        (lane == 0) & (d[:, :1] == carry_doc[:]), v + carry_sum[:], v
    )
    # segmented inclusive run-sum by shift-doubling: rows are sorted, so
    # doc equality at distance s implies every element between is the same
    # doc — no head-flag carry. Same roll count as the previous
    # cumsum+maxscan pair, but run totals are sums of <= run-length
    # POSITIVE values instead of differences of a tile-wide prefix sum
    # (whose f32 ulp exceeded real score gaps at production widths — see
    # ops.sparse.sorted_segment_topk).
    t = v.shape[1]
    s = 1
    while s < t:
        rolled_v = pltpu.roll(v, s, axis=1)
        rolled_d = pltpu.roll(d, s, axis=1)
        v = v + jnp.where((lane >= s) & (rolled_d == d), rolled_v, 0.0)
        s *= 2

    # the carried run ends iff this tile starts with a different doc
    carry_ended = (d[:, :1] != carry_doc[:]) & (carry_doc[:] != _CARRY_INIT) \
        & (carry_doc[:] != sentinel)
    cand_vals = jnp.where((lane == 0) & carry_ended, carry_sum[:], -jnp.inf)
    cand_ids = jnp.broadcast_to(carry_doc[:], d.shape)
    nv, ni_ = topk_merge_tile(
        cand_vals, cand_ids, run_vals[:], run_idx[:], 1, thresh_k=k
    )

    # runs ending inside this tile (the tile's last lane is never an end —
    # it's finalized via the carry in the next tile / at the flush)
    next_d = _shift_left(d, d[:, -1:])
    is_end = (next_d != d) & (d != sentinel)
    totals = jnp.where(is_end, v, -jnp.inf)
    nv, ni_ = topk_merge_tile(totals, d, nv, ni_, k)
    run_vals[:] = nv
    run_idx[:] = ni_

    carry_doc[:] = d[:, -1:]
    carry_sum[:] = jnp.where(d[:, -1:] == sentinel, 0.0, v[:, -1:])

    @pl.when(pi == n_tiles - 1)
    def _():
        # flush the final carried run
        flush = (carry_doc[:] != _CARRY_INIT) & (carry_doc[:] != sentinel)
        fv = jnp.where((lane == 0) & flush, carry_sum[:], -jnp.inf)
        fi = jnp.broadcast_to(carry_doc[:], d.shape)
        nv2, ni2 = topk_merge_tile(
            fv, fi, run_vals[:], run_idx[:], 1, thresh_k=k
        )
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


def _gather_kernel(starts_ref, lens_ref, cum_ref, *refs, chunk, tq, limit,
                   alternated):
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
    total happens outside the kernel.

    ``alternated`` (0 = off, else the store's block width) makes the kernel
    take BOTH block-alternated copies of the bitonic store (E: each term's
    blocks sorted asc at even term-local index, O: asc at odd —
    bm25_index.bitonic_csr) and pick per term the copy whose alternation
    lands asc on even ROW-local blocks, so every block of the produced row
    is sorted alternating — the ``k_start = 2 * block`` precondition of
    the sort kernels. Copying at ``chunk`` (a block multiple) granularity
    preserves per-block alternation in lockstep."""
    if alternated:
        doc_e, imp_e, doc_o, imp_o, out_doc, out_imp, sems = refs
    else:
        doc_e, imp_e, out_doc, out_imp, sems = refs
        doc_o = imp_o = None
    qi = pl.program_id(0)

    def copy_term(t, carry):
        n_chunks = pl.cdiv(lens_ref[qi, t], chunk)

        def run(doc_hbm, imp_hbm):
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

            jax.lax.fori_loop(0, n_chunks, copy_chunk, 0)

        if alternated:
            parity = (cum_ref[qi, t] // alternated) & 1

            @pl.when(parity == 0)
            def _():
                run(doc_e, imp_e)

            @pl.when(parity == 1)
            def _():
                run(doc_o, imp_o)
        else:
            run(doc_e, imp_e)
        return carry

    jax.lax.fori_loop(0, tq, copy_term, 0)


@functools.partial(
    jax.jit,
    static_argnames=("pad", "sentinel", "chunk", "interpret", "block"),
)
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
    postings_doc_o: Optional[jnp.ndarray] = None,  # O copy (bitonic store)
    postings_impact_o: Optional[jnp.ndarray] = None,
    block: int = _ALIGN,  # store block width (parity unit when alternated)
):
    """Segmented posting gather as contiguous DMA copies. Returns
    (doc [Q, pad], impact [Q, pad]) — the same contract as
    ops.sparse.postings_gather. Requires the aligned CSR layout (offsets and
    lengths in 1024-multiples, >= ``chunk`` guard tail) on the compiled TPU
    path; the sequential wait-each copy stream makes term-boundary chunk
    overshoot benign (see _gather_kernel). Passing the O copy
    (``postings_doc_o``/``postings_impact_o``) turns on per-term E/O parity
    selection: every ``block`` of the produced rows comes out sorted
    alternating (see _gather_kernel), enabling the sort-network pass skip.

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

    alternated = postings_doc_o is not None
    if alternated and (chunk % block or not (pad % block == 0)):
        raise ValueError(
            f"alternated gather needs block-multiple chunk/pad "
            f"(block={block}, chunk={chunk}, pad={pad})"
        )
    # interpret mode keeps a guard column instead of the capacity contract
    # (tiny-pad tests fill the full tile; block layout cost is irrelevant)
    padg = pad + chunk if interpret else pad
    n_in = 4 if alternated else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_in,
        out_specs=[
            pl.BlockSpec((padg,), lambda qi, *_: (qi,), memory_space=pltpu.VMEM),
            pl.BlockSpec((padg,), lambda qi, *_: (qi,), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(
        _gather_kernel, chunk=chunk, tq=tq, limit=padg,
        alternated=block if alternated else 0,
    )
    hbm_in = (postings_doc, postings_impact)
    if alternated:
        hbm_in = hbm_in + (postings_doc_o, postings_impact_o)
    out_doc, out_imp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q * padg,), jnp.int32),
            jax.ShapeDtypeStruct((q * padg,), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, lens, cum, *hbm_in)

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


def _assemble_kernel(src_ref, rlen_ref, wt_ref, doc_hbm, imp_hbm,
                     out_doc, out_imp, win_doc, win_imp, stage_doc, stage_imp,
                     sems, *, tq, sentinel, weighted, pad, rows):
    """One grid step assembles ``rows`` query rows of COMPACTLY packed
    short-term postings: per term, a 2-block window DMA from the compact
    store, a bit-decomposed roll to the row's current fill position, and a
    masked select into a 2-block VMEM staging buffer that flushes full
    1024-blocks to the output row. Replaces the XLA per-element gather
    (~70 ns/element measured) for the over-cap fallback's short tail with
    ~3 DMAs + ~100 vector ops per term. Terms must be shorter than one
    block (the bitonic store's ``min_len`` upper-bounds short terms at
    256 < 1024).

    Memref layout follows _bitonic_gather_kernel: the output block is
    (1, 1, rows*pad) — rows packed along the LANE dim of one sublane —
    so every flush is a 2-D (1, len) -> (1, len) copy at 1024-aligned
    lane offsets. Mosaic rejects the two sublane-major alternatives:
    a (1, pad) block over a (Q, pad) array fails the block-divisibility
    rule, and a 1-sublane DMA slice of an (8, W) scratch fails tiling
    ("Slice shape along dimension 0 must be aligned to tiling (8)") —
    both crashed the round-3 headline bench (logs/measure_bm25.err).

    ``weighted`` applies the per-(query, term) dedup weight at select time
    (prefetched as int32 bit patterns — SMEM scalars are 32-bit; bitcast
    back to f32 in-kernel)."""
    base = pl.program_id(0) * rows  # hoisted: see _bitonic_gather_kernel
    # staging width: one 2-block window is enough roll headroom — fill
    # and per-term L are both < _ALIGN, so fill+L <= 2*_ALIGN-2 and the
    # rotate never wraps (and one fewer roll pass than a 4-block stage)
    W = 2 * _ALIGN
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def row(local, carry_outer):
        qi = base + local
        row0 = local * pad  # this row's flat lane offset in the out block

        stage_doc[:] = jnp.full((1, W), sentinel, jnp.int32)
        stage_imp[:] = jnp.zeros((1, W), jnp.float32)

        def flush_block(nblk, n_lanes):
            dd = pl.multiple_of(row0 + nblk * _ALIGN, _ALIGN)
            c1 = pltpu.make_async_copy(
                stage_doc.at[pl.ds(0, 1), pl.ds(0, n_lanes)],
                out_doc.at[0, pl.ds(0, 1), pl.ds(dd, n_lanes)],
                sems.at[0],
            )
            c2 = pltpu.make_async_copy(
                stage_imp.at[pl.ds(0, 1), pl.ds(0, n_lanes)],
                out_imp.at[0, pl.ds(0, 1), pl.ds(dd, n_lanes)],
                sems.at[1],
            )
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()

        def term(t, carry):
            fill, nblk = carry
            L = rlen_ref[t, qi]

            @pl.when(L > 0)
            def _():
                start = src_ref[t, qi]
                win = (start // _ALIGN) * _ALIGN
                off = start - win
                wo = pl.multiple_of(win, _ALIGN)
                c1 = pltpu.make_async_copy(
                    doc_hbm.at[pl.ds(0, 1), pl.ds(wo, 2 * _ALIGN)],
                    win_doc.at[pl.ds(0, 1), pl.ds(0, 2 * _ALIGN)],
                    sems.at[0],
                )
                c2 = pltpu.make_async_copy(
                    imp_hbm.at[pl.ds(0, 1), pl.ds(wo, 2 * _ALIGN)],
                    win_imp.at[pl.ds(0, 1), pl.ds(0, 2 * _ALIGN)],
                    sems.at[1],
                )
                c1.start()
                c2.start()
                c1.wait()
                c2.wait()
                # roll the window so the term's data starts at lane ``fill``
                # (static-amount rolls gated by the dynamic shift's bits —
                # the reliable form of a dynamic rotate, as in the bitonic
                # gather)
                xd = win_doc[:]
                xi = win_imp[:]
                sh = (fill - off) % W
                bits = (W - 1).bit_length()
                for b in range(bits):
                    bit = ((sh >> b) & 1) == 1
                    amt = 1 << b
                    xd = jnp.where(bit, pltpu.roll(xd, amt, axis=1), xd)
                    xi = jnp.where(bit, pltpu.roll(xi, amt, axis=1), xi)
                mask = (lane >= fill) & (lane < fill + L)
                if weighted:
                    # Mosaic's tpu.bitcast takes vectors only — a scalar
                    # i32->f32 bitcast fails TPU verification (this, not
                    # the layout, crashed the r3/r4 headline bench:
                    # logs/measure_bm25.err). Splat the SMEM bit pattern
                    # across the lane dim first; interpret mode accepted
                    # the scalar form, which is why tests missed it.
                    w = jax.lax.bitcast_convert_type(
                        jnp.full((1, W), wt_ref[t, qi], jnp.int32),
                        jnp.float32,
                    )
                    xi = xi * w
                stage_doc[:] = jnp.where(mask, xd, stage_doc[:])
                stage_imp[:] = jnp.where(mask, xi, stage_imp[:])

            fill2 = fill + L
            flushed = fill2 >= _ALIGN

            @pl.when(flushed)
            def _():
                flush_block(nblk, _ALIGN)
                # shift the staging buffer left one block; refill the
                # vacated tail with sentinels
                sd = pltpu.roll(stage_doc[:], W - _ALIGN, axis=1)
                si = pltpu.roll(stage_imp[:], W - _ALIGN, axis=1)
                tail = lane >= W - _ALIGN
                stage_doc[:] = jnp.where(tail, sentinel, sd)
                stage_imp[:] = jnp.where(tail, 0.0, si)

            fill2 = jnp.where(flushed, fill2 - _ALIGN, fill2)
            return fill2, nblk + flushed.astype(jnp.int32)

        fill, nblk = jax.lax.fori_loop(
            0, tq, term, (jnp.int32(0), jnp.int32(0))
        )

        @pl.when(fill > 0)
        def _():
            # final partial block: stage already sentinel-padded past fill
            flush_block(nblk, _ALIGN)

        return carry_outer

    jax.lax.fori_loop(0, rows, row, 0)


@functools.partial(
    jax.jit, static_argnames=("pad", "sentinel", "row_tile", "interpret")
)
def postings_assemble_pallas(
    doc_c: jnp.ndarray,  # (1, NNZ + >=2-block guard) int32 compact copy
    imp_c: jnp.ndarray,  # same shape f32
    src: jnp.ndarray,  # [Q, TQ] int32 compact start offsets (0 masked)
    rlen: jnp.ndarray,  # [Q, TQ] int32 posting counts (0 masked), < 1024
    wt_bits: Optional[jnp.ndarray] = None,  # [Q, TQ] int32 f32-bitcast weights
    *,
    pad: int,
    sentinel: int,
    row_tile: int = 1,
    interpret: bool = False,
):
    """Compactly packed short-term gather (same [Q, pad] contract as
    ops.sparse.postings_gather, weights pre-applied) as DMA windows + VMEM
    rolls — see _assemble_kernel. ``pad`` must be a 1024-multiple >= the
    largest row total (the flush writes whole blocks). ``row_tile`` > 1
    assembles that many query rows per grid step in the lane-major
    (1, 1, row_tile*pad) block layout (Q is zero-row padded up to a
    multiple; padded rows write nothing and the sentinel-fix below covers
    them)."""
    if pad % _ALIGN:
        raise ValueError(f"assemble pad must be a {_ALIGN}-multiple, got {pad}")
    q_in, tq = src.shape
    rt = row_tile
    q = -(-q_in // rt) * rt
    if q != q_in:  # zero rows: L=0 for every term -> the row never flushes
        src = jnp.pad(src, ((0, q - q_in), (0, 0)))
        rlen = jnp.pad(rlen, ((0, q - q_in), (0, 0)))
        if wt_bits is not None:
            wt_bits = jnp.pad(wt_bits, ((0, q - q_in), (0, 0)))
    weighted = wt_bits is not None
    # prefetch operands as [TQ, Q]: SMEM lane padding (see bm25_search_bitonic)
    pre = [src.T, rlen.T]
    pre.append(wt_bits.T if weighted else jnp.zeros((tq, q), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q // rt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=[
            pl.BlockSpec((1, 1, rt * pad), lambda qi, *_: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt * pad), lambda qi, *_: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 2 * _ALIGN), jnp.int32),
            pltpu.VMEM((1, 2 * _ALIGN), jnp.float32),
            pltpu.VMEM((1, 2 * _ALIGN), jnp.int32),
            pltpu.VMEM((1, 2 * _ALIGN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _assemble_kernel, tq=tq, sentinel=sentinel, weighted=weighted,
        pad=pad, rows=rt,
    )
    out_doc, out_imp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q // rt, 1, rt * pad), jnp.int32),
            jax.ShapeDtypeStruct((q // rt, 1, rt * pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*pre, doc_c, imp_c)
    out_doc = out_doc.reshape(q, pad)[:q_in]
    out_imp = out_imp.reshape(q, pad)[:q_in]
    # sentinel-fix the unwritten row tails (blocks past the final flush)
    total = jnp.sum(rlen[:q_in], axis=1, dtype=jnp.int32)[:, None]
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


# ------------------------------------------------- bitonic single-dispatch


def _bitonic_gather_kernel(
    src_ref, srcr_ref, slot_ref, rlen_ref, big_ref, cum_ref,
    doc_e, imp_e, doc_o, imp_o, doc_c, imp_c, doc_r, imp_r,
    out_doc, out_imp, scr_doc, scr_imp, sems,
    *, tq, sentinel, block, pad, row_tile,
):
    """Assemble ``row_tile`` query rows of the bitonic layout (see
    bm25_index.BitonicStore): long terms as chunked DMA copies from the E/O
    block-alternated store (copy chosen by the slot's 1024-block parity);
    short terms as a 2-block window DMA from the (forward | reversed)
    compact store, rotated into place with a bit-decomposed roll in VMEM
    scratch, sentinel-masked, and DMA'd into the row. Every 1024-block of a
    produced row is sorted (ascending at even block index, descending at
    odd) — the state after pass ``block`` of a bitonic network — so the sort
    kernel starts at pass ``2*block``.

    Memref shapes are chosen for Mosaic's DMA rules: HBM stores are (1, N)
    and the output block is (1, 1, row_tile*pad), so every copy is a 2-D
    (1, len) -> (1, len) transfer at 1024-aligned lane offsets (1-D <-> 2-D
    transfers and dynamic sub-8 sublane slices are rejected)."""
    win_w = 2 * block
    base = pl.program_id(0) * row_tile  # program_id is not substituted
    # inside loop bodies in interpret mode; hoist it

    def row(local, carry):
        qi = base + local
        row0 = local * pad

        def term(t, carry):
            w = slot_ref[t, qi]

            @pl.when(w > 0)
            def _():
                dloc = cum_ref[t, qi]  # row-local offset
                d0 = row0 + dloc  # flat buffer offset (DMA destination)
                # parity is the slot's 1024-block index WITHIN ITS ROW: the
                # sort sees [pad]-wide rows, so the asc/desc alternation must
                # follow the row-local block index, not the flat one (they
                # differ on odd rows when pad == block)
                parity = (dloc // block) & 1
                s = src_ref[t, qi]

                @pl.when(big_ref[t, qi] == 1)
                def _():
                    def chunks(doc_hbm, imp_hbm):
                        def one(c, carry):
                            off = c * block
                            so = pl.multiple_of(s + off, block)
                            do_ = pl.multiple_of(d0 + off, block)
                            c1 = pltpu.make_async_copy(
                                doc_hbm.at[pl.ds(0, 1), pl.ds(so, block)],
                                out_doc.at[0, pl.ds(0, 1), pl.ds(do_, block)],
                                sems.at[0])
                            c2 = pltpu.make_async_copy(
                                imp_hbm.at[pl.ds(0, 1), pl.ds(so, block)],
                                out_imp.at[0, pl.ds(0, 1), pl.ds(do_, block)],
                                sems.at[1])
                            c1.start(); c2.start(); c1.wait(); c2.wait()
                            return carry
                        jax.lax.fori_loop(0, w // block, one, 0)

                    @pl.when(parity == 0)
                    def _():
                        chunks(doc_e, imp_e)

                    @pl.when(parity == 1)
                    def _():
                        chunks(doc_o, imp_o)

                @pl.when(big_ref[t, qi] == 0)
                def _():
                    L = rlen_ref[t, qi]
                    # slot parity picks data direction: even -> ascending
                    # run from the compact store; odd -> descending run from
                    # the reversed store (srcr = nnz - src - len, computed by
                    # the planner so the kernel needs no per-shard nnz),
                    # placed at the slot TAIL so the sentinel padding leads
                    # (block stays sorted desc)
                    start = jnp.where(parity == 0, s, srcr_ref[t, qi])
                    win = (start // block) * block
                    sh = jnp.where(
                        parity == 0,
                        start - win,
                        (start - win - (block - L) + win_w) % win_w,
                    )

                    def dma_in(doc_hbm, imp_hbm):
                        wo = pl.multiple_of(win, block)
                        c1 = pltpu.make_async_copy(
                            doc_hbm.at[pl.ds(0, 1), pl.ds(wo, win_w)],
                            scr_doc.at[pl.ds(0, 1), pl.ds(0, win_w)],
                            sems.at[0])
                        c2 = pltpu.make_async_copy(
                            imp_hbm.at[pl.ds(0, 1), pl.ds(wo, win_w)],
                            scr_imp.at[pl.ds(0, 1), pl.ds(0, win_w)],
                            sems.at[1])
                        c1.start(); c2.start(); c1.wait(); c2.wait()

                    @pl.when(parity == 0)
                    def _():
                        dma_in(doc_c, imp_c)

                    @pl.when(parity == 1)
                    def _():
                        dma_in(doc_r, imp_r)

                    xd = scr_doc[:]  # (1, 2*block)
                    xi = scr_imp[:]
                    bits = (win_w - 1).bit_length()
                    for b in range(bits):  # roll left by sh, bit-decomposed
                        bit = ((sh >> b) & 1) == 1
                        amt = (win_w - (1 << b)) % win_w
                        xd = jnp.where(bit, pltpu.roll(xd, amt, axis=1), xd)
                        xi = jnp.where(bit, pltpu.roll(xi, amt, axis=1), xi)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, win_w), 1)
                    even = parity == 0
                    keep = (even & (lane < L)) | (
                        ~even & (lane >= block - L) & (lane < block))
                    scr_doc[:] = jnp.where(keep, xd, sentinel)
                    scr_imp[:] = jnp.where(keep, xi, 0.0)
                    dd = pl.multiple_of(d0, block)
                    c1 = pltpu.make_async_copy(
                        scr_doc.at[pl.ds(0, 1), pl.ds(0, block)],
                        out_doc.at[0, pl.ds(0, 1), pl.ds(dd, block)],
                        sems.at[0])
                    c2 = pltpu.make_async_copy(
                        scr_imp.at[pl.ds(0, 1), pl.ds(0, block)],
                        out_imp.at[0, pl.ds(0, 1), pl.ds(dd, block)],
                        sems.at[1])
                    c1.start(); c2.start(); c1.wait(); c2.wait()
            return carry

        jax.lax.fori_loop(0, tq, term, 0)
        return carry

    jax.lax.fori_loop(0, row_tile, row, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pad", "sentinel_doc", "k", "block", "interpret", "narrow_sort_max",
    ),
)
def bm25_search_bitonic(
    doc_e, imp_e, doc_o, imp_o, doc_c, imp_c, doc_r, imp_r,
    src, srcr, slot, rlen, big, wtblk=None,
    *, pad: int, sentinel_doc: int, k: int, block: int = 1024,
    interpret: bool = False, narrow_sort_max: int = NARROW_SORT_MAX_PAD,
):
    """Single-dispatch BM25 search over the bitonic postings store: DMA/roll
    gather (every 1024-block of each row sorted) -> bitonic sort starting at
    pass 2*block (ops/pallas_sort.py) -> fused run-reduction + top-k.

    Store arrays must be 2-D (1, N) (BM25Engine reshapes on device_put).
    src/srcr/slot/rlen/big are [Q, TQ] int32 per-(query, term) descriptors
    from BM25Engine planning: aligned-store offset | compact offset, the
    reversed-compact offset (nnz - src - len; short terms only), slot width
    (aligned len | block | 0 for masked), real posting count, and the
    long-term flag. Row width ``pad`` must be a power of two >= the largest
    row total.

    ``wtblk`` ([Q, pad // block] f32, optional) scales each 1024-block's
    impacts — the exact term-dedup hook: slots are block-aligned, so the
    planner can express "term t was planned once for m occurrences" as
    weight m on every block of t's slot. The multiply fuses into the row-
    tail masking pass that already touches [Q, pad]; unweighted calls
    compile the variant without it.

    Row widths above ``NARROW_SORT_MAX_PAD`` (32768) sort on the
    while_loop-form wide bitonic network (ops/pallas_sort.py::
    sort_pairs_pallas_wide — compact compile: 512K built in 69 s where the
    unrolled network took 74 s at 32K and would be pathological beyond)
    instead of the unrolled per-pass network, raising the main-path row cap
    from 32768 to 524288 slots. At the reference's 21M-passage corpus scale
    78%% of queries used to exceed the 32K cap and fall back to the exact
    two-program over-cap path with its ~30x per-query planning cost
    (ROUND4_NOTES §7); with the wide sort they ride the single fused
    bucket-stream dispatch."""
    from probing_rag_tpu.ops.pallas_sort import (
        sort_pairs_pallas,
        sort_pairs_pallas_wide,
    )

    q_in, tq = src.shape
    row_tile = 8
    q = -(-q_in // row_tile) * row_tile
    if q != q_in:
        padrows = ((0, q - q_in), (0, 0))
        src = jnp.pad(src, padrows)
        srcr = jnp.pad(srcr, padrows)
        slot = jnp.pad(slot, padrows)
        rlen = jnp.pad(rlen, padrows)
        big = jnp.pad(big, padrows)
    cum = (jnp.cumsum(slot, axis=-1) - slot).astype(jnp.int32)
    # prefetch operands live in SMEM lane-padded to 128: pass them as
    # [TQ, Q] (queries on the lane dim) so a 1024-row tile costs 32KB of
    # SMEM per operand instead of 512KB (measured OOM at [1024, 8])
    src_t, srcr_t, slot_t, rlen_t, big_t, cum_t = (
        a.T for a in (src, srcr, slot, rlen, big, cum)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(q // row_tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 8,
        out_specs=[
            pl.BlockSpec((1, 1, row_tile * pad), lambda qi, *_: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile * pad), lambda qi, *_: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 2 * block), jnp.int32),
            pltpu.VMEM((1, 2 * block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bitonic_gather_kernel, tq=tq, sentinel=sentinel_doc,
        block=block, pad=pad, row_tile=row_tile,
    )
    out_doc, out_imp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q // row_tile, 1, row_tile * pad), jnp.int32),
            jax.ShapeDtypeStruct((q // row_tile, 1, row_tile * pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
    )(src_t, srcr_t, slot_t, rlen_t, big_t, cum_t,
      doc_e, imp_e, doc_o, imp_o, doc_c, imp_c, doc_r, imp_r)
    out_doc = out_doc.reshape(q, pad)
    out_imp = out_imp.reshape(q, pad)

    # mask the never-written row tail (constant blocks sort trivially)
    total = (cum[:, -1] + slot[:, -1])[:, None]
    lane = jnp.arange(pad, dtype=jnp.int32)[None, :]
    valid = lane < total
    doc = jnp.where(valid, out_doc, sentinel_doc)
    imp = jnp.where(valid, out_imp, 0.0)
    if wtblk is not None:
        if wtblk.shape[0] != q:
            wtblk = jnp.pad(
                wtblk, ((0, q - wtblk.shape[0]), (0, 0)), constant_values=1.0
            )
        imp = imp * jnp.broadcast_to(
            wtblk[:, :, None], (q, pad // block, block)
        ).reshape(q, pad)
    if pad > narrow_sort_max:
        # k_start stays exactly 2*block: the gather's alternating
        # asc/desc sorted 1024-blocks satisfy the bitonic network's
        # stage-2048 precondition and nothing finer. lane_width shrinks
        # for small pads (tests) so each row still splits into >= 8
        # sub-rows (Mosaic block rule; the wrapper also self-shrinks).
        doc, imp = sort_pairs_pallas_wide(
            doc, imp, lane_width=min(8192, max(pad // 8, 2 * block)),
            k_start=2 * block, interpret=interpret
        )
    else:
        doc, imp = sort_pairs_pallas(
            doc, imp, k_start=2 * block, interpret=interpret
        )
    scores, docs = segment_topk_pallas(
        doc, imp, k=k, sentinel=sentinel_doc, interpret=interpret
    )
    return scores[:q_in], docs[:q_in]
