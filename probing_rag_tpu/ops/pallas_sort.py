"""Pallas TPU bitonic sort over (key, value) rows — the XLA-sort replacement
in the BM25 scoring chain.

Why: XLA's variadic sort on TPU measures ~25 ns/element at the BM25 tile
shapes ([1024, 8192] int32 keys + f32 values) — ~60% of the whole search
budget. A whole-row-in-VMEM bitonic network runs the same sort at VPU
throughput: each compare-exchange stage is two dynamic ``pltpu.roll``s, a
compare, and selects over the row (~6 vector ops), and the full network is
``log2(P)*(log2(P)+1)/2`` stages with no HBM traffic in between.

The network loops are ``lax.while_loop``s with *traced* roll distances
(Mosaic supports dynamic rotate amounts), so the compiled kernel is compact
regardless of P — no unrolled 100k-instruction bodies.

Keys sort ascending. Ties keep both elements' own payloads (pairs are
preserved; callers sum payloads per key downstream, so intra-key payload
order is irrelevant). Rows must be a power of two wide; callers pad with a
+inf-like sentinel key (BM25 uses ``n_docs``).

Used by retrieval/bm25.py (sort stage of the fused search); reference
behavior being replaced: rank_bm25's per-query python scoring loop
(SURVEY.md §2.3, exp_rag.py:426).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stage(x, v, lane, k, j, p):
    """One bitonic compare-exchange stage at (block size k, distance j)."""
    pj = p - j  # roll(x, p - j)[i] == x[(i + j) % p]
    up_x = pltpu.roll(x, pj, axis=1)
    dn_x = pltpu.roll(x, j, axis=1)
    up_v = pltpu.roll(v, pj, axis=1)
    dn_v = pltpu.roll(v, j, axis=1)
    is_low = (lane & j) == 0  # lower index of the compare-exchange pair
    px = jnp.where(is_low, up_x, dn_x)
    pv = jnp.where(is_low, up_v, dn_v)
    asc = (lane & k) == 0  # ascending block of the bitonic network
    want_min = asc == is_low
    # no bool-vector select (Mosaic i1 truncation limitation): use logic
    take_partner = (want_min & (px < x)) | (~want_min & (px > x))
    nx = jnp.where(take_partner, px, x)
    nv = jnp.where(take_partner, pv, v)
    return nx, nv


def _bitonic_kernel(
    key_ref, val_ref, out_key_ref, out_val_ref, *, unroll, k_start, k_stop
):
    p = key_ref.shape[1]
    shape = key_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    k_last = min(p, k_stop)

    if unroll:
        # Static roll distances (cheap vreg permutations / intra-vreg
        # rotates). Each stage round-trips through the output refs: without
        # the ref barrier Mosaic keeps every stage's temporaries live and
        # spills a >16MB stack (measured: 321ms/tile); with it the stack
        # stays one stage deep.
        out_key_ref[:] = key_ref[:]
        out_val_ref[:] = val_ref[:]
        k = k_start
        while k <= k_last:
            j = k // 2
            while j >= 1:
                nx, nv = _stage(out_key_ref[:], out_val_ref[:], lane, k, j, p)
                out_key_ref[:] = nx
                out_val_ref[:] = nv
                j //= 2
            k *= 2
    else:
        # dynamic roll distances inside a while_loop: the compiled body is a
        # single stage regardless of P (the unrolled form at P >= 16384
        # produces 100k+ Mosaic instructions and compiles for minutes).
        # Data flows through the refs so temporaries stay one stage deep.
        out_key_ref[:] = key_ref[:]
        out_val_ref[:] = val_ref[:]

        def stage(carry):
            k, j = carry
            nx, nv = _stage(out_key_ref[:], out_val_ref[:], lane, k, j, p)
            out_key_ref[:] = nx
            out_val_ref[:] = nv
            j2 = j // 2
            done = j2 == 0
            return (jnp.where(done, k * 2, k), jnp.where(done, k, j2))

        def cond(carry):
            k, _ = carry
            return k <= k_last

        jax.lax.while_loop(
            cond, stage, (jnp.int32(k_start), jnp.int32(k_start // 2))
        )


def _stage2d(x, v, lane, brow, k, j, w):
    """One pass of the width-``B*w`` network on the [B, w] row view.

    Element (b, l) holds global index ``i = b*w + l``. Passes with distance
    ``j < w`` pair elements within a sub-row (lane rolls, as in ``_stage``);
    passes with ``j >= w`` pair whole sub-rows ``b`` and ``b ^ (j//w)``
    (sublane rolls — elementwise vector ops, no lane movement at all). The
    ascending-block mask reads the ``k`` bit of the global index: the lane
    bits when ``k < w``, the sub-row bits otherwise."""
    b = x.shape[0]
    if j < w:
        up_x = pltpu.roll(x, w - j, axis=1)
        dn_x = pltpu.roll(x, j, axis=1)
        up_v = pltpu.roll(v, w - j, axis=1)
        dn_v = pltpu.roll(v, j, axis=1)
        is_low = (lane & j) == 0
    else:
        jb = j // w
        up_x = pltpu.roll(x, b - jb, axis=0)
        dn_x = pltpu.roll(x, jb, axis=0)
        up_v = pltpu.roll(v, b - jb, axis=0)
        dn_v = pltpu.roll(v, jb, axis=0)
        is_low = (brow & jb) == 0
    px = jnp.where(is_low, up_x, dn_x)
    pv = jnp.where(is_low, up_v, dn_v)
    asc = ((lane & k) == 0) if k < w else ((brow & (k // w)) == 0)
    want_min = asc == is_low
    take = (want_min & (px < x)) | (~want_min & (px > x))
    return jnp.where(take, px, x), jnp.where(take, pv, v)


def _stage2d_dynj(x, v, lane, brow, k, j, w):
    """In-row pass (``j < w``) with a TRACED distance ``j`` — the compact-
    compile variant's loop body (``k`` stays static; dynamic ``pltpu.roll``
    amounts are fine below the ~16k-lane regression, and ``lane_width``
    is chosen under it)."""
    up_x = pltpu.roll(x, w - j, axis=1)
    dn_x = pltpu.roll(x, j, axis=1)
    up_v = pltpu.roll(v, w - j, axis=1)
    dn_v = pltpu.roll(v, j, axis=1)
    is_low = (lane & j) == 0
    px = jnp.where(is_low, up_x, dn_x)
    pv = jnp.where(is_low, up_v, dn_v)
    asc = ((lane & k) == 0) if k < w else ((brow & (k // w)) == 0)
    want_min = asc == is_low
    take = (want_min & (px < x)) | (~want_min & (px > x))
    return jnp.where(take, px, x), jnp.where(take, pv, v)


def _bitonic_wide_kernel(
    key_ref, val_ref, out_key_ref, out_val_ref, *, k_start, total, unroll
):
    b, w = key_ref.shape
    shape = key_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    # ref barrier per pass, as in _bitonic_kernel (stack stays one pass deep)
    out_key_ref[:] = key_ref[:]
    out_val_ref[:] = val_ref[:]
    k = k_start
    while k <= total:
        j = k // 2
        # cross-row passes (j >= w): always static — there are only
        # O(log^2 B) of them and their sublane rolls are cheap to emit
        while j >= w:
            nx, nv = _stage2d(
                out_key_ref[:], out_val_ref[:], lane, brow, k, j, w
            )
            out_key_ref[:] = nx
            out_val_ref[:] = nv
            j //= 2
        if unroll:
            while j >= 1:
                nx, nv = _stage2d(
                    out_key_ref[:], out_val_ref[:], lane, brow, k, j, w
                )
                out_key_ref[:] = nx
                out_val_ref[:] = nv
                j //= 2
        elif j >= 1:
            # in-row passes as ONE while_loop body per stage k: the
            # unrolled form at fallback widths (150+ passes) compiles for
            # tens of minutes; this emits ~log2(total) compact bodies
            k_static = k

            def one_pass(jc):
                nx, nv = _stage2d_dynj(
                    out_key_ref[:], out_val_ref[:], lane, brow,
                    k_static, jc, w,
                )
                out_key_ref[:] = nx
                out_val_ref[:] = nv
                return jc // 2

            jax.lax.while_loop(
                lambda jc: jc >= 1, one_pass, jnp.int32(j)
            )
        k *= 2


@functools.partial(
    jax.jit, static_argnames=("lane_width", "interpret", "k_start", "unroll")
)
def sort_pairs_pallas_wide(
    keys: jnp.ndarray,  # [Q, P] int32, P a power of two > lane_width
    vals: jnp.ndarray,  # [Q, P] f32
    *,
    lane_width: int = 8192,
    interpret: bool = False,
    k_start: int = 2,
    unroll: bool = False,
):
    """Row-wise ascending (key, value) sort for rows wider than one VMEM
    sort tile, still entirely in VMEM: each [P] row is viewed as a
    [B, lane_width] block and the bitonic network's long-distance passes
    become sublane rolls (see ``_stage2d``).

    This replaces ``jax.lax.sort_key_val`` in the over-cap BM25 fallback
    (retrieval/bm25.py::_hybrid_gather_sort), where XLA's variadic sort at
    [64, 512K] costs ~25 ns/element; the network runs at VPU throughput
    like ``sort_pairs_pallas``. One query per grid step (a 512K row is
    4 MB of key+val; VMEM holds in+out copies comfortably, many rows would
    not fit). ``k_start`` as in ``sort_pairs_pallas``."""
    q, p = keys.shape
    if p & (p - 1):
        raise ValueError(f"row width must be a power of two, got {p}")
    if lane_width & (lane_width - 1):
        raise ValueError(f"lane_width must be a power of two, got {lane_width}")
    if p <= lane_width:
        return sort_pairs_pallas(
            keys, vals, tile_q=min(8, q), interpret=interpret, k_start=k_start
        )
    if k_start & (k_start - 1) or k_start < 2:
        raise ValueError(f"k_start must be a power of two >= 2, got {k_start}")
    b = p // lane_width
    if b < 8:
        # Mosaic's block rule: the sublane dim of a block must be divisible
        # by 8 or equal the whole array's — a (4, 8192) block over a
        # (Q*4, 8192) array aborts lowering (caught by scripts/tpu_smoke.py
        # on widths 16k/32k, reachable when the caller shrinks max_pad).
        # Shrink the lane view so every row splits into exactly 8 sub-rows;
        # p >= 2*lane_width here, so lane_width stays >= 2048 — far below
        # the ~16k-lane dynamic-roll regression.
        lane_width = p // 8
        b = 8
    kr = keys.reshape(q * b, lane_width)
    vr = vals.reshape(q * b, lane_width)
    grid = (q,)
    out_k, out_v = pl.pallas_call(
        functools.partial(
            _bitonic_wide_kernel, k_start=k_start, total=p, unroll=unroll
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b, lane_width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b, lane_width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (b, lane_width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b, lane_width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q * b, lane_width), keys.dtype),
            jax.ShapeDtypeStruct((q * b, lane_width), vals.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(kr, vr)
    return out_k.reshape(q, p), out_v.reshape(q, p)


@functools.partial(
    jax.jit,
    static_argnames=("tile_q", "interpret", "unroll", "k_start", "k_stop"),
)
def sort_pairs_pallas(
    keys: jnp.ndarray,  # [Q, P] int32, P a power of two
    vals: jnp.ndarray,  # [Q, P] f32
    *,
    tile_q: int = 8,
    interpret: bool = False,
    unroll: bool = True,
    k_start: int = 2,
    k_stop: Optional[int] = None,
):
    """Row-wise ascending sort of (key, value) pairs, whole row in VMEM.

    ``k_start`` skips the network's first passes: with ``k_start = 2*B`` the
    caller guarantees every aligned ``B``-wide block of each row is already
    sorted — ascending at even block index, descending at odd (the exact
    state after pass ``B`` of the standard network). The BM25 gather kernel
    produces this layout directly from the block-alternated postings store
    (bm25_index.bitonic_csr), cutting the stage count roughly in half at
    production widths.

    ``k_stop`` truncates the network AFTER stage ``k_stop``: the result is
    not sorted but every aligned ``k_stop``-wide block is (alternating, as
    above) — i.e. it ESTABLISHES the ``k_start = 2*k_stop`` precondition
    for a later, wider sort. The over-cap fallback preconditions its
    XLA-gathered short tail this way before the wide-row network."""
    q, p = keys.shape
    if p & (p - 1):
        raise ValueError(f"row width must be a power of two, got {p}")
    if k_start & (k_start - 1) or k_start < 2:
        raise ValueError(f"k_start must be a power of two >= 2, got {k_start}")
    if k_stop is None:
        k_stop = p
    elif k_stop & (k_stop - 1) or k_stop < 2:
        raise ValueError(f"k_stop must be a power of two >= 2, got {k_stop}")
    if k_start > min(p, k_stop):
        return keys, vals  # nothing to do at this network span
    qp = -(-q // tile_q) * tile_q
    if qp != q:
        # padding rows sort trivially (constant keys)
        keys = jnp.pad(keys, ((0, qp - q), (0, 0)))
        vals = jnp.pad(vals, ((0, qp - q), (0, 0)))
    grid = (qp // tile_q,)
    out_k, out_v = pl.pallas_call(
        functools.partial(
            _bitonic_kernel, unroll=unroll, k_start=k_start, k_stop=k_stop
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, p), keys.dtype),
            jax.ShapeDtypeStruct((qp, p), vals.dtype),
        ],
        interpret=interpret,
        # [tile_q, P] blocks at production widths exceed the default 16MB
        # scoped-vmem budget (v5e has 128MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(keys, vals)
    return out_k[:q], out_v[:q]
