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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD = 16  # scratch top-k width (>= requested k), aligned-ish


class PreparedDenseStore(NamedTuple):
    """Device-resident store from :func:`prepare_dense_store` (a pytree).

    ``scales`` is None for f32/bf16 stores; for int8 stores it is the
    per-vector dequantization scale broadcast to ``[8, N_pad]`` (TPU block
    shapes need the second-to-last dim divisible by 8)."""

    embeddings: jnp.ndarray  # [N_pad, D], store dtype
    sq_norms: Optional[jnp.ndarray]  # [8, N_pad] f32 (l2 only)
    scales: Optional[jnp.ndarray]  # [8, N_pad] f32 (int8 only)
    n_docs: int


def topk_merge_tile(scores, idx_source, run_vals, run_idx, k, thresh_k=None):
    """Fold one [QB, TN] candidate tile into the running top-k ([QB, K_PAD]).

    ``idx_source[q, lane]`` is the id recorded for a candidate (a global
    column for dense search, a doc id for sparse run totals). -inf scores
    never insert (run_vals is seeded with -inf and insertion positions past
    the existing -inf tail are no-ops for ranking).

    Adaptive round count: insert rounds run only while some row's best
    remaining candidate beats that row's current ``k``-th value — never more
    than ``k`` rounds (each round extracts the global remaining max of a
    qualifying tile), and almost always 0-2 once the running top-k is warm
    (expected qualifying candidates per [256, 2048] tile of a 500k-doc sweep
    is ~0.04/query). The fixed-``k`` version of this loop was the dense
    kernel's bottleneck: ~30 us/tile of serial VPU reduces, 10x the tile's
    DMA time, dropping the sweep to 7-13%% of HBM bandwidth (measured).

    ``k`` bounds the insert rounds (the most candidates one call can place);
    ``thresh_k`` is the buffer rank whose value gates insertion, defaulting
    to ``k``. Callers merging a few candidates into a deeper buffer (the
    segment kernel's run-carry merges use k=1 against a top-``K`` buffer)
    must pass their true ``thresh_k=K`` — gating a single candidate on slot
    0 would drop everything below the current best."""
    qb, tn = scores.shape
    tk = k if thresh_k is None else thresh_k
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, tn), 1)
    # buffer width from the running buffer itself (callers size it K_PAD
    # or a per-call k_pad; lanes pad to 128 so wider buffers are ~free)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qb, run_vals.shape[-1]), 1)

    def qualifies(scores_max, run_vals):
        # a candidate only matters if it beats its row's current k-th value;
        # ties can't change the ranking (insertion is stable) and -inf
        # (exhausted / masked) never qualifies
        return scores_max[:, 0] > run_vals[:, tk - 1]

    def cond(carry):
        scores_max, _, run_vals, _ = carry
        return jnp.any(qualifies(scores_max, run_vals))

    def body(carry):
        cur_max, scores, run_vals, run_idx = carry
        live = qualifies(cur_max, run_vals)[:, None]  # [QB, 1]
        is_max = scores == cur_max
        cur_arg = jnp.min(jnp.where(is_max, lane, tn), axis=-1, keepdims=True)
        cur_id = jnp.sum(
            jnp.where(lane == cur_arg, idx_source, 0), axis=-1, keepdims=True
        )
        # mask the taken element (also in non-qualifying rows: their max is
        # <= their k-th value, so it could never insert in a later round
        # either — run_vals only rises)
        scores = jnp.where(lane == cur_arg, -jnp.inf, scores)
        # insertion position among running values (descending order)
        pos = jnp.sum((run_vals > cur_max).astype(jnp.int32), axis=-1, keepdims=True)
        insert = (kcol == pos) & live
        shift_right = (kcol > pos) & live
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
        return jnp.max(scores, axis=-1, keepdims=True), scores, new_vals, new_idx

    _, _, run_vals, run_idx = jax.lax.while_loop(
        cond, body,
        (jnp.max(scores, axis=-1, keepdims=True), scores, run_vals, run_idx),
    )
    return run_vals, run_idx


def topk_merge_tile_nocarry(scores, idx_base, run_vals, run_idx, k,
                            thresh_k=None):
    """Threshold-descent variant of :func:`topk_merge_tile`: same contract,
    but the while_loop never carries (or rewrites) the [QB, TN] score
    block. ``topk_merge_tile`` masks the extracted element into a fresh
    copy of ``scores`` every round — a [QB, TN] f32 carry that Mosaic
    round-trips through VMEM (~1 MB per round at [64, 4096]). Here the
    carry is only the cursor ``(cur_s [QB,1], cur_l [QB,1])`` plus the
    small running buffers: each round inserts the cursor element and then
    re-finds the strictly-next element in lexicographic (score desc, lane
    asc) order by re-reading the loop-invariant ``scores`` closure. Exact:
    the lex order is a total order (lane ids are unique), so descent
    enumerates candidates in exactly the order the masking version does.

    ``idx_base`` is the global id of lane 0 (a scalar; dense columns are
    contiguous) — recorded ids are ``idx_base + lane``."""
    qb, tn = scores.shape
    tk = k if thresh_k is None else thresh_k
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, tn), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qb, run_vals.shape[-1]), 1)

    def first_cursor():
        cur_s = jnp.max(scores, axis=-1, keepdims=True)
        cur_l = jnp.min(
            jnp.where(scores == cur_s, lane, tn), axis=-1, keepdims=True)
        return cur_s, cur_l

    def cond(carry):
        cur_s, _, run_vals, _ = carry
        return jnp.any(cur_s[:, 0] > run_vals[:, tk - 1])

    def body(carry):
        cur_s, cur_l, run_vals, run_idx = carry
        live = (cur_s[:, 0] > run_vals[:, tk - 1])[:, None]
        pos = jnp.sum(
            (run_vals > cur_s).astype(jnp.int32), axis=-1, keepdims=True)
        insert = (kcol == pos) & live
        shift_right = (kcol > pos) & live
        prev_vals = jnp.concatenate(
            [jnp.full((qb, 1), -jnp.inf, run_vals.dtype), run_vals[:, :-1]],
            axis=-1)
        prev_idx = jnp.concatenate(
            [jnp.full((qb, 1), -1, run_idx.dtype), run_idx[:, :-1]], axis=-1)
        cur_id = idx_base + cur_l
        new_vals = jnp.where(
            insert, cur_s, jnp.where(shift_right, prev_vals, run_vals))
        new_idx = jnp.where(
            insert, cur_id, jnp.where(shift_right, prev_idx, run_idx))
        # strictly-next in (score desc, lane asc) lex order — scores is
        # read-only here, so rows that stopped qualifying do idle lanes'
        # worth of VPU work but no VMEM writes
        after = (scores < cur_s) | ((scores == cur_s) & (lane > cur_l))
        cand = jnp.where(after, scores, -jnp.inf)
        nxt_s = jnp.max(cand, axis=-1, keepdims=True)
        nxt_l = jnp.min(
            jnp.where(cand == nxt_s, lane, tn), axis=-1, keepdims=True)
        return nxt_s, nxt_l, new_vals, new_idx

    cur_s, cur_l = first_cursor()
    _, _, run_vals, run_idx = jax.lax.while_loop(
        cond, body, (cur_s, cur_l, run_vals, run_idx))
    return run_vals, run_idx


def _kernel(q_ref, emb_ref, sqn_ref, scl_ref, out_v_ref, out_i_ref, vals,
            idxs, *, k, metric, n_total, tile_n, group_rows, merge_segs,
            int8_store, merge_mode, mxu_int8):
    ni = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(ni == 0)
    def _():
        vals[:] = jnp.full_like(vals, -jnp.inf)
        idxs[:] = jnp.full_like(idxs, -1)

    emb = emb_ref[:]
    if int8_store and mxu_int8:
        # full-int8 MXU path: queries arrive pre-quantized (per-row int8;
        # the row scale factors out of the row's ranking and is applied to
        # the returned values OUTSIDE the kernel), the dot runs on the
        # MXU's int8xint8->int32 path (2x the bf16 MAC rate on v5e), and
        # only the per-DOC scale — which does affect ranking — multiplies
        # the scores here
        scores = jnp.dot(
            q_ref[:], emb.T, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * scl_ref[0:1, :]
    else:
        if int8_store:
            # the sweep is HBM-read bound: the tile rides the bus as int8
            # (half the bf16 bytes) and is dequantized HERE, in VMEM, to
            # bf16 for the MXU; the per-vector scale multiplies the f32
            # scores once (int8 -> bf16 is exact for |v| <= 127)
            emb = emb.astype(jnp.bfloat16)
        scores = jnp.dot(
            q_ref[:], emb.T, preferred_element_type=jnp.float32
        )  # [QB, TN]
        if int8_store:
            scores = scores * scl_ref[0:1, :]
    if metric == "l2":
        # rank by -(||d||^2 - 2 q.d); caller re-adds ||q||^2
        scores = 2.0 * scores - sqn_ref[0:1, :]

    # Per-tile critical path = matmul + this one row-max + a scalar any():
    # measured 1.27 ms/batch at [256 x 500k x 768] vs 2.50 ms when the
    # column iota, the n_total mask select, and the merge while-loop's
    # [QB, TN] f32 carry ran unconditionally — ~10 us/tile of VPU work and
    # carry copies for tiles that insert nothing. Everything beyond the
    # row-max lives behind the pl.when, which fires on the rare tile with a
    # candidate (expected ~0.04 qualifying candidates per tile on unordered
    # data once the running top-k is warm).
    row_max = jnp.max(scores, axis=-1)  # [QB]

    qb = scores.shape[0]
    gq = min(group_rows, qb) if group_rows else qb
    if qb % gq:  # groups must tile the block exactly (static shapes)
        gq = qb
    base = ni * tile_n

    # Merge per ``gq``-row group, each behind its own gate: the serial
    # insert rounds of ``topk_merge_tile`` run max-candidates-per-row-in-
    # the-group times (vs per-whole-block), and every round's TN-wide ops
    # shrink by QB/gq. At [256 x 4096] tiles of a 500k sweep virtually
    # every 256-row block qualifies (~50 expected inserts spread over the
    # rows), so the whole-block gate never skips — the group split is what
    # actually cuts the merge cost.
    sw = tile_n // merge_segs if merge_segs and tile_n % merge_segs == 0 \
        else tile_n
    for g in range(0, qb, gq):
        # Lane-segment split (merge_segs > 1): the serial insert rounds
        # of topk_merge_tile cost rounds x [gq, width] VPU work, and
        # rounds = max candidates per row IN THE MERGED SPAN. Splitting
        # the tile into static lane segments makes each span ~1/segs as
        # wide AND usually 1-round (candidates per (row, segment) are
        # Poisson-thin), at the price of one gate + one [gq, sw] max
        # per segment. Each segment's inserts also raise the running
        # k-th threshold for the next segment's gate.
        #
        # Gates stay FLAT: each segment's pl.when is emitted at the top
        # level of the kernel, not nested inside a per-group pl.when — a
        # segment gate (seg max > kth) strictly implies the group gate,
        # so the outer conditional is redundant, and the nested
        # when-in-when form SIGABRTed the TPU compiler (the r3
        # dense_bf16_segs4/8 bench failures; scripts/tpu_smoke.py repro).
        for s0 in range(0, tile_n, sw):
            seg = scores[g : g + gq, s0 : s0 + sw]
            # per-segment column ids from a FRESH iota: slicing one
            # tile-wide iota-derived array (col[:, s0:s0+sw]) into
            # topk_merge_tile SIGABRTs the TPU compiler — the actual
            # root cause of the r3 dense_bf16_segs4/8 failures, isolated
            # by scripts/bisect_segs.py (sliced scores are fine, the
            # sliced iota operand is not)
            seg_col = (base + s0) + jax.lax.broadcasted_iota(
                jnp.int32, (gq, sw), 1
            )

            def merge(seg=seg, seg_col=seg_col, g=g, s0=s0):
                # pad columns exist only in the final (partial) tile; a
                # pad lane may spuriously trip the gates there — masked
                # before the merge, so it inserts nothing
                s = jnp.where(seg_col < n_total, seg, -jnp.inf)
                if merge_mode == "nocarry":
                    new_vals, new_idx = topk_merge_tile_nocarry(
                        s, base + s0, vals[g : g + gq, :],
                        idxs[g : g + gq, :], k,
                    )
                else:
                    new_vals, new_idx = topk_merge_tile(
                        s, seg_col, vals[g : g + gq, :],
                        idxs[g : g + gq, :], k,
                    )
                vals[g : g + gq, :] = new_vals
                idxs[g : g + gq, :] = new_idx

            if sw == tile_n:
                # single span: gate on the group's row-max (cheap — the
                # row_max above is already on the critical path)
                gate = jnp.any(row_max[g : g + gq] > vals[g : g + gq, k - 1])
            else:
                gate = jnp.any(
                    jnp.max(seg, axis=-1) > vals[g : g + gq, k - 1]
                )
            pl.when(gate)(merge)

    @pl.when(ni == n_tiles - 1)
    def _():
        out_v_ref[:] = vals[:]
        out_i_ref[:] = idxs[:]


def prepare_dense_store(
    embeddings: jnp.ndarray,  # [N, D]
    *,
    tile_n: int = 4096,
    metric: str = "ip",
    store_dtype: jnp.dtype | str | None = None,
) -> PreparedDenseStore:
    """One-time store preparation: pad the embedding matrix to a ``tile_n``
    multiple and (for ``l2``) materialize the squared-norm row block.

    Doing this per search call costs a full read+write copy of the matrix
    (the pad) plus a second full read (the norms) — measured at 3x the
    kernel's own HBM traffic at [500k x 768]. Callers that search the same
    store repeatedly (DenseEngine) should prepare once and pass the
    :class:`PreparedDenseStore` fields through to :func:`dense_topk_pallas`.

    ``store_dtype="int8"`` quantizes per vector (symmetric, scale =
    max|v|/127 — the faiss SQ8 layout): the flat sweep is HBM-bandwidth
    bound, so halving the store bytes vs bf16 roughly halves the sweep
    time. The kernel dequantizes each tile to bf16 in VMEM right before
    the matmul (the win is the HBM read, not the MXU dtype), and for
    ``l2`` the squared norms are taken from the DEQUANTIZED vectors so the
    ranking is exactly the quantized-store oracle's.
    """
    n = embeddings.shape[0]
    np_ = -(-n // tile_n) * tile_n
    if np_ != n:
        embeddings = jnp.pad(embeddings, ((0, np_ - n), (0, 0)))
    scales = None
    if store_dtype is not None and jnp.dtype(store_dtype) == jnp.int8:
        absmax = jnp.max(jnp.abs(embeddings.astype(jnp.float32)), axis=-1)
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)  # [N_pad]
        q = jnp.round(embeddings.astype(jnp.float32) / s[:, None])
        embeddings = jnp.clip(q, -127, 127).astype(jnp.int8)
        scales = jnp.asarray(
            jnp.broadcast_to(s[None, :], (8, np_)), jnp.float32
        )
    elif store_dtype is not None:
        embeddings = embeddings.astype(jnp.dtype(store_dtype))
    sq_norms = None
    if metric == "l2":
        if scales is not None:
            deq = embeddings.astype(jnp.float32) * scales[0][:, None]
            sq = jnp.sum(deq * deq, axis=-1)
        else:
            sq = jnp.sum(embeddings.astype(jnp.float32) ** 2, axis=-1)
        # [8, N] with replicated sublanes: TPU block shapes need the second-
        # to-last dim divisible by 8 (a [1, tile_n] block is not lowerable)
        sq_norms = jnp.asarray(jnp.broadcast_to(sq[None, :], (8, np_)))
    return PreparedDenseStore(embeddings, sq_norms, scales, n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "tile_n", "tile_q", "interpret", "n_total",
        "group_rows", "merge_segs", "k_pad", "merge_mode", "mxu_int8",
    ),
)
def dense_topk_pallas(
    queries: jnp.ndarray,  # [Q, D]
    embeddings: jnp.ndarray,  # [N, D] (or pre-padded [N_pad, D] with n_total)
    *,
    k: int,
    metric: str = "ip",
    tile_n: int = 4096,  # sweep: 1024/8192 lose 5x (grid overhead / carry
    # spill), 16384 exceeds the 64 MB scoped-vmem cap; 4096 is the optimum
    tile_q: int = 0,
    sq_norms: jnp.ndarray | None = None,  # [8, N_pad] from prepare_dense_store
    scales: jnp.ndarray | None = None,  # [8, N_pad] f32 for int8 stores
    n_total: int = 0,  # true doc count when embeddings are pre-padded
    group_rows: int = 0,  # merge-gate granularity (0 = whole query block;
    # chip-measured best with the nocarry merge — scripts/bench_merge_variants.py)
    merge_segs: int = 1,  # lane-segment split of the gated merge (1 = off;
    # 4/8 chip-measured WORSE than flat, MEASURE_r4 dense_bf16_segs4/8)
    k_pad: int = 0,  # running-buffer width (0 = K_PAD); the rerank path
    # asks for a deeper candidate pool — lanes pad to 128, so wider
    # buffers cost no extra vregs up to 128
    merge_mode: str = "nocarry",  # "nocarry" (threshold-descent, no
    # [QB, TN] while-loop carry; chip-measured ~12% faster at the
    # production shape) or "carry" (topk_merge_tile)
    mxu_int8: bool = False,  # int8 stores only: quantize queries per-row
    # and run the sweep dot on the MXU's int8xint8->int32 path (2x the
    # bf16 MAC rate); ip metric only — the per-row query scale factors out
    # of ranking and is applied to the returned values
    interpret: bool = False,
):
    """Returns (scores [Q, k], indices [Q, k]); same contract as
    ops.dense_topk.matmul_topk.

    ``tile_q=0`` (default) picks the query-block size adaptively: the
    embedding matrix streams through VMEM once PER QUERY BLOCK, so covering
    the whole batch in one block (up to 512 queries; ~1.5 MB of VMEM at
    d=768) halves-or-better the HBM traffic whenever Q exceeds a block.

    Hot-path contract: pass pre-padded ``embeddings`` + ``sq_norms`` +
    ``n_total`` (and ``scales`` for int8 stores) from
    :func:`prepare_dense_store`; otherwise the pad and the norm pass re-run
    inside the jitted program on EVERY call."""
    kp = k_pad or K_PAD
    assert k <= kp
    int8_store = embeddings.dtype == jnp.int8
    if int8_store and scales is None:
        raise ValueError(
            "int8 embeddings need the per-vector scales from "
            "prepare_dense_store(store_dtype='int8')"
        )
    if merge_mode not in ("carry", "nocarry"):
        raise ValueError(f"unknown merge_mode {merge_mode!r}")
    q_row_scale = None
    if mxu_int8:
        if not int8_store or metric != "ip":
            raise ValueError("mxu_int8 needs an int8 store and metric='ip'")
        # per-row symmetric query quantization; the row scale multiplies
        # every score in the row equally, so ranking is unaffected and the
        # scale is applied to the returned values after the kernel
        qmax = jnp.max(jnp.abs(queries.astype(jnp.float32)), axis=-1)
        q_row_scale = jnp.where(qmax > 0, qmax / 127.0, 1.0)  # [Q]
        queries = jnp.clip(
            jnp.round(queries.astype(jnp.float32) / q_row_scale[:, None]),
            -127, 127,
        ).astype(jnp.int8)
    elif embeddings.dtype == jnp.bfloat16 or int8_store:
        # pure-bf16 MXU matmul (f32 accumulate): a mixed f32 x bf16 dot
        # falls on the multi-pass f32 MXU path (~4x slower, measured); the
        # int8 store dequantizes tiles to bf16 in-kernel
        queries = queries.astype(jnp.bfloat16)
    q, d = queries.shape
    n = n_total or embeddings.shape[0]
    if tile_q == 0:
        tile_q = 8
        while tile_q < min(q, 512):
            tile_q *= 2
    qp = -(-q // tile_q) * tile_q
    np_ = -(-embeddings.shape[0] // tile_n) * tile_n
    if qp != q:
        queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    if np_ != embeddings.shape[0]:
        if int8_store:
            scales = jnp.pad(
                scales, ((0, 0), (0, np_ - embeddings.shape[0])),
                constant_values=1.0,
            )
        embeddings = jnp.pad(
            embeddings, ((0, np_ - embeddings.shape[0]), (0, 0))
        )
    if metric == "l2" and sq_norms is None:
        deq = embeddings.astype(jnp.float32)
        if int8_store:
            deq = deq * scales[0][:, None]
        sq_norms = jnp.broadcast_to(
            jnp.sum(deq * deq, axis=-1)[None, :], (8, np_)
        )
    if metric == "l2":
        sqn_spec = pl.BlockSpec(
            (8, tile_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM
        )
    else:
        # ip never reads the norms: feed a constant dummy block so no
        # [8, N] stream rides along with the embedding DMA
        sq_norms = jnp.zeros((8, tile_n), jnp.float32)
        sqn_spec = pl.BlockSpec(
            (8, tile_n), lambda qi, ni: (0, 0), memory_space=pltpu.VMEM
        )

    if int8_store:
        scl_spec = pl.BlockSpec(
            (8, tile_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM
        )
    else:
        # bf16/f32 stores never read the scales: constant dummy block so no
        # [8, N] stream rides along with the embedding DMA
        scales = jnp.ones((8, tile_n), jnp.float32)
        scl_spec = pl.BlockSpec(
            (8, tile_n), lambda qi, ni: (0, 0), memory_space=pltpu.VMEM
        )

    grid = (qp // tile_q, np_ // tile_n)
    kernel = functools.partial(
        _kernel, k=k, metric=metric, n_total=n, tile_n=tile_n,
        group_rows=group_rows, merge_segs=merge_segs, int8_store=int8_store,
        merge_mode=merge_mode, mxu_int8=mxu_int8,
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qi, ni: (ni, 0), memory_space=pltpu.VMEM),
            sqn_spec,
            scl_spec,
        ],
        out_specs=[
            pl.BlockSpec((tile_q, kp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, kp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, kp), jnp.float32),
            jax.ShapeDtypeStruct((qp, kp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, kp), jnp.float32),
            pltpu.VMEM((tile_q, kp), jnp.int32),
        ],
        interpret=interpret,
        # adaptive tile_q (512-query blocks) overflows the 16 MB default
        # scoped-vmem budget; the double-buffered working set still fits
        # comfortably below this raised cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(queries, embeddings, sq_norms, scales)

    vals = out_v[:q, :k]
    idx = out_i[:q, :k]
    if q_row_scale is not None:
        vals = vals * q_row_scale[:q, None]
    if metric == "l2":
        q_sq = jnp.sum(queries[:q].astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        vals = -vals + q_sq
    return vals, idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "tile_n", "n_total", "k_pad", "group_rows",
        "merge_segs", "merge_mode", "mxu_int8", "interpret",
    ),
)
def dense_topk_rerank(
    queries: jnp.ndarray,  # [Q, D] f32
    embeddings: jnp.ndarray,  # sweep store (int8 from prepare_dense_store)
    rerank_emb: jnp.ndarray,  # [N, D] bf16 exact copy for refinement
    *,
    k: int,
    metric: str = "ip",
    tile_n: int = 4096,
    sq_norms: jnp.ndarray | None = None,
    scales: jnp.ndarray | None = None,
    n_total: int = 0,
    k_pad: int = 32,
    group_rows: int = 0,
    merge_segs: int = 1,
    merge_mode: str = "nocarry",
    mxu_int8: bool = False,
    interpret: bool = False,
):
    """Quantized sweep + exact refinement (the faiss ``IndexRefineFlat``
    design): the int8 store rides the HBM bus for the full sweep at half
    the bf16 bytes, keeping a ``k_pad``-deep candidate pool (deeper is
    ~free: the running buffer pads to 128 lanes either way), then the
    candidates alone — ``Q x k_pad`` rows, ~0.1%% of the sweep's traffic —
    are re-scored against the exact bf16 copy and the top ``k`` returned.

    Trades HBM *capacity* (int8 + bf16 copies resident = 1.5x bf16) for
    *bandwidth* (sweep reads int8 only), and restores recall@k to the bf16
    store's: int8 rounding at d=768 costs ~0.95 recall@10 on the flat
    sweep (measured, MEASURE_r3 dense_int8_segs1) because top-of-ranking
    score gaps are smaller than the quantization noise — but the true
    top-k virtually always sits inside the int8 top-32, so the refine pass
    recovers it. Returns (scores [Q, k], indices [Q, k]); -1 slots (fewer
    than k valid docs) keep score -inf (ip) / +inf (l2).
    """
    assert k <= k_pad
    _, cand = dense_topk_pallas(
        queries, embeddings, k=k_pad, metric=metric, tile_n=tile_n,
        sq_norms=sq_norms, scales=scales, n_total=n_total,
        group_rows=group_rows, merge_segs=merge_segs, k_pad=k_pad,
        merge_mode=merge_mode, mxu_int8=mxu_int8, interpret=interpret,
    )
    valid = cand >= 0
    rows = rerank_emb[jnp.maximum(cand, 0)]  # [Q, R, D] candidate gather
    dot = jnp.einsum(
        "qd,qrd->qr", queries.astype(rerank_emb.dtype), rows,
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        sq = jnp.sum(
            rows.astype(jnp.float32) * rows.astype(jnp.float32), axis=-1
        )
        key = jnp.where(valid, 2.0 * dot - sq, -jnp.inf)  # descending rank
    else:
        key = jnp.where(valid, dot, -jnp.inf)
    vals, pos = jax.lax.top_k(key, k)
    idx = jnp.take_along_axis(cand, pos, axis=-1)
    idx = jnp.where(vals > -jnp.inf, idx, -1)
    if metric == "l2":
        q_sq = jnp.sum(
            queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True
        )
        vals = -vals + q_sq  # true squared L2 distance, ascending
    return vals, idx
