"""IVF dense index: k-means coarse quantizer + cell-sorted block store +
probed search (faiss IndexIVFFlat parity; SURVEY.md §2.3 "flat, optionally
IVF").

The reference builds flat faiss indexes (make_indexer.py:446-457) and
searches them per retrieval round (utils.py:374-380). Flat search on TPU
(ops/pallas_dense.py) is optimal for big query batches but reads the whole
store per <=512-query block — at the adaptive-RAG loop's small rounds
(64 queries; 1 interactively) that is the full store per tiny batch. IVF
cuts per-query HBM traffic to ``nprobe / nlist`` of the store independent
of batch size, which is the standard faiss scaling step and the dense
low-latency lever at Wikipedia scale (BASELINE config 5).

TPU-first design (no faiss translation):

- **Training** is batched Lloyd iterations on device: assignment is one
  [chunk, D] x [D, nlist] matmul + argmin (MXU), centroid update is a
  ``segment_sum`` — both jitted, host only accumulates partial sums.
- **Storage** is ONE contiguous [NB*block, D] matrix sorted by cell, each
  cell padded to a ``block``-row multiple (pad rows: id -1, zero vector),
  plus a trailing all-pad block for plan holes. A probe plan is then just
  block indices, so search is the scalar-prefetch block-gather pattern
  proven on the BM25 path (ops/pallas_sparse.py) with MXU scoring
  (ops/pallas_ivf.py).
- **Planning** is fully vectorized numpy (sort-dedup per 8-query tile +
  ragged repeat/cumsum expansion of cells into block indices) — the
  per-query Python planning loop costs 25-35% of throughput at BM25
  batch sizes, measured twice (retrieval/bm25.py:289).

Semantics note: the 8 queries of a tile probe the UNION of their cells
(probing extra cells only raises recall; results stay deterministic and
are oracle-tested against a union-probe reference in tests/test_ivf.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from probing_rag_tpu.retrieval.dense import DenseSearchResult


def _next_pow2(n: int, floor: int = 1) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def _kmeanspp_init(x: np.ndarray, nlist: int, rng) -> np.ndarray:
    """Batched k-means++ seeding (k-means||-style rounds).

    Plain random init collapses duplicate centroids onto dense clusters
    (a Lloyd local optimum the separable-cluster test catches); sequential
    k-means++ costs ``nlist`` dispatches. Middle ground: sample centroid
    candidates in rounds proportional to the current min squared distance,
    a whole batch per round — ~16 device matmuls total regardless of
    ``nlist``, quality close to full ++."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def min_d2_update(xd, cd, mind2):
        d2 = (
            jnp.sum(xd * xd, -1)[:, None]
            - 2.0 * (xd @ cd.T)
            + jnp.sum(cd * cd, -1)[None, :]
        )
        return jnp.minimum(mind2, jnp.min(d2, axis=-1))

    n = x.shape[0]
    xd = jnp.asarray(x)
    first = x[rng.integers(n)][None]
    chosen = [first]
    mind2 = np.asarray(
        min_d2_update(xd, jnp.asarray(first), jnp.full((n,), np.inf, jnp.float32))
    )
    per_round = max(1, nlist // 16)
    while sum(c.shape[0] for c in chosen) < nlist:
        take = min(per_round, nlist - sum(c.shape[0] for c in chosen))
        p = np.maximum(mind2, 0)
        tot = p.sum()
        # degenerate corpora (fewer distinct points than nlist) can leave
        # fewer nonzero-probability points than ``take``, which
        # rng.choice(replace=False, p=...) rejects — fill uniformly then
        # (duplicate seeds are fine: Lloyd reseeds empty cells)
        if tot <= 0 or int((p > 0).sum()) < take:
            picks = rng.choice(n, take, replace=False)
        else:
            picks = rng.choice(n, take, replace=False, p=p / tot)
        batch = x[picks]
        chosen.append(batch)
        mind2 = np.asarray(min_d2_update(xd, jnp.asarray(batch), jnp.asarray(mind2)))
    return np.concatenate(chosen)[:nlist].copy()


def kmeans(
    x: np.ndarray,  # [N, D] float32 training vectors
    nlist: int,
    *,
    iters: int = 10,
    seed: int = 0,
    sample_per_list: int = 64,  # cap training points at nlist * this (faiss
    # trains on a subsample for the same reason: assignment cost dominates)
    chunk: int = 65536,
) -> np.ndarray:
    """Lloyd's k-means for the coarse quantizer. Returns [nlist, D] f32.

    Assignment runs as jitted (matmul + argmin) chunks on the default
    device; centroid sums via ``segment_sum``. Empty cells are reseeded
    from random training points (keeps all ``nlist`` cells usable, the
    faiss behavior)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = x.shape[0]
    if nlist > n:
        raise ValueError(f"nlist={nlist} > n_train={n}")
    cap = nlist * sample_per_list
    if n > cap:
        x = x[rng.choice(n, cap, replace=False)]
        n = cap
    x = np.ascontiguousarray(x, np.float32)
    cent = _kmeanspp_init(x, nlist, rng)

    @jax.jit
    def step(xc, c):
        # d2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is constant per row for
        # the argmin, so skip it
        s = xc @ c.T  # [B, nlist] f32
        d2 = jnp.sum(c * c, axis=-1)[None, :] - 2.0 * s
        a = jnp.argmin(d2, axis=-1)
        sums = jax.ops.segment_sum(xc, a, num_segments=c.shape[0])
        cnts = jax.ops.segment_sum(
            jnp.ones((xc.shape[0],), jnp.float32), a, num_segments=c.shape[0]
        )
        return sums, cnts

    # upload the training sample ONCE; chunks are device slices (the TPU
    # here rides an RPC tunnel — per-chunk host->device transfers would
    # dominate training)
    xd = jnp.asarray(x)
    for _ in range(iters):
        sums = np.zeros((nlist, x.shape[1]), np.float32)
        cnts = np.zeros((nlist,), np.float32)
        cd = jnp.asarray(cent)
        for s0 in range(0, n, chunk):
            ps, pc = step(xd[s0 : s0 + chunk], cd)
            sums += np.asarray(ps)
            cnts += np.asarray(pc)
        empty = cnts == 0
        cent = sums / np.maximum(cnts, 1.0)[:, None]
        if empty.any():
            cent[empty] = x[rng.choice(n, int(empty.sum()), replace=False)]
    return cent


def assign_cells(
    x: np.ndarray, centroids: np.ndarray, chunk: int = 65536
) -> np.ndarray:
    """Nearest-centroid cell id per vector ([N] int32), jitted in chunks."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def nearest(xc, c):
        d2 = jnp.sum(c * c, axis=-1)[None, :] - 2.0 * (xc @ c.T)
        return jnp.argmin(d2, axis=-1).astype(jnp.int32)

    c = jnp.asarray(centroids, jnp.float32)
    x = np.asarray(x, np.float32)
    # single upload + device slices when the matrix fits comfortably in
    # HBM; stream per chunk from host otherwise (Wikipedia-scale stores)
    resident = x.nbytes <= 8 << 30
    xd = jnp.asarray(x) if resident else None
    out = [
        np.asarray(
            nearest(
                xd[s0 : s0 + chunk] if resident else jnp.asarray(x[s0 : s0 + chunk]),
                c,
            )
        )
        for s0 in range(0, x.shape[0], chunk)
    ]
    return np.concatenate(out)


@dataclass
class IVFDenseIndex:
    """Cell-sorted, block-padded dense store + coarse quantizer.

    ``emb_blocked``/``ids_blocked`` include the trailing all-pad block
    (``pad_block`` is its block index); ``list_block_start[l]`` /
    ``list_nblocks[l]`` locate cell ``l``'s blocks. ``ids_blocked`` maps
    each stored row back to its original doc index (-1 = pad row)."""

    centroids: np.ndarray  # [nlist, D] f32
    emb_blocked: np.ndarray  # [(NB+1)*block, D] f32 master copy
    ids_blocked: np.ndarray  # [(NB+1)*block] int32
    list_block_start: np.ndarray  # [nlist] int32 (block units)
    list_nblocks: np.ndarray  # [nlist] int32
    metric: str
    block: int
    n_docs: int

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def pad_block(self) -> int:
        return self.emb_blocked.shape[0] // self.block - 1

    def imbalance_factor(self) -> float:
        """faiss's quantizer balance diagnostic: ``nlist * sum(n_i^2) / N^2``
        (1.0 = perfectly balanced cells; probed bytes per query scale with
        it, so a bad quantizer shows up here before it shows up as latency)."""
        cell_of_block = np.repeat(np.arange(self.nlist), self.list_nblocks)
        blk = np.nonzero(self.ids_blocked >= 0)[0] // self.block
        counts = np.bincount(cell_of_block[blk], minlength=self.nlist)
        return float(self.nlist * np.sum(counts.astype(np.float64) ** 2)
                     / max(self.n_docs, 1) ** 2)

    @staticmethod
    def default_nlist(n_docs: int) -> int:
        # ~2*sqrt(N) rounded to pow2 (faiss guideline sqrt(N)..16*sqrt(N));
        # capped so the average cell still fills a few hundred rows
        return int(min(_next_pow2(max(2.0 * np.sqrt(n_docs), 8)), 65536,
                       _next_pow2(max(n_docs // 64, 8)) ))

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,  # [N, D]
        *,
        nlist: Optional[int] = None,
        block: int = 256,
        metric: str = "l2",
        seed: int = 0,
        iters: int = 10,
    ) -> "IVFDenseIndex":
        emb = np.ascontiguousarray(embeddings, np.float32)
        n, d = emb.shape
        nlist = nlist or cls.default_nlist(n)
        cent = kmeans(emb, nlist, iters=iters, seed=seed)
        cells = assign_cells(emb, cent)

        order = np.argsort(cells, kind="stable")
        counts = np.bincount(cells, minlength=nlist)
        nblocks = -(-counts // block)  # 0 for empty cells
        starts = np.concatenate([[0], np.cumsum(nblocks[:-1])]).astype(np.int32)
        nb_tot = int(nblocks.sum())

        emb_blocked = np.zeros(((nb_tot + 1) * block, d), np.float32)
        ids_blocked = np.full(((nb_tot + 1) * block,), -1, np.int32)
        # dest row = cell's first block * block + rank within cell,
        # fully vectorized over the cell-sorted order
        cell_sorted = cells[order]
        cell_first = np.concatenate([[0], np.cumsum(counts[:-1])])
        rank = np.arange(n) - cell_first[cell_sorted]
        dest = starts[cell_sorted].astype(np.int64) * block + rank
        emb_blocked[dest] = emb[order]
        ids_blocked[dest] = order.astype(np.int32)
        return cls(cent, emb_blocked, ids_blocked, starts,
                   nblocks.astype(np.int32), metric, block, n)

    def save(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path.with_suffix(".npz"),
            centroids=self.centroids,
            emb_blocked=self.emb_blocked,
            ids_blocked=self.ids_blocked,
            list_block_start=self.list_block_start,
            list_nblocks=self.list_nblocks,
        )
        path.with_suffix(".json").write_text(
            json.dumps({"metric": self.metric, "block": self.block,
                        "n_docs": self.n_docs})
        )

    @classmethod
    def load(cls, path: Path) -> "IVFDenseIndex":
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        z = np.load(path.with_suffix(".npz"))
        return cls(z["centroids"], z["emb_blocked"], z["ids_blocked"],
                   z["list_block_start"], z["list_nblocks"],
                   meta["metric"], meta["block"], meta["n_docs"])


# -- shared engine plumbing (single-device AND cell-sharded engines) ---------
#
# One SQ8/norm scheme and ONE planner implementation, used by IVFEngine here
# and parallel/sharded_ivf.py's ShardedIVFEngine: a planner or quantization
# fix applied to one engine but not the other would silently break the
# sharded-vs-single score equality the dryrun asserts. (The flat kernel's
# device-side store prep is ops.pallas_dense.prepare_dense_store — same SQ8
# layout, kept separate because it pads/tiles for a different kernel.)


def host_store_prep(emb: np.ndarray, metric: str, store_dtype):
    """Host-side store preparation: optional SQ8 per-vector quantization and
    the [8, N] sublane-broadcast (norms, scales) blocks the kernel reads.

    Returns ``(emb_host, scales8, sq_norms8)``. All computed on host — no
    device round-trips (an earlier version pulled the whole bf16 store back
    from the device just to square it; at Wikipedia scale that doubles
    engine construction over the RPC tunnel)."""
    import jax.numpy as jnp

    emb = np.ascontiguousarray(emb, np.float32)
    npad = emb.shape[0]
    int8 = jnp.dtype(store_dtype) == jnp.int8
    scl8 = None
    if int8:
        absmax = np.abs(emb).max(axis=-1)
        s = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        emb_host = np.clip(np.round(emb / s[:, None]), -127, 127).astype(np.int8)
        scl8 = np.broadcast_to(s[None, :], (8, npad)).copy()
        deq = emb_host.astype(np.float32) * s[:, None] if metric == "l2" else None
    else:
        # ml_dtypes gives numpy a native bfloat16: round host-side so l2
        # norms match the stored (rounded) vectors exactly
        emb_host = emb.astype(jnp.dtype(store_dtype).type)
        deq = emb_host.astype(np.float32) if metric == "l2" else None
    sqn8 = None
    if metric == "l2":
        sq = np.sum(deq * deq, axis=-1).astype(np.float32)
        sqn8 = np.broadcast_to(sq[None, :], (8, npad)).copy()
    return emb_host, scl8, sqn8


def probe_cells_host(query_emb, centroids_dev, nprobe: int, metric: str,
                     nlist: int) -> np.ndarray:
    """[Q, nprobe] nearest-centroid cell ids (the coarse quantizer).

    Cells are ALWAYS ranked by L2 distance to the centroids, for both
    metrics: docs were assigned to their L2-nearest centroid at add time
    (``assign_cells``), so query-time cell selection must use the same
    geometry or the two quantizers disagree — with metric='ip' over
    non-normalized vectors, ranking cells by q·centroid favors large-norm
    centroids and silently drops the true nearest cells from the probe
    set. (Same contract as faiss IndexIVFFlat/IP over an IndexFlatL2
    coarse quantizer; the ``metric`` arg still names the index metric and
    is kept for call-site clarity.)"""
    import jax.numpy as jnp

    from probing_rag_tpu.ops.dense_topk import matmul_topk

    del metric  # cell ranking is l2 by construction (see docstring)
    _, idx = matmul_topk(
        jnp.asarray(query_emb, jnp.float32), centroids_dev,
        k=int(min(nprobe, nlist)), metric="l2",
        tile_n=min(16384, max(256, nlist)),
    )
    return np.asarray(idx)


def tile_union(probes: np.ndarray):
    """Pad queries to 8-row tiles and dedup each tile's probed cells.

    Returns ``(tiles [T, 8*nprobe] sorted cell ids, keep mask, t)`` — the 8
    queries of a tile probe their cells' union (see module docstring)."""
    q = probes.shape[0]
    t = -(-q // 8)
    if t * 8 != q:  # tile-pad with the first query's probes
        probes = np.concatenate(
            [probes, np.broadcast_to(probes[:1], (t * 8 - q, probes.shape[1]))]
        )
    tiles = np.sort(probes.reshape(t, -1), axis=1)
    keep = np.ones_like(tiles, bool)
    keep[:, 1:] = tiles[:, 1:] != tiles[:, :-1]
    return tiles, keep, t


def expand_tile_blocks(starts: np.ndarray, nb: np.ndarray, pb: int,
                       pad_block: int) -> np.ndarray:
    """Ragged cell->block expansion, fully vectorized (repeat/cumsum): cell
    j of tile row i contributes blocks ``starts[i,j] + 0..nb[i,j]-1``,
    packed left; holes point at ``pad_block``. Returns [T, PB] int32."""
    t = nb.shape[0]
    nb = nb.astype(np.int64)
    starts = starts.astype(np.int64)
    desc = np.full((t, pb), pad_block, np.int32)
    nbf = nb.ravel()
    total = int(nbf.sum())
    if total:
        reps = np.repeat(np.arange(nbf.size), nbf)
        offs = np.arange(total) - np.repeat(np.cumsum(nbf) - nbf, nbf)
        blocks = starts.ravel()[reps] + offs
        tile_of = reps // nb.shape[1]
        per_tile = nb.sum(axis=1)
        tile_first = np.concatenate([[0], np.cumsum(per_tile[:-1])])
        pos = np.arange(total) - np.repeat(tile_first, per_tile)
        desc[tile_of, pos] = blocks.astype(np.int32)
    return desc


class IVFEngine:
    """Device-resident IVF search. ``nprobe`` cells per query; the 8
    queries of a tile probe their cells' union (see module docstring)."""

    def __init__(
        self,
        index: IVFDenseIndex,
        nprobe: int = 32,
        encode_fn=None,  # texts -> [Q, D] embeddings (query encoder)
        device=None,
        store_dtype=None,  # default bf16; jnp.int8 for the SQ8 store
        force_kernel: bool = False,  # off-TPU: run the Pallas kernel in
        # interpret mode instead of the XLA path (kernel certification)
    ):
        import jax
        import jax.numpy as jnp

        self.index = index
        self.encode_fn = encode_fn
        self.nprobe = int(min(nprobe, index.nlist))
        self.force_kernel = force_kernel
        store_dtype = jnp.bfloat16 if store_dtype is None else store_dtype
        self._int8 = jnp.dtype(store_dtype) == jnp.int8
        npad = index.emb_blocked.shape[0]
        emb_host, scl8, sqn8 = host_store_prep(
            index.emb_blocked, index.metric, store_dtype
        )
        emb_dev = jnp.asarray(emb_host)
        self._scales = jnp.asarray(scl8) if scl8 is not None else None
        self._sqn = jnp.asarray(sqn8) if sqn8 is not None else None
        self._emb = jax.device_put(emb_dev, device) if device else emb_dev
        self._ids = jnp.asarray(
            np.broadcast_to(index.ids_blocked[None, :], (8, npad)).copy()
        )
        self._cent = jnp.asarray(index.centroids, jnp.float32)

    def probe_cells(self, query_emb: np.ndarray, nprobe: Optional[int] = None
                    ) -> np.ndarray:
        return probe_cells_host(
            query_emb, self._cent, nprobe or self.nprobe,
            self.index.metric, self.index.nlist,
        )

    def plan(self, probes: np.ndarray) -> np.ndarray:
        """Vectorized tile plan: [Q, nprobe] cell ids -> [T, PB] block
        descriptors (per-tile union, deduped, holes -> pad block; PB is the
        pow2 bucket of the widest tile)."""
        ix = self.index
        tiles, keep, _ = tile_union(probes)
        nb = np.where(keep, ix.list_nblocks[tiles], 0).astype(np.int64)
        per_tile = nb.sum(axis=1)
        pb = _next_pow2(int(per_tile.max()) if per_tile.max() > 0 else 1, 8)
        return expand_tile_blocks(
            ix.list_block_start[tiles], nb, pb, ix.pad_block
        )

    def search_embeddings(
        self, query_emb: np.ndarray, k: int = 5,
        nprobe: Optional[int] = None, as_numpy: bool = True,
    ) -> DenseSearchResult:
        import jax
        import jax.numpy as jnp

        from probing_rag_tpu.ops.pallas_ivf import ivf_topk_pallas, ivf_topk_xla

        q = np.asarray(query_emb, np.float32)
        nq = q.shape[0]
        probes = self.probe_cells(q, nprobe)
        desc = self.plan(probes)
        t = desc.shape[0]
        qpad = q
        if t * 8 != nq:
            qpad = np.concatenate(
                [q, np.broadcast_to(q[:1], (t * 8 - nq, q.shape[1]))]
            )
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu or self.force_kernel:
            # the Pallas block-gather kernel: compiled on TPU; interpret
            # mode off-TPU (kernel certification — minutes-slow at scale)
            vals, idx = ivf_topk_pallas(
                jnp.asarray(qpad), jnp.asarray(desc), self._emb, self._ids,
                k=k, metric=self.index.metric, block=self.index.block,
                sq_norms=self._sqn, scales=self._scales,
                interpret=not on_tpu,
            )
        else:
            vals, idx = ivf_topk_xla(
                jnp.asarray(qpad), jnp.asarray(desc), self._emb, self._ids,
                k=k, metric=self.index.metric, block=self.index.block,
                sq_norms=self._sqn, scales=self._scales,
            )
        vals, idx = vals[:nq], idx[:nq]
        if self.index.metric == "l2":
            qsq = jnp.sum(jnp.asarray(qpad[:nq]) ** 2, axis=-1, keepdims=True)
            vals = -vals + qsq  # ascending squared distance (faiss contract)
        if not as_numpy:
            return DenseSearchResult(idx, vals)
        return DenseSearchResult(np.asarray(idx), np.asarray(vals))

    def search(self, queries, k: int = 5) -> DenseSearchResult:
        """Text-query search (the AdaptiveRAGPipeline retriever contract,
        same as DenseEngine.search)."""
        if self.encode_fn is None:
            raise ValueError("IVFEngine needs encode_fn to search raw text")
        return self.search_embeddings(
            np.asarray(self.encode_fn(list(queries))), k=k
        )
