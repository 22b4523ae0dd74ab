"""Cell-sharded IVF dense search over a mesh.

The IVF store (retrieval/ivf.py) shards by COARSE CELL: cells are assigned
to shards by greedy block-count balancing, each shard keeps its cells'
blocks as a local cell-sorted store, and a query's probed cells fan out to
whichever shards own them. Each shard runs the same block-gather kernel
(ops/pallas_ivf.py) over its local probed blocks; a k-per-shard
``all_gather`` merge produces the global top-k — the same collective merge
as the sharded flat path (parallel/sharded_dense.py), exact because stored
ids are global doc ids and every candidate appears on exactly one shard.

Why cell-sharding (vs row-striping every cell): a probed cell's blocks
stay contiguous on one device, so the per-shard plan is the single-chip
plan filtered by ownership — no per-query cross-shard descriptor
arithmetic — and a cell's DMA stream stays sequential. Load balance is
statistical (a query's nprobe cells spread over shards); the greedy
assignment bounds worst-case shard size, tested in tests/test_sharding.py.

At Wikipedia scale (BASELINE config 5) this is the layout where IVF
actually matters: the store exceeds one chip's HBM, the mesh holds it
row-sharded anyway, and probing reads ~nprobe/nlist of each shard.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from probing_rag_tpu.retrieval.dense import DenseSearchResult
from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, _next_pow2


class ShardedIVFLayout(NamedTuple):
    owner: np.ndarray  # [nlist] shard of each cell
    local_start: np.ndarray  # [nlist] cell's first block in its shard (block units)
    nb_max: int  # real blocks on the fullest shard (pad block excluded)
    emb: np.ndarray  # [S * (nb_max+1) * block, D] f32 host master
    ids: np.ndarray  # [S * (nb_max+1) * block] int32 global doc ids (-1 pad)


def shard_ivf_layout(index: IVFDenseIndex, n_shards: int) -> ShardedIVFLayout:
    """Greedy balanced cell->shard assignment + per-shard block stores.

    Cells sorted by descending block count go to the least-loaded shard
    (LPT scheduling: worst shard <= 4/3 * optimum). Every shard's local
    store is padded to the SAME block count (+1 trailing all-pad block for
    plan holes) so the mesh carries one uniform array."""
    nlist, block = index.nlist, index.block
    nb = index.list_nblocks.astype(np.int64)
    owner = np.zeros(nlist, np.int32)
    local_start = np.zeros(nlist, np.int32)
    load = np.zeros(n_shards, np.int64)
    for c in np.argsort(-nb, kind="stable"):
        s = int(np.argmin(load))
        owner[c] = s
        local_start[c] = load[s]
        load[s] += nb[c]
    nb_max = int(load.max())

    d = index.emb_blocked.shape[1]
    np_local = (nb_max + 1) * block
    emb = np.zeros((n_shards * np_local, d), np.float32)
    ids = np.full((n_shards * np_local,), -1, np.int32)
    # vectorized block copy: global block b of cell c (offset p) lands at
    # shard_base(owner[c]) + (local_start[c] + p) * block
    cells = np.repeat(np.arange(nlist), index.list_nblocks)
    p = np.arange(cells.size) - np.repeat(
        index.list_block_start.astype(np.int64), index.list_nblocks
    )
    src_b = index.list_block_start[cells].astype(np.int64) + p
    dst_b = owner[cells].astype(np.int64) * (nb_max + 1) + local_start[cells] + p
    src = (src_b[:, None] * block + np.arange(block)[None, :]).ravel()
    dst = (dst_b[:, None] * block + np.arange(block)[None, :]).ravel()
    emb[dst] = index.emb_blocked[src]
    ids[dst] = index.ids_blocked[src]
    return ShardedIVFLayout(owner, local_start, nb_max, emb, ids)


class ShardedIVFEngine:
    """IVF search over a ``jax.sharding.Mesh``; results are score-equal to
    the single-device IVFEngine on the same index (same probe plan, same
    candidate set — tested on the virtual 8-device mesh)."""

    def __init__(
        self,
        index: IVFDenseIndex,
        mesh,
        nprobe: int = 32,
        store_dtype=None,  # default bf16; jnp.int8 for SQ8
        interpret: Optional[bool] = None,
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.index = index
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)
        self.n_shards = int(np.prod([mesh.shape[a] for a in self.axes]))
        self.nprobe = int(min(nprobe, index.nlist))
        self.interpret = (
            interpret if interpret is not None
            else jax.default_backend() != "tpu"
        )
        lay = shard_ivf_layout(index, self.n_shards)
        self._lay = lay
        store_dtype = jnp.bfloat16 if store_dtype is None else store_dtype
        self._int8 = jnp.dtype(store_dtype) == jnp.int8

        npad = lay.emb.shape[0]
        self._scales = None
        if self._int8:
            absmax = np.abs(lay.emb).max(axis=-1)
            s = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.round(lay.emb / s[:, None]), -127, 127).astype(np.int8)
            emb_host, deq = q, q.astype(np.float32) * s[:, None]
            scl = np.broadcast_to(s[None, :], (8, npad)).copy()
        else:
            emb_host = lay.emb
            deq = lay.emb
            scl = np.ones((1, 1), np.float32)  # placeholder, replaced below
        self._sqn_host = None
        if index.metric == "l2":
            sq = np.sum(deq * deq, axis=-1).astype(np.float32)
            self._sqn_host = np.broadcast_to(sq[None, :], (8, npad)).copy()

        shard_rows = NamedSharding(mesh, P(self.axes, None))
        shard_cols = NamedSharding(mesh, P(None, self.axes))
        self._emb = jax.device_put(
            jnp.asarray(emb_host, store_dtype if not self._int8 else jnp.int8),
            shard_rows,
        )
        self._ids = jax.device_put(
            jnp.asarray(np.broadcast_to(lay.ids[None, :], (8, npad)).copy()),
            shard_cols,
        )
        self._sqn = (
            jax.device_put(jnp.asarray(self._sqn_host), shard_cols)
            if self._sqn_host is not None else None
        )
        if self._int8:
            self._scales = jax.device_put(jnp.asarray(scl), shard_cols)
        self._cent = jnp.asarray(index.centroids, jnp.float32)

    # -- planning (host, vectorized per shard) ------------------------------
    def probe_cells(self, query_emb: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from probing_rag_tpu.ops.dense_topk import matmul_topk

        _, idx = matmul_topk(
            jnp.asarray(query_emb, jnp.float32), self._cent,
            k=self.nprobe, metric=self.index.metric,
            tile_n=min(16384, max(256, self.index.nlist)),
        )
        return np.asarray(idx)

    def plan(self, probes: np.ndarray) -> np.ndarray:
        """[Q, nprobe] cell ids -> [S, T, PB] per-shard local block
        descriptors (per-tile union, ownership-filtered; holes -> each
        shard's trailing pad block). PB is the pow2 bucket of the widest
        (shard, tile) requirement, shared by all shards (one static shape
        rides the mesh)."""
        ix, lay = self.index, self._lay
        q = probes.shape[0]
        t = -(-q // 8)
        if t * 8 != q:
            probes = np.concatenate(
                [probes, np.broadcast_to(probes[:1], (t * 8 - q, probes.shape[1]))]
            )
        tiles = np.sort(probes.reshape(t, -1), axis=1)
        keep = np.ones_like(tiles, bool)
        keep[:, 1:] = tiles[:, 1:] != tiles[:, :-1]
        own = lay.owner[tiles]
        nb_all = ix.list_nblocks[tiles].astype(np.int64)
        pb = 8
        per = []
        for s in range(self.n_shards):
            nb_s = np.where(keep & (own == s), nb_all, 0)
            per.append(nb_s)
            m = int(nb_s.sum(axis=1).max())
            pb = max(pb, _next_pow2(max(m, 1), 8))
        pad_block = lay.nb_max  # local index of each shard's all-pad block
        desc = np.full((self.n_shards, t, pb), pad_block, np.int32)
        starts = lay.local_start[tiles].astype(np.int64)
        for s in range(self.n_shards):
            nbf = per[s].ravel()
            total = int(nbf.sum())
            if not total:
                continue
            reps = np.repeat(np.arange(nbf.size), nbf)
            offs = np.arange(total) - np.repeat(np.cumsum(nbf) - nbf, nbf)
            blocks = starts.ravel()[reps] + offs
            tile_of = reps // tiles.shape[1]
            per_tile = per[s].sum(axis=1)
            tile_first = np.concatenate([[0], np.cumsum(per_tile[:-1])])
            pos = np.arange(total) - np.repeat(tile_first, per_tile)
            desc[s, tile_of, pos] = blocks.astype(np.int32)
        return desc

    # -- search --------------------------------------------------------------
    def search_embeddings(
        self, query_emb: np.ndarray, k: int = 5, as_numpy: bool = True
    ) -> DenseSearchResult:
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from probing_rag_tpu.ops.pallas_ivf import ivf_topk_pallas

        q = np.asarray(query_emb, np.float32)
        nq = q.shape[0]
        desc = self.plan(self.probe_cells(q))
        t = desc.shape[1]
        qpad = q
        if t * 8 != nq:
            qpad = np.concatenate(
                [q, np.broadcast_to(q[:1], (t * 8 - nq, q.shape[1]))]
            )
        axes = self.axes
        metric = self.index.metric
        block = self.index.block
        interpret = self.interpret
        # NOTE: unlike matmul_topk, the kernel's raw scores are
        # descending-better for BOTH metrics (l2 rides as -(d^2 - 2 q.d)
        # until the engine re-adds ||q||^2), so the merge needs no sign flip

        sqn = self._sqn if self._sqn is not None else jnp.zeros(
            (8, self._emb.shape[0]), jnp.float32
        )
        scl = self._scales if self._scales is not None else jnp.ones(
            (8, self._emb.shape[0]), jnp.float32
        )

        def shard_fn(qd, desc_l, emb_l, ids_l, sqn_l, scl_l):
            vals, gids = ivf_topk_pallas(
                qd, desc_l[0], emb_l, ids_l, k=k, metric=metric, block=block,
                sq_norms=sqn_l if metric == "l2" else None,
                scales=scl_l if self._int8 else None,
                interpret=interpret,
            )
            all_v = jax.lax.all_gather(vals, axes, tiled=False)
            all_i = jax.lax.all_gather(gids, axes, tiled=False)
            s, qn, kk = all_v.shape
            flat_v = jnp.transpose(all_v, (1, 0, 2)).reshape(qn, s * kk)
            flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, s * kk)
            flat_v = jnp.where(flat_i >= 0, flat_v, -jnp.inf)
            top_v, pos = jax.lax.top_k(flat_v, k)
            top_i = jnp.take_along_axis(flat_i, pos, axis=-1)
            top_v = jnp.where(top_i >= 0, top_v, 0.0)
            return top_v, top_i

        vals, idx = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(), P(axes, None, None), P(axes, None), P(None, axes),
                      P(None, axes), P(None, axes)),
            out_specs=(P(), P()),
            check_vma=False,  # replicated after the all_gather merge
        )(jnp.asarray(qpad), jnp.asarray(desc), self._emb, self._ids, sqn, scl)
        vals, idx = vals[:nq], idx[:nq]
        if metric == "l2":
            qsq = jnp.sum(jnp.asarray(q) ** 2, axis=-1, keepdims=True)
            vals = -vals + qsq
        if not as_numpy:
            return DenseSearchResult(idx, vals)
        return DenseSearchResult(np.asarray(idx), np.asarray(vals))
