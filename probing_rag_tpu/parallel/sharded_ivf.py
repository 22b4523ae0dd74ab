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
from probing_rag_tpu.retrieval import ivf as ivf_mod
from probing_rag_tpu.retrieval.ivf import IVFDenseIndex, _next_pow2


class ShardedIVFLayout(NamedTuple):
    owner: np.ndarray  # [nlist] shard of each cell
    local_start: np.ndarray  # [nlist] cell's first block in its shard (block units)
    nb_max: int  # real blocks on the fullest shard (pad block excluded)
    emb: np.ndarray  # [S * (nb_max+1) * block, D] f32 host master (the
    # engine drops this field after device_put — a full-store RAM copy)
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
        encode_fn=None,  # texts -> [Q, D] embeddings (query encoder)
        store_dtype=None,  # default bf16; jnp.int8 for SQ8
        interpret: Optional[bool] = None,  # True: kernel-interpret off-TPU
        # (certification); default: Pallas compiled on TPU, XLA path else
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.index = index
        self.encode_fn = encode_fn
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)
        self.n_shards = int(np.prod([mesh.shape[a] for a in self.axes]))
        self.nprobe = int(min(nprobe, index.nlist))
        on_tpu = jax.default_backend() == "tpu"
        # three modes: compiled kernel (TPU), kernel-interpret
        # (explicit certification), or the XLA gather+einsum path (the
        # non-TPU production path — interpret is minutes-slow at scale)
        self.interpret = bool(interpret) and not on_tpu
        self.use_kernel = on_tpu or self.interpret
        lay = shard_ivf_layout(index, self.n_shards)
        store_dtype = jnp.bfloat16 if store_dtype is None else store_dtype
        self._int8 = jnp.dtype(store_dtype) == jnp.int8

        npad = lay.emb.shape[0]
        # same host-side SQ8/norm scheme as the single-device engine (the
        # shared helper keeps flat/IVF/sharded-IVF rankings consistent)
        emb_host, scl8, sqn8 = ivf_mod.host_store_prep(
            lay.emb, index.metric, store_dtype
        )
        shard_rows = NamedSharding(mesh, P(self.axes, None))
        shard_cols = NamedSharding(mesh, P(None, self.axes))
        self._emb = jax.device_put(jnp.asarray(emb_host), shard_rows)
        self._ids = jax.device_put(
            jnp.asarray(np.broadcast_to(lay.ids[None, :], (8, npad)).copy()),
            shard_cols,
        )
        self._sqn = (
            jax.device_put(jnp.asarray(sqn8), shard_cols)
            if sqn8 is not None else None
        )
        self._scales = (
            jax.device_put(jnp.asarray(scl8), shard_cols)
            if scl8 is not None else None
        )
        self._cent = jnp.asarray(index.centroids, jnp.float32)
        # planning only needs the slim tables; dropping the rearranged f32
        # host master (lay.emb) releases a full-store RAM copy (~64 GB at
        # the 21M x 768 Wikipedia target) once it lives on the mesh
        self._lay = lay._replace(emb=None)

    # -- planning (host, vectorized per shard) ------------------------------
    def probe_cells(self, query_emb: np.ndarray) -> np.ndarray:
        return ivf_mod.probe_cells_host(
            query_emb, self._cent, self.nprobe,
            self.index.metric, self.index.nlist,
        )

    def plan(self, probes: np.ndarray) -> np.ndarray:
        """[Q, nprobe] cell ids -> [S, T, PB] per-shard local block
        descriptors (per-tile union, ownership-filtered; holes -> each
        shard's trailing pad block). PB is the pow2 bucket of the widest
        (shard, tile) requirement, shared by all shards (one static shape
        rides the mesh)."""
        ix, lay = self.index, self._lay
        tiles, keep, t = ivf_mod.tile_union(probes)
        own = lay.owner[tiles]
        nb_all = ix.list_nblocks[tiles].astype(np.int64)
        per = [np.where(keep & (own == s), nb_all, 0)
               for s in range(self.n_shards)]
        pb = 8
        for nb_s in per:
            m = int(nb_s.sum(axis=1).max())
            pb = max(pb, _next_pow2(max(m, 1), 8))
        starts = lay.local_start[tiles]
        pad_block = lay.nb_max  # local index of each shard's all-pad block
        return np.stack([
            ivf_mod.expand_tile_blocks(starts, nb_s, pb, pad_block)
            for nb_s in per
        ])

    # -- search --------------------------------------------------------------
    def search_embeddings(
        self, query_emb: np.ndarray, k: int = 5, as_numpy: bool = True
    ) -> DenseSearchResult:
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from probing_rag_tpu.ops.pallas_ivf import ivf_topk_pallas, ivf_topk_xla

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

        # only operands that exist ride the mesh: materializing full-store
        # [8, npad] placeholder zeros/ones per call would push ~2x32 MB
        # host->device on every search at 1M docs — on the exact
        # small-batch latency path IVF exists to shorten
        extra, extra_specs = [], []
        if self._sqn is not None:
            extra.append(self._sqn)
            extra_specs.append(P(None, axes))
        if self._scales is not None:
            extra.append(self._scales)
            extra_specs.append(P(None, axes))
        int8 = self._int8

        use_kernel = self.use_kernel

        def shard_fn(qd, desc_l, emb_l, ids_l, *rest):
            sqn_l = rest[0] if metric == "l2" else None
            scl_l = rest[-1] if int8 else None
            if use_kernel:
                vals, gids = ivf_topk_pallas(
                    qd, desc_l[0], emb_l, ids_l, k=k, metric=metric,
                    block=block, sq_norms=sqn_l, scales=scl_l,
                    interpret=interpret,
                )
            else:
                vals, gids = ivf_topk_xla(
                    qd, desc_l[0], emb_l, ids_l, k=k, metric=metric,
                    block=block, sq_norms=sqn_l, scales=scl_l,
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
                      *extra_specs),
            out_specs=(P(), P()),
            check_vma=False,  # replicated after the all_gather merge
        )(jnp.asarray(qpad), jnp.asarray(desc), self._emb, self._ids, *extra)
        vals, idx = vals[:nq], idx[:nq]
        if metric == "l2":
            qsq = jnp.sum(jnp.asarray(q) ** 2, axis=-1, keepdims=True)
            vals = -vals + qsq
        if not as_numpy:
            return DenseSearchResult(idx, vals)
        return DenseSearchResult(np.asarray(idx), np.asarray(vals))

    def search(self, queries, k: int = 5) -> DenseSearchResult:
        """Text-query search (same retriever contract as IVFEngine.search)."""
        if self.encode_fn is None:
            raise ValueError("ShardedIVFEngine needs encode_fn to search raw text")
        return self.search_embeddings(
            np.asarray(self.encode_fn(list(queries))), k=k
        )
