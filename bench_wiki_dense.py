"""Wikipedia-scale sharded IVF dense exercise (BASELINE.json configs 4+5).

The reference's dense path is contriever embeddings in flat faiss indexes
(make_indexer.py:446-457); at the full 21M-passage corpus a bf16 [N, 768]
store is ~32 GB — beyond one chip's HBM — so the serving layout is the
cell-sharded IVF store over the mesh (parallel/sharded_ivf.py). This
script builds the largest synthetic embedding corpus a CPU session
comfortably holds (default 2M x 256) and measures the host path the claim
rests on: device k-means training -> corpus assignment -> cell-sorted
block layout -> greedy LPT cell sharding -> vectorized union-tile planning
— then runs the probed search on the virtual 8-device CPU mesh
(interpret-mode kernel) and spot-checks against the exact probed-union
oracle plus recall@10 vs flat brute force. The round-3 lesson stands:
exactness claims tested only at small scale were false at serving scale;
this is the dense path's scale-regression net.

Prints one JSON line; run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(msg):
    print(f"[wiki-dense {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


N_DOCS = int(os.environ.get("WIKI_DENSE_DOCS", 2_000_000))
D = int(os.environ.get("WIKI_DENSE_D", 256))
N_CLUSTERS = int(os.environ.get("WIKI_DENSE_CLUSTERS", 4096))
N_QUERIES = int(os.environ.get("WIKI_DENSE_QUERIES", 8192))
N_SEARCH = int(os.environ.get("WIKI_DENSE_SEARCH", 64))
NPROBE = int(os.environ.get("WIKI_DENSE_NPROBE", 32))
N_SHARDS = 8


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from probing_rag_tpu.parallel.sharded_ivf import ShardedIVFEngine
    from probing_rag_tpu.retrieval.ivf import IVFDenseIndex

    rng = np.random.default_rng(0)
    t0 = time.time()
    centers = rng.normal(size=(N_CLUSTERS, D)).astype(np.float32)
    emb = (centers[rng.integers(0, N_CLUSTERS, size=N_DOCS)]
           + 0.3 * rng.normal(size=(N_DOCS, D)).astype(np.float32))
    synth_s = time.time() - t0

    log(f"synth done ({synth_s:.0f}s); building IVF index (k-means + layout)")
    t0 = time.time()
    index = IVFDenseIndex.build(emb, metric="ip", seed=0)
    build_s = time.time() - t0
    log(f"build done ({build_s:.0f}s, nlist={index.nlist})")

    devices = jax.devices()[:N_SHARDS]
    assert len(devices) == N_SHARDS, "run with xla_force_host_platform_device_count=8"
    mesh = Mesh(np.asarray(devices), ("shard",))

    # default: the XLA gather+einsum per-shard path (the off-TPU
    # production path — compiled, seconds at 2M docs); WIKI_DENSE_KERNEL=1
    # certifies the Pallas kernel in interpret mode instead (~19 min at 2M)
    force_kernel = os.environ.get("WIKI_DENSE_KERNEL", "") == "1"
    t0 = time.time()
    engine = ShardedIVFEngine(index, mesh, nprobe=NPROBE,
                              store_dtype=jnp.bfloat16,
                              interpret=True if force_kernel else None)
    shard_build_s = time.time() - t0
    log(f"shard layout done ({shard_build_s:.0f}s)")

    # planning microbench: vectorized union-tile planning at 8k queries
    qs = (emb[rng.choice(N_DOCS, N_QUERIES, replace=False)]
          + 0.1 * rng.normal(size=(N_QUERIES, D)).astype(np.float32))
    t0 = time.time()
    probes = engine.probe_cells(qs)
    probe_s = time.time() - t0
    log(f"probe done ({probe_s:.0f}s for {N_QUERIES} queries)")
    t0 = time.time()
    desc = engine.plan(probes)
    plan_s = time.time() - t0

    # sharded probed search on the virtual mesh (interpret-mode kernel)
    sample_ids = rng.choice(N_QUERIES, N_SEARCH, replace=False)
    t0 = time.time()
    res = engine.search_embeddings(qs[sample_ids], k=10)
    search_s = time.time() - t0
    log(f"mesh search done ({search_s:.0f}s for {N_SEARCH} queries)")

    # exact probed-union oracle + recall@10 vs flat brute force (sampled).
    # NOTE: the oracle must replay the SAMPLED batch's own plan — tile
    # membership (and so the probed union) depends on batch order
    desc_s = engine.plan(engine.probe_cells(qs[sample_ids]))
    lay = engine._lay
    ok = 0
    recall = []
    for i in range(8):
        q = qs[sample_ids[i]]
        ti = i // 8
        rows = []
        for s in range(N_SHARDS):
            base = s * (lay.nb_max + 1) * index.block
            for b in desc_row(engine, desc_s, s, ti):
                rows.append(np.arange(base + b * index.block,
                                      base + (b + 1) * index.block))
        rows = np.concatenate(rows)
        rows = rows[lay.ids[rows] >= 0]
        # oracle over the bf16-rounded store (what the kernel reads);
        # lay.emb is dropped by the engine after device_put, so map the
        # layout rows back to the original embeddings via the stored ids
        sub = emb[lay.ids[rows]].astype(jnp.bfloat16).astype(np.float32)
        sc = sub @ q
        order = np.argsort(-sc, kind="stable")[:10]
        exp = sc[order]
        got = res.scores[i]
        ok += int(np.allclose(np.sort(got)[::-1], np.sort(exp)[::-1],
                              rtol=5e-2, atol=5e-2))
        flat = np.argsort(-(emb @ q))[:10]
        recall.append(len(set(res.doc_indices[i]) & set(flat)) / 10)

    print(json.dumps({
        "metric": "wiki_scale_sharded_ivf_exercise",
        "value": N_DOCS,
        "unit": "docs",
        "vs_baseline": round(N_DOCS / 21_000_000, 3),
        "detail": {
            "n_docs": N_DOCS, "dim": D,
            "nlist": index.nlist, "nprobe": NPROBE,
            "n_shards": N_SHARDS,
            "synth_s": round(synth_s, 1),
            "kmeans_and_layout_build_s": round(build_s, 1),
            "shard_layout_s": round(shard_build_s, 1),
            "store_bytes_bf16": int(np.prod(engine._emb.shape)) * 2,
            "quantizer_imbalance": round(index.imbalance_factor(), 2),
            "probe_8k_queries_s": round(probe_s, 2),
            "plan_8k_queries_s": round(plan_s, 2),
            "plan_us_per_query": round(plan_s / N_QUERIES * 1e6, 1),
            "probed_blocks_per_tile_mean": round(
                float((desc != lay.nb_max).sum() / desc.shape[1]), 1),
            "mesh_search_s_per_64q": round(search_s, 1),
            "search_path": "pallas-interpret" if force_kernel else "xla",
            "oracle_spot_checks_passed": f"{ok}/8",
            "recall_at_10_vs_flat_mean": round(float(np.mean(recall)), 3),
        },
    }))


def desc_row(engine, desc, s, ti):
    lay = engine._lay
    return [b for b in desc[s, ti] if b != lay.nb_max]


if __name__ == "__main__":
    main()
