#!/usr/bin/env python
"""Chip micro-benchmark for the dense-sweep merge design space.

The r4 session measured the flat dense sweep at 37% of HBM bound
(MEASURE_r4 dense_bf16_segs1: 2.51 ms/batch) against a measured merge-free
floor of 1.27 ms — the gated ``topk_merge_tile`` insert rounds cost ~1.2 ms
per batch. This script measures each candidate lever directly on the chip
so the kernel change is chosen by data, not modeling:

- ``group_rows`` sweep (merge-gate granularity),
- ``k_pad`` width (wider running buffer = rarer qualifying candidates? no —
  same threshold; included to confirm it is free),
- the no-carry threshold-descent merge (``BENCH_MERGE_NOCARRY=1`` once
  implemented in ops/pallas_dense.py),
- int8xint8 MXU sweep (``BENCH_MERGE_I8MXU=1`` once implemented).

Run: python scripts/bench_merge_variants.py  (needs the TPU tunnel)
Prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_DOCS = int(os.environ.get("BENCH_MERGE_DOCS", 500_000))
DIM = int(os.environ.get("BENCH_MERGE_DIM", 768))
QB = int(os.environ.get("BENCH_MERGE_Q", 256))
K = 10
REPS = int(os.environ.get("BENCH_MERGE_REPS", 20))


def main():
    from bench_util import require_live_device

    require_live_device()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from probing_rag_tpu.ops.pallas_dense import (
        dense_topk_pallas, prepare_dense_store,
    )

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(N_DOCS, DIM)).astype(np.float32)
    q = rng.normal(size=(QB, DIM)).astype(np.float32)
    store, _, scl, n = prepare_dense_store(
        jnp.asarray(emb, jnp.bfloat16), tile_n=4096, metric="ip")
    qd = jax.device_put(jnp.asarray(q))
    oracle = np.argsort(-(q @ emb.T), axis=-1)[:, :K]

    def run_variant(name, tile_n=4096, st=None, **kw):
        try:
            fn = lambda: dense_topk_pallas(  # noqa: E731
                qd, st if st is not None else store, k=K, n_total=n,
                tile_n=tile_n, **kw)
            v, idx = fn()
            idx.block_until_ready()
            # settle + time
            fn()[1].block_until_ready()
            t0 = time.time()
            for _ in range(REPS):
                out = fn()
            out[1].block_until_ready()
            per_batch_ms = (time.time() - t0) / REPS * 1000
            got = np.asarray(idx)
            rec = np.mean(
                [len(set(got[r]) & set(oracle[r])) / K for r in range(QB)])
            print(json.dumps({
                "variant": name, "per_batch_ms": round(per_batch_ms, 3),
                "qps": round(QB / per_batch_ms * 1000, 1),
                "recall_at_10": round(float(rec), 4), **kw,
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "variant": name, "error": str(e).splitlines()[0][:200], **kw,
            }), flush=True)

    for gr in (16, 32, 64, 128, 0):
        run_variant(f"group_rows={gr}", group_rows=gr)
    run_variant("k_pad=32", group_rows=64, k_pad=32)
    if os.environ.get("BENCH_MERGE_NOCARRY", "0") == "1":
        for gr in (32, 64, 128, 0):
            run_variant(f"nocarry gr={gr}", group_rows=gr, merge_mode="nocarry")
    if os.environ.get("BENCH_MERGE_TILES", "0") == "1":
        # tile_n sweep under the winning merge mode: the 8192 tile
        # historically lost 5x to while-loop carry spill, which nocarry
        # removes; 2048 halves the per-gate width
        for tn in (2048, 8192, 16384):
            st, _, _, ntn = prepare_dense_store(
                jnp.asarray(emb, jnp.bfloat16), tile_n=tn, metric="ip")
            run_variant(f"nocarry tile_n={tn}", tile_n=tn, st=st,
                        group_rows=0, merge_mode="nocarry")
            del st
    if os.environ.get("BENCH_MERGE_I8MXU", "0") == "1":
        from probing_rag_tpu.ops.pallas_dense import dense_topk_rerank

        store8, _, scl8, n8 = prepare_dense_store(
            jnp.asarray(emb, jnp.float32), tile_n=4096, metric="ip",
            store_dtype=jnp.int8)
        emb_bf16 = jax.device_put(jnp.asarray(emb, jnp.bfloat16))

        def run_rerank(name, **kw):
            try:
                fn = lambda: dense_topk_rerank(  # noqa: E731
                    qd, store8, emb_bf16, k=K, scales=scl8, n_total=n8,
                    tile_n=4096, k_pad=32, **kw)
                v, idx = fn()
                idx.block_until_ready()
                fn()[1].block_until_ready()
                t0 = time.time()
                for _ in range(REPS):
                    out = fn()
                out[1].block_until_ready()
                per_batch_ms = (time.time() - t0) / REPS * 1000
                got = np.asarray(idx)
                rec = np.mean(
                    [len(set(got[r]) & set(oracle[r])) / K for r in range(QB)])
                print(json.dumps({
                    "variant": name, "per_batch_ms": round(per_batch_ms, 3),
                    "qps": round(QB / per_batch_ms * 1000, 1),
                    "recall_at_10": round(float(rec), 4), **kw,
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "variant": name, "error": str(e).splitlines()[0][:200],
                    **kw,
                }), flush=True)

        run_rerank("i8mxu rerank", mxu_int8=True)
        run_rerank("i8 rerank (dequant)", )


if __name__ == "__main__":
    main()

