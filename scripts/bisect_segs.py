#!/usr/bin/env python
"""Bisect the merge_segs TPU compiler SIGABRT (disposable diagnostic).

The dense kernel with merge_segs>1 aborts tpu_compile_helper (r3
dense_bf16_segs4/8; scripts/tpu_smoke.py repro). This builds stripped
variants of the kernel's segment loop to isolate the construct Mosaic
chokes on. Run: python scripts/bisect_segs.py v1 v2 ...
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probing_rag_tpu.ops.pallas_dense import topk_merge_tile

QB, D, TILE_N, NT, K, KP = 16, 128, 512, 4, 10, 16
SW = TILE_N // 4


def make_kernel(variant):
    def kern(q_ref, emb_ref, out_v, out_i, vals, idxs, seg_scr):
        ni = pl.program_id(0)

        @pl.when(ni == 0)
        def _():
            vals[:] = jnp.full_like(vals, -jnp.inf)
            idxs[:] = jnp.full_like(idxs, -1)

        scores = jnp.dot(q_ref[:], emb_ref[:].T,
                         preferred_element_type=jnp.float32)
        col = ni * TILE_N + jax.lax.broadcasted_iota(
            jnp.int32, (QB, TILE_N), 1)
        row_max = jnp.max(scores, axis=-1)

        def merge_span(s0, sw):
            def m():
                new_v, new_i = topk_merge_tile(
                    scores[:, s0:s0 + sw], col[:, s0:s0 + sw],
                    vals[:], idxs[:], K)
                vals[:] = new_v
                idxs[:] = new_i
            return m

        if variant == "v0":  # control: whole-tile gated merge (works)
            pl.when(jnp.any(row_max > vals[:, K - 1]))(merge_span(0, TILE_N))
        elif variant == "v1":  # segments, NO gates
            for s0 in range(0, TILE_N, SW):
                merge_span(s0, SW)()
        elif variant == "v2":  # segments, gate on slice max, merge slice
            for s0 in range(0, TILE_N, SW):
                g = jnp.any(jnp.max(scores[:, s0:s0 + SW], axis=-1)
                            > vals[:, K - 1])
                pl.when(g)(merge_span(s0, SW))
        elif variant == "v3":  # segments, gate on row_max (no slice in gate)
            for s0 in range(0, TILE_N, SW):
                pl.when(jnp.any(row_max > vals[:, K - 1]))(merge_span(s0, SW))
        elif variant == "v4":  # one sliced-gate sliced-merge segment only
            g = jnp.any(jnp.max(scores[:, 0:SW], axis=-1) > vals[:, K - 1])
            pl.when(g)(merge_span(0, SW))
        elif variant == "v5":  # scratch-materialized slice + fresh iota col
            for s0 in range(0, TILE_N, SW):
                seg_scr[:] = scores[:, s0:s0 + SW]
                seg = seg_scr[:]
                seg_col = (ni * TILE_N + s0) + jax.lax.broadcasted_iota(
                    jnp.int32, (QB, SW), 1)
                g = jnp.any(jnp.max(seg, axis=-1) > vals[:, K - 1])

                def m(seg=seg, seg_col=seg_col):
                    new_v, new_i = topk_merge_tile(
                        seg, seg_col, vals[:], idxs[:], K)
                    vals[:] = new_v
                    idxs[:] = new_i
                pl.when(g)(m)
        elif variant == "v6":  # sliced seg + fresh iota col (no scratch)
            for s0 in range(0, TILE_N, SW):
                seg = scores[:, s0:s0 + SW]
                seg_col = (ni * TILE_N + s0) + jax.lax.broadcasted_iota(
                    jnp.int32, (QB, SW), 1)
                g = jnp.any(jnp.max(seg, axis=-1) > vals[:, K - 1])

                def m(seg=seg, seg_col=seg_col):
                    new_v, new_i = topk_merge_tile(
                        seg, seg_col, vals[:], idxs[:], K)
                    vals[:] = new_v
                    idxs[:] = new_i
                pl.when(g)(m)

        @pl.when(ni == pl.num_programs(0) - 1)
        def _():
            out_v[:] = vals[:]
            out_i[:] = idxs[:]

    return kern


def run(variant):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(QB, D)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(NT * TILE_N, D)), jnp.float32)
    out = pl.pallas_call(
        make_kernel(variant),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((QB, D), lambda ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, D), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QB, KP), lambda ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, KP), lambda ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QB, KP), jnp.float32),
            jax.ShapeDtypeStruct((QB, KP), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QB, KP), jnp.float32),
            pltpu.VMEM((QB, KP), jnp.int32),
            pltpu.VMEM((QB, SW), jnp.float32),
        ],
    )(q, emb)
    v, i = out
    oracle = np.argsort(-(np.asarray(q) @ np.asarray(emb).T), axis=-1)[:, :K]
    ok = np.array_equal(np.asarray(i)[:, :K], oracle)
    return ok


if __name__ == "__main__":
    for v in sys.argv[1:] or ["v0", "v4", "v3", "v2", "v1"]:
        try:
            ok = run(v)
            print(f"PASS {v} (oracle match: {ok})")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {v}: {str(e).splitlines()[0][:120]}")
