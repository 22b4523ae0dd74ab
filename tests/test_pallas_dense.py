"""Pallas dense top-k kernel vs the XLA implementation and brute force
(interpret mode on the CPU test backend; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.ops.dense_topk import matmul_topk
from probing_rag_tpu.ops.pallas_dense import dense_topk_pallas

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_pallas_matches_bruteforce(metric):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(700, 64)).astype(np.float32)  # non-multiple of tiles
    q = rng.normal(size=(9, 64)).astype(np.float32)
    vals, idx = dense_topk_pallas(
        jnp.asarray(q), jnp.asarray(emb), k=5, metric=metric,
        tile_n=256, tile_q=8, interpret=INTERPRET,
    )
    if metric == "ip":
        scores = q @ emb.T
        order = np.argsort(-scores, axis=-1)[:, :5]
    else:
        scores = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
        order = np.argsort(scores, axis=-1)[:, :5]
    for i in range(9):
        np.testing.assert_allclose(
            scores[i][np.asarray(idx[i])], scores[i][order[i]], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(vals[i]), scores[i][order[i]], rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_prepared_store_path_matches_direct(metric):
    """The hot-path contract (pre-padded store + cached norms + n_total)
    must rank identically to the convenience path that pads internally."""
    from probing_rag_tpu.ops.pallas_dense import prepare_dense_store

    rng = np.random.default_rng(2)
    emb = rng.normal(size=(700, 64)).astype(np.float32)  # pad 700 -> 768
    q = rng.normal(size=(9, 64)).astype(np.float32)
    v1, i1 = dense_topk_pallas(
        jnp.asarray(q), jnp.asarray(emb), k=5, metric=metric,
        tile_n=256, tile_q=8, interpret=INTERPRET,
    )
    store, sqn, n = prepare_dense_store(
        jnp.asarray(emb), tile_n=256, metric=metric
    )
    assert store.shape[0] == 768 and n == 700
    assert (sqn is None) == (metric == "ip")
    v2, i2 = dense_topk_pallas(
        jnp.asarray(q), store, k=5, metric=metric, sq_norms=sqn, n_total=n,
        tile_n=256, tile_q=8, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_matches_xla_op():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(512, 32)).astype(np.float32)
    q = rng.normal(size=(16, 32)).astype(np.float32)
    v1, i1 = matmul_topk(jnp.asarray(q), jnp.asarray(emb), k=4, metric="ip", tile_n=128)
    v2, i2 = dense_topk_pallas(
        jnp.asarray(q), jnp.asarray(emb), k=4, metric="ip",
        tile_n=128, tile_q=8, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("group_rows", [16, 32, 0])
def test_group_split_merge_matches_xla_op(group_rows):
    """The per-group gated merge (group_rows < query block) must rank
    identically to the whole-block merge and the XLA oracle — covers
    multiple groups per tile, partial final tiles, and ties."""
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(900, 32)).astype(np.float32)
    q = rng.normal(size=(96, 32)).astype(np.float32)
    v1, i1 = matmul_topk(
        jnp.asarray(q), jnp.asarray(emb), k=5, metric="ip", tile_n=256
    )
    v2, i2 = dense_topk_pallas(
        jnp.asarray(q), jnp.asarray(emb), k=5, metric="ip",
        tile_n=256, tile_q=96, group_rows=group_rows, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
