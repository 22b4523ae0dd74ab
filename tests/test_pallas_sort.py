"""Bitonic pair-sort kernel (ops/pallas_sort.py) — interpret-mode parity
against numpy. The TPU-compiled path is exercised by bench.py; measured
numbers live in PARITY.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probing_rag_tpu.ops.pallas_sort import (
    sort_pairs_pallas,
    sort_pairs_pallas_wide,
)


@pytest.mark.parametrize("q,p", [(4, 256), (8, 1024), (3, 512), (9, 128)])
@pytest.mark.parametrize("unroll", [True, False])
@pytest.mark.slow
def test_sort_pairs_matches_numpy(q, p, unroll):
    rng = np.random.default_rng(q * 1000 + p)
    k = rng.integers(0, 500, (q, p)).astype(np.int32)
    v = rng.normal(size=(q, p)).astype(np.float32)
    ok, ov = sort_pairs_pallas(
        jnp.asarray(k), jnp.asarray(v), interpret=True, unroll=unroll
    )
    ok, ov = np.asarray(ok), np.asarray(ov)
    assert np.array_equal(ok, np.sort(k, axis=1))
    # pairs must be preserved: same multiset of (key, value) per row
    for r in range(q):
        a = sorted(zip(k[r].tolist(), v[r].tolist()))
        b = sorted(zip(ok[r].tolist(), ov[r].tolist()))
        assert a == b


def test_sort_pairs_with_sentinel_padding():
    # the BM25 layout: real docs + a sentinel tail that must sort last
    sentinel = 100
    k = np.array([[5, sentinel, 3, sentinel, 3, 7, sentinel, 1]], np.int32)
    v = np.array([[1.0, 0.0, 2.0, 0.0, 3.0, 4.0, 0.0, 5.0]], np.float32)
    ok, ov = sort_pairs_pallas(jnp.asarray(k), jnp.asarray(v), interpret=True)
    assert np.asarray(ok)[0].tolist() == [1, 3, 3, 5, 7, sentinel, sentinel, sentinel]
    # equal-key payloads may permute within the run; totals are what matter
    run_3 = np.asarray(ov)[0][1:3].sum()
    assert run_3 == pytest.approx(5.0)


@pytest.mark.parametrize(
    "q,p,w", [(3, 2048, 256), (2, 4096, 512), (5, 1024, 128)]
)
@pytest.mark.parametrize("unroll", [True, False])
@pytest.mark.slow
def test_sort_pairs_wide_matches_numpy(q, p, w, unroll):
    rng = np.random.default_rng(q * 1000 + p + w)
    k = rng.integers(0, 700, (q, p)).astype(np.int32)
    v = rng.normal(size=(q, p)).astype(np.float32)
    ok, ov = sort_pairs_pallas_wide(
        jnp.asarray(k), jnp.asarray(v), lane_width=w, interpret=True,
        unroll=unroll,
    )
    ok, ov = np.asarray(ok), np.asarray(ov)
    assert np.array_equal(ok, np.sort(k, axis=1))
    for r in range(q):
        a = sorted(zip(k[r].tolist(), v[r].tolist()))
        b = sorted(zip(ok[r].tolist(), ov[r].tolist()))
        assert a == b


@pytest.mark.slow
def test_sort_pairs_wide_narrow_delegates():
    # p <= lane_width routes to the single-tile kernel
    rng = np.random.default_rng(7)
    k = rng.integers(0, 99, (4, 256)).astype(np.int32)
    v = rng.normal(size=(4, 256)).astype(np.float32)
    ok, _ = sort_pairs_pallas_wide(
        jnp.asarray(k), jnp.asarray(v), lane_width=512, interpret=True
    )
    assert np.array_equal(np.asarray(ok), np.sort(k, axis=1))


def test_sort_pairs_wide_sentinel_tail():
    # over-cap fallback layout: postings then a sentinel-padded tail
    sentinel = 1_000_000
    rng = np.random.default_rng(3)
    k = rng.integers(0, 50, (2, 1024)).astype(np.int32)
    k[:, 700:] = sentinel
    v = rng.normal(size=(2, 1024)).astype(np.float32)
    ok, _ = sort_pairs_pallas_wide(
        jnp.asarray(k), jnp.asarray(v), lane_width=128, interpret=True
    )
    assert np.array_equal(np.asarray(ok), np.sort(k, axis=1))


def test_sort_pairs_k_stop_establishes_block_alternation():
    """k_stop=B leaves every aligned B-block sorted — ascending at even
    block index, descending at odd (the k_start=2B precondition)."""
    B = 64
    rng = np.random.default_rng(11)
    k = rng.integers(0, 10_000, (4, 1024)).astype(np.int32)
    v = rng.normal(size=(4, 1024)).astype(np.float32)
    ok, ov = sort_pairs_pallas(
        jnp.asarray(k), jnp.asarray(v), interpret=True, k_stop=B
    )
    ok, ov = np.asarray(ok), np.asarray(ov)
    blocks = ok.reshape(4, -1, B)
    asc = np.all(np.diff(blocks[:, 0::2], axis=-1) >= 0)
    desc = np.all(np.diff(blocks[:, 1::2], axis=-1) <= 0)
    assert asc and desc
    for r in range(4):  # multiset of pairs preserved
        assert sorted(zip(k[r].tolist(), v[r].tolist())) == sorted(
            zip(ok[r].tolist(), ov[r].tolist())
        )


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.slow
def test_sort_kernels_k_start_resumes_partial_network(wide):
    """Rows preconditioned to the post-stage-B state (every B-block sorted,
    alternating) sort fully with k_start=2B — in both the single-tile and
    the wide-row kernel."""
    B = 32
    q, p = 3, 1024
    rng = np.random.default_rng(13)
    k = rng.integers(0, 50_000, (q, p)).astype(np.int32)
    v = rng.normal(size=(q, p)).astype(np.float32)
    # numpy reference preconditioner: sort each B-block, reverse odd blocks
    kb = np.sort(k.reshape(q, -1, B), axis=-1)
    order = np.argsort(k.reshape(q, -1, B), kind="stable", axis=-1)
    vb = np.take_along_axis(v.reshape(q, -1, B), order, axis=-1)
    kb[:, 1::2] = kb[:, 1::2, ::-1]
    vb[:, 1::2] = vb[:, 1::2, ::-1]
    kp, vp = kb.reshape(q, p), vb.reshape(q, p)
    if wide:
        ok, ov = sort_pairs_pallas_wide(
            jnp.asarray(kp), jnp.asarray(vp), lane_width=128,
            interpret=True, k_start=2 * B,
        )
    else:
        ok, ov = sort_pairs_pallas(
            jnp.asarray(kp), jnp.asarray(vp), interpret=True, k_start=2 * B
        )
    ok, ov = np.asarray(ok), np.asarray(ov)
    assert np.array_equal(ok, np.sort(k, axis=1))
    for r in range(q):
        assert sorted(zip(k[r].tolist(), v[r].tolist())) == sorted(
            zip(ok[r].tolist(), ov[r].tolist())
        )


def test_sort_pairs_rejects_non_pow2():
    with pytest.raises(ValueError):
        sort_pairs_pallas(
            jnp.zeros((2, 96), jnp.int32), jnp.zeros((2, 96), jnp.float32),
            interpret=True,
        )
