"""int8-weight matmul kernel (ops/pallas_matmul.py) — interpret-mode parity
against the XLA formulation it replaces on TPU (models/gemma.py::_mm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probing_rag_tpu.ops.pallas_matmul import matmul_int8


@pytest.mark.parametrize("m,k,n", [(8, 128, 256), (100, 256, 300), (1, 128, 640)])
@pytest.mark.parametrize("transpose_rhs", [False, True])
def test_matmul_int8_matches_xla_form(m, k, n, transpose_rhs):
    rng = np.random.default_rng(m * 7 + n + transpose_rhs)
    x = rng.normal(size=(m, k)).astype(np.float32)
    q = rng.integers(-127, 128, (n, k) if transpose_rhs else (k, n)).astype(np.int8)
    s = ((rng.random((1, n)) + 0.5) / 100).astype(np.float32)
    out = np.asarray(
        matmul_int8(
            jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
            dt=jnp.float32, interpret=True, transpose_rhs=transpose_rhs,
        )
    )
    ref = (x @ (q.T if transpose_rhs else q).astype(np.float32)) * s
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_matmul_int8_bf16_matches_quantized_mm():
    """Same op order as gemma._mm's XLA branch: dot -> cast bf16 -> scale."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 128)).astype(np.float32)
    q = rng.integers(-127, 128, (128, 256)).astype(np.int8)
    s = ((rng.random((1, 256)) + 0.5) / 100).astype(np.float32)
    out = matmul_int8(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(q), jnp.asarray(s),
        dt=jnp.bfloat16, interpret=True,
    )
    xb = jnp.asarray(x, jnp.bfloat16)
    ref = (xb @ jnp.asarray(q).astype(jnp.bfloat16)) * jnp.asarray(s).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
