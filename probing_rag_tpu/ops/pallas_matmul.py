"""Pallas TPU int8-weight matmul for the quantized LM path.

``x @ (q * s)`` with ``q`` int8 [K, N] and per-output-column scale ``s``
[1, N] — the seven matmul weight families of the quantized Gemma/Mistral
forward (models/gemma.py::quantize_lm_params). The int8→compute-dtype
convert happens on VMEM *tiles inside the kernel*, so HBM weight reads stay
int8 AND the convert is invisible to XLA: the XLA formulation's
loop-invariant converts get hoisted out of the decode ``while_loop`` at
batch ≥ 32, materializing a full bf16 weight copy per family and blowing
HBM (measured 16.7 GB > 15.75 GB on v5e; see PARITY.md).

Numerics mirror the XLA path bit-for-bit-ish: dot in the compute dtype
(f32 MXU accumulation), cast to ``dt``, then scale — the same op order as
``(x @ q.astype(dt)) * s.astype(dt)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, q_ref, s_ref, o_ref, *, dt, transpose_rhs):
    x = x_ref[:]  # [Mt, K] dt
    w = q_ref[:].astype(dt)  # int8 -> dt (in VMEM): [K, Nt] | [Nt, K]
    if transpose_rhs:
        acc = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc.astype(dt) * s_ref[:].astype(dt)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "tile_m", "tile_n", "interpret", "transpose_rhs"),
)
def matmul_int8(
    x: jnp.ndarray,  # [M, K] compute dtype
    q: jnp.ndarray,  # [K, N] int8 ([N, K] with transpose_rhs — the tied head)
    s: jnp.ndarray,  # [1, N] f32 per-output-column scales
    *,
    dt=jnp.bfloat16,
    tile_m: int = 256,
    tile_n: int = 512,
    interpret: bool = False,
    transpose_rhs: bool = False,
):
    m, k = x.shape
    if transpose_rhs:
        n, k2 = q.shape
    else:
        k2, n = q.shape
    assert k == k2, (x.shape, q.shape)
    tm = min(tile_m, max(8, -(-m // 8) * 8))
    mp = -(-m // tm) * tm
    np_ = -(-n // tile_n) * tile_n
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        qpad = ((0, np_ - n), (0, 0)) if transpose_rhs else ((0, 0), (0, np_ - n))
        q = jnp.pad(q, qpad)
        s = jnp.pad(s, ((0, 0), (0, np_ - n)))
    grid = (mp // tm, np_ // tile_n)
    q_spec = (
        pl.BlockSpec((tile_n, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        if transpose_rhs
        else pl.BlockSpec((k, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        functools.partial(_mm_kernel, dt=dt, transpose_rhs=transpose_rhs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            q_spec,
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, q, s)
    return out[:m, :n]
