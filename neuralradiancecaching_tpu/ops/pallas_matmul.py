"""Tiled MXU matmul kernel -- the TPU-native counterpart of the reference's
generic compute-shader matmul (data/shader/matmul/matmul.comp: one thread
per output element, O(n) loop each).

On TPU the same contraction is a grid of (TM, TN) output tiles, each
accumulating TK-wide panels on the 128x128 systolic array with an f32 VMEM
accumulator -- the canonical Pallas matmul shape. Exposed mainly for the
generic NN library (models/nn.py) and as the pedagogical replacement for
matmul.comp; XLA's native dot is equally good for plain uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
TILE_N = 256
TILE_K = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul(a: jnp.ndarray, b: jnp.ndarray,
           interpret: bool = False) -> jnp.ndarray:
    """(M, K) @ (K, N) -> (M, N), f32 accumulation, any shapes (padded to
    tile multiples internally)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    mp, kp, np_ = _round_up(m, TILE_M), _round_up(k, TILE_K), _round_up(
        n, TILE_N)
    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    n_k = kp // TILE_K
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(mp // TILE_M, np_ // TILE_N, n_k),
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_K), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, TILE_N), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_M, TILE_N), jnp.float32)],
        interpret=interpret,
    )(a, b)
    return out[:m, :n]
