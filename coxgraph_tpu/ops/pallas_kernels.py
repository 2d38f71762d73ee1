"""Pallas TPU kernels for hot ops where hand-fusion beats XLA.

Most of this framework's hot paths (TSDF integration, merge, ESDF) are
memory-bound XLA programs already near the HBM roofline (see
docs/PERFORMANCE.md); Pallas is applied where XLA leaves real headroom:

  * `hamming_match_topk` — brute-force binary-descriptor matching. XLA
    materializes the (Ka, Kb, 8) XOR tensor in HBM and reduces it in
    separate passes; this kernel streams b-descriptors through VMEM tiles
    and keeps the popcount + top-2 reduction in registers, one pass.

Falls back to the jnp implementation on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_A_TILE = 128


def _popcount_u32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _match_kernel(da_ref, dbT_ref, d1_ref, i1_ref, d2_ref):
    """One a-tile (128, 8 words) vs ALL b, b TRANSPOSED to (8, Kb).

    Fully static: the 8 descriptor words unroll into broadcast XORs on
    (128, Kb) lane-major arrays; reductions stay 2-D via keepdims and
    outputs are (tile, 1) columns. (The first version looped b rows with
    dynamic_slice and carried 1-D state — interpret mode accepted it,
    real Mosaic has no dynamic_slice lowering and 1-D carries waste 7 of
    8 sublanes; caught by tests/test_tpu_onchip.py.)"""
    da = da_ref[:]                       # (128, 8) uint32
    dbT = dbT_ref[:]                     # (8, Kb) uint32
    kb = dbT.shape[1]

    dist = jnp.zeros((_A_TILE, kb), jnp.int32)
    for w in range(8):                   # static unroll over words
        x = da[:, w:w + 1] ^ dbT[w:w + 1, :]          # (128, Kb)
        dist = dist + _popcount_u32(x).astype(jnp.int32)

    d1 = jnp.min(dist, axis=1, keepdims=True)         # (128, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (_A_TILE, kb), 1)
    i1 = jnp.min(jnp.where(dist == d1, col, kb), axis=1, keepdims=True)
    dist2 = jnp.where(col == i1, jnp.int32(1 << 15), dist)
    d2 = jnp.min(dist2, axis=1, keepdims=True)
    d1_ref[...] = d1
    i1_ref[...] = i1
    d2_ref[...] = d2


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_match_topk(da: Array, db: Array, interpret: bool = False):
    """→ (d1 (Ka,), i1 (Ka,), d2 (Ka,)): best/second-best Hamming distance
    and best index in db for every row of da. da/db: (K, 8) uint32."""
    ka = da.shape[0]
    assert ka % _A_TILE == 0, f"Ka must be a multiple of {_A_TILE}"
    grid = (ka // _A_TILE,)
    # default (VMEM-blocked) specs: memory_space=ANY only supports
    # whole-array blocks with trivial index maps on real Mosaic —
    # the ANY variant lowered in interpret mode but failed to compile
    # on chip (caught by tests/test_tpu_onchip.py)
    d1, i1, d2 = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_A_TILE, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, db.shape[0]), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_A_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((_A_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((_A_TILE, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ka, 1), jnp.int32),
            jax.ShapeDtypeStruct((ka, 1), jnp.int32),
            jax.ShapeDtypeStruct((ka, 1), jnp.int32),
        ],
        interpret=interpret,
    )(da, db.T)
    return d1[:, 0], i1[:, 0], d2[:, 0]


def hamming_match_topk_reference(da: Array, db: Array):
    """jnp reference (and non-TPU fallback)."""
    x = da[:, None, :] ^ db[None, :, :]
    D = jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.int32)
    i1 = jnp.argmin(D, axis=1)
    d1 = jnp.min(D, axis=1)
    D2 = D.at[jnp.arange(D.shape[0]), i1].set(1 << 15)
    d2 = jnp.min(D2, axis=1)
    return d1, i1.astype(jnp.int32), d2
