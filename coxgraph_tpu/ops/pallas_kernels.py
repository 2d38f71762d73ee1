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


def _match_kernel(da_ref, db_ref, d1_ref, i1_ref, d2_ref):
    """One a-tile (128, 8 words) vs ALL b (Kb, 8 words).

    Outputs per a-row: best distance, best index, second-best distance."""
    da = da_ref[:]                       # (128, 8) uint32
    db = db_ref[:]                       # (Kb, 8) uint32
    kb = db.shape[0]

    d1 = jnp.full((_A_TILE,), 1 << 15, jnp.int32)
    i1 = jnp.full((_A_TILE,), -1, jnp.int32)
    d2 = jnp.full((_A_TILE,), 1 << 15, jnp.int32)

    def body(j, carry):
        d1, i1, d2 = carry
        # distance of every a-row to b-row j: (128,8)^(1,8) → popcount sum
        x = da ^ jax.lax.dynamic_slice_in_dim(db, j, 1, axis=0)
        dist = jnp.sum(_popcount_u32(x), axis=1).astype(jnp.int32)  # (128,)
        better1 = dist < d1
        new_d2 = jnp.where(better1, d1, jnp.minimum(d2, dist))
        new_d1 = jnp.where(better1, dist, d1)
        new_i1 = jnp.where(better1, j, i1)
        return new_d1, new_i1, new_d2

    d1, i1, d2 = jax.lax.fori_loop(0, kb, body, (d1, i1, d2))
    d1_ref[:] = d1
    i1_ref[:] = i1
    d2_ref[:] = d2


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_match_topk(da: Array, db: Array, interpret: bool = False):
    """→ (d1 (Ka,), i1 (Ka,), d2 (Ka,)): best/second-best Hamming distance
    and best index in db for every row of da. da/db: (K, 8) uint32."""
    ka = da.shape[0]
    assert ka % _A_TILE == 0, f"Ka must be a multiple of {_A_TILE}"
    grid = (ka // _A_TILE,)
    out = pl.pallas_call(
        _match_kernel,
        grid=grid,
        # default (VMEM-blocked) specs: memory_space=ANY only supports
        # whole-array blocks with trivial index maps on real Mosaic —
        # the ANY variant lowered in interpret mode but failed to compile
        # on chip (caught by tests/test_tpu_onchip.py)
        in_specs=[
            pl.BlockSpec((_A_TILE, 8), lambda i: (i, 0)),
            pl.BlockSpec(db.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_A_TILE,), lambda i: (i,)),
            pl.BlockSpec((_A_TILE,), lambda i: (i,)),
            pl.BlockSpec((_A_TILE,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ka,), jnp.int32),
            jax.ShapeDtypeStruct((ka,), jnp.int32),
            jax.ShapeDtypeStruct((ka,), jnp.int32),
        ],
        interpret=interpret,
    )(da, db)
    return tuple(out)


def hamming_match_topk_reference(da: Array, db: Array):
    """jnp reference (and non-TPU fallback)."""
    x = da[:, None, :] ^ db[None, :, :]
    D = jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.int32)
    i1 = jnp.argmin(D, axis=1)
    d1 = jnp.min(D, axis=1)
    D2 = D.at[jnp.arange(D.shape[0]), i1].set(1 << 15)
    d2 = jnp.min(D2, axis=1)
    return d1, i1.astype(jnp.int32), d2
