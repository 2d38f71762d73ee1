"""ESDF propagation from a TSDF layer — replaces voxblox EsdfMap /
EsdfIntegrator::updateFromTsdfLayerBatch (reference call sites:
map_server.h:90-94,141-145 — batch ESDF rebuild after submap pose updates;
traversability output map_server.cpp:109-117; esdf_max_distance ≈ 4 m).

TPU design: instead of voxblox's sequential wavefront (priority-queue
raise/lower), the ESDF is computed by **masked Jacobi distance sweeps** over
the allocated blocks: every voxel relaxes against its neighbors
(d ← min(d, dₙ + ‖Δ‖)) in parallel on the VPU; cross-block neighbors are
fetched through the block-index grid. K sweeps propagate the front K voxels
— the iteration count is ceil(max_distance / voxel_size) (plus slack), all
inside one jit with lax.scan, no queues. Negative (inside-surface)
distances propagate symmetrically, as in voxblox.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..core import voxel as vx

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EsdfConfig:
    max_distance: float = 2.0      # m (reference uses up to 4 m)
    full_connectivity: bool = False  # 6-neighbour vs 26-neighbour sweeps
    extra_iters: int = 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EsdfLayer:
    """Block-sparse ESDF sharing the parent TSDF's block table.

    Pools are FLAT rows like every other pool in the repo (core/voxel.py
    layout rule): a canonical (B, v, v, v) carry tiles its (v, v) minors
    — at v=16 the 16-lane minor pads to 128 (8x HBM) and every consumer
    boundary becomes a relayout copy. The sweep kernel reshapes to a
    spatial view internally, once, at control rate."""

    dist: Array          # (B, v³) signed distance, flat C-order rows
    observed: Array      # (B, v³) bool
    block_index: Array   # (G,G,G) int32 — same mapping as the TSDF layer
    block_coords: Array  # (B,3)
    num_blocks: Array    # ()


def _neighbor_offsets(full: bool):
    if not full:
        return np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
             [0, 0, -1]], dtype=np.int32)
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) != (0, 0, 0):
                    offs.append((dx, dy, dz))
    return np.array(offs, dtype=np.int32)



AXIS_OFFSETS = ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                (0, 0, 1), (0, 0, -1))


def face_neighbor_indices(spec: vx.VoxelGridSpec, block_coords: Array,
                          flat_index: Array):
    """{axis offset: (B,) index of the face-neighbor block} (−1 = none),
    hoisted out of the sweep (the lookups are block-level and static
    across iterations)."""
    out = {}
    for off3 in AXIS_OFFSETS:
        nb = block_coords + jnp.asarray(off3, jnp.int32)[None]
        slot = vx.block_grid_slot(spec, nb)
        out[off3] = jnp.where(vx.block_in_grid(spec, nb),
                              flat_index[slot], -1)
    return out


def axis_neighbor_field(d_src: Array, d_own: Array, face_idx, off3,
                        v: int, md: float) -> Array:
    """Axis-aligned neighbor field via static slice + one FACE-PLANE
    gather: the per-voxel 4-D gather of the generic path serializes the
    TPU gather unit (measured 32 s per ESDF build at 534 blocks over the
    tunnel — 2.2 G randomly-addressed elements across 44 sweeps); a
    (B, v, v) plane gather per direction is 1/16th the addresses and the
    rest is a contiguous shift XLA fuses. Bit-identical results.
    ``d_src`` may be a halo-extended pool (parallel/esdf_sharded) while
    ``d_own`` is the local slice being swept."""
    axis = next(a for a, c in enumerate(off3) if c != 0)
    sign = off3[axis]
    idx = face_idx[off3]
    safe = jnp.maximum(idx, 0)
    pl_i = 0 if sign > 0 else v - 1
    ax = axis + 1                                  # voxel axis in d
    # face plane of the neighbor block, (B, v, v)
    if ax == 1:
        plane = d_src[safe, pl_i, :, :]
    elif ax == 2:
        plane = d_src[safe, :, pl_i, :]
    else:
        plane = d_src[safe, :, :, pl_i]
    plane = jnp.where((idx >= 0)[:, None, None], plane, md)
    plane = jnp.expand_dims(plane, ax)             # (B,...,1,...)
    if sign > 0:
        body = jax.lax.slice_in_dim(d_own, 1, v, axis=ax)
        return jnp.concatenate([body, plane], axis=ax)
    body = jax.lax.slice_in_dim(d_own, 0, v - 1, axis=ax)
    return jnp.concatenate([plane, body], axis=ax)


@partial(jax.jit, static_argnums=(0, 2))
def esdf_from_tsdf(spec: vx.VoxelGridSpec, tsdf: vx.TsdfLayer,
                   cfg: EsdfConfig = EsdfConfig()) -> EsdfLayer:
    """Batch-build the ESDF over the TSDF's allocated blocks.

    Jitted (host-control-loop rule, docs/PERFORMANCE.md): run eagerly
    over the axon tunnel the surrounding op-by-op dispatches cost ~32 s
    per build at 534 blocks; jitted it is one dispatch (~0.4 s warm,
    round-3 measurement)."""
    v = spec.voxels_per_side
    B = tsdf.max_blocks
    # spatial views of the flat pool rows (control-rate: one relayout)
    sdf3 = tsdf.sdf.reshape(B, v, v, v)
    w3 = tsdf.weight.reshape(B, v, v, v)
    live = (jnp.arange(B) < tsdf.num_blocks)[:, None, None, None]
    observed = (w3 > 1e-6) & live
    md = cfg.max_distance

    # frozen band: observed voxels inside the truncation band keep their
    # TSDF value; the rest start at ±max_distance by TSDF sign
    band = observed & (jnp.abs(sdf3) < spec.truncation)
    init = jnp.where(
        band, sdf3, jnp.where(sdf3 >= 0, md, -md))
    init = jnp.where(observed, init, md)

    # global voxel indices of every voxel (B,v,v,v,3) for neighbor lookup
    r = jnp.arange(v, dtype=jnp.int32)
    ii, jj, kk = jnp.meshgrid(r, r, r, indexing="ij")
    local = jnp.stack([ii, jj, kk], axis=-1)
    gvox = tsdf.block_coords[:, None, None, None, :] * v + local

    offs = _neighbor_offsets(cfg.full_connectivity)
    step = jnp.linalg.norm(offs.astype(jnp.float32), axis=-1) * spec.voxel_size

    n_iters = math.ceil(md / spec.voxel_size) + cfg.extra_iters

    flat_index = tsdf.block_index.reshape(-1)

    def gather_neighbor(d: Array, off: Array) -> Array:
        nvox = gvox + off
        b, l = vx.voxel_to_block(spec, nvox)
        slot = vx.block_grid_slot(spec, b)
        idx = jnp.where(vx.block_in_grid(spec, b), flat_index[slot], -1)
        safe = jnp.maximum(idx, 0)
        dn = d[safe, l[..., 0], l[..., 1], l[..., 2]]
        return jnp.where(idx >= 0, dn, md)

    # block-level face-neighbor slots (one per axis-aligned direction):
    # cheap (B,)-sized lookups, hoisted out of the sweep
    face_idx = face_neighbor_indices(spec, tsdf.block_coords, flat_index)
    offs_np = [tuple(int(c) for c in o) for o in offs.tolist()]

    def sweep(d, _):
        pos_best = jnp.full_like(d, md)
        neg_best = jnp.full_like(d, -md)
        for a in range(len(offs_np)):
            o = offs_np[a]
            if sum(abs(c) for c in o) == 1:
                dn = axis_neighbor_field(d, d, face_idx, o, v, md)
            else:
                # diagonal offsets (full_connectivity): generic gather
                dn = gather_neighbor(d, offs[a])
            pos_best = jnp.minimum(pos_best, jnp.maximum(dn, 0.0) + step[a])
            neg_best = jnp.maximum(neg_best, jnp.minimum(dn, 0.0) - step[a])
        d_new = jnp.where(
            d >= 0, jnp.minimum(d, pos_best), jnp.maximum(d, neg_best))
        d_new = jnp.where(band, init, d_new)        # band frozen
        d_new = jnp.where(live, d_new, md)
        return d_new, None

    dist, _ = jax.lax.scan(sweep, init, None, length=n_iters)
    dist = jnp.clip(dist, -md, md)

    return EsdfLayer(
        dist=dist.reshape(B, -1),           # back to flat pool rows
        observed=observed.reshape(B, -1),
        block_index=tsdf.block_index,
        block_coords=tsdf.block_coords,
        num_blocks=tsdf.num_blocks,
    )


def sample_esdf(spec: vx.VoxelGridSpec, esdf: EsdfLayer,
                p: Array) -> Tuple[Array, Array]:
    """Trilinear ESDF lookup at world points (...,3) → (dist, valid)."""
    B = esdf.dist.shape[0]
    tmp = vx.TsdfLayer(
        sdf=esdf.dist,                    # already flat pool rows
        weight=esdf.observed.astype(esdf.dist.dtype),
        color=jnp.zeros((B, 0)),
        block_index=esdf.block_index, block_coords=esdf.block_coords,
        num_blocks=esdf.num_blocks)
    d, w, ok = vx.sample_tsdf_trilinear(spec, tmp, p)
    return d, ok


@partial(jax.jit, static_argnums=(0, 2))
def traversable_points(spec: vx.VoxelGridSpec, esdf: EsdfLayer,
                       robot_radius: float = 0.3):
    """Free-space voxel centers with clearance > robot_radius →
    (points (N,3), mask (N,)) fixed capacity — the reference's
    traversability pointcloud (createFreePointcloudFromEsdfLayer,
    map_server.cpp:109-117)."""
    centers = vx.voxel_centers_of_block(spec, esdf.block_coords)
    free = esdf.observed & (esdf.dist > robot_radius)      # (B, v³)
    live = (jnp.arange(esdf.dist.shape[0]) < esdf.num_blocks)
    free = free & live[:, None]
    return centers.reshape(-1, 3), free.reshape(-1)
