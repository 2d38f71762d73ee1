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
        return jnp.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
             [0, 0, -1]], dtype=jnp.int32)
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) != (0, 0, 0):
                    offs.append((dx, dy, dz))
    return jnp.array(offs, dtype=jnp.int32)


@partial(jax.jit, static_argnums=(0, 2))
def esdf_from_tsdf(spec: vx.VoxelGridSpec, tsdf: vx.TsdfLayer,
                   cfg: EsdfConfig = EsdfConfig()) -> EsdfLayer:
    """Batch-build the ESDF over the TSDF's allocated blocks."""
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

    def sweep(d, _):
        pos_best = jnp.full_like(d, md)
        neg_best = jnp.full_like(d, -md)
        for a in range(offs.shape[0]):
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
