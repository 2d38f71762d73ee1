"""Transform-and-fuse of TSDF layers — replaces voxblox
``mergeLayerAintoLayerB`` (reference call sites: submap_collection.cpp:31-33
server-side client-map reassembly; map_server.cpp:66-70 client merged-map
rebuild; msg_converter.h:48-50).

TPU design: resampling, not voxel-list iteration. Destination voxel centers
of every touched block are transformed into the source frame and the source
TSDF is sampled trilinearly; weighted running averages fuse the result into
the destination pool. Source blocks conservatively allocate a 3³
neighborhood of destination blocks around their transformed AABB (a block's
rotated bounding box spans ≤ 3 destination blocks per axis), all as fixed-
shape scatters.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..core import voxel as vx
from .tsdf import touched_block_slots

Array = jax.Array


def _candidate_dst_blocks(spec: vx.VoxelGridSpec, src: vx.TsdfLayer,
                          T_dst_src: Array):
    """→ (coords (S*27, 3) int32, valid (S*27,) bool): destination block
    coordinates conservatively covering each live source block."""
    s = spec.block_size
    live = jnp.arange(src.max_blocks) < src.num_blocks
    origin = vx.block_origin(spec, src.block_coords)          # (S,3)
    corners = jnp.stack(
        jnp.meshgrid(*([jnp.array([0.0, 1.0])] * 3), indexing="ij"), axis=-1
    ).reshape(8, 3) * s                                        # (8,3)
    pts = origin[:, None, :] + corners[None, :, :]             # (S,8,3)
    pts_dst = geo.transform_points(T_dst_src, pts)
    bmin = jnp.floor(jnp.min(pts_dst, axis=1) / s).astype(jnp.int32)  # (S,3)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(3)] * 3), indexing="ij"), axis=-1
    ).reshape(27, 3).astype(jnp.int32)
    cand = bmin[:, None, :] + offs[None, :, :]                 # (S,27,3)
    valid = jnp.broadcast_to(live[:, None], cand.shape[:2])
    return cand.reshape(-1, 3), valid.reshape(-1)


@partial(jax.jit, static_argnums=(0, 4), donate_argnums=1)
def merge_layer_into(spec: vx.VoxelGridSpec, dst: vx.TsdfLayer,
                     src: vx.TsdfLayer, T_dst_src: Array,
                     max_touched: int = 4096) -> vx.TsdfLayer:
    """Fuse src (posed by T_dst_src) into dst. Returns updated dst."""
    cand, cand_valid = _candidate_dst_blocks(spec, src, T_dst_src)
    dst = vx.allocate_blocks(spec, dst, cand, cand_valid)

    slots, slot_mask = touched_block_slots(spec, dst, cand, cand_valid,
                                           max_touched)
    coords = dst.block_coords[slots]
    centers = vx.voxel_centers_of_block(spec, coords)          # (K,v,v,v,3)
    p_src = geo.transform_points(geo.inverse(T_dst_src), centers)
    s_sdf, s_w, s_ok = vx.sample_tsdf_trilinear(spec, src, p_src)
    # nearest-voxel color from source (flat planar pool rows: per-channel
    # gather via a broadcast channel offset on the linear voxel index)
    v = spec.voxels_per_side
    v3 = v * v * v
    K = slots.shape[0]
    vsrc = vx.point_to_voxel(spec, p_src)
    b, l = vx.voxel_to_block(spec, vsrc)
    bidx = vx.lookup_block(spec, src, b)
    lin = ((l[..., 0] * v + l[..., 1]) * v + l[..., 2]).reshape(K, 1, v3)
    ch_off = (jnp.arange(3) * v3).reshape(1, 3, 1)
    c_src = src.color[jnp.maximum(bidx, 0).reshape(K, 1, v3),
                      ch_off + lin]                        # (K,3,v³)

    s_sdf = s_sdf.reshape(K, v3)
    w_in = jnp.where((s_ok & slot_mask[:, None, None, None]).reshape(K, v3),
                     s_w.reshape(K, v3), 0.0)
    old_sdf = dst.sdf[slots]                               # (K,v³)
    old_w = dst.weight[slots]
    old_c = dst.color[slots].reshape(K, 3, v3)
    new_w = old_w + w_in
    new_sdf = jnp.where(
        new_w > 0,
        (old_w * old_sdf + w_in * s_sdf) / jnp.maximum(new_w, 1e-9),
        old_sdf,
    )
    new_c = jnp.where(
        (new_w > 0)[:, None],
        (old_w[:, None] * old_c + w_in[:, None] * c_src)
        / jnp.maximum(new_w, 1e-9)[:, None],
        old_c,
    ).reshape(K, 3 * v3)
    return dataclasses.replace(
        dst,
        sdf=dst.sdf.at[slots].set(new_sdf, mode="drop"),
        weight=dst.weight.at[slots].set(new_w, mode="drop"),
        color=dst.color.at[slots].set(new_c, mode="drop"),
    )
