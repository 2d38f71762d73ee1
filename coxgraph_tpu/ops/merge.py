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


def _candidate_dst_blocks(dst_spec: vx.VoxelGridSpec,
                          src_spec: vx.VoxelGridSpec, src: vx.TsdfLayer,
                          T_dst_src: Array):
    """→ (coords (S*n³, 3) int32, valid (S*n³,) bool): destination block
    coordinates conservatively covering each live source block. n per axis
    is derived from the block-size ratio so cross-resolution merges
    (server 0.05 m vs client 0.10 m voxels, coxgraph_server.launch:5-6 vs
    coxgraph_client.yaml) stay covered: a rotated source block's AABB
    spans ≤ src_block·√3, hence ≤ floor(src_block·√3/dst_block)+2
    destination blocks per axis (= 3 in the same-spec case)."""
    s_src, s_dst = src_spec.block_size, dst_spec.block_size
    n_off = int(s_src * (3.0 ** 0.5) / s_dst) + 2
    live = jnp.arange(src.max_blocks) < src.num_blocks
    origin = vx.block_origin(src_spec, src.block_coords)      # (S,3)
    corners = jnp.stack(
        jnp.meshgrid(*([jnp.array([0.0, 1.0])] * 3), indexing="ij"), axis=-1
    ).reshape(8, 3) * s_src                                    # (8,3)
    pts = origin[:, None, :] + corners[None, :, :]             # (S,8,3)
    pts_dst = geo.transform_points(T_dst_src, pts)
    bmin = jnp.floor(jnp.min(pts_dst, axis=1) / s_dst).astype(jnp.int32)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(n_off)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(jnp.int32)
    cand = bmin[:, None, :] + offs[None, :, :]                 # (S,n³,3)
    valid = jnp.broadcast_to(live[:, None], cand.shape[:2])
    return cand.reshape(-1, 3), valid.reshape(-1)


@partial(jax.jit, static_argnums=(0, 4, 5), donate_argnums=1)
def merge_layer_into(spec: vx.VoxelGridSpec, dst: vx.TsdfLayer,
                     src: vx.TsdfLayer, T_dst_src: Array,
                     max_touched: int = 4096,
                     src_spec: vx.VoxelGridSpec = None) -> vx.TsdfLayer:
    """Fuse src (posed by T_dst_src) into dst. Returns updated dst.
    ``src_spec`` (default: same as dst) enables cross-resolution fusion —
    the destination is resampled from the source at its own grid, the
    reference's mergeLayerAintoLayerB between the server's finer mesh
    layer and client-resolution submaps."""
    src_spec = src_spec or spec
    cand, cand_valid = _candidate_dst_blocks(spec, src_spec, src, T_dst_src)
    dst = vx.allocate_blocks(spec, dst, cand, cand_valid)

    slots, slot_mask = touched_block_slots(spec, dst, cand, cand_valid,
                                           max_touched)
    coords = dst.block_coords[slots]
    centers = vx.voxel_centers_of_block(spec, coords)          # (K,v,v,v,3)
    p_src = geo.transform_points(geo.inverse(T_dst_src), centers)
    s_sdf, s_w, s_ok = vx.sample_tsdf_trilinear(src_spec, src, p_src)
    # nearest-voxel color from source (flat planar pool rows: per-channel
    # gather via a broadcast channel offset on the linear voxel index)
    v3 = spec.voxels_per_side ** 3                 # dst voxels per block
    sv = src_spec.voxels_per_side
    sv3 = sv * sv * sv
    K = slots.shape[0]
    vsrc = vx.point_to_voxel(src_spec, p_src)
    b, l = vx.voxel_to_block(src_spec, vsrc)
    bidx = vx.lookup_block(src_spec, src, b)
    lin = ((l[..., 0] * sv + l[..., 1]) * sv + l[..., 2]).reshape(K, 1, v3)
    ch_off = (jnp.arange(3) * sv3).reshape(1, 3, 1)
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
