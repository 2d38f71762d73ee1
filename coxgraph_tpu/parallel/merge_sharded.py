"""Sharded global transform-merge — the final-mesh reassembly distributed
over the device mesh (SURVEY.md §5.7 spatial-scaling axis: shard SUBMAPS
across chips, all-reduce only the fused voxel pools; the multi-chip form
of ServerVisualizer::getFinalGlobalMesh's per-submap merge loop,
server_visualizer.cpp:67-121 / voxblox mergeLayerAintoLayerB).

Weighted TSDF fusion is associative: merging k posed sources into an
empty destination is exactly sdf = Σᵢwᵢ·sdfᵢ / Σᵢwᵢ per voxel (and the
same for color), so the work decomposes cleanly:

  1. ALIGNED ALLOCATION (replicated): destination blocks are allocated
     from every submap's candidate set in a fixed scan order, so every
     device holds the identical slot ↔ block-coordinate mapping.
  2. LOCAL ACCUMULATION (sharded): each device resamples ITS submap
     subset at the destination voxel centers (the merge_layer_into math)
     and scatter-adds (Σw, Σw·sdf, Σw·color) into its pool accumulator.
  3. ONE psum PER FIELD reduces the exact global weighted average —
     matching the sequential result up to float reduction order.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import geometry as geo
from ..core import voxel as vx
from ..ops import tsdf as tsdf_ops
from ..ops.merge import _candidate_dst_blocks

Array = jax.Array


def stack_layers(layers: Sequence[vx.TsdfLayer],
                 spec: vx.VoxelGridSpec,
                 pad_to: Optional[int] = None) -> vx.TsdfLayer:
    """Stack per-submap layers into one pytree with a leading (S,) axis,
    padding with empty layers (num_blocks=0) up to ``pad_to`` so the S
    axis divides the device count."""
    n = len(layers)
    total = max(pad_to or n, n)
    if total > n:
        empty = vx.create_tsdf_layer(spec)
        layers = list(layers) + [empty] * (total - n)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def allocate_merged(spec: vx.VoxelGridSpec, stacked: vx.TsdfLayer,
                    poses: Array,
                    src_spec: Optional[vx.VoxelGridSpec] = None,
                    ) -> vx.TsdfLayer:
    """Deterministic destination allocation from every submap's candidate
    blocks (fixed scan order ⇒ identical pools on every device)."""
    src_spec = src_spec or spec

    def body(dst, xs):
        src, T = xs
        cand, cv = _candidate_dst_blocks(spec, src_spec, src, T)
        return vx.allocate_blocks(spec, dst, cand, cv), None

    dst, _ = jax.lax.scan(body, vx.create_tsdf_layer(spec),
                          (stacked, poses))
    return dst


def _accumulate_one(spec: vx.VoxelGridSpec, src_spec: vx.VoxelGridSpec,
                    dst: vx.TsdfLayer, src: vx.TsdfLayer, T_dst_src: Array,
                    max_touched: int, acc_w: Array, acc_ws: Array,
                    acc_wc: Array):
    """Scatter-add one source's (w, w·sdf, w·color) contribution at the
    destination voxel centers (the merge_layer_into resampling math)."""
    from ..ops.merge import _packed_trilinear

    cand, cv = _candidate_dst_blocks(spec, src_spec, src, T_dst_src)
    slots, smask = tsdf_ops.touched_block_slots(spec, dst, cand, cv,
                                                max_touched)
    coords = dst.block_coords[slots]
    centers = vx.voxel_centers_of_block(spec, coords)        # (K,v,v,v,3)
    p_src = geo.transform_points(geo.inverse(T_dst_src), centers)
    # same bf16-packed sampler as merge_layer_into — half the gather
    # count AND bit-identical fields between sharded and sequential
    # merges (the equality test pins them together)
    s16 = jax.lax.bitcast_convert_type(
        src.sdf.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    w16 = jax.lax.bitcast_convert_type(
        src.weight.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = ((s16 << 16) | w16).reshape(-1)
    s_sdf, s_w, s_ok = _packed_trilinear(src_spec, src, packed, p_src)

    v3 = spec.voxels_per_side ** 3
    sv = src_spec.voxels_per_side
    K = slots.shape[0]
    vsrc = vx.point_to_voxel(src_spec, p_src)
    b, l = vx.voxel_to_block(src_spec, vsrc)
    bidx = vx.lookup_block(src_spec, src, b)
    lin = ((l[..., 0] * sv + l[..., 1]) * sv + l[..., 2]).reshape(K, 1, v3)
    ch_off = (jnp.arange(3) * sv ** 3).reshape(1, 3, 1)
    c_src = src.color[jnp.maximum(bidx, 0).reshape(K, 1, v3), ch_off + lin]

    w_in = jnp.where((s_ok & smask[:, None, None, None]).reshape(K, v3),
                     s_w.reshape(K, v3), 0.0)
    # slots are deduped within one source → plain .at[].add is exact
    acc_w = acc_w.at[slots].add(w_in, mode="drop")
    acc_ws = acc_ws.at[slots].add(w_in * s_sdf.reshape(K, v3), mode="drop")
    acc_wc = acc_wc.at[slots].add(
        (w_in[:, None] * c_src).reshape(K, 3 * v3), mode="drop")
    return acc_w, acc_ws, acc_wc


def merge_submaps_sharded(spec: vx.VoxelGridSpec, mesh: Mesh,
                          stacked: vx.TsdfLayer, poses: Array,
                          src_spec: Optional[vx.VoxelGridSpec] = None,
                          max_touched: int = 4096) -> vx.TsdfLayer:
    """Distributed merge of S posed submaps (leading S axis sharded over
    ``mesh``'s first axis; S must divide the device count via
    stack_layers' padding). Returns the fused layer, replicated."""
    src_spec = src_spec or spec
    axis = mesh.axis_names[0]
    dst = allocate_merged(spec, stacked, poses, src_spec)
    mb, v3 = spec.max_blocks, spec.voxels_per_side ** 3

    def shard_fn(stacked, poses, dst):
        acc_w = jnp.zeros((mb, v3))
        acc_ws = jnp.zeros((mb, v3))
        acc_wc = jnp.zeros((mb, 3 * v3))

        def body(acc, xs):
            src, T = xs
            return _accumulate_one(spec, src_spec, dst, src, T,
                                   max_touched, *acc), None

        (acc_w, acc_ws, acc_wc), _ = jax.lax.scan(
            body, (acc_w, acc_ws, acc_wc), (stacked, poses))
        acc_w = jax.lax.psum(acc_w, axis)
        acc_ws = jax.lax.psum(acc_ws, axis)
        acc_wc = jax.lax.psum(acc_wc, axis)
        live = acc_w > 0
        sdf = jnp.where(live, acc_ws / jnp.maximum(acc_w, 1e-9),
                        spec.truncation)
        # color rows are channel-PLANAR [r(v³), g, b] → tile, not repeat
        color = jnp.where(
            jnp.tile(live, (1, 3)),
            acc_wc / jnp.maximum(jnp.tile(acc_w, (1, 3)), 1e-9), 0.0)
        return dataclasses.replace(dst, sdf=sdf, weight=acc_w, color=color)

    layer_specs = jax.tree.map(lambda _: P(), dst)
    stacked_specs = jax.tree.map(lambda _: P(axis), stacked)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(stacked_specs, P(axis), layer_specs),
        out_specs=layer_specs,
        check_vma=False,
    )(stacked, poses, dst)


def merge_layers_sharded(spec: vx.VoxelGridSpec, mesh: Mesh,
                         layers: List[vx.TsdfLayer], poses,
                         src_spec: Optional[vx.VoxelGridSpec] = None,
                         max_touched: int = 4096) -> vx.TsdfLayer:
    """Convenience wrapper: stack + pad per-submap layers to the device
    count, then run the sharded merge."""
    n_dev = int(np.prod(mesh.devices.shape))
    pad = -(-len(layers) // n_dev) * n_dev
    src_spec = src_spec or spec
    stacked = stack_layers(layers, src_spec, pad_to=pad)
    P7 = jnp.concatenate(
        [jnp.stack([jnp.asarray(p) for p in poses]),
         jnp.tile(geo.identity()[None], (pad - len(layers), 1))])
    return merge_submaps_sharded(spec, mesh, stacked, P7, src_spec,
                                 max_touched)


def extract_mesh_sharded(spec: vx.VoxelGridSpec, mesh: Mesh,
                         layer: vx.TsdfLayer, min_weight: float = 1e-4,
                         chunk: int = 16,
                         max_tris_per_device: int = 250_000):
    """Distributed marching-tetrahedra over a (replicated) fused layer:
    pool slots partitioned over the device mesh, each device extracts its
    shard's triangles (ops.mesh.extract_mesh_device over a slot range),
    host concatenates the compacted prefixes. The multi-chip form of
    voxblox MeshIntegrator for the final global mesh.

    → (verts (T,3,3) f32, colors (T,3,3) f32) numpy, like extract_mesh."""
    from ..ops import mesh as mesh_ops
    from ..utils.hostops import bucket_slice_cols

    axis = mesh.axis_names[0]
    D = int(np.prod(mesh.devices.shape))
    mbd = -(-spec.max_blocks // D)
    bases = jnp.arange(D, dtype=jnp.int32) * mbd

    def shard_fn(base, layer):
        v, c, n, total = mesh_ops.extract_mesh_device(
            spec, layer, min_weight, chunk, max_tris_per_device,
            slot_base=base[0], n_slots=mbd)
        return v[None], c[None], n[None], total[None]

    layer_specs = jax.tree.map(lambda _: P(), layer)
    verts, cols, cnt, tot = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), layer_specs),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )(bases, layer)

    counts = np.asarray(cnt)
    # overflow is observable here exactly like the single-device
    # extract_mesh — a dense shard silently losing triangles was the
    # failure mode the per-chunk counters were added for (ADVICE r4)
    n_lost = int(np.maximum(np.asarray(tot) - counts, 0).sum())
    if n_lost:
        import warnings
        warnings.warn(
            f"sharded mesh extraction dropped {n_lost} triangles (a "
            "shard overflowed max_tris_per_device or a chunk its "
            "capacity) — raise max_tris_per_device or lower chunk",
            RuntimeWarning, stacklevel=2)
    pv, pc = [], []
    for d in range(D):
        k = int(counts[d])
        if k == 0:
            continue
        # per-device buffers are (9, M) planes (ops.mesh round-4 layout)
        pv.append(np.ascontiguousarray(
            bucket_slice_cols(verts[d], k).T).reshape(-1, 3, 3))
        pc.append(np.ascontiguousarray(
            bucket_slice_cols(cols[d], k).T).reshape(-1, 3, 3))
    if not pv:
        return (np.zeros((0, 3, 3), np.float32),
                np.zeros((0, 3, 3), np.float32))
    return np.concatenate(pv), np.concatenate(pc)
