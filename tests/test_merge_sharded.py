"""Sharded global merge (parallel/merge_sharded) — submaps partitioned
over an 8-device mesh must fuse to the same layer as the sequential
merge_layer_into loop (weighted fusion is associative)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import merge as merge_ops
from coxgraph_tpu.ops import tsdf as tsdf_ops
from coxgraph_tpu.parallel import merge_sharded as ms

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=2048, truncation=0.3)
ICFG = tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=128)
INTR = syn.PinholeIntrinsics().scaled(0.125)


def build_submaps(n=3):
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(n, scene.room_center, radius=2.4,
                                sweep=0.9 * jnp.pi)
    layers, poses = [], []
    for i in range(n):
        d, c = syn.render_depth(scene, INTR, traj[i])
        la = vx.create_tsdf_layer(SPEC)
        la = tsdf_ops.integrate_frame(SPEC, ICFG, INTR, la, d, c,
                                      geo.identity())
        layers.append(la)
        poses.append(traj[i])       # submap frame = camera frame
    return scene, layers, poses


def test_sharded_merge_matches_sequential():
    scene, layers, poses = build_submaps(3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dev",))
    sharded = ms.merge_layers_sharded(SPEC, mesh, layers, poses,
                                      max_touched=SPEC.max_blocks)

    seq = vx.create_tsdf_layer(SPEC)
    for la, T in zip(layers, poses):
        seq = merge_ops.merge_layer_into(SPEC, seq, la, T,
                                         max_touched=SPEC.max_blocks)

    # per-voxel agreement on blocks allocated by BOTH (rim blocks with
    # zero weight may differ by float-edge candidate dilation; the
    # observed volume must agree)
    n_sh, n_sq = int(sharded.num_blocks), int(seq.num_blocks)
    assert n_sh > 10 and n_sq > 10
    idx_sh = np.asarray(sharded.block_index)
    idx_sq = np.asarray(seq.block_index)
    sel = (idx_sh >= 0) & (idx_sq >= 0)
    a_w = np.asarray(sharded.weight)[idx_sh[sel]]
    b_w = np.asarray(seq.weight)[idx_sq[sel]]
    np.testing.assert_allclose(a_w, b_w, atol=1e-5)
    # every OBSERVED voxel lives in a block allocated by both
    tot_sh = float(np.asarray(sharded.weight).sum())
    tot_sq = float(np.asarray(seq.weight).sum())
    np.testing.assert_allclose(a_w.sum(), tot_sh, rtol=1e-6)
    np.testing.assert_allclose(b_w.sum(), tot_sq, rtol=1e-6)
    live = b_w > 1e-6
    np.testing.assert_allclose(
        np.asarray(sharded.sdf)[idx_sh[sel]][live],
        np.asarray(seq.sdf)[idx_sq[sel]][live], atol=1e-4)
    # nearest-voxel color can flip its source at exact block boundaries
    # under different fusion orders — tolerance covers those rare flips
    np.testing.assert_allclose(
        np.asarray(sharded.color)[idx_sh[sel]][np.tile(live, (1, 3))],
        np.asarray(seq.color)[idx_sq[sel]][np.tile(live, (1, 3))],
        atol=2e-2)

    # the fused surface is near ground truth
    centers = vx.voxel_centers_of_block(SPEC, sharded.block_coords)
    true = np.asarray(syn.scene_sdf(scene, centers)).reshape(
        SPEC.max_blocks, -1)
    near = (np.asarray(sharded.weight) > 0.1) & (np.abs(true) < 0.15)
    assert near.sum() > 100
    err = np.abs(np.asarray(sharded.sdf)[near] - true[near])
    assert np.median(err) < SPEC.voxel_size


def test_sharded_merge_cross_resolution():
    scene, layers, poses = build_submaps(2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dev",))
    dspec = vx.VoxelGridSpec(voxel_size=0.2, voxels_per_side=8,
                             grid_dim=16, max_blocks=256, truncation=0.6)
    out = ms.merge_layers_sharded(dspec, mesh, layers, poses,
                                  src_spec=SPEC, max_touched=256)
    assert int(out.num_blocks) > 5
    centers = vx.voxel_centers_of_block(dspec, out.block_coords)
    true = np.asarray(syn.scene_sdf(scene, centers)).reshape(
        dspec.max_blocks, -1)
    near = (np.asarray(out.weight) > 0.01) & (np.abs(true) < 0.3)
    assert near.sum() > 50
    err = np.abs(np.asarray(out.sdf)[near] - true[near])
    assert np.median(err) < 0.2


def test_sharded_mesh_extraction_matches_sequential():
    """Slot-sharded marching tetrahedra over the fused layer must produce
    the same triangle set as the single-device extractor."""
    from coxgraph_tpu.ops import mesh as mesh_ops

    scene, layers, poses = build_submaps(2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dev",))
    fused = ms.merge_layers_sharded(SPEC, mesh, layers, poses,
                                    max_touched=SPEC.max_blocks)
    v_sh, c_sh = ms.extract_mesh_sharded(SPEC, mesh, fused,
                                         min_weight=0.05,
                                         max_tris_per_device=100_000)
    # quantize=False: the set comparison keys centroids at 0.1 mm, finer
    # than the default readback quantization LSB
    v_sq, c_sq = mesh_ops.extract_mesh(SPEC, fused, min_weight=0.05,
                                       quantize=False)
    assert v_sh.shape == v_sq.shape and v_sh.shape[0] > 100
    # same triangles (order may differ across shards) — compare as sets
    # keyed by centroid
    key_sh = np.round(v_sh.mean(1) * 1e4).astype(np.int64)
    key_sq = np.round(v_sq.mean(1) * 1e4).astype(np.int64)
    s_sh = {tuple(k) for k in key_sh}
    s_sq = {tuple(k) for k in key_sq}
    assert s_sh == s_sq
