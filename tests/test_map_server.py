"""MapServer parity tests (reference map_server.cpp:59-152): merged ESDF
batch update, traversability pointcloud, keyframe-filtered submap mesh."""

import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.mapper import map_server as msrv
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import esdf as esdf_ops
from coxgraph_tpu.ops import tsdf as tsdf_ops

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=1024, truncation=0.3)
CFG = sm.MapperConfig(
    spec=SPEC,
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
    intrinsics=syn.PinholeIntrinsics().scaled(0.125),
    max_submaps=8,
    max_history=64,
    submap_interval=0.3,
)


def run_clip(n_frames=8, dt=0.1):
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(n_frames, scene.room_center, radius=2.5,
                                sweep=jnp.pi)
    state = sm.create_mapper(CFG)
    server = msrv.MapServer(CFG, msrv.MapServerConfig(
        esdf=esdf_ops.EsdfConfig(max_distance=1.0), robot_radius=0.4))
    for i in range(n_frames):
        depth, color = syn.render_depth(scene, CFG.intrinsics, traj[i])
        state, _ = sm.mapper_step(CFG, state, depth, color, traj[i], i * dt)
        server.add_keyframe(i * dt)
    return scene, traj, state, server


def test_merged_esdf_and_traversability():
    scene, traj, state, server = run_clip()
    col = state.collection
    esdf = server.merged_esdf(col)
    assert int(esdf.num_blocks) > 0
    # traversability: clearance points must be far from the true surface
    pts, mask = server.traversability(col)
    pts = np.asarray(pts)[np.asarray(mask)]
    assert pts.shape[0] > 20
    # every traversable point must clear the OBSERVED surface by at least
    # ~robot_radius (the ESDF cannot know about never-observed geometry;
    # one-voxel discretization slack)
    tsdf = server.merged_tsdf(col)
    centers = np.asarray(
        vx.voxel_centers_of_block(SPEC, tsdf.block_coords)).reshape(-1, 3)
    near_surf = (np.asarray(tsdf.weight).reshape(-1) > 1e-4) & (
        np.abs(np.asarray(tsdf.sdf)).reshape(-1) < 0.5 * SPEC.voxel_size)
    surf = centers[near_surf]
    assert surf.shape[0] > 0
    d = np.sqrt(
        ((pts[:, None, :] - surf[None, :, :]) ** 2).sum(-1)).min(axis=1)
    assert d.min() > 0.4 - 2 * SPEC.voxel_size

    # cache behaviour: same object until invalidated
    assert server.merged_esdf(col) is esdf
    server.notify_pose_update()
    assert server.merged_esdf(col) is not esdf


def test_keyframe_filtered_history():
    scene, traj, state, server = run_clip()
    col = state.collection
    # submap 0 spans t = 0, 0.1, 0.2; drop registered keyframes so only
    # t=0.1 matches
    server._keyframe_stamps = [0.1]
    stamps, poses = server.keyframe_history(col, 0)
    assert stamps.shape == (1,) and abs(stamps[0] - 0.1) < 1e-6
    assert poses.shape == (1, 7)
    # fallback stride path when nothing registered
    server._keyframe_stamps = []
    stamps2, _ = server.keyframe_history(col, 0)
    assert stamps2.shape[0] >= 1


def test_submap_mesh_msg_roundtrip():
    scene, traj, state, server = run_clip()
    col = state.collection
    msg = server.submap_mesh_msg(col, 0, CFG.intrinsics, client_id=1)
    assert msg.client_id == 1 and msg.submap_id == 0
    buf = msg.pack()
    from coxgraph_tpu.comm import mesh_comm
    back = mesh_comm.MeshWithHistory.unpack(buf)
    assert back.vertices().shape == msg.vertices().shape
