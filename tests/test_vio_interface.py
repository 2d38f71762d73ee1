"""VIO adapter (coxgraph_mod parity): ORB-SLAM axis conversion, matrix
pose input, TF frame chain, toggle-mapping gating, need-to-fuse cache."""

import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn, vio_interface as vio
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import tsdf as tsdf_ops
from coxgraph_tpu.server.client_interface import InProcessClient

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=256, truncation=0.3)
CFG = sm.MapperConfig(
    spec=SPEC,
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=64),
    intrinsics=syn.PinholeIntrinsics().scaled(0.125),
    max_submaps=4, max_history=32, submap_interval=100.0)

C = vio._ORB_TO_ROS


def orb_matrix_from_pose(pose):
    """Inverse of pose_from_orbslam (test oracle): world pose → ORB Tcw."""
    R3 = np.asarray(geo.quat_to_matrix(pose[:4]), np.float64)
    t3 = np.asarray(pose[4:7], np.float64)
    R_i = C.T @ R3.T @ C
    t_i = -(R_i @ (C.T @ t3))
    T = np.eye(4)
    T[:3, :3] = R_i
    T[:3, 3] = t_i
    return T


def test_pose_from_orbslam_identity_and_roundtrip():
    # identity tracker pose → identity world pose
    p = vio.pose_from_orbslam(np.eye(4))
    np.testing.assert_allclose(np.asarray(p), np.asarray(geo.identity()),
                               atol=1e-6)
    # round-trip a generic pose through the ORB convention
    want = geo.from_xyzyaw(jnp.asarray([0.7, -0.3, 0.25, 0.9]))
    got = vio.pose_from_orbslam(orb_matrix_from_pose(want))
    err = geo.se3_log(geo.relative(got, want))
    assert float(jnp.linalg.norm(err)) < 1e-5


def make_vio():
    client = InProcessClient(0, CFG, sm.create_mapper(CFG))
    return vio.VIOInterface(0, CFG, client), client


def test_update_pose_matrix_and_frames():
    v, client = make_vio()
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = syn.render_depth(scene, CFG.intrinsics, T)
    v.update_pose_matrix(orb_matrix_from_pose(T), 0.0, depth, color)
    assert int(client.state.collection.num_submaps) == 1
    # frame chain: odom→sensor only, matches the fed pose
    fr = v.frames()
    err = geo.se3_log(geo.relative(fr[("odom", "sensor")], T))
    assert float(jnp.linalg.norm(err)) < 1e-4
    # with IMU extrinsics: odom→imu ∘ imu→sensor == odom→sensor
    v.T_imu_sensor = geo.from_xyzyaw(jnp.asarray([0.1, 0.0, 0.05, 0.2]))
    fr = v.frames()
    chained = geo.compose(fr[("odom", "imu")], fr[("imu", "sensor")])
    err = geo.se3_log(geo.relative(chained, fr.get(("odom", "sensor"),
                                                   v.T_odom_latest)))
    assert float(jnp.linalg.norm(err)) < 1e-5


def test_toggle_mapping_gates_integration():
    v, client = make_vio()
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = syn.render_depth(scene, CFG.intrinsics, T)
    v.toggle_mapping(False)
    v.update_pose(T, 0.0, depth, color)
    assert int(client.state.collection.num_submaps) == 0
    assert v.T_odom_latest is T         # pose still tracked
    v.toggle_mapping(True)
    v.update_pose(T, 0.1, depth, color)
    assert int(client.state.collection.num_submaps) == 1
