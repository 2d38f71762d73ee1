import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import tsdf as tsdf_ops
from coxgraph_tpu.utils import checkpoint as ckpt
from coxgraph_tpu.utils import config as cfgutil

CFG = sm.MapperConfig(
    spec=vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                          max_blocks=128, truncation=0.3),
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=64),
    intrinsics=syn.PinholeIntrinsics().scaled(0.0625),
    max_submaps=4, max_history=16, submap_interval=0.2,
)


def test_mapper_state_roundtrip(tmp_path):
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(4, scene.room_center, radius=2.5)
    state = sm.create_mapper(CFG)
    for i in range(4):
        d, c = syn.render_depth(scene, CFG.intrinsics, traj[i])
        state, _ = sm.mapper_step(CFG, state, d, c, traj[i], i * 0.1)
    p = os.path.join(tmp_path, "mapper.npz")
    ckpt.save_pytree(p, state)
    template = sm.create_mapper(CFG)
    restored = ckpt.load_pytree(p, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues integrating
    restored = jax.tree.map(jnp.asarray, restored)
    d, c = syn.render_depth(scene, CFG.intrinsics, traj[0])
    out, _ = sm.mapper_step(CFG, restored, d, c, traj[0], 0.5)
    assert int(out.frame_count) == 5


def test_load_pytree_shape_mismatch(tmp_path):
    p = os.path.join(tmp_path, "x.npz")
    ckpt.save_pytree(p, {"a": jnp.zeros((3,))})
    try:
        ckpt.load_pytree(p, {"a": jnp.zeros((4,))})
        assert False, "expected shape error"
    except ValueError:
        pass


def test_server_checkpoint_roundtrip(tmp_path):
    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.server.client_interface import InProcessClient

    scene = syn.default_scene()
    trajs = [syn.orbit_trajectory(6, scene.room_center, radius=2.3,
                                  sweep=0.8 * jnp.pi,
                                  start_angle=s)
             for s in (0.0, 1.8)]
    clients = []
    for cid in range(2):
        st = sm.create_mapper(CFG)
        for i in range(6):
            d, c = syn.render_depth(scene, CFG.intrinsics, trajs[cid][i])
            st, _ = sm.mapper_step(CFG, st, d, c, trajs[cid][i], i * 0.1)
        clients.append(InProcessClient(cid, CFG, st))
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=CFG.spec, max_submaps=16, refuse_interval=0.0,
                        registration=fs.reg.RegistrationConfig(
                            max_points=256, iterations=4)),
        clients)
    mf = fs.MapFusionMsg(0, 0.3, 1, 0.3,
                         geo.relative(trajs[0][3], trajs[1][3]))
    assert server.map_fusion(mf)

    d = os.path.join(tmp_path, "server_ckpt")
    ckpt.save_server(d, server)

    server2 = fs.CoxgraphServer(server.cfg, clients)
    ckpt.load_server(d, server2)
    assert len(server2.submaps) == len(server.submaps)
    assert server2.cli_ser == server.cli_ser
    np.testing.assert_allclose(
        np.asarray(server2.submaps[0].T_G_submap),
        np.asarray(server.submaps[0].T_G_submap))
    # restored server can keep optimizing
    server2.optimize()


def test_yaml_config(tmp_path):
    y = tmp_path / "sys.yaml"
    y.write_text("""
voxel: {voxel_size: 0.08, grid_dim: 32, max_blocks: 512}
integrator: {max_touched_blocks: 256}
intrinsics: {width: 80, height: 60, fx: 66.0, fy: 66.0, cx: 39.5, cy: 29.5}
mapper: {max_submaps: 8, submap_interval: 5.0}
server: {refuse_interval: 10.0}
solver: {iterations: 12, huber_delta: 0.4}
features: {max_keypoints: 128}
loop_detector: {min_inliers: 20}
esdf: {max_distance: 3.0}
""")
    cfgs = cfgutil.load_system_config(str(y))
    assert cfgs["spec"].voxel_size == 0.08
    assert cfgs["mapper"].submap_interval == 5.0
    assert cfgs["mapper"].spec.max_blocks == 512
    assert cfgs["server"].refuse_interval == 10.0
    assert cfgs["server"].solver.huber_delta == 0.4
    assert cfgs["loop_detector"].min_inliers == 20
    assert cfgs["loop_detector"].features.max_keypoints == 128
    assert cfgs["esdf"].max_distance == 3.0
    s = cfgutil.describe(cfgs["mapper"])
    assert "submap_interval: 5.0" in s
    # unknown keys rejected
    bad = tmp_path / "bad.yaml"
    bad.write_text("voxel: {voxel_sz: 0.1}")
    try:
        cfgutil.load_system_config(str(bad))
        assert False
    except KeyError:
        pass


def test_resource_sampler():
    from coxgraph_tpu.utils.runtime import ResourceSampler
    rs = ResourceSampler()
    first = rs.sample()
    assert first["rss_mb"] > 1.0
    # burn some CPU so the delta is visible
    x = 0
    for i in range(2_000_00):
        x += i * i
    rec = rs.sample()
    assert rec["rss_mb"] > 1.0 and rec["cpu_pct"] >= 0.0
    assert len(rs.samples) == 1


def test_resource_sampler_periodic():
    """node_evaluator periodic per-node sampling (["cpu","mem"] modes,
    evaluation_config.yaml:1-2): start() samples on a timer until
    stop(), which returns the end-of-experiment summary."""
    import time

    from coxgraph_tpu.utils.runtime import ResourceSampler
    rs = ResourceSampler().start(rate_hz=20.0)
    time.sleep(0.4)
    summary = rs.stop()
    assert summary["n"] >= 3
    assert summary["rss_mb_max"] > 1.0
    assert summary["cpu_pct_mean"] >= 0.0
    # stop() is idempotent and keeps the summary
    assert rs.stop()["n"] == summary["n"]


def test_average_same_stamp():
    import numpy as np
    from coxgraph_tpu.server.fusion_server import average_same_stamp

    stamps = np.array([0.2, 0.1, 0.2])
    q = np.array([[1, 0, 0, 0, 0, 0, 0.0],
                  [1, 0, 0, 0, 1, 1, 1.0],
                  [-1, 0, 0, 0, 2, 0, 0.0]])  # negated quat, same rotation
    s, p = average_same_stamp(stamps, q)
    np.testing.assert_allclose(s, [0.1, 0.2])
    # the duplicate pair averages translation; quats sign-align first
    np.testing.assert_allclose(p[1, 4:], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.abs(p[1, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(p[0, 4:], [1, 1, 1.0])


def test_information_matrix_from_params():
    from coxgraph_tpu.utils import config as cfg_mod

    M = cfg_mod.information_matrix_from_params(
        {"x_x": 100.0, "y_y": 100.0, "z_z": 400.0, "yaw_yaw": 400.0,
         "x_y": 10.0})
    assert M.shape == (4, 4)
    assert M[0, 1] == M[1, 0] == 10.0     # upper mirrored to lower
    assert M[2, 2] == 400.0
    # whitening root reproduces the matrix
    S = cfg_mod.sqrt_information(M)
    np.testing.assert_allclose(S.T @ S, M, atol=1e-9)
    # robust path on a semi-definite matrix
    M2 = np.zeros((4, 4))
    M2[0, 0] = 1.0
    S2 = cfg_mod.sqrt_information(M2)
    np.testing.assert_allclose(S2.T @ S2, M2, atol=1e-6)


def test_preemption_resume_bit_identical(tmp_path):
    """Preemption story (SURVEY.md §5.4): checkpoint mid-clip via
    HostMapper, restore into a FRESH mapper, continue — final state must
    equal the uninterrupted run exactly (pools, poses, histories)."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(6, scene.room_center, radius=2.5,
                                sweep=jnp.pi)
    frames = [syn.render_depth(scene, CFG.intrinsics, traj[i])
              for i in range(6)]

    # uninterrupted
    hm_ref = sm.HostMapper(CFG)
    for i in range(6):
        hm_ref.step(frames[i][0], frames[i][1], traj[i], i * 0.1)

    # run half, checkpoint, "crash", restore, finish
    hm1 = sm.HostMapper(CFG)
    for i in range(3):
        hm1.step(frames[i][0], frames[i][1], traj[i], i * 0.1)
    p = os.path.join(tmp_path, "preempt.npz")
    ckpt.save_pytree(p, hm1.state)
    del hm1
    restored = jax.tree.map(jnp.asarray,
                            ckpt.load_pytree(p, sm.create_mapper(CFG)))
    hm2 = sm.HostMapper(CFG, restored)   # host mirrors rebuilt from state
    for i in range(3, 6):
        hm2.step(frames[i][0], frames[i][1], traj[i], i * 0.1)

    for a, b in zip(jax.tree.leaves(hm_ref.state),
                    jax.tree.leaves(hm2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
