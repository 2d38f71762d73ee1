"""Real-sequence end-to-end: TUM-RGBD directory replay (PNG decode,
depth factor 5000, per-sensor timestamp association, epoch rebasing)
through the full mapper pipeline → trajectory ATE vs groundtruth.txt +
mesh vs the fixture's exact analytic geometry (SURVEY.md §4
replay-driven validation; fixture committed at tests/fixtures/tum_tiny,
regenerable with tests/make_tum_fixture.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from coxgraph_tpu.core import voxel as vx
from coxgraph_tpu.eval import metrics
from coxgraph_tpu.frontends import replay, synthetic as syn
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import mesh as mesh_ops, tsdf as tsdf_ops

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "tum_tiny")
SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=1024, truncation=0.3)
CFG = sm.MapperConfig(
    spec=SPEC,
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
    intrinsics=syn.PinholeIntrinsics().scaled(0.125),
    max_submaps=8, max_history=64, submap_interval=0.35)


def read_groundtruth(t0: float):
    stamps, poses = [], []
    with open(os.path.join(ROOT, "groundtruth.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            stamps.append(v[0] - t0)
            tx, ty, tz, qx, qy, qz, qw = v[1:]
            poses.append([qw, qx, qy, qz, tx, ty, tz])
    return np.asarray(stamps), np.asarray(poses)


def test_tum_replay_full_pipeline():
    rp = replay.TumRgbdReplay(ROOT, intr=CFG.intrinsics)
    mapper = sm.HostMapper(CFG)
    n = 0
    for f in rp:
        # epoch stamps are rebased to ~0 so f32 device stamps keep ms
        assert f.t < 1e6
        assert float(f.depth.max()) < 20.0      # factor-5000 decode sanity
        assert float(f.depth.max()) > 0.5
        mapper.step(f.depth, f.color, f.T_odom_cam, f.t)
        n += 1
    assert n == 10
    assert mapper.n_submaps >= 2                # interval rollovers fired

    # trajectory ATE vs the fixture's groundtruth.txt (TUM association +
    # Umeyama alignment); odometry == gt here so the pipeline must be
    # near-exact — any decode/association/frame bug shows up as ATE
    stamps_est, poses_est = sm.trajectory(mapper.state.collection)
    stamps_gt, poses_gt = read_groundtruth(rp.t0)
    ate = metrics.ate_rmse(np.asarray(stamps_est), np.asarray(poses_est),
                           stamps_gt, poses_gt, max_dt=0.02)
    assert ate < 5e-3, ate

    # the reconstructed surface matches the fixture's analytic scene —
    # wrong depth scaling or axis conventions would miss by meters
    scene = syn.default_scene()
    layer = sm.merged_layer(CFG, mapper.state.collection)
    verts, _ = mesh_ops.extract_mesh(SPEC, layer, min_weight=0.1)
    pts = verts.reshape(-1, 3)
    assert pts.shape[0] > 300
    sdf = np.asarray(syn.scene_sdf(scene, jnp.asarray(pts)))
    q90 = float(np.quantile(np.abs(sdf), 0.9))
    assert q90 < 3.0 * SPEC.voxel_size, q90


def test_tum_depth_rgb_association_tolerance():
    """Frames whose nearest depth stamp is >30 ms away are skipped (the
    fixture's 11 ms offset associates; a fabricated far-off list would
    not) — mesh_converter.h:194-198 20 Hz bucketing analog."""
    rp = replay.TumRgbdReplay(ROOT, intr=CFG.intrinsics, max_frames=3)
    frames = list(rp)
    assert len(frames) == 3
    ts = [f.t for f in frames]
    assert all(b > a for a, b in zip(ts, ts[1:]))


ROOT_LOOP = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixtures", "tum_loop")


@pytest.mark.slow
def test_tum_loop_drift_correction():
    """SLAM under drift on a ~100-frame committed sequence (VERDICT r2
    Weak #6 — the 10-frame clip validates decoding, not drift): replay
    tum_loop with odometry that accumulates a deterministic bias, run
    the REAL feature loop detector on the decoded frames, route its
    closures through the server's intra-client path
    (map_fusion → receive_loop_closure → local PGO), and gate that the
    detector-driven correction measurably reduces trajectory ATE vs the
    drifted baseline.

    Fixture/weighting choices came from measured observability analysis
    (round 3): a single start-end closure pins only the loop ENDS — the
    interior keeps following biased odometry at an optimum whose cost is
    50x below the ground-truth configuration's, so no estimator could
    recover it; the two-turn trajectory gives the detector closures
    along the WHOLE path. And closures must be weighted by their real
    accuracy (1-3 cm → sqrt_info 100) against the odometry chain's 20:
    at weight 10 each closure absorbs only ~w²/(w²+2·20²) ≈ 11% of the
    per-hop bias. Height priors (MapperConfig.height_prior_stddev) pin
    the local solve's pitch+z valley — without them the "closed" loop
    sags 0.36 m out of plane mid-trajectory."""
    import jax

    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.frontends import loop_detector as ld
    from coxgraph_tpu.ops import features as ft
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.server.client_interface import InProcessClient

    intr = syn.PinholeIntrinsics().scaled(0.25)
    spec = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                            max_blocks=1024, truncation=0.3)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
        intrinsics=intr,
        max_submaps=20, max_history=48, submap_interval=1.0,
    height_prior_stddev=0.1)

    rp = replay.TumRgbdReplay(ROOT_LOOP, intr=intr)
    frames = list(rp)
    assert len(frames) == 144

    # ---- drifted odometry: GT relative motions + deterministic bias ----
    rng = np.random.default_rng(11)
    gt = [np.asarray(f.T_odom_cam, np.float32) for f in frames]
    drifted = [gt[0]]
    for k in range(1, len(gt)):
        T_rel = geo.relative_np(gt[k - 1], gt[k])
        noise = rng.normal(0, 0.0015, 6).astype(np.float32)
        noise[2] += 0.0045      # yaw bias per frame (se3: rx ry rz x y z)
        noise[3] += 0.0045      # forward bias
        T_rel = geo.compose_np(
            T_rel, np.asarray(jax.numpy.asarray(
                geo.se3_exp(jax.numpy.asarray(noise)))))
        drifted.append(geo.compose_np(drifted[-1], T_rel))
    drifted = np.stack(drifted)

    stamps = np.asarray([f.t for f in frames])
    ate_drifted = metrics.ate_rmse(stamps, drifted, stamps, np.stack(gt))
    assert ate_drifted > 0.045, ate_drifted   # the bias really drifts

    # ---- map with drifted odometry + run the real loop detector --------
    mapper = sm.HostMapper(cfg)
    det = ld.LoopDetector(intr, ld.LoopDetectorConfig(
        features=ft.FeatureConfig(max_keypoints=384),
        min_match_score=25, min_inliers=15,
        keyframe_stride=0.4, min_time_separation=5.0,
        # closures measure 1-3 cm (vs ~4.5 cm/hop odometry bias): weight
        # them accordingly or each closure absorbs only ~10% of the bias
        sqrt_info=100.0))
    closures = []
    for f, T_drift in zip(frames, drifted):
        mapper.step(f.depth, f.color, jnp.asarray(T_drift), f.t)
        closures.extend(det.add_keyframe(0, f.t, f.color, f.depth))
    assert closures, "real detector found no loop on the full orbit"

    client = InProcessClient(0, cfg, mapper.state)
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=spec, refuse_interval=0.0), [client])
    routed = 0
    for mf in closures:
        assert mf.from_client == 0 and mf.to_client == 0
        if server.map_fusion(mf):      # intra-client → local PGO path
            routed += 1
    assert routed >= 1

    stamps_c, poses_c = client.get_pose_history()
    ate_corrected = metrics.ate_rmse(np.asarray(stamps_c),
                                     np.asarray(poses_c),
                                     stamps, np.stack(gt))
    # detector-driven closures must measurably reduce the drift
    assert ate_corrected < 0.75 * ate_drifted, (ate_corrected, ate_drifted)
