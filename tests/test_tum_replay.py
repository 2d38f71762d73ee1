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
