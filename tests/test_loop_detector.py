import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo
from coxgraph_tpu.frontends import loop_detector as ld
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import features as ft

INTR = syn.PinholeIntrinsics().scaled(0.5)


def test_cross_robot_loop_detection():
    """Robot 1 revisits robot 0's sector → detector must emit an accurate
    MapFusion for the overlapping views and none for disjoint ones."""
    scene = syn.default_scene()
    # robot 0 covers [0, pi/2]; robot 1 covers [1.9pi .. 2.4pi] ≈ wraps into
    # robot 0's sector at the end
    t0 = syn.orbit_trajectory(4, scene.room_center, radius=2.5,
                              sweep=jnp.pi / 2)
    t1 = syn.orbit_trajectory(4, scene.room_center, radius=2.5,
                              sweep=jnp.pi / 2, start_angle=-0.15)
    cfg = ld.LoopDetectorConfig(
        features=ft.FeatureConfig(max_keypoints=384),
        min_match_score=25, min_inliers=15, keyframe_stride=0.0,
        min_time_separation=1e9)
    det = ld.LoopDetector(INTR, cfg)

    # ingest robot 0's keyframes — no loops yet
    for i in range(4):
        d, c = syn.render_depth(scene, INTR, t0[i])
        msgs = det.add_keyframe(0, i * 1.0, c, d)
        assert msgs == []

    # robot 1's frames overlap robot 0's early views
    found = []
    for i in range(4):
        d, c = syn.render_depth(scene, INTR, t1[i])
        msgs = det.add_keyframe(1, 100.0 + i, c, d)
        found.extend((m, i) for m in msgs)
    assert found, "no cross-robot loop detected"
    # verify transform accuracy for each reported fusion
    for m, i in found:
        assert m.from_client == 0 and m.to_client == 1
        Ta = t0[int(round(m.from_time))]
        Tb = t1[i]
        T_true = geo.relative(Ta, Tb)
        err = geo.se3_log(geo.relative(m.T_from_to, T_true))
        assert float(jnp.linalg.norm(err[3:])) < 0.08, np.asarray(err)


def test_same_robot_time_gate():
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(3, scene.room_center, radius=2.5,
                                sweep=0.1)
    cfg = ld.LoopDetectorConfig(
        features=ft.FeatureConfig(max_keypoints=256),
        min_match_score=10, min_inliers=10, keyframe_stride=0.0,
        min_time_separation=100.0)
    det = ld.LoopDetector(INTR, cfg)
    for i in range(3):
        d, c = syn.render_depth(scene, INTR, traj[i])
        msgs = det.add_keyframe(0, i * 1.0, c, d)
        # nearly identical consecutive views, but the time gate blocks them
        assert msgs == []
