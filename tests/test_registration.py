import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import registration as reg
from coxgraph_tpu.ops import tsdf as tsdf_ops

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=2048, truncation=0.3)
ICFG = tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=1024)
INTR = syn.PinholeIntrinsics().scaled(0.25)  # 160x120
RCFG = reg.RegistrationConfig(max_points=1024, iterations=15)


def build_layer(scene, poses, T_submap):
    """Integrate frames (world poses) into a layer anchored at T_submap."""
    layer = vx.create_tsdf_layer(SPEC)
    for i in range(poses.shape[0]):
        d, c = syn.render_depth(scene, INTR, poses[i])
        T_sm_cam = geo.relative(T_submap, poses[i])
        layer = tsdf_ops.integrate_frame(SPEC, ICFG, INTR, layer, d, c,
                                         T_sm_cam)
    return layer


def test_surface_point_extraction():
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(4, scene.room_center, radius=2.5,
                                sweep=jnp.pi / 2)
    layer = build_layer(scene, traj, traj[0])
    pts, mask = reg.extract_surface_points(SPEC, layer, RCFG)
    m = np.asarray(mask)
    assert m.sum() > 500
    # extracted points lie near the true surface (in world = submap frame)
    world = geo.transform_points(traj[0], pts)
    sdf = np.asarray(syn.scene_sdf(scene, world))[m]
    assert np.quantile(np.abs(sdf), 0.9) < 2.5 * SPEC.voxel_size


def test_register_pair_recovers_perturbation():
    """Two overlapping submaps; B's pose perturbed — registration must
    recover the true relative transform."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(8, scene.room_center, radius=2.5,
                                sweep=jnp.pi)
    T_A = traj[0]
    T_B = traj[4]
    layerA = build_layer(scene, traj[:5], T_A)
    layerB = build_layer(scene, traj[3:], T_B)
    T_A_B_true = geo.relative(T_A, T_B)

    pert = geo.se3_exp(jnp.array([0.02, -0.015, 0.03, 0.06, -0.04, 0.05]))
    T_init = geo.compose(T_A_B_true, pert)

    res = reg.register_pair(SPEC, layerA, layerB, T_init, RCFG)
    err0 = geo.se3_log(geo.relative(T_init, T_A_B_true))
    err1 = geo.se3_log(geo.relative(res.T_A_B, T_A_B_true))
    n0 = float(jnp.linalg.norm(err0))
    n1 = float(jnp.linalg.norm(err1))
    assert int(res.n_inliers) > 200
    assert float(res.cost) < float(res.initial_cost)
    assert n1 < 0.35 * n0, (n0, n1)
    assert n1 < 0.035


def test_register_pair_identity_stays_put():
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(6, scene.room_center, radius=2.5,
                                sweep=0.75 * jnp.pi)
    T_A, T_B = traj[0], traj[3]
    layerA = build_layer(scene, traj[:4], T_A)
    layerB = build_layer(scene, traj[2:], T_B)
    T_true = geo.relative(T_A, T_B)
    res = reg.register_pair(SPEC, layerA, layerB, T_true, RCFG)
    drift = float(jnp.linalg.norm(geo.se3_log(geo.relative(res.T_A_B,
                                                           T_true))))
    # two independently discretized TSDFs put the cost minimum within half
    # a voxel of the true pose
    assert drift < 0.5 * SPEC.voxel_size


def test_registration_normal_eq_gradient_sanity():
    """H must be PSD and b ≈ 0 at a residual minimum."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(4, scene.room_center, radius=2.5,
                                sweep=jnp.pi / 2)
    layer = build_layer(scene, traj, traj[0])
    pts, mask = reg.extract_surface_points(SPEC, layer, RCFG)
    sA, _, okA = vx.sample_tsdf_trilinear(SPEC, layer, pts)
    H, b, cost, n = reg.registration_normal_eq(
        SPEC, layer, pts, jnp.where(okA, sA, 0.0), mask & okA,
        geo.identity(), geo.identity())
    # self-registration at identity: residuals exactly zero
    assert float(cost) < 1e-6
    assert float(jnp.abs(b).max()) < 1e-4
    w = np.linalg.eigvalsh(np.asarray(H))
    assert w.min() > -1e-4
