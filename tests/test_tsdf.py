import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import tsdf as tsdf_ops

INTR = syn.PinholeIntrinsics().scaled(0.125)  # 80x60
SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=4096, truncation=0.3)
CFG = tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=1024)


def test_render_depth_matches_sdf_root():
    """Depth from sphere tracing must satisfy scene_sdf(hit point) ≈ 0."""
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=3.0)[0]
    depth, color = syn.render_depth(scene, INTR, T)
    d = np.asarray(depth)
    assert (d > 0).mean() > 0.9  # almost all rays hit in a closed room
    # reconstruct hit points and evaluate sdf
    pts = tsdf_ops._backproject(INTR, depth)
    pts_w = geo.transform_points(T, pts)
    sdf = syn.scene_sdf(scene, pts_w)
    hit = d > 0
    err = np.abs(np.asarray(sdf))[hit]
    assert np.quantile(err, 0.95) < 2e-2


def test_integrate_single_frame_tsdf_accuracy():
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = syn.render_depth(scene, INTR, T)
    layer = vx.create_tsdf_layer(SPEC)
    layer = tsdf_ops.integrate_frame(SPEC, CFG, INTR, layer, depth, color, T)
    assert int(layer.num_blocks) > 10

    # sample observed voxels near the surface; TSDF must approximate the
    # true signed distance to within ~1 voxel
    live = np.asarray(layer.weight > 0)
    sdf = np.asarray(layer.sdf)
    centers = np.asarray(vx.voxel_centers_of_block(SPEC, layer.block_coords))
    true = np.asarray(syn.scene_sdf(scene, jnp.asarray(centers)))
    true = true.reshape(true.shape[0], -1)     # flat rows, like the pool
    near = live & (np.abs(true) < 0.5 * SPEC.truncation)
    assert near.sum() > 100
    err = np.abs(sdf[near] - true[near])
    # single-view projective TSDF is biased at oblique incidence (the
    # reference's ray-cast integrators share this); median must be tight,
    # tail bounded by the incidence bias
    assert np.median(err) < SPEC.voxel_size
    assert np.quantile(err, 0.95) < 2.5 * SPEC.voxel_size


def test_integrate_orbit_converges():
    """Multi-view fusion must beat the single-view estimate near surfaces."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(8, scene.room_center, radius=2.5)
    layer = vx.create_tsdf_layer(SPEC)
    for i in range(traj.shape[0]):
        depth, color = syn.render_depth(scene, INTR, traj[i])
        layer = tsdf_ops.integrate_frame(SPEC, CFG, INTR, layer, depth, color,
                                         traj[i])
    live = np.asarray(layer.weight > 0)
    sdf = np.asarray(layer.sdf)
    centers = np.asarray(vx.voxel_centers_of_block(SPEC, layer.block_coords))
    true = np.asarray(syn.scene_sdf(scene, jnp.asarray(centers)))
    true = true.reshape(true.shape[0], -1)     # flat rows, like the pool
    centers = centers.reshape(true.shape[0], -1, 3)
    # judge accuracy on the sphere obstacles, which the orbit views
    # frontally (walls/floor stay grazing-incidence and keep the
    # projective bias, as in the reference integrators)
    c = np.asarray(scene.spheres)
    sph_true = np.min(
        np.stack([
            np.linalg.norm(centers - c[i, :3], axis=-1) - c[i, 3]
            for i in range(c.shape[0])
        ]),
        axis=0,
    )
    # gate on weight like voxblox meshing (mesh_min_weight): low-weight
    # voxels are silhouette-edge one-shot observations
    well_observed = live & (np.asarray(layer.weight) > 0.1)
    near = well_observed & (np.abs(sph_true) < 0.3 * SPEC.truncation)
    assert near.sum() > 50
    err = np.abs(sdf[near] - true[near])
    assert np.median(err) < 0.6 * SPEC.voxel_size
    assert np.quantile(err, 0.9) < 1.5 * SPEC.voxel_size
    # zero-crossing sign agreement just off the surface
    band = well_observed & (np.abs(sph_true) > 0.05) & (np.abs(sph_true) < 0.1)
    agree = (np.sign(sdf[band]) == np.sign(true[band])).mean()
    assert agree > 0.9


def test_integrate_is_jittable_once():
    """integrate_frame must not retrace across frames (fixed shapes)."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(3, scene.room_center, radius=2.5)
    layer = vx.create_tsdf_layer(SPEC)
    depth, color = syn.render_depth(scene, INTR, traj[0])
    f = tsdf_ops.integrate_frame
    layer = f(SPEC, CFG, INTR, layer, depth, color, traj[0])
    n0 = f._cache_size() if hasattr(f, "_cache_size") else None
    layer = f(SPEC, CFG, INTR, layer, depth, color, traj[1])
    if n0 is not None:
        assert f._cache_size() == n0
