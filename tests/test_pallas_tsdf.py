"""Pallas TSDF block-update kernel (ops/pallas_tsdf) — interpret-mode
cross-check against the XLA voxel-update path on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import pallas_tsdf
from coxgraph_tpu.ops import tsdf as tsdf_ops

INTR = syn.PinholeIntrinsics().scaled(0.125)  # 80x60
SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=256, truncation=0.3)
CFG = tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=64)


def test_pyramid_atlas_layout():
    atlas = pallas_tsdf.build_atlases(
        INTR, jnp.full((60, 80), 2.0), jnp.full((60, 80, 3), 0.5))
    offs, ws, hs, rows = pallas_tsdf._pyramid_layout(INTR)
    assert atlas.shape == (pallas_tsdf.PLANES, rows,
                           max(80, pallas_tsdf.TILE_W))
    # depth = hi + lo planes
    d = np.asarray(atlas[0], np.float32) + np.asarray(atlas[1], np.float32)
    for l in range(pallas_tsdf.LEVELS):
        lvl = d[offs[l]:offs[l] + hs[l], :ws[l]]
        np.testing.assert_allclose(lvl, 2.0)
        # zero padding beyond each level's width (invalid depth)
        assert (d[offs[l]:offs[l] + hs[l], ws[l]:] == 0).all()
    # color channels: 0.5 -> 128 (exact in bf16)
    for p in range(2, 5):
        assert float(atlas[p, 0, 0]) == 128.0


def test_kernel_matches_xla_update_interpret():
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = syn.render_depth(scene, INTR, T)

    # allocate + touched slots exactly like the integrator's pass 1
    layer = vx.create_tsdf_layer(SPEC)
    lx = tsdf_ops.integrate_frame(
        SPEC,
        tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=64,
                                      use_pallas=False),
        INTR, layer, depth, color, T)

    # run the production pass 1 again to get the same slots, then the
    # kernel in interpret mode
    gs, cv = tsdf_ops._alloc_candidates_soa(SPEC, CFG, INTR, depth, T)
    base = vx.create_tsdf_layer(SPEC)
    bi, bc, nb, slots, mask = vx.allocate_and_slots(
        SPEC, base.block_index.reshape(-1), base.block_coords,
        base.num_blocks, gs, cv, 64)
    slots = jnp.minimum(slots, SPEC.max_blocks - 1)

    v3 = SPEC.voxels_per_side ** 3
    atlas = pallas_tsdf.build_atlases(INTR, depth, color)
    R = geo.quat_to_matrix(geo.inverse(T)[:4])
    Tc = geo.inverse(T)
    params = jnp.concatenate([
        R.reshape(9), Tc[4:7],
        jnp.asarray([INTR.fx, INTR.fy, INTR.cx, INTR.cy], jnp.float32)])
    old = jnp.zeros((64, v3))
    oldc = jnp.zeros((64, 3 * v3))
    tiles = pallas_tsdf.compute_tile_specs(SPEC, CFG, INTR, bc[slots],
                                           mask, params)
    new_sdf, new_w, new_cp = pallas_tsdf.tsdf_update_blocks(
        SPEC, CFG, INTR, bc[slots], tiles, params, atlas,
        old, jnp.zeros((64, v3)), oldc, interpret=True)

    # compare against the XLA integrator's result on the same blocks
    ref_sdf = np.asarray(lx.sdf.reshape(-1, v3)[slots])
    ref_w = np.asarray(lx.weight.reshape(-1, v3)[slots])
    got_sdf = np.asarray(new_sdf)
    got_w = np.asarray(new_w)
    m = np.asarray(mask)
    # weights: identical where both observed (same pixels at level 0)
    both = (ref_w > 0) & (got_w > 0) & m[:, None]
    assert both.sum() > 500
    agree = np.abs(got_sdf - ref_sdf)[both]
    # small image → blocks fit level-0 tiles → exact depth selects;
    # tolerance covers the bf16 hi/lo split (~1e-4)
    assert np.quantile(agree, 0.95) < 5e-3, np.quantile(agree, 0.95)
    # observation masks mostly coincide (level >0 blocks may differ)
    iou = ((ref_w > 0) & (got_w > 0)).sum() / max(
        ((ref_w > 0) | (got_w > 0)).sum(), 1)
    assert iou > 0.9, iou
