import dataclasses

import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import voxel as vx
from coxgraph_tpu.ops import esdf as esdf_ops

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=128, truncation=0.2)


def sphere_tsdf(center, radius, nblk=2):
    """Fully-observed TSDF of a sphere over a (2*nblk)^3 block region."""
    layer = vx.create_tsdf_layer(SPEC)
    r = np.arange(-nblk, nblk)
    bx, by, bz = np.meshgrid(r, r, r, indexing="ij")
    coords = jnp.asarray(np.stack([bx, by, bz], -1).reshape(-1, 3), jnp.int32)
    layer = vx.allocate_blocks(SPEC, layer, coords)
    centers = vx.voxel_centers_of_block(SPEC, layer.block_coords)
    true = jnp.linalg.norm(centers - jnp.asarray(center), axis=-1) - radius
    live2 = (jnp.arange(SPEC.max_blocks) < layer.num_blocks)[:, None]
    return dataclasses.replace(
        layer,
        sdf=jnp.where(live2,
                      jnp.clip(true, -SPEC.truncation,
                               SPEC.truncation).reshape(
                          SPEC.max_blocks, -1),
                      layer.sdf),
        weight=jnp.where(live2, jnp.ones_like(layer.weight), 0.0),
    ), true.reshape(SPEC.max_blocks, -1)     # flat rows, like the pools


def test_esdf_extends_beyond_truncation():
    tsdf, true = sphere_tsdf([0.0, 0.0, 0.0], 0.35)
    cfg = esdf_ops.EsdfConfig(max_distance=1.0, full_connectivity=True)
    esdf = esdf_ops.esdf_from_tsdf(SPEC, tsdf, cfg)
    d = np.asarray(esdf.dist)
    t = np.asarray(true)
    obs = np.asarray(esdf.observed)
    # in the band: equals tsdf
    band = obs & (np.abs(t) < SPEC.truncation)
    np.testing.assert_allclose(
        d[band],
        np.asarray(tsdf.sdf).reshape(d.shape)[band], atol=1e-5)
    # beyond the band (up to max_distance): 26-connectivity quasi-Euclidean
    # distance overestimates true Euclidean by < ~8% + one voxel
    out = obs & (t > SPEC.truncation) & (t < 0.9)
    assert out.sum() > 100
    err = d[out] - t[out]
    assert err.min() > -2.5 * SPEC.voxel_size      # never underestimates much
    assert np.quantile(err, 0.95) < 0.09 * np.abs(t[out]).max() + 1.5 * SPEC.voxel_size
    # interior negative distances propagate too
    interior = obs & (t < -SPEC.truncation)
    if interior.sum():
        assert (d[interior] < -SPEC.truncation * 0.5).all()


def test_esdf_6_connectivity_looser_bound():
    tsdf, true = sphere_tsdf([0.0, 0.0, 0.0], 0.35)
    cfg = esdf_ops.EsdfConfig(max_distance=1.0, full_connectivity=False)
    esdf = esdf_ops.esdf_from_tsdf(SPEC, tsdf, cfg)
    d = np.asarray(esdf.dist)
    t = np.asarray(true)
    obs = np.asarray(esdf.observed)
    out = obs & (t > SPEC.truncation) & (t < 0.9)
    # L1-style propagation: within sqrt(3) factor, plus a voxel
    ratio = (d[out] + 1e-6) / (t[out] + 1e-6)
    assert ratio.max() < np.sqrt(3) + 0.35
    assert ratio.min() > 0.7


def test_traversability():
    tsdf, true = sphere_tsdf([0.0, 0.0, 0.0], 0.35)
    cfg = esdf_ops.EsdfConfig(max_distance=1.0, full_connectivity=True)
    esdf = esdf_ops.esdf_from_tsdf(SPEC, tsdf, cfg)
    pts, mask = esdf_ops.traversable_points(SPEC, esdf, robot_radius=0.3)
    pts = np.asarray(pts)[np.asarray(mask)]
    assert pts.shape[0] > 50
    # every traversable point is at least ~0.3-ish from the sphere
    dist_true = np.linalg.norm(pts, axis=-1) - 0.35
    assert dist_true.min() > 0.3 - 1.8 * SPEC.voxel_size


def test_esdf_sampling():
    tsdf, true = sphere_tsdf([0.0, 0.0, 0.0], 0.35)
    esdf = esdf_ops.esdf_from_tsdf(
        SPEC, tsdf, esdf_ops.EsdfConfig(max_distance=1.0,
                                        full_connectivity=True))
    p = jnp.array([[0.6, 0.0, 0.0], [0.0, 0.75, 0.0]])
    d, ok = esdf_ops.sample_esdf(SPEC, esdf, p)
    assert bool(ok.all())
    expect = np.linalg.norm(np.asarray(p), axis=-1) - 0.35
    np.testing.assert_allclose(np.asarray(d), expect, atol=2.5 * SPEC.voxel_size)
