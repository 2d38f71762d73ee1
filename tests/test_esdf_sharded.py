"""Block-sharded ESDF over a device mesh (parallel/esdf_sharded) — must
reproduce the single-device Jacobi result exactly (same schedule, halo
exchange per sweep)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from coxgraph_tpu.core import voxel as vx
from coxgraph_tpu.ops import esdf as esdf_ops
from coxgraph_tpu.parallel import esdf_sharded as es

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=512, truncation=0.2)


def sphere_tsdf(center, radius, nblk=3):
    layer = vx.create_tsdf_layer(SPEC)
    r = np.arange(-nblk, nblk)
    bx, by, bz = np.meshgrid(r, r, r, indexing="ij")
    coords = jnp.asarray(np.stack([bx, by, bz], -1).reshape(-1, 3),
                         jnp.int32)
    layer = vx.allocate_blocks(SPEC, layer, coords)
    centers = vx.voxel_centers_of_block(SPEC, layer.block_coords)
    true = jnp.linalg.norm(centers - jnp.asarray(center), axis=-1) - radius
    live = (jnp.arange(SPEC.max_blocks) < layer.num_blocks)[:, None]
    return dataclasses.replace(
        layer,
        sdf=jnp.where(live,
                      jnp.clip(true, -SPEC.truncation,
                               SPEC.truncation).reshape(
                          SPEC.max_blocks, -1),
                      layer.sdf),
        weight=jnp.where(live, jnp.ones_like(layer.weight), 0.0),
    )


def test_sharded_esdf_matches_single_device():
    n_dev = 4
    tsdf = sphere_tsdf([0.05, -0.1, 0.0], 0.35)
    ecfg = esdf_ops.EsdfConfig(max_distance=0.8, full_connectivity=False)
    ref = esdf_ops.esdf_from_tsdf(SPEC, tsdf, ecfg)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    cfg = es.ShardedEsdfConfig(per_device_blocks=128, halo_blocks=64,
                               esdf=ecfg)
    parts = es.partition_blocks(SPEC, tsdf, n_dev, cfg)
    # every live block landed in exactly one slab
    assert int(parts.live.sum()) == int(tsdf.num_blocks)

    dist = es.esdf_sharded(SPEC, mesh, parts, cfg)
    merged = es.gather_to_layer(SPEC, tsdf, parts, dist)

    n = int(tsdf.num_blocks)
    got = np.asarray(merged.dist)[:n]
    want = np.asarray(ref.dist)[:n]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_esdf_boundary_propagation():
    """Distances must propagate ACROSS slab boundaries: a surface entirely
    inside one slab still fills far voxels in other slabs with correct
    distances (halo exchange is doing real work)."""
    n_dev = 4
    # sphere centered left of the domain: right slabs have no band voxels
    tsdf = sphere_tsdf([-0.6, 0.0, 0.0], 0.3)
    ecfg = esdf_ops.EsdfConfig(max_distance=3.0, full_connectivity=False)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    cfg = es.ShardedEsdfConfig(per_device_blocks=128, halo_blocks=64,
                               esdf=ecfg)
    parts = es.partition_blocks(SPEC, tsdf, n_dev, cfg)
    dist = es.esdf_sharded(SPEC, mesh, parts, cfg)
    merged = es.gather_to_layer(SPEC, tsdf, parts, dist)

    ref = esdf_ops.esdf_from_tsdf(SPEC, tsdf, ecfg)
    n = int(tsdf.num_blocks)
    np.testing.assert_allclose(np.asarray(merged.dist)[:n],
                               np.asarray(ref.dist)[:n], atol=1e-5)
    # sanity: the rightmost blocks really did receive propagated values
    coords = np.asarray(tsdf.block_coords)[:n]
    right = coords[:, 0] == coords[:, 0].max()
    d_right = np.asarray(merged.dist)[:n][right]
    assert (np.abs(d_right) < ecfg.max_distance - 1e-3).any()


def test_ici_byte_accounting():
    """Exchange-layer byte counters (SURVEY.md §5.1): exact static counts
    for the sharded-ESDF halo traffic and the fleet psum reduction."""
    import math
    from coxgraph_tpu.parallel import esdf_sharded as es, fleet
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.solver import pose_graph as pg

    spec = SPEC
    cfg = es.ShardedEsdfConfig(per_device_blocks=64, halo_blocks=8)
    acct = es.ici_bytes_per_update(spec, cfg)
    v3 = spec.voxels_per_side ** 3
    n_sweeps = math.ceil(cfg.esdf.max_distance / spec.voxel_size) \
        + cfg.esdf.extra_iters
    assert acct["n_sweeps"] == n_sweeps
    assert acct["per_sweep_bytes"] == 2 * 8 * v3 * 4
    assert acct["per_device_bytes"] > acct["n_sweeps"] * acct[
        "per_sweep_bytes"]

    mcfg = sm.MapperConfig(spec=spec, max_submaps=4)
    f = fleet.ici_bytes_per_optimize(mcfg, n_robots=2,
                                     solver_cfg=pg.SolverConfig(iterations=3))
    N, d = 8, 48
    assert f["per_iteration_bytes"] == (d * d + d + 1) * 4
    assert f["per_device_bytes"] == N * 7 * 4 + 3 * f["per_iteration_bytes"]
