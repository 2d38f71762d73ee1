"""Shared deterministic fleet pose-graph problem for the multi-host test
(tests/test_multihost.py + tests/multihost_worker.py). Both worker
processes AND the single-process reference build exactly this problem
from a fixed seed, so the distributed psum solve can be compared
bit-for-bit-ish (fp tolerance) across deployments."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import tsdf as tsdf_ops
from coxgraph_tpu.parallel import fleet as fl
from coxgraph_tpu.solver import pose_graph as pg

R = 4                       # robots = global devices (2 per process)
S = 4                       # submaps per robot
CFG = sm.MapperConfig(
    spec=vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=4, grid_dim=8,
                          max_blocks=8, truncation=0.3),
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=8),
    intrinsics=syn.PinholeIntrinsics().scaled(0.0625),
    max_submaps=S, max_history=4, max_constraints=16,
    submap_interval=1.0)


def true_pose(r, k):
    return geo.from_xyzyaw(jnp.asarray(
        [2.0 * r + 0.5 * k, 0.1 * r, 0.0, 0.05 * k]))


def build_fleet_problem():
    """→ (fleet MapperState with leading (R,) axes — drifted init poses +
    noisy per-robot chains, inter-robot constraints linking submap 0 of
    consecutive robots). Everything derives from seed 3."""
    rng = np.random.default_rng(3)
    fleet = fl.create_fleet(CFG, R)

    T_init = np.zeros((R, S, 7), np.float32)
    cons_i = []
    for r in range(R):
        cons = pg.RelPoseConstraints.empty(CFG.max_constraints)
        T_init[r, 0] = np.asarray(true_pose(r, 0))
        for k in range(S - 1):
            T_rel = geo.relative(true_pose(r, k), true_pose(r, k + 1))
            noise = jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32)
            T_meas = geo.compose(T_rel, geo.se3_exp(noise))
            cons = cons.add(k, k + 1, T_meas, 20.0 * jnp.eye(6))
            T_init[r, k + 1] = np.asarray(
                geo.compose(jnp.asarray(T_init[r, k]), T_meas))
        cons_i.append(cons)
    constraints = jax.tree.map(lambda *xs: jnp.stack(xs), *cons_i)

    col = dataclasses.replace(fleet.collection,
                              T_odom_submap=jnp.asarray(T_init),
                              num_submaps=jnp.full((R,), S, jnp.int32))
    fleet = dataclasses.replace(fleet, collection=col,
                                constraints=constraints)

    inter = pg.RelPoseConstraints.empty(16)
    for r in range(R - 1):
        T_rel = geo.relative(true_pose(r, 0), true_pose(r + 1, 0))
        noise = jnp.asarray(rng.normal(0, 0.005, 6), jnp.float32)
        inter = inter.add(r * S, (r + 1) * S,
                          geo.compose(T_rel, geo.se3_exp(noise)),
                          10.0 * jnp.eye(6))
    return fleet, inter
