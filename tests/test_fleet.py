import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.parallel import fleet as fl
from coxgraph_tpu.ops import tsdf as tsdf_ops
from coxgraph_tpu.solver import pose_graph as pg

R = 4
CFG = sm.MapperConfig(
    spec=vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                          max_blocks=256, truncation=0.3),
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=128),
    intrinsics=syn.PinholeIntrinsics().scaled(0.0625),  # 40x30
    max_submaps=4,
    max_history=16,
    submap_interval=0.2,
    max_constraints=16,
)


def make_inputs(n_frames):
    scene = syn.default_scene()
    trajs = [
        syn.orbit_trajectory(n_frames, scene.room_center, radius=2.0,
                             sweep=jnp.pi / 2,
                             start_angle=r * jnp.pi / 2)
        for r in range(R)
    ]
    frames = []
    for i in range(n_frames):
        ds, cs = [], []
        for r in range(R):
            d, c = syn.render_depth(scene, CFG.intrinsics, trajs[r][i])
            ds.append(d)
            cs.append(c)
        frames.append((jnp.stack(ds), jnp.stack(cs)))
    return scene, jnp.stack(trajs), frames


def test_fleet_step_integrates_all_robots():
    mesh = fl.make_robot_mesh(R)
    scene, trajs, frames = make_inputs(3)
    fleet = fl.shard_fleet(fl.create_fleet(CFG, R), mesh)
    for i in range(3):
        d, c = frames[i]
        ts = jnp.full((R,), i * 0.1)
        fleet = fl.fleet_step(CFG, mesh, fleet, d, c, trajs[:, i], ts)
    nb = np.asarray(fleet.collection.num_submaps)
    assert (nb == 2).all()  # rollover at t=0 and t=0.2
    fc = np.asarray(fleet.frame_count)
    assert (fc == 3).all()
    # every robot's active submap holds observed voxels
    for r in range(R):
        st = fl.robot_state(fleet, r)
        k = int(st.collection.num_submaps) - 1
        layer = sm._get_layer(st.collection.layers, jnp.asarray(k))
        assert int(layer.num_blocks) > 3
        assert float(layer.weight.max()) > 0


def test_fleet_matches_single_robot():
    """SPMD fleet integration must produce the same state as running the
    single-robot mapper per robot."""
    mesh = fl.make_robot_mesh(R)
    scene, trajs, frames = make_inputs(2)
    fleet = fl.shard_fleet(fl.create_fleet(CFG, R), mesh)
    for i in range(2):
        d, c = frames[i]
        fleet = fl.fleet_step(CFG, mesh, fleet, d, c, trajs[:, i],
                              jnp.full((R,), i * 0.1))
    for r in range(R):
        ref = sm.create_mapper(CFG)
        for i in range(2):
            d, c = frames[i]
            ref, _ = sm.mapper_step(CFG, ref, d[r], c[r], trajs[r, i], i * 0.1)
        got = fl.robot_state(fleet, r)
        k = int(ref.collection.num_submaps) - 1
        la = sm._get_layer(got.collection.layers, jnp.asarray(k))
        lb = sm._get_layer(ref.collection.layers, jnp.asarray(k))
        assert int(la.num_blocks) == int(lb.num_blocks)
        np.testing.assert_allclose(np.asarray(la.sdf), np.asarray(lb.sdf),
                                   atol=1e-5)


def test_fleet_optimize_aligns_robots():
    """Distributed GN with inter-robot loop closures corrects per-robot
    drift, matching the single-process solver."""
    mesh = fl.make_robot_mesh(R)
    S = CFG.max_submaps
    key = jax.random.PRNGKey(0)

    # ground-truth submap poses per robot: short chains around a circle
    def mk_chain(r):
        base = geo.from_xyzyaw(jnp.array([float(r), 0.5 * r, 0.0, 0.4 * r]))
        rel = geo.se3_exp(jnp.array([0.0, 0.0, 0.1, 0.5, 0.1, 0.0]))
        poses = [base]
        for _ in range(S - 1):
            poses.append(geo.compose(poses[-1], rel))
        return jnp.stack(poses)

    gt = jnp.stack([mk_chain(r) for r in range(R)])      # (R,S,7)

    fleet = fl.create_fleet(CFG, R)
    # noisy initial poses (except robot0/submap0 gauge)
    noise = jax.vmap(
        lambda k: geo.se3_exp(
            jnp.concatenate([jax.random.normal(k, (3,)) * 0.03,
                             jax.random.normal(jax.random.fold_in(k, 7), (3,)) * 0.1])
        )
    )(jax.random.split(key, R * S)).reshape(R, S, 7)
    init = jax.vmap(jax.vmap(geo.compose))(gt, noise)
    init = init.at[0, 0].set(gt[0, 0])

    # local odometry constraints per robot (exact)
    cons = fleet.constraints
    for r in range(R):
        c = pg.RelPoseConstraints.empty(CFG.max_constraints)
        for s in range(S - 1):
            c = c.add(s, s + 1, geo.relative(gt[r, s], gt[r, s + 1]),
                      10.0 * jnp.eye(6))
        cons = jax.tree.map(lambda all_, one, rr=r: all_.at[rr].set(one),
                            cons, c)
    col = dataclasses.replace(fleet.collection, T_odom_submap=init,
                              num_submaps=jnp.full((R,), S, jnp.int32))
    fleet = dataclasses.replace(fleet, collection=col, constraints=cons)

    # inter-robot constraints: robot r submap 0 ↔ robot r+1 submap 0
    inter = pg.RelPoseConstraints.empty(16)
    for r in range(R - 1):
        gi, gj = r * S + 0, (r + 1) * S + 0
        inter = inter.add(gi, gj, geo.relative(gt[r, 0], gt[r + 1, 0]),
                          10.0 * jnp.eye(6))

    fleet = fl.shard_fleet(fleet, mesh)
    out, poses = fl.fleet_optimize(CFG, mesh, fleet, inter,
                                   pg.SolverConfig(iterations=20))

    got = np.asarray(out.collection.T_odom_submap)
    err = jax.vmap(jax.vmap(lambda a, b: geo.se3_log(geo.relative(a, b))))(
        jnp.asarray(got), gt)
    maxerr = float(jnp.abs(err).max())
    assert maxerr < 5e-3, maxerr
    # global pose vector is consistent with the per-robot shards
    np.testing.assert_allclose(
        np.asarray(poses).reshape(R, S, 7), got, atol=1e-6)
