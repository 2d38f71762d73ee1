import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import merge as merge_ops
from coxgraph_tpu.ops import tsdf as tsdf_ops

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=1024, truncation=0.3)
CFG = sm.MapperConfig(
    spec=SPEC,
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
    intrinsics=syn.PinholeIntrinsics().scaled(0.125),
    max_submaps=8,
    max_history=64,
    submap_interval=0.3,
)


def run_clip(n_frames=10, dt=0.1):
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(n_frames, scene.room_center, radius=2.5,
                                sweep=jnp.pi)
    state = sm.create_mapper(CFG)
    starts = 0
    for i in range(n_frames):
        depth, color = syn.render_depth(scene, CFG.intrinsics, traj[i])
        state, started = sm.mapper_step(CFG, state, depth, color, traj[i],
                                        i * dt)
        starts += started
    return scene, traj, state, starts


def test_submap_rollover_and_history():
    scene, traj, state, starts = run_clip()
    col = state.collection
    # 10 frames at 0.1s with 0.3s interval → submaps at t=0,0.3,0.6,0.9
    assert int(col.num_submaps) == 4 == starts
    assert int(col.hist_count[0]) == 3
    # odometry constraints chained between consecutive submaps
    assert int(state.constraints.count) == 3
    # trajectory reconstruction matches ground truth (perfect odometry)
    stamps, poses = sm.trajectory(col)
    assert stamps.shape[0] == 10
    err = np.linalg.norm(
        np.asarray(geo.translation(poses)) -
        np.asarray(geo.translation(traj)), axis=-1)
    assert err.max() < 1e-4


def test_submap_layers_hold_surface():
    scene, traj, state, _ = run_clip()
    col = state.collection
    # each submap's layer should contain observed voxels near the true
    # surface (in its own frame)
    for k in range(int(col.num_submaps)):
        layer = sm._get_layer(col.layers, jnp.asarray(k))
        assert int(layer.num_blocks) > 5
        live = np.asarray(layer.weight > 0.1)
        centers = vx.voxel_centers_of_block(SPEC, layer.block_coords)
        world = geo.transform_points(col.T_odom_submap[k], centers)
        true = np.asarray(syn.scene_sdf(scene, world))
        true = true.reshape(true.shape[0], -1)
        sdf = np.asarray(layer.sdf)
        near = live & (np.abs(true) < 0.15)
        assert near.sum() > 50
        assert np.median(np.abs(sdf[near] - true[near])) < SPEC.voxel_size


def test_merge_two_posed_layers():
    """Golden test for mergeLayerAintoLayerB equivalence: two submaps of the
    same sphere observed from different frames must fuse consistently."""
    scene = syn.default_scene()
    intr = CFG.intrinsics
    icfg = CFG.integrator
    traj = syn.orbit_trajectory(2, scene.room_center, radius=2.5,
                                sweep=jnp.pi / 2)
    # submap frames = the two camera poses
    layers = []
    for i in range(2):
        depth, color = syn.render_depth(scene, intr, traj[i])
        la = vx.create_tsdf_layer(SPEC)
        la = tsdf_ops.integrate_frame(SPEC, icfg, intr, la, depth, color,
                                      geo.identity())
        layers.append(la)
    # merge layer1 (frame B) into layer0's frame A: T_A_B = inv(TA) ∘ TB
    T_A_B = geo.relative(traj[0], traj[1])
    merged = merge_ops.merge_layer_into(SPEC, layers[0], layers[1], T_A_B)
    live = np.asarray(merged.weight > 0.1)
    centers = vx.voxel_centers_of_block(SPEC, merged.block_coords)
    world = geo.transform_points(traj[0], centers)  # frame A → world
    true = np.asarray(syn.scene_sdf(scene, world))
    true = true.reshape(true.shape[0], -1)     # flat rows, like the pool
    near = live & (np.abs(true) < 0.15)
    assert near.sum() > 100
    err = np.abs(np.asarray(merged.sdf)[near] - true[near])
    assert np.median(err) < SPEC.voxel_size
    # merged map must cover more than either input (union of views)
    assert int(merged.num_blocks) >= int(layers[1].num_blocks)


def test_merged_layer_covers_scene():
    scene, traj, state, _ = run_clip()
    merged = sm.merged_layer(CFG, state.collection)
    assert int(merged.num_blocks) > 20
    live = np.asarray(merged.weight > 0.2)
    centers = vx.voxel_centers_of_block(SPEC, merged.block_coords)
    true = np.asarray(syn.scene_sdf(scene, centers))
    true = true.reshape(true.shape[0], -1)
    near = live & (np.abs(true) < 0.1)
    assert near.sum() > 100
    err = np.abs(np.asarray(merged.sdf)[near] - true[near])
    assert np.median(err) < SPEC.voxel_size


def test_local_pgo_fixes_drift():
    """Loop closure between first/last submap corrects odometric drift."""
    scene = syn.default_scene()
    n = 12
    traj = syn.orbit_trajectory(n, scene.room_center, radius=2.5)
    noisy = syn.noisy_odometry(jax.random.PRNGKey(0), traj,
                               rot_std=0.01, trans_std=0.03)
    state = sm.create_mapper(CFG)
    for i in range(n):
        depth, color = syn.render_depth(scene, CFG.intrinsics, traj[i])
        state, _ = sm.mapper_step(CFG, state, depth, color, noisy[i], i * 0.1)
    col = state.collection
    ns = int(col.num_submaps)
    assert ns >= 3
    # ground-truth submap poses = true pose at each submap's start frame
    frame_of_submap = [int(round(float(col.start_time[k]) / 0.1))
                       for k in range(ns)]
    T_true = jnp.stack([traj[f] for f in frame_of_submap])
    # drift before
    drift0 = float(jnp.linalg.norm(
        geo.translation(col.T_odom_submap[ns - 1]) -
        geo.translation(T_true[ns - 1])))
    # add exact loop closure submap 0 ↔ last
    state = sm.add_loop_closure(
        state, 0, ns - 1, geo.relative(T_true[0], T_true[ns - 1]),
        50.0 * jnp.eye(6))
    state = sm.optimize_local(CFG, state)
    drift1 = float(jnp.linalg.norm(
        geo.translation(state.collection.T_odom_submap[ns - 1]) -
        geo.translation(T_true[ns - 1])))
    assert drift1 < drift0 * 0.5 + 1e-3


def test_stacked_integration_matches_single_layer():
    """The flat-pool stacked integrator (hot path) must produce exactly
    the same voxel state as integrate_frame on an extracted layer."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(4, scene.room_center, radius=2.5)
    state = sm.create_mapper(CFG)
    ref_layers = {}
    for i in range(4):
        depth, color = syn.render_depth(scene, CFG.intrinsics, traj[i])
        state, started = sm.mapper_step(CFG, state, depth, color, traj[i],
                                        i * 0.1)
        k = int(state.collection.num_submaps) - 1
        if started:
            ref_layers[k] = vx.create_tsdf_layer(SPEC)
        T_sm_cam = geo.relative(state.collection.T_odom_submap[k], traj[i])
        ref_layers[k] = tsdf_ops.integrate_frame(
            SPEC, CFG.integrator, CFG.intrinsics, ref_layers[k], depth,
            color, T_sm_cam)
    col = state.collection
    for k, ref in ref_layers.items():
        got = sm._get_layer(col.layers, jnp.asarray(k))
        assert int(got.num_blocks) == int(ref.num_blocks)
        n = int(ref.num_blocks)
        np.testing.assert_array_equal(np.asarray(got.block_coords)[:n],
                                      np.asarray(ref.block_coords)[:n])
        np.testing.assert_allclose(np.asarray(got.sdf)[:n],
                                   np.asarray(ref.sdf)[:n], atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.weight)[:n],
                                   np.asarray(ref.weight)[:n], atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.color)[:n],
                                   np.asarray(ref.color)[:n], atol=1e-5)


def test_integrate_batch_matches_sequential():
    """integrate_batch (one-dispatch frame window) ≡ sequential steps."""
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(5, scene.room_center, radius=2.5)
    frames = [syn.render_depth(scene, CFG.intrinsics, traj[i])
              for i in range(5)]
    ts = np.arange(5, dtype=np.float32) * 0.05  # all inside one submap

    seq = sm.create_mapper(CFG)
    seq = sm.start_submap(CFG, seq, traj[0], jnp.asarray(0.0))
    for i in range(5):
        seq = sm.integrate(CFG, seq, frames[i][0], frames[i][1], traj[i],
                           jnp.asarray(ts[i]))

    bat = sm.create_mapper(CFG)
    bat = sm.start_submap(CFG, bat, traj[0], jnp.asarray(0.0))
    bat = sm.integrate_batch(CFG, bat, jnp.stack([f[0] for f in frames]),
                             jnp.stack([f[1] for f in frames]),
                             jnp.stack(list(traj)), jnp.asarray(ts))

    for name in ("sdf", "weight", "color"):
        np.testing.assert_allclose(
            np.asarray(getattr(bat.collection.layers, name)),
            np.asarray(getattr(seq.collection.layers, name)), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bat.collection.hist_count),
                                  np.asarray(seq.collection.hist_count))
    assert int(bat.frame_count) == int(seq.frame_count)


def test_host_mapper_step_batch_matches_steps():
    """HostMapper.step_batch ≡ per-frame HostMapper.step across rollovers."""
    scene = syn.default_scene()
    n = 8
    traj = syn.orbit_trajectory(n, scene.room_center, radius=2.5)
    frames = [syn.render_depth(scene, CFG.intrinsics, traj[i])
              for i in range(n)]
    ts = np.arange(n, dtype=np.float32) * 0.1  # rollover every 3 frames

    a = sm.HostMapper(CFG)
    starts_a = sum(a.step(frames[i][0], frames[i][1], traj[i], float(ts[i]))
                   for i in range(n))
    b = sm.HostMapper(CFG)
    starts_b = b.step_batch(jnp.stack([f[0] for f in frames]),
                            jnp.stack([f[1] for f in frames]),
                            jnp.stack(list(traj)), ts)
    assert starts_a == starts_b
    assert a.n_submaps == b.n_submaps
    # the windowed working-set path compiles the pose math in a
    # different program structure than the per-frame path, so pixels on
    # rounding boundaries may project one pixel apart — equivalence is
    # numerical, not bitwise: near-exact almost everywhere with a tiny
    # fraction of boundary voxels seeing a different depth sample
    sa = np.asarray(a.state.collection.layers.sdf)
    sb = np.asarray(b.state.collection.layers.sdf)
    np.testing.assert_allclose(sb, sa, atol=5e-3)
    assert (np.abs(sb - sa) > 1e-4).mean() < 1e-3
    np.testing.assert_array_equal(
        np.asarray(b.state.collection.hist_count),
        np.asarray(a.state.collection.hist_count))


def test_toggle_mapping_and_finish_map():
    """toggle_mapping drops frames (start_mapping.sh:2-5); finish_map runs
    a last local PGO and latches integration off
    (finish_experiment.sh:3-4)."""
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = syn.render_depth(scene, CFG.intrinsics, T)
    hm = sm.HostMapper(CFG)
    hm.mapping_enabled = False
    assert hm.step(depth, color, T, 0.0) is False
    assert hm.n_submaps == 0
    assert hm.step_batch(depth[None], color[None], T[None], [0.0]) == 0
    hm.mapping_enabled = True
    assert hm.step(depth, color, T, 0.0) is True
    assert hm.n_submaps == 1
    hm.finish_map()
    assert not hm.mapping_enabled
    assert hm.step(depth, color, T, 1e6) is False
    assert hm.n_submaps == 1

    from coxgraph_tpu.server.client_interface import InProcessClient
    robot = InProcessClient(0, CFG, hm.state)
    robot.mapper = hm
    hm.mapping_enabled = True
    robot.toggle_mapping(False)
    assert not hm.mapping_enabled and not robot.mapping_enabled
    robot.toggle_mapping(True)
    assert hm.mapping_enabled
    assert robot.finish_map() is True
    assert robot.finished and not hm.mapping_enabled
    assert robot.finish_map() is False          # idempotent
    robot.toggle_mapping(True)                  # finished ⇒ stays off
    assert not robot.mapping_enabled


def test_merge_cross_resolution():
    """Cross-spec resampling merge: a client-resolution (0.1 m) layer fused
    into finer (0.05 m) and coarser (0.2 m) destination grids must still
    carry the true surface (the server meshes at its own voxel size,
    coxgraph_server.launch:5-6, while submaps stay at client resolution)."""
    scene = syn.default_scene()
    depth, color = syn.render_depth(
        scene, CFG.intrinsics,
        syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0])
    src = vx.create_tsdf_layer(SPEC)
    src = tsdf_ops.integrate_frame(SPEC, CFG.integrator, CFG.intrinsics,
                                   src, depth, color, geo.identity())
    T_pose = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    for vs, gd, mb in ((0.05, 64, 4096), (0.2, 16, 256)):
        dspec = vx.VoxelGridSpec(voxel_size=vs, voxels_per_side=8,
                                 grid_dim=gd, max_blocks=mb,
                                 truncation=3 * vs)
        dst = vx.create_tsdf_layer(dspec)
        dst = merge_ops.merge_layer_into(dspec, dst, src, T_pose,
                                         src_spec=SPEC)
        # single-frame weights are distance-attenuated (≤1, ~0 at the
        # truncation edge) — any positive fused weight marks an observed
        # voxel here
        live = np.asarray(dst.weight > 0.01)
        centers = vx.voxel_centers_of_block(dspec, dst.block_coords)
        # src is in camera frame (integrated with identity); posing it by
        # the camera's world pose makes the dst frame the world frame
        true = np.asarray(syn.scene_sdf(scene, centers)).reshape(
            centers.shape[0], -1)
        band = 1.5 * max(vs, SPEC.voxel_size)
        near = live & (np.abs(true) < band)
        assert near.sum() > 50, (vs, near.sum())
        err = np.abs(np.asarray(dst.sdf)[near] - true[near])
        assert np.median(err) < max(SPEC.voxel_size, vs), (vs, np.median(err))


def test_saturated_submap_pool_drops_constraint_adds():
    """ADVICE r3: at pool saturation, start_submap must drop the chain
    AND height adds — otherwise a row with node index == max_submaps
    lands valid and jit gather clamping applies it to the LAST real
    submap in optimize_local."""
    import dataclasses

    cfg = dataclasses.replace(CFG, max_submaps=2, height_prior_stddev=0.1)
    state = sm.create_mapper(cfg)
    for k in range(4):
        T = geo.make(jnp.asarray([1.0, 0, 0, 0]),
                     jnp.asarray([float(k), 0.0, 0.2 * k]))
        state = sm.start_submap(cfg, state, T, jnp.asarray(float(k)))
    assert int(state.collection.num_submaps) == 2
    # only the one in-pool chain constraint (0→1)
    assert int(state.constraints.count) == 1
    # height priors for the two real submaps only, indices in range
    assert int(state.heights.count) == 2
    hi = np.asarray(state.heights.i)[np.asarray(state.heights.valid)]
    assert (hi < cfg.max_submaps).all(), hi


def test_host_mapper_warns_on_submap_saturation():
    """Saturated rollovers warn + count (warn-and-count discipline of
    the constraint pools; VERDICT r3 task #3, mapper side)."""
    import dataclasses
    import warnings

    cfg = dataclasses.replace(CFG, max_submaps=2, submap_interval=0.1)
    hm = sm.HostMapper(cfg)
    depth = jnp.full((cfg.intrinsics.height, cfg.intrinsics.width), 2.0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        for i in range(4):
            hm.step(depth, None, geo.identity(), 0.1 * i)
        assert hm.dropped_submaps == 2
        assert hm.n_submaps == 2
        msgs = [w for w in rec if "submap pool saturated" in str(w.message)]
        assert len(msgs) == 2
    # step_batch path counts too
    hm2 = sm.HostMapper(cfg)
    depths = jnp.tile(depth[None], (4, 1, 1))
    Ts = jnp.tile(geo.identity()[None], (4, 1))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        n_started = hm2.step_batch(depths, None, Ts,
                                   np.arange(4, dtype=np.float32) * 0.1)
    assert n_started == 2 and hm2.dropped_submaps == 2


def test_step_batch_saturation_clock_persists():
    """A saturation-DROPPED rollover must advance the interval clock
    like step() does (ADVICE r4): with windows SHORTER than the submap
    interval, a frozen clock re-fires the drop warning every window —
    4x over-counted dropped_submaps and a warning flood."""
    import dataclasses
    import warnings

    cfg = dataclasses.replace(CFG, max_submaps=1, submap_interval=1.0)
    hm = sm.HostMapper(cfg)
    depth = jnp.full((cfg.intrinsics.height, cfg.intrinsics.width), 2.0)
    depths = jnp.tile(depth[None], (3, 1, 1))
    Ts = jnp.tile(geo.identity()[None], (3, 1))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        # 6 windows of 3 frames at 0.1 s → t spans 1.8 s: exactly ONE
        # rollover is due (t=1.0) after the initial submap, and it drops
        for w in range(6):
            ts = (np.arange(3, dtype=np.float32) + 3 * w) * 0.1
            hm.step_batch(depths, None, Ts, ts)
        msgs = [x for x in rec if "submap pool saturated" in str(x.message)]
    assert hm.n_submaps == 1
    assert hm.dropped_submaps == 1, hm.dropped_submaps
    assert len(msgs) == 1, len(msgs)


def test_host_mirror_serving_matches_device_path():
    """The HostMapper host mirror (round 5): a client with an attached
    mapper serves timeline/handles/pose lookups/history from host
    bookkeeping with ZERO device readbacks — results must match the
    device-derived path bit-for-bit (same f32 math on both sides)."""
    import numpy as np
    import pytest

    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.server.client_interface import InProcessClient

    cfg = sm.MapperConfig(
        spec=vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8,
                              grid_dim=32, max_blocks=512, truncation=0.3),
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=256),
        intrinsics=syn.PinholeIntrinsics().scaled(0.125),
        max_submaps=4, max_history=8, submap_interval=0.25)
    scene = syn.default_scene()
    traj = np.asarray(syn.orbit_trajectory(6, scene.room_center,
                                           radius=2.5, sweep=0.4))

    mapper = sm.HostMapper(cfg)
    cli = InProcessClient(0, cfg, mapper.state)
    cli.mapper = mapper                      # mirror-backed serving
    ref_mapper = sm.HostMapper(cfg)
    ref = InProcessClient(0, cfg, ref_mapper.state)   # device path

    for i in range(6):
        d, c = syn.render_depth(scene, cfg.intrinsics, jnp.asarray(traj[i]))
        for m_, c_ in ((mapper, cli), (ref_mapper, ref)):
            m_.step(d, c, traj[i], i * 0.1)   # HOST pose → mirror valid
            c_.state = m_.state
    assert mapper.mirror_enabled and len(mapper.host_submaps) >= 2

    assert cli.timeline() == pytest.approx(ref.timeline(), abs=1e-6)
    hs_m = cli.get_all_submaps()
    hs_d = ref.get_all_submaps()
    assert len(hs_m) == len(hs_d) == mapper.n_submaps
    for a, b in zip(hs_m, hs_d):
        assert a.client_submap_id == b.client_submap_id
        assert a.start_time == pytest.approx(b.start_time, abs=1e-6)
        assert a.end_time == pytest.approx(b.end_time, abs=1e-6)
        np.testing.assert_allclose(a.T_cli_submap, b.T_cli_submap,
                                   atol=1e-6)
        np.testing.assert_allclose(a.hist_stamps, b.hist_stamps, atol=1e-6)
        np.testing.assert_allclose(a.hist_poses, b.hist_poses, atol=1e-5)
    t_mid = 0.15
    np.testing.assert_allclose(
        cli.lookup_pose_in_submap(0, t_mid),
        ref.lookup_pose_in_submap(0, t_mid), atol=1e-5)
    s_m, p_m = cli.get_pose_history()
    s_d, p_d = ref.get_pose_history()
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_m), np.asarray(p_d), atol=1e-5)
    # deltas: both publish every submap pose once, then go quiet
    d_m = cli.pose_update_deltas()
    d_d = ref.pose_update_deltas()
    assert len(d_m) == len(d_d) == mapper.n_submaps
    assert cli.pose_update_deltas() == []
    # device-pose input disables the mirror gracefully (fallback path)
    mapper.step(d, c, jnp.asarray(traj[5]), 0.9)
    cli.state = mapper.state
    assert not mapper.mirror_enabled
    assert len(cli.get_all_submaps()) == mapper.n_submaps


def test_window_boundary_rollovers_stay_exact_at_mission_timescales():
    """Round-5 regression: step_batch keeps rollover bookkeeping in
    FLOAT64. With the old f32 downcast, `t - last_start >= interval -
    1e-6` started failing at EXACT window boundaries a few minutes into
    a mission (f32 resolution at t≈60 s is ~4 µs) — the rollover fired
    one frame late and split the window into odd-length segments, each
    a fresh multi-second tunnel compile (~100 s of the round-5
    endurance soak, invisible in stage timings)."""
    import numpy as np

    from coxgraph_tpu.frontends import synthetic as syn

    WINDOW, DT = 24, 0.1
    cfg = sm.MapperConfig(
        spec=vx.VoxelGridSpec(voxel_size=0.2, voxels_per_side=8,
                              grid_dim=16, max_blocks=64, truncation=0.6),
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=32),
        intrinsics=syn.PinholeIntrinsics().scaled(0.025),   # 16x12
        max_submaps=64, max_history=32,
        submap_interval=WINDOW * DT)
    mapper = sm.HostMapper(cfg)
    depth = jnp.full((WINDOW, 12, 16), 2.0, jnp.float32)
    poses = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                    (WINDOW, 1))
    for w in range(40):                       # 96 s of mission time
        ts = (np.arange(WINDOW) + w * WINDOW) * DT   # float64 stamps
        started = mapper.step_batch(depth, None, poses, ts)
        # exactly ONE rollover per window, fired at the BOUNDARY frame
        assert started == 1, (w, started)
        assert mapper.last_start == float(ts[0]), (w, mapper.last_start)
    assert mapper.n_submaps == 40
