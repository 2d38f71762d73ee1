"""On-chip endurance run (VERDICT r3 task #8): the two-robot drifting
experiment streamed for O(1000) frames on the REAL TPU with async PGO,
the incremental live-mesh path, and the saturation counters all active —
the long-mission soak the 40-80-frame demos never exercised. Writes the
round artifact ``ENDURANCE_r{N}.json`` at the repo root:

    wall/fps, accepted fusions, async-solve seconds, per-robot ATE,
    window-union watermark + dropped blocks, dropped submap rollovers,
    constraint-pool drops, incremental-mesh chunks re-meshed vs full,
    final mesh size + surface error.

Design notes (the streaming discipline of docs/PERFORMANCE.md):
  * frames are pre-rendered ONCE on CPU and cached (.endurance_frames.npz,
    like bench's frame cache) — each robot loops a 96-frame orbit lap
    with drifting odometry, so revisits are real and closures matter;
  * integration runs through HostMapper.step_batch windows (one device
    dispatch per window) under the client lock — the async PGO thread
    reads the same state the reference way (client_handler.cpp);
  * the loop detector runs on keyframes from the cached frames; intra-
    robot closures route through the server back to local PGO, cross-
    robot matches become MapFusion messages driving the two-phase solve.

Run: python tools/endurance_run.py [--laps N] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAME_CACHE = os.path.join(ROOT, ".endurance_frames.npz")
DT = 0.1
N_LAP = 96          # frames per lap per robot (one full orbit)
WINDOW = 24         # frames per step_batch dispatch


def _render_frames(scale: float):
    """One lap of frames per robot, rendered on CPU and cached."""
    import numpy as np

    if os.path.exists(FRAME_CACHE):
        z = np.load(FRAME_CACHE)
        if z["scale"] == scale and z["d0"].shape[0] == N_LAP:
            return z
    import subprocess
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, {ROOT!r})
from coxgraph_tpu.frontends import synthetic as syn
scene = syn.default_scene()
intr = syn.PinholeIntrinsics().scaled({scale})
out = {{"scale": {scale}}}
for r, a0 in ((0, 0.0), (1, np.pi)):
    traj = syn.orbit_trajectory({N_LAP}, scene.room_center, radius=2.4,
                                sweep=2 * jnp.pi, start_angle=a0)
    d, c = [], []
    for i in range({N_LAP}):
        di, ci = syn.render_depth(scene, intr, traj[i])
        d.append(np.asarray(di, np.float32))
        c.append(np.asarray(ci, np.float32))
    out[f"d{{r}}"] = np.stack(d)
    out[f"c{{r}}"] = np.stack(c)
    out[f"traj{{r}}"] = np.asarray(traj, np.float32)
np.savez_compressed({FRAME_CACHE!r}, **out)
print("frames cached")
"""
    subprocess.run([sys.executable, "-c", code], check=True)
    return np.load(FRAME_CACHE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--out", default=os.path.join(ROOT, "ENDURANCE_r04.json"))
    args = ap.parse_args()

    from coxgraph_tpu.utils import runtime
    if args.cpu:
        runtime.force_cpu()
    runtime.enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coxgraph_tpu.core import geometry as geo, voxel as vx
    from coxgraph_tpu.eval import metrics
    from coxgraph_tpu.eval.live_view import LiveMeshViewer
    from coxgraph_tpu.frontends import loop_detector as ld
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import features as ft, tsdf as tsdf_ops
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.server.client_interface import InProcessClient
    from coxgraph_tpu.solver import pose_graph as pg

    print(f"backend: {jax.default_backend()}")
    z = _render_frames(args.scale)
    depths = [np.asarray(z["d0"]), np.asarray(z["d1"])]
    colors = [np.asarray(z["c0"]), np.asarray(z["c1"])]
    trajs = [np.asarray(z["traj0"]), np.asarray(z["traj1"])]

    n_frames = args.laps * N_LAP
    duration = n_frames * DT
    spec = vx.VoxelGridSpec(voxel_size=0.05, voxels_per_side=16,
                            grid_dim=64, max_blocks=1024, truncation=0.15)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
        intrinsics=syn.PinholeIntrinsics().scaled(args.scale),
        # the interval is an exact multiple of the WINDOW length so
        # every rollover lands on a step_batch boundary — one compiled
        # window program instead of one per segment length (tunnel
        # compile discipline, docs/PERFORMANCE.md); at 6 laps the 24
        # rollovers overrun the 20-submap pool, so the graceful
        # warn-and-count saturation path runs as part of the soak
        max_submaps=20, max_history=512,
        submap_interval=WINDOW * DT,
        height_prior_stddev=0.1,
        local_solver=pg.SolverConfig(huber_delta=1.5))
    scene = syn.default_scene()

    # drifting odometry: per-frame relative motions with deterministic
    # bias, continuous ACROSS laps (revisit error grows until corrected)
    rng = np.random.default_rng(3)
    gt_all, odom_all = [], []
    X_np = [np.asarray(geo.identity()),
            np.asarray(geo.from_xyzyaw(jnp.array([0.8, -0.4, 0.0, 0.5])))]
    for r in range(2):
        gt = [trajs[r][i % N_LAP] for i in range(n_frames)]
        od = [gt[0]]
        for k in range(1, n_frames):
            T_rel = geo.relative_np(gt[k - 1], gt[k])
            noise = rng.normal(0, 0.0008, 6).astype(np.float32)
            noise[2] += 0.0008
            noise[3] += 0.0010
            T_rel = geo.compose_np(T_rel, np.asarray(jnp.asarray(
                geo.se3_exp(jnp.asarray(noise)))))
            od.append(geo.compose_np(od[-1], T_rel))
        gt_all.append(np.stack(gt))
        # odometry expressed in each robot's own odom frame
        odom_all.append(np.stack([
            geo.compose_np(geo.inverse_np(X_np[r]), p) for p in od]))

    clients = [InProcessClient(r, cfg, sm.create_mapper(cfg))
               for r in range(2)]
    mappers = [sm.HostMapper(cfg, clients[r].state) for r in range(2)]
    server = fs.CoxgraphServer(
        fs.ServerConfig(
            spec=spec, max_submaps=48, refuse_interval=2.0,
            async_pgo=True, registration_weight=30.0,
            registration=fs.reg.RegistrationConfig(max_points=1024,
                                                   iterations=10)),
        clients)
    detector = ld.LoopDetector(
        cfg.intrinsics,
        ld.LoopDetectorConfig(
            features=ft.FeatureConfig(max_keypoints=384),
            min_match_score=25, min_inliers=15,
            keyframe_stride=4 * DT, min_time_separation=6.0,
            sqrt_info=60.0))
    viewer = LiveMeshViewer("/tmp/coxgraph_endurance", label="endurance")

    t0 = time.time()
    n_fusions = n_candidates = 0
    live_updates = 0
    for lap in range(args.laps):
        for w0 in range(0, N_LAP, WINDOW):
            i0 = lap * N_LAP + w0
            ts = (np.arange(WINDOW) + i0) * DT
            for r in range(2):
                sl = slice(w0, w0 + WINDOW)
                osl = slice(i0, i0 + WINDOW)
                with clients[r].lock:
                    # resync FIRST: the async-PGO server rebinds
                    # client.state on pose pushes / forwarded closures
                    # (apply_pose_updates, receive_loop_closure) — a
                    # stale mapper.state rebind would silently revert
                    # them (ADVICE r4)
                    mappers[r].state = clients[r].state
                    mappers[r].step_batch(
                        jnp.asarray(depths[r][sl]),
                        jnp.asarray(colors[r][sl]),
                        jnp.asarray(odom_all[r][osl]), ts)
                    # the client serves timeline/submaps straight off
                    # this state (in-process ClientHandler duality)
                    clients[r].state = mappers[r].state
        # keyframes + closures once per lap (frames already on host)
        for k in range(0, N_LAP, 4):
            i = lap * N_LAP + k
            for r in range(2):
                for mf in detector.add_keyframe(
                        r, i * DT, jnp.asarray(colors[r][k]),
                        jnp.asarray(depths[r][k])):
                    n_candidates += 1
                    if server.map_fusion(mf):
                        n_fusions += 1
        server.process_mf_future()
        # incremental live mesh of robot 0 (the streaming path);
        # live_mesh DONATES mapper state, so run under the client lock
        # and rebind the alias (ADVICE r4 — the async PGO thread reads
        # clients[0].state)
        with clients[0].lock:
            mappers[0].state = clients[0].state   # pick up server pushes
            viewer.update_from_mapper(mappers[0])
            clients[0].state = mappers[0].state
        live_updates += 1
        print(f"lap {lap + 1}/{args.laps}: fusions {n_fusions}, "
              f"server submaps {len(server.submaps)}, "
              f"live chunks re-meshed "
              f"{sum(m.chunks_remeshed for m in mappers[0]._meshers.values())}")
    server.wait_for_optimize()
    stream_wall = time.time() - t0

    for r in range(2):
        with clients[r].lock:
            mappers[r].state = clients[r].state   # pick up server pushes
            mappers[r].finish_map()
            clients[r].state = mappers[r].state
    solve_wall = sum(f.get("solve_wall", 0.0) for f in server.fusion_log)

    t_mesh = time.time()
    merged, verts, cols = server.get_final_global_mesh(
        "/tmp/coxgraph_endurance/final.ply", isolate=False,
        mesh_spec=vx.VoxelGridSpec(
            voxel_size=spec.voxel_size, voxels_per_side=16, grid_dim=64,
            max_blocks=6144, truncation=spec.truncation))
    mesh_wall = time.time() - t_mesh
    sdf = np.abs(np.asarray(
        syn.scene_sdf(scene, jnp.asarray(verts.reshape(-1, 3)))))

    ates = []
    for r in range(2):
        stamps, poses = server.pose_history(r)
        order = np.argsort(stamps)
        gt_stamps = np.arange(n_frames) * DT
        ate = metrics.ate_rmse(np.asarray(stamps)[order],
                               np.asarray(poses)[order],
                               gt_stamps, gt_all[r], align=False)
        ates.append(float(ate))

    sat = [m.union_saturation() for m in mappers]
    art = {
        "frames": 2 * n_frames,
        "stream_wall_s": round(stream_wall, 2),
        "stream_fps": round(2 * n_frames / stream_wall, 2),
        "fusion_candidates": n_candidates,
        "fusions_accepted": n_fusions,
        "async_solve_wall_s": round(solve_wall, 2),
        "server_submaps": len(server.submaps),
        "ate_m": [round(a, 4) for a in ates],
        "union_watermark": [s[0] for s in sat],
        "dropped_union_blocks": [s[1] for s in sat],
        "dropped_submap_rollovers": [m.dropped_submaps for m in mappers],
        "server_dropped_constraints": int(server.constraints.num_dropped()),
        "live_mesh_updates": live_updates,
        "live_chunks_remeshed": sum(
            m.chunks_remeshed for mp in mappers for m in mp._meshers.values()),
        "final_mesh_tris": int(verts.shape[0]),
        "final_mesh_wall_s": round(mesh_wall, 2),
        "surface_err_p90_m": round(float(np.quantile(sdf, 0.9)), 4),
        "backend": jax.default_backend(),
        "optimize_errors": server.optimize_errors,
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(art) + "\n")
    print(json.dumps(art))
    ok = (max(ates) < 0.25 and not server.optimize_errors
          and n_fusions > 0 and verts.shape[0] > 1000)
    print("ENDURANCE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
