"""On-chip endurance run — round 5: the PIPELINED two-robot streaming
mission (VERDICT r4 Missing #1/Weak #1). The reference runs its stages as
concurrent OS processes wired by topic queues (tsdf_server → tsdf_recover
→ client → server, firefly/tsdf_client.launch:25-50) with the global
solve on a detached std::async thread (coxgraph_server.cpp:471-473) so
dense integration never blocks on loop detection or optimization. This
harness reproduces that overlap with the repo's own machinery:

  STREAM thread   — integrate_batch windows per robot (client lock),
                    deferred local PGO drains. Never calls map_fusion,
                    wait_for_optimize, or a mesh readback.
  SERVING thread  — per-lap incremental live mesh of robot 0 (the
                    reference's separate map_server node,
                    map_server.cpp:77-152): the lock-held half is just
                    the dirty-consume + layer-slice dispatches
                    (live_mesh_async), the multi-second extraction
                    readback happens off-lock so it never stalls the
                    stream; queued requests coalesce (dirty bits
                    accumulate).
  DETECTOR thread — consumes keyframe jobs from a queue (posted as each
                    window lands), runs the fused one-dispatch
                    match+verify, routes MapFusion messages to the
                    server. Fusions use NONBLOCKING PGO: constraints
                    land immediately, solves coalesce.
  SOLVE thread    — the server's async PGO loop (kicked by fusions),
                    pushes optimized poses back under the client locks.

Writes ``ENDURANCE_r{N}.json``: wall/fps (FULL pipeline wall — stream +
detector drain + final solve), per-stage wall breakdown, accepted
fusions, coalesced solves, per-robot ATE, pool watermarks, incremental-
mesh stats, final mesh size + surface error, and the wire-bandwidth
stage (per-submap voxel-wire vs mesh-wire bytes/latency — the L2 tier's
designed bottleneck, eval_data_publisher.h:23-31, msg_converter.h:149-167).

Frames are pre-rendered ONCE on CPU and cached (.endurance_frames.npz);
each robot loops a 96-frame orbit lap with drifting odometry, so revisits
are real and closures matter. Sensor rate: 2 robots × 10 Hz ⇒ real time
means ≥ 20 frames/s aggregate pipeline wall.

Run: python tools/endurance_run.py [--laps N] [--cpu]
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAME_CACHE = os.path.join(ROOT, ".endurance_frames.npz")
DT = 0.1
N_LAP = 96          # frames per lap per robot (one full orbit)
WINDOW = 24         # frames per step_batch dispatch
KF_STRIDE = 4       # frames between detector keyframes


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
    ap.add_argument("--no-loops", action="store_true",
                    help="diagnostic: skip keyframes/fusions entirely "
                         "(isolates the stream+serve side)")
    ap.add_argument("--paced", action="store_true",
                    help="release each window at its SENSOR timestamp "
                         "(2 robots x 10 Hz): the sustained real-time "
                         "test — every stage must keep up with bounded "
                         "queues, vs. the default max-throughput burst")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--out", default=os.path.join(ROOT, "ENDURANCE_r05.json"))
    args = ap.parse_args()

    from coxgraph_tpu.utils import runtime
    if args.cpu:
        runtime.force_cpu()
    runtime.enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coxgraph_tpu.comm import mesh_comm, wire
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

    # Pre-stage the lap frames ON DEVICE once (color as u8): per-window
    # host→device uploads over the ~2 MB/s axon tunnel were the single
    # biggest "integrate" cost of the first round-5 soak (~90 s of 335);
    # a real robot's sensor feed DMAs at PCIe rates, so staging models
    # the sensor path honestly (the bench frame-cache discipline).
    # Window/keyframe access goes through jitted TRACED-index slicers —
    # eager `arr[k]` per index compiles a fresh tunnel program each
    # (CLAUDE.md host discipline).
    d_dev = [jnp.asarray(depths[r]) for r in range(2)]
    c_dev = [jnp.asarray(np.clip(colors[r] * 255.0, 0, 255)
                         .astype(np.uint8)) for r in range(2)]

    @jax.jit
    def window_at(d, c, i0):
        dw = jax.lax.dynamic_slice_in_dim(d, i0, WINDOW)
        cw = jax.lax.dynamic_slice_in_dim(c, i0, WINDOW)
        return dw, cw.astype(jnp.float32) / 255.0

    @jax.jit
    def frame_at(d, c, i):
        return d[i], c[i].astype(jnp.float32) / 255.0

    n_frames = args.laps * N_LAP
    spec = vx.VoxelGridSpec(voxel_size=0.05, voxels_per_side=16,
                            grid_dim=64, max_blocks=1024, truncation=0.15)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
        intrinsics=syn.PinholeIntrinsics().scaled(args.scale),
        # the interval is an exact multiple of the WINDOW length so every
        # rollover lands on a step_batch boundary — one compiled window
        # program (tunnel compile discipline, docs/PERFORMANCE.md); at 6
        # laps the 24 rollovers overrun the 20-submap pool, so the
        # graceful warn-and-count saturation path runs as part of the soak
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
    for c in clients:
        c.defer_local_pgo = True    # closures add; the stream thread solves
    mappers = [sm.HostMapper(cfg, clients[r].state) for r in range(2)]
    for r in range(2):
        # attach the mapper so the client serves timeline/handles/pose
        # lookups from its HOST MIRROR (zero device readbacks on the
        # fusion path), and check union stats every 8th window (each
        # mid-mission stats readback queues behind in-flight solves)
        clients[r].mapper = mappers[r]
        mappers[r].stats_check_windows = 8
    server = fs.CoxgraphServer(
        fs.ServerConfig(
            spec=spec, max_submaps=48, refuse_interval=2.0,
            intra_refuse_interval=2.0,
            async_pgo=True, nonblocking_pgo=True,
            min_solve_interval=6.0,
            max_registration_pairs=96,
            registration_weight=30.0,
            # solve sized to the mission: submaps carry ≲400 live blocks
            # (union watermark ~310), so max_reg_blocks=512 halves the
            # per-solve stacked field ((S·R, v³) rebuilt every solve);
            # 512 surface points is the reference's own subsampling
            # spirit (sampling_ratio 0.3, server.yaml:30)
            # phase2_dispatch_iters=1: the solve runs as per-iteration
            # device programs (carry on device, zero extra readbacks) so
            # detector/mesh readbacks queue behind ≤1 LM iteration
            # instead of the whole fused multi-second solve — the
            # round-5 shared-chip rule's "keep the longest device
            # program short" applied to the solver itself
            registration=fs.reg.RegistrationConfig(
                max_points=512, iterations=8, max_reg_blocks=512,
                phase2_dispatch_iters=1)),
        clients)
    detector = ld.LoopDetector(
        cfg.intrinsics,
        ld.LoopDetectorConfig(
            features=ft.FeatureConfig(max_keypoints=384),
            min_match_score=25, min_inliers=15,
            keyframe_stride=KF_STRIDE * DT, min_time_separation=6.0,
            # closures enter at their measured accuracy (~1-3 cm on the
            # noiseless synthetic frames — the tum_real operating point
            # uses 100 too); at 60 the odometry chain retains ~8% of the
            # per-hop drift per closure
            sqrt_info=100.0, max_keyframes=512,
            # 8-frame fused sub-batches (one readback per 8 keyframes);
            # match_chunk drops to keep the batched Hamming transient
            # ~300 MB (batch x chunk x K^2 x i32)
            batch_size=8, match_chunk=64))
    viewer = LiveMeshViewer("/tmp/coxgraph_endurance", label="endurance")

    # -- detector/fusion thread ----------------------------------------
    kf_jobs: "queue.Queue" = queue.Queue()
    stage = {"integrate": 0.0, "live_mesh": 0.0, "local_pgo": 0.0,
             "detect": 0.0, "fuse": 0.0}
    counts = {"cand": 0, "fused": 0, "kf": 0}
    det_errors: list = []

    def detector_loop():
        try:
            while True:
                job = kf_jobs.get()
                if job is None:
                    return
                # drain up to 8 queued keyframes into one batched ingest
                # (2 sub-batches of 4): per-keyframe readbacks each queue
                # behind in-flight solves on the shared chip
                batch = [job]
                while len(batch) < 16:
                    try:
                        j2 = kf_jobs.get_nowait()
                    except queue.Empty:
                        break
                    if j2 is None:
                        kf_jobs.put(None)   # re-post the sentinel
                        break
                    batch.append(j2)
                t0 = time.perf_counter()
                items = []
                for r, k, t in batch:
                    dk, ck = frame_at(d_dev[r], c_dev[r], k)
                    items.append((r, t, ck, dk))
                mfs = detector.add_keyframes_batch(items)
                stage["detect"] += time.perf_counter() - t0
                counts["kf"] += len(batch)
                for mf in mfs:
                    counts["cand"] += 1
                    t0 = time.perf_counter()
                    if server.map_fusion(mf):
                        counts["fused"] += 1
                    stage["fuse"] += time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — surface, don't hang
            det_errors.append(f"{type(e).__name__}: {e}")

    det_thread = threading.Thread(target=detector_loop, daemon=True)
    det_thread.start()

    # -- serving thread (live mesh, the reference's map_server node) ----
    serve_jobs: "queue.Queue" = queue.Queue()
    serve_counts = {"updates": 0}

    def serving_loop():
        try:
            while True:
                job = serve_jobs.get()
                if job is None:
                    return
                # coalesce queued requests: dirty bits accumulate, so one
                # update covers every lap that requested while we served
                while True:
                    try:
                        j2 = serve_jobs.get_nowait()
                    except queue.Empty:
                        break
                    if j2 is None:
                        serve_jobs.put(None)   # re-post the sentinel
                        break
                t0 = time.perf_counter()
                # lock-held half: consume dirty bits + slice the layer
                # (dispatches only — no readback under the lock).
                # ACTIVE-submap delta streaming (per-submap mesh publish
                # cadence, map_server.cpp:119-152): only the changed
                # chunks of the submap being built cross the link.
                # min_weight 0.1 (the 1e-4 default meshes every grazing
                # observation) + fixed max_tris (buffer auto-growth
                # would recompile the extractor mid-mission).
                with clients[0].lock:
                    mappers[0].state = clients[0].state
                    finish = mappers[0].live_mesh_async(
                        min_weight=0.1, max_tris=1 << 20)
                    clients[0].state = mappers[0].state
                # off-lock half: extraction dispatch + host readback
                # (queues behind in-flight solves WITHOUT stalling the
                # stream thread)
                v_live, c_live = finish()
                viewer.update(v_live.reshape(-1, 3),
                              np.round(np.clip(c_live.reshape(-1, 3),
                                               0, 1)
                                       * 255).astype(np.uint8))
                stage["live_mesh"] += time.perf_counter() - t0
                serve_counts["updates"] += 1
        except Exception as e:  # noqa: BLE001 — surface, don't hang
            det_errors.append(f"serving: {type(e).__name__}: {e}")

    serve_thread = threading.Thread(target=serving_loop, daemon=True)
    serve_thread.start()

    # -- stream thread (this thread) -----------------------------------
    t_start = time.time()
    kf_queue_max = 0
    max_window_lag = 0.0
    for lap in range(args.laps):
        for w0 in range(0, N_LAP, WINDOW):
            i0 = lap * N_LAP + w0
            ts = (np.arange(WINDOW) + i0) * DT
            if args.paced:
                # frames for this window finish capturing at sensor time
                # (i0 + WINDOW)·DT — sleep until then; positive lag means
                # the pipeline fell behind the sensor
                deadline = t_start + (i0 + WINDOW) * DT
                lag = time.time() - deadline
                if lag < 0:
                    time.sleep(-lag)
                else:
                    max_window_lag = max(max_window_lag, lag)
            kf_queue_max = max(kf_queue_max, kf_jobs.qsize())
            t0 = time.perf_counter()
            for r in range(2):
                osl = slice(i0, i0 + WINDOW)
                dw, cw = window_at(d_dev[r], c_dev[r], w0)
                with clients[r].lock:
                    # resync FIRST: the async-PGO server rebinds
                    # client.state on pose pushes / forwarded closures —
                    # a stale mapper.state rebind would silently revert
                    # them (ADVICE r4)
                    mappers[r].state = clients[r].state
                    # odometry passed as HOST arrays (the pose mirror
                    # consumes them; jit converts for the device side)
                    mappers[r].step_batch(
                        dw, cw, odom_all[r][osl], ts)
                    clients[r].state = mappers[r].state
            stage["integrate"] += time.perf_counter() - t0
            # deferred local solves accumulated from forwarded closures.
            # NOTE: pose deltas are NOT published back to the server —
            # measured WORSE both mid-stream (client-push ⇄ server-push
            # tug: the two solvers overwrite each other's corrections)
            # and at mission end (chains rebuilt from locally-corrected
            # poses double-count closures that the global graph already
            # holds as fusion constraints). Server chains stay raw
            # odometry measurements.
            t0 = time.perf_counter()
            for r in range(2):
                with clients[r].lock:
                    if clients[r].run_pending_local_pgo():
                        mappers[r].state = clients[r].state
            stage["local_pgo"] += time.perf_counter() - t0
            # hand this window's keyframes to the detector thread (the
            # frames exist in the map now — reference topic causality)
            if not args.no_loops:
                for k in range(w0, w0 + WINDOW, KF_STRIDE):
                    for r in range(2):
                        kf_jobs.put((r, k, (lap * N_LAP + k) * DT))
        # request a live-mesh update from the serving thread (coalesces
        # if serving is still busy with the previous lap's update)
        serve_jobs.put(True)
        print(f"lap {lap + 1}/{args.laps}: fused {counts['fused']}, "
              f"kf queue {kf_jobs.qsize()}, "
              f"server submaps {len(server.submaps)}, "
              f"coalesced solves {server.coalesced_solves}")
    stream_wall = time.time() - t_start

    # drain: detector + serving finish their queued tails, then the last
    # solve lands
    t0 = time.perf_counter()
    kf_jobs.put(None)
    serve_jobs.put(None)
    det_thread.join()
    serve_thread.join()
    server.process_mf_future()
    server.wait_for_optimize()
    for r in range(2):
        with clients[r].lock:
            if clients[r].run_pending_local_pgo():
                mappers[r].state = clients[r].state
    drain_wall = time.perf_counter() - t0
    pipeline_wall = time.time() - t_start
    solve_wall = sum(f.get("solve_wall", 0.0) for f in server.fusion_log)

    for r in range(2):
        with clients[r].lock:
            mappers[r].state = clients[r].state   # pick up server pushes
            mappers[r].finish_map()
            clients[r].state = mappers[r].state
    # one extra offline refinement pass before the final collection: the
    # client-frame 4-DoF alignment is solved AFTER the pose solve, so a
    # second pass lets poses re-settle against the updated alignment
    # (otherwise the final trajectory inherits whichever mid-stream
    # alignment happened to be current — +-2.5 cm of robot-1 ATE
    # run-to-run variance measured from exactly this). NOTE: the final
    # solves keep the same 96-pair registration budget as online —
    # lifting the cap was measured WORSE (at ~400 pairs the summed
    # registration influence triples against the fixed-weight odometry/
    # fusion constraints and grazing-incidence TSDF bias pulls poses;
    # registration_weight was tuned at ~125 pairs).
    if server.in_control and len(server.submaps) >= 2:
        server.optimize()

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

    # -- wire-bandwidth stage (VERDICT r4 Missing #2) ------------------
    # per-submap voxel-wire vs mesh-wire bytes + encode latency on the
    # MISSION's own submaps (eval_data_publisher.h:23-31 /
    # msg_converter.h:149-167 sizeOfMsg — the L2 mesh tier exists to win
    # exactly this ratio)
    bw = wire.BandwidthLog()
    mesh_bytes = []
    n_bw = min(4, len(server.submaps))
    for s in server.submaps[:n_bw]:
        t0 = time.perf_counter()
        msg = wire.pack_submap_msg(
            spec, s.client_id, s.client_submap_id, s.layer,
            s.T_cli_submap, s.start_time, s.end_time,
            s.hist_stamps, s.hist_poses)
        bw.record(f"submap_{s.sid}_voxel", len(msg), t0)
        voxel_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        m = mesh_comm.encode_submap_mesh(
            spec, s.layer, s.hist_stamps, s.hist_poses, cfg.intrinsics,
            client_id=s.client_id, submap_id=s.client_submap_id)
        mb = m.nbytes
        bw.record(f"submap_{s.sid}_mesh", mb, t0)
        mesh_bytes.append((len(msg), mb, voxel_s,
                           time.perf_counter() - t0))
    bw_art = {}
    if mesh_bytes:
        vb = [x[0] for x in mesh_bytes]
        mb_ = [x[1] for x in mesh_bytes]
        bw_art = {
            "submaps_measured": n_bw,
            "voxel_wire_bytes_per_submap": int(np.mean(vb)),
            "mesh_wire_bytes_per_submap": int(np.mean(mb_)),
            "mesh_vs_voxel_ratio": round(float(np.sum(mb_) / np.sum(vb)), 4),
            "voxel_wire_s_per_transfer": round(
                float(np.mean([x[2] for x in mesh_bytes])), 3),
            "mesh_wire_s_per_transfer": round(
                float(np.mean([x[3] for x in mesh_bytes])), 3),
            "voxel_size_m": spec.voxel_size,
            "submap_interval_s": cfg.submap_interval,
        }

    sat = [m.union_saturation() for m in mappers]
    art = {
        "frames": 2 * n_frames,
        "sensor_rate_fps": 2.0 / DT,
        "pipeline_wall_s": round(pipeline_wall, 2),
        "pipeline_fps": round(2 * n_frames / pipeline_wall, 2),
        "stream_wall_s": round(stream_wall, 2),
        "stream_fps": round(2 * n_frames / stream_wall, 2),
        "paced": bool(args.paced),
        "kf_queue_max": kf_queue_max,
        "max_window_lag_s": round(max_window_lag, 3),
        "realtime_factor": round(
            (2 * n_frames / pipeline_wall) / (2.0 / DT), 2),
        "stage_wall_s": {k: round(v, 2) for k, v in stage.items()},
        "drain_wall_s": round(drain_wall, 2),
        "async_solve_wall_s": round(solve_wall, 2),
        "n_solves": len(server.fusion_log),
        "coalesced_solves": server.coalesced_solves,
        "keyframes": counts["kf"],
        "detect_ms_per_keyframe": round(
            1e3 * stage["detect"] / max(counts["kf"], 1), 1),
        "fusion_candidates": counts["cand"],
        "fusions_accepted": counts["fused"],
        "server_submaps": len(server.submaps),
        "ate_m": [round(a, 4) for a in ates],
        "union_watermark": [s[0] for s in sat],
        "dropped_union_blocks": [s[1] for s in sat],
        "dropped_submap_rollovers": [m.dropped_submaps for m in mappers],
        "server_dropped_constraints": int(server.constraints.num_dropped()),
        "dropped_keyframes": detector.dropped_keyframes,
        "live_mesh_updates": serve_counts["updates"],
        "live_chunks_remeshed": sum(
            m.chunks_remeshed for mp in mappers for m in mp._meshers.values()),
        "final_mesh_tris": int(verts.shape[0]),
        "final_mesh_wall_s": round(mesh_wall, 2),
        "surface_err_p90_m": round(float(np.quantile(sdf, 0.9)), 4),
        "backend": jax.default_backend(),
        "optimize_errors": server.optimize_errors + det_errors,
        "wire_bandwidth": bw_art,
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(art) + "\n")
    print(json.dumps(art))
    ok = (max(ates) < 0.25 and not server.optimize_errors
          and not det_errors
          and counts["fused"] > 0 and verts.shape[0] > 1000)
    print("ENDURANCE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
