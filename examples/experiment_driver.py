"""Scripted multi-robot experiment over the bus — the reference's shell
orchestration reproduced end to end:

  1. toggle mapping ON for every robot   (scripts/start_mapping.sh:2-5)
  2. robots map while the server fuses   (run_experiment_cvg.launch)
  3. finish_map on every robot           (finish_experiment.sh:3-4)
  4. get_final_global_mesh → PLY         (finish_experiment.sh:5)
  5. get_pose_history → TUM trajectory   (finish_experiment.sh:6)

Robots run in their own OS processes over the native broker and start
with mapping DISABLED — frames only integrate after the toggle, as the
reference tsdf clients do.

Run: python examples/experiment_driver.py
"""

import os
import socket
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def robot_main(port: int, client_id: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from coxgraph_tpu.comm import bus as cbus
    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.frontends import replay
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import tsdf as tsdf_ops
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.server.client_interface import InProcessClient

    spec = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                            max_blocks=512, truncation=0.3)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=128),
        intrinsics=syn.PinholeIntrinsics().scaled(0.125),
        max_submaps=4, max_history=64, submap_interval=0.5)
    replays, _, _ = replay.two_robot_experiment(
        n_frames=10, intr=cfg.intrinsics, dt=0.1, drift=False)

    robot = InProcessClient(client_id, cfg, sm.create_mapper(cfg))
    svc = cbus.ClientService(port, robot, spec)
    mapper = sm.HostMapper(cfg, robot.state)
    robot.mapper = mapper
    # mapping starts DISABLED until the driver's toggle_mapping arrives
    robot.toggle_mapping(False)

    frames = list(replays[client_id])
    i = 0
    deadline = time.time() + 600
    while time.time() < deadline:
        svc.step(timeout_ms=20)          # serve toggles / submap RPCs
        if robot.finished:
            continue                     # keep serving until shutdown
        if robot.mapping_enabled and i < len(frames):
            f = frames[i]
            mapper.step(f.depth, f.color, f.T_odom_cam, f.t)
            robot.state = mapper.state
            svc.publish_timeline()
            i += 1


def main() -> None:
    import multiprocessing as mp

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from coxgraph_tpu.comm import bus as cbus
    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.frontends import replay
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.solver import pose_graph as pg

    broker = cbus.Broker(port)
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=robot_main, args=(port, cid))
             for cid in range(2)]
    for p in procs:
        p.start()

    spec = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                            max_blocks=512, truncation=0.3)
    proxies = [cbus.RemoteClient(port, client_id=cid, spec=spec)
               for cid in range(2)]
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=spec, max_submaps=16,
                        solver=pg.SolverConfig(iterations=5)),
        proxies)
    vio = cbus.RemoteVIO(port)

    # node_evaluator ["cpu","mem"] sampling for the server node
    # (evaluation_config.yaml:1-2): periodic samples for the whole
    # experiment, summarized at the end next to the bandwidth log
    server._resources.start(rate_hz=2.0)

    # --- start_mapping.sh: toggle every robot's mapper ON ----------------
    # retry until each robot's service is registered (imports take a while)
    for cid in range(2):
        while not vio.toggle_mapping(cid, True):
            time.sleep(0.5)
    print("mapping toggled on", flush=True)

    # --- run: wait for coverage, then fuse like the loop detector would --
    t_last = time.time()
    while True:
        tls = [p.timeline() for p in proxies]
        if all(t1 >= 0.9 - 1e-5 for _, t1 in tls):   # float32 timelines
            break
        if time.time() - t_last > 10:
            print("timelines:", tls, flush=True)
            t_last = time.time()
        time.sleep(0.2)
        server.time_line_update()
    _, trajs, X = replay.two_robot_experiment(n_frames=10, dt=0.1,
                                              drift=False)
    T_ta_tb = geo.relative(trajs[0][5], trajs[1][5])
    ok = server.map_fusion(fs.MapFusionMsg(
        from_client=0, from_time=0.5, to_client=1, to_time=0.5,
        T_from_to=T_ta_tb))
    assert ok, "fusion failed"

    # --- finish_experiment.sh ---------------------------------------------
    for cid in range(2):
        assert vio.finish_map(cid)
    print("maps finished", flush=True)

    outdir = tempfile.mkdtemp(prefix="coxgraph_experiment_")
    ply = os.path.join(outdir, "coxgraph_server_mesh.ply")
    merged, verts, cols = server.get_final_global_mesh(ply)
    print(f"global mesh: {verts.shape[0]} tris → {ply}", flush=True)
    assert verts.shape[0] > 200

    # finish_experiment.sh:6 — FilePath get_pose_history writes all
    # clients' global-frame trajectories into one TUM file
    traj = server.save_pose_history(outdir)
    with open(traj) as fh:
        n_rows = fh.read().count("\n")
    print(f"pose history: {n_rows} poses → {traj}", flush=True)
    assert n_rows > 10

    err = geo.se3_log(geo.relative(server.T_G_cli[1], X[1]))
    e = float(np.linalg.norm(np.asarray(err)))
    print(f"client-frame alignment error: {e:.3f}", flush=True)
    res = server._resources.stop()
    print(f"server node resources: {res}", flush=True)
    assert res["n"] > 0

    for p in procs:
        p.terminate()
        p.join()
    broker.close()
    assert e < 0.35, e
    print("EXPERIMENT DRIVER PASS", flush=True)


if __name__ == "__main__":
    main()
