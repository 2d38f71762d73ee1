"""Multi-PROCESS collaborative mapping over the native message bus.

The deployment shape of the reference (one coxgraph_server process + one
coxgraph_client process per robot, wired by ROS) reproduced with this
framework's C++ broker: each robot runs in its own OS process (mapping a
synthetic clip on CPU and serving submaps over the bus); the parent
process runs the fusion server against RemoteClient proxies and produces
the global mesh.

Run: python examples/distributed_demo.py
"""

import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def robot_main(port: int, client_id: int) -> None:
    # each robot process: CPU backend, own mapper, serves the bus
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coxgraph_tpu.comm import bus as cbus
    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.frontends import replay, synthetic as syn
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import tsdf as tsdf_ops
    from coxgraph_tpu.server.client_interface import InProcessClient

    spec = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                            max_blocks=512, truncation=0.3)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=128),
        intrinsics=syn.PinholeIntrinsics().scaled(0.125),
        max_submaps=4, max_history=64, submap_interval=0.5)
    replays, trajs, X = replay.two_robot_experiment(
        n_frames=10, intr=cfg.intrinsics, dt=0.1, drift=False)

    robot = InProcessClient(client_id, cfg, sm.create_mapper(cfg))
    svc = cbus.ClientService(port, robot, spec)
    mapper = sm.HostMapper(cfg, robot.state)
    for frame in replays[client_id]:
        mapper.step(frame.depth, frame.color, frame.T_odom_cam, frame.t)
        robot.state = mapper.state
        svc.publish_timeline()
        svc.step(timeout_ms=0)       # serve any pending server RPC
    # keep serving until the parent finishes
    deadline = time.time() + 120
    while time.time() < deadline:
        svc.step(timeout_ms=100)


def main() -> None:
    import multiprocessing as mp

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from coxgraph_tpu.comm import bus as cbus
    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.frontends import synthetic as syn
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

    # wait for both robots to cover t=0.5 (their second submap)
    print("waiting for robot timelines...", flush=True)
    while True:
        tls = [p.timeline() for p in proxies]
        if all(t1 >= 0.5 for _, t1 in tls):
            break
        time.sleep(0.2)
    print("timelines:", tls, flush=True)

    # inter-robot fusion at t=0.5: true relative transform from the known
    # client-frame offsets (X[1] vs identity), as the reference's external
    # loop detector would provide
    from coxgraph_tpu.frontends import replay
    _, trajs, X = replay.two_robot_experiment(n_frames=10, dt=0.1,
                                              drift=False)
    idx = 5
    T_w_a = trajs[0][idx]
    T_w_b = trajs[1][idx]
    T_ta_tb = geo.relative(T_w_a, T_w_b)
    ok = server.map_fusion(fs.MapFusionMsg(
        from_client=0, from_time=0.5, to_client=1, to_time=0.5,
        T_from_to=T_ta_tb))
    print("fusion accepted:", ok, "server submaps:", len(server.submaps),
          flush=True)
    assert ok

    # alignment check: T_G_cli[1] should recover the true frame offset
    err = geo.se3_log(geo.relative(server.T_G_cli[1], X[1]))
    e = float(jnp.linalg.norm(err))
    print(f"client-frame alignment error: {e:.3f}", flush=True)

    merged, verts, cols = server.get_final_global_mesh()
    print(f"global mesh: {verts.shape[0]} triangles", flush=True)
    assert verts.shape[0] > 200

    for p in procs:
        p.terminate()
        p.join()
    broker.close()
    assert e < 0.35, e
    print("DISTRIBUTED DEMO PASS", flush=True)


if __name__ == "__main__":
    main()
