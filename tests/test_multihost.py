"""Two-process multi-host tier (SURVEY.md §5.8 two-tier fabric, host
half; BASELINE.md 2-host scaling target): jax.distributed bring-up +
the distributed fleet_optimize whose H/b psum reductions cross the
process boundary over GRPC (the DCN stand-in), validated without real
hosts by two CPU processes — the reference's own "multi-node without a
real cluster" recipe (SURVEY.md §4).

Also covers the bus crossing a non-loopback bind (the TCP topics/
services tier between hosts)."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_fleet_optimize(tmp_path):
    port = free_port()
    outs = [str(tmp_path / f"poses_{k}.npy") for k in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(port), str(k), "2", outs[k]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for k in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
    for k, p in enumerate(procs):
        assert p.returncode == 0, f"worker {k} failed:\n{logs[k][-4000:]}"
        assert "WORKER_OK" in logs[k]

    # both processes hold the identical replicated solution
    p0 = np.load(outs[0])
    p1 = np.load(outs[1])
    np.testing.assert_allclose(p0, p1, atol=1e-6)

    # ...which matches a single-process solve of the same problem (the
    # conftest 8-device CPU mesh): DCN reduction ≡ local reduction
    import jax
    from jax.sharding import PartitionSpec as P

    from coxgraph_tpu.parallel import fleet as fl, multihost
    from coxgraph_tpu.solver import pose_graph as pg
    from tests.multihost_problem import CFG, R, S, build_fleet_problem

    mesh = fl.make_robot_mesh(R)
    fleet_np, inter_np = build_fleet_problem()
    fleet = multihost.make_global_pytree(fleet_np, mesh, P("robot"))
    inter = multihost.replicate(inter_np, mesh)
    _, poses_ref = fl.fleet_optimize(CFG, mesh, fleet, inter,
                                     pg.SolverConfig(iterations=8))
    np.testing.assert_allclose(p0, np.asarray(poses_ref), atol=5e-5)

    # and the distributed LM reduced the combined constraint cost (the
    # guarantee accept/reject provides; translation-vs-truth can shift
    # either way when rotation/translation residuals trade off)
    import jax.numpy as jnp

    init = np.asarray(fleet_np.collection.T_odom_submap).reshape(-1, 7)
    lg = fl.globalize_constraints(fleet_np.constraints, S)
    flat = pg.RelPoseConstraints(
        i=lg.i.reshape(-1), j=lg.j.reshape(-1),
        T_meas=lg.T_meas.reshape(-1, 7),
        sqrt_info=lg.sqrt_info.reshape(-1, 6, 6),
        valid=lg.valid.reshape(-1), count=jnp.sum(lg.count))

    def total_cost(P_):
        scfg = pg.SolverConfig()
        return float(pg._total_cost(jnp.asarray(P_), flat, scfg)
                     + pg._total_cost(jnp.asarray(P_), inter_np, scfg))

    assert total_cost(p0) <= total_cost(init) + 1e-6

    # scaling telemetry populated (BASELINE 2-host methodology): every
    # worker reports its warm solve wall and the per-optimize collective
    # payload parsed from the compiled HLO
    import re

    times = [float(re.search(r"WORKER_TIME ([0-9.]+)", lg).group(1))
             for lg in logs]
    comms = [int(re.search(r"WORKER_COMM ([0-9]+)", lg).group(1))
             for lg in logs]
    assert all(t > 0 for t in times)
    assert comms[0] == comms[1] > 0       # same program on both hosts
    # 1-process comparison number for the SAME global problem/mesh size
    import time as _time

    _, warm = fl.fleet_optimize(CFG, mesh, fleet, inter,
                                pg.SolverConfig(iterations=8))
    jax.block_until_ready(warm)
    t0 = _time.perf_counter()
    _, warm = fl.fleet_optimize(CFG, mesh, fleet, inter,
                                pg.SolverConfig(iterations=8))
    jax.block_until_ready(warm)
    t1p = _time.perf_counter() - t0
    comm1 = multihost.fleet_optimize_comm_bytes(
        CFG, mesh, fleet, inter, pg.SolverConfig(iterations=8))
    assert comm1["per_optimize"] == comms[0]   # same HLO either way
    print(f"[scaling] 1-process warm {t1p:.4f}s; 2-process warm "
          f"{max(times):.4f}s; efficiency {t1p / max(times):.2f}; "
          f"per-optimize collective payload {comms[0]} B")


def test_bus_cross_host_bind():
    """BusClient reaching a broker through the machine's non-loopback
    address — the topics/services tier crossing hosts (ROS-over-network
    parity). Skipped when the sandbox exposes no non-loopback interface."""
    from coxgraph_tpu.comm import bus as cbus

    host = socket.gethostbyname(socket.gethostname())
    if host.startswith("127."):
        candidates = socket.getaddrinfo(socket.gethostname(), None,
                                        socket.AF_INET)
        addrs = {c[4][0] for c in candidates if not
                 c[4][0].startswith("127.")}
        if not addrs:
            pytest.skip("no non-loopback interface in this sandbox")
        host = sorted(addrs)[0]

    port = free_port()
    b = cbus.Broker(port)
    try:
        pub = cbus.BusClient(port, host=host)     # non-loopback route
        sub = cbus.BusClient(port, host=host)
        sub.subscribe("xhost")
        time.sleep(0.05)
        pub.publish("xhost", b"over-the-wire")
        msg = sub.poll(2000)
        assert msg == ("pub", "xhost", b"over-the-wire")
        pub.close()
        sub.close()
    finally:
        b.close()


def test_collective_payload_bytes_tuple_and_async():
    """ADVICE r3: XLA's AllReduceCombiner merges psums into tuple-shaped
    collectives and async forms split into -start/-done pairs; the HLO
    accounting must count both (members summed, -done not re-counted)."""
    from coxgraph_tpu.parallel.multihost import collective_payload_bytes

    hlo = """
      %ar.1 = f32[64]{0} all-reduce(%x), replica_groups={}
      %ar.2 = (f32[64]{0:T(256)}, f32[12,3]{1,0}) all-reduce(%a, %b)
      %ars = f32[8]{0} all-reduce-start(%y)
      %ard = f32[8]{0} all-reduce-done(%ars)
      %ag = bf16[128]{0} all-gather(%z)
      %t = (f32[64]{0}) tuple(%all-reduce.3)
    """
    out = collective_payload_bytes(hlo)
    assert out["all-reduce"] == 64 * 4 + (64 * 4 + 36 * 4) + 8 * 4
    assert out["all-gather"] == 128 * 2
