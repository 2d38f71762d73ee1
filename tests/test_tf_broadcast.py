"""Timer-driven TF broadcast (comm/tf_broadcast.py) — push-rate parity
with the reference's TfPublisher 10 ms timer (tf_publisher.h:38-100) and
the server's 100 Hz T_G_Client broadcast (global_tf_controller.h:122)."""

import socket
import time

import numpy as np
import pytest

from coxgraph_tpu.comm import bus as cbus, wire
from coxgraph_tpu.comm.tf_broadcast import TfBroadcaster, TfListener


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


def test_tf_set_wire_roundtrip():
    frames = {("mission_g", "client0_odom"): np.arange(7, dtype=np.float32),
              ("odom", "cam"): np.ones(7, np.float32)}
    stamp, out = wire.unpack_tf_set(wire.pack_tf_set(123.25, frames))
    assert stamp == 123.25
    assert set(out) == set(frames)
    for k in frames:
        np.testing.assert_array_equal(out[k], frames[k])


def test_broadcaster_pushes_at_rate_and_listener_caches(broker):
    tick = {"n": 0}

    def source():
        tick["n"] += 1
        return {("mission_g", "client1_odom"):
                np.array([1, 0, 0, 0, tick["n"], 0, 0], np.float32)}

    bc = TfBroadcaster(broker, source, rate_hz=100.0)
    try:
        lis = TfListener(broker)
        deadline = time.time() + 5.0
        while time.time() < deadline and bc.n_published < 10:
            time.sleep(0.01)
        assert bc.n_published >= 10      # ≥10 pushes within the window
        assert lis.spin_once(1000)
        pose = lis.lookup("mission_g", "client1_odom")
        assert pose is not None and pose[4] >= 1
        # snapshots keep flowing — the cache advances
        v0 = pose[4]
        time.sleep(0.2)
        lis.spin_once(1000)
        assert lis.lookup("mission_g", "client1_odom")[4] > v0
        lis.close()
    finally:
        bc.close()


def test_late_listener_gets_latched_snapshot(broker):
    frames = {("odom", "sensor"): np.ones(7, np.float32)}
    bc = TfBroadcaster(broker, lambda: frames, rate_hz=50.0)
    try:
        time.sleep(0.1)
        bc.close()                        # broadcaster long gone...
        late = TfListener(broker)         # ...late consumer still sees it
        assert late.spin_once(2000)
        np.testing.assert_array_equal(late.lookup("odom", "sensor"),
                                      frames[("odom", "sensor")])
        late.close()
    finally:
        pass


def test_empty_source_publishes_nothing(broker):
    bc = TfBroadcaster(broker, lambda: {}, rate_hz=200.0)
    try:
        time.sleep(0.1)
        assert bc.n_published == 0        # out-of-control server shape
    finally:
        bc.close()
