"""ApproximateTime synchronizer (message_filters parity — the reference
client's recover-mode pairing of LayerWithTrajectory + mesh_pointcloud,
coxgraph_client.cpp:16-28)."""

from coxgraph_tpu.comm.sync import ApproximateTimeSynchronizer


def test_pairs_within_slop():
    got = []
    s = ApproximateTimeSynchronizer(["layer", "cloud"], slop=0.05,
                                    callback=lambda a, b: got.append((a, b)))
    assert s.add("layer", 1.00, "L1") == []
    out = s.add("cloud", 1.02, "C1")
    assert len(out) == 1 and out[0][1] == ("L1", "C1")
    assert got == [("L1", "C1")]


def test_unpaired_head_discarded():
    s = ApproximateTimeSynchronizer(["a", "b"], slop=0.05)
    s.add("a", 1.0, "A1")       # will never pair (b starts at 2.0)
    s.add("a", 2.01, "A2")
    out = s.add("b", 2.0, "B1")
    assert len(out) == 1 and out[0][1] == ("A2", "B1")


def test_in_order_and_no_reuse():
    s = ApproximateTimeSynchronizer(["a", "b"], slop=0.1)
    for t in (1.0, 2.0, 3.0):
        s.add("a", t, f"A{t}")
    out = s.add("b", 2.05, "B2") + s.add("b", 3.0, "B3")
    assert [o[1] for o in out] == [("A2.0", "B2"), ("A3.0", "B3")]
    # A1.0 was skipped (older than the first emitted set), never reused
    assert s.add("b", 1.0, "B1") == []


def test_queue_size_bound():
    s = ApproximateTimeSynchronizer(["a", "b"], slop=0.01, queue_size=2)
    for t in (1.0, 2.0, 3.0):
        s.add("a", t, t)
    assert len(s._q["a"]) == 2          # oldest dropped
    out = s.add("b", 1.0, "B")
    assert out == []                     # 1.0 already evicted


def test_three_channels():
    s = ApproximateTimeSynchronizer(["a", "b", "c"], slop=0.1)
    s.add("a", 5.0, "A")
    s.add("b", 5.04, "B")
    out = s.add("c", 4.96, "C")
    assert len(out) == 1 and out[0][1] == ("A", "B", "C")
    assert abs(out[0][0] - 5.0) < 1e-9
