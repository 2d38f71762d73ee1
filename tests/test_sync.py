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


def test_recover_mode_pairing_end_to_end():
    """The reference client's recover mode pairs (LayerWithTrajectory,
    mesh_pointcloud) with ApproximateTime (coxgraph_client.cpp:16-28).
    Here: submap wire msgs and mesh msgs stream with jittered stamps; the
    synchronizer must emit id-consistent pairs and drop the straggler."""
    import numpy as np

    from coxgraph_tpu.comm import mesh_comm, wire
    from tests.test_mesh_comm import build_submap, SPEC, INTR

    scene, layer, stamps, poses = build_submap(6)
    sync = ApproximateTimeSynchronizer(["tsdf_map_out", "mesh_pointcloud"],
                                       slop=0.02)
    pairs = []
    for sid, t in ((0, 10.0), (1, 20.0), (2, 30.0)):
        lay_buf = wire.pack_submap_msg(SPEC, 0, sid, layer,
                                       poses[0], t - 1, t, stamps, poses)
        mesh_buf = mesh_comm.encode_submap_mesh(
            SPEC, layer, stamps, poses, INTR, client_id=0,
            submap_id=sid).pack()
        pairs += sync.add("tsdf_map_out", t, lay_buf)
        if sid == 2:
            continue                     # straggler: no matching cloud
        pairs += sync.add("mesh_pointcloud", t + 0.015, mesh_buf)

    assert len(pairs) == 2
    for _, (lay_buf, mesh_buf) in pairs:
        lay = wire.unpack_submap_msg(SPEC, lay_buf)
        m = mesh_comm.MeshWithHistory.unpack(mesh_buf)
        assert lay["submap_id"] == m.submap_id
        assert int(lay["layer"].num_blocks) > 0 and m.faces.shape[0] > 0
