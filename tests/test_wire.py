import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.comm import wire
from coxgraph_tpu.core import geometry as geo, voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import tsdf as tsdf_ops

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=1024, truncation=0.3)


def make_layer():
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(3, scene.room_center, radius=2.5,
                                sweep=jnp.pi / 3)
    layer = vx.create_tsdf_layer(SPEC)
    cfg = tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512)
    intr = syn.PinholeIntrinsics().scaled(0.125)
    for i in range(3):
        d, c = syn.render_depth(scene, intr, traj[i])
        layer = tsdf_ops.integrate_frame(SPEC, cfg, intr, layer, d, c,
                                         traj[i])
    return layer


def test_layer_roundtrip_and_compression():
    layer = make_layer()
    buf = wire.serialize_layer(SPEC, layer)
    raw_bytes = vx.memory_size_bytes(layer)
    ratio = raw_bytes / len(buf)
    assert ratio > 5.0, f"compression ratio only {ratio:.1f}x"

    out = wire.deserialize_layer(SPEC, buf)
    assert int(out.num_blocks) == int(layer.num_blocks)
    # compare per original block
    n = int(layer.num_blocks)
    slots = np.asarray(vx.lookup_block(SPEC, out, layer.block_coords[:n]))
    assert (slots >= 0).all()
    w_in = np.asarray(layer.weight[:n])
    w_out = np.asarray(out.weight)[slots]
    s_in = np.asarray(layer.sdf[:n])
    s_out = np.asarray(out.sdf)[slots]
    obs = w_in > 1e-6
    # quantization error bounds: sdf ≤ trunc/32000; weights are 16-bit
    # log-quantized (coarser at the small end — they are confidence values)
    assert np.abs(s_out - s_in)[obs].max() < SPEC.truncation / 16000
    assert np.abs(w_out - w_in)[obs].max() < 1e-3  # near-zero weights coarse
    sig = w_in > 1e-3
    # log-quantization step ≈ (1+w)·ln(1e4+1)/65535 ⇒ atol 2e-4 at w≈1
    np.testing.assert_allclose(w_out[sig], w_in[sig], rtol=0.05, atol=2e-4)
    # unobserved voxels are reset to defaults
    assert (w_out[~obs] == 0).all()
    c_in = np.asarray(layer.color[:n]).reshape(n, 3, -1)   # planar rows
    c_out = np.asarray(out.color)[slots].reshape(n, 3, -1)
    assert np.abs(c_out - c_in).max(axis=1)[obs].max() < 1 / 250


def test_submap_msg_roundtrip():
    layer = make_layer()
    T = geo.from_xyzyaw(jnp.array([1.0, 2.0, 0.5, 0.3]))
    hs = np.array([0.1, 0.2, 0.3])
    hp = jnp.tile(geo.identity()[None], (3, 1))
    buf = wire.pack_submap_msg(SPEC, 2, 5, layer, T, 0.1, 0.3, hs, hp)
    msg = wire.unpack_submap_msg(SPEC, buf)
    assert msg["client_id"] == 2 and msg["submap_id"] == 5
    np.testing.assert_allclose(np.asarray(msg["T_cli_submap"]),
                               np.asarray(T), atol=1e-6)
    np.testing.assert_allclose(msg["hist_stamps"], hs)
    assert int(msg["layer"].num_blocks) == int(layer.num_blocks)


def test_bad_buffer_rejected():
    try:
        wire.deserialize_layer(SPEC, b"garbage-not-a-layer")
        assert False
    except ValueError:
        pass


def test_bandwidth_log():
    log = wire.BandwidthLog()
    log.record("submap_0_1", 12345, 0.0)
    log.record("submap_0_2", 55555, 1.0)
    assert log.total_bytes() == 67900
    assert "2 transfers" in log.summary()


def test_map_transform_roundtrip():
    from coxgraph_tpu.comm import wire
    pose = np.array([1, 0, 0, 0, 0.5, -1.0, 2.0], np.float32)
    buf = wire.pack_map_transform(12.25, 7, pose)
    stamp, sid, out = wire.unpack_map_transform(buf)
    assert stamp == 12.25 and sid == 7
    np.testing.assert_allclose(out, pose)


def test_submap_msg_with_mesh_pointcloud():
    """Optional recover-mode cloud attachment (ClientSubmap.msg:1-3
    mesh_pointclouds; attached at coxgraph_client.h:162-165)."""
    layer = make_layer()
    pts = np.random.RandomState(0).randn(17, 3).astype(np.float32)
    cols = (np.random.RandomState(1).rand(17, 3) * 255).astype(np.uint8)
    buf = wire.pack_submap_msg(SPEC, 1, 2, layer, np.zeros(7, np.float32),
                               0.0, 1.0, np.zeros(3), np.zeros((3, 7)),
                               mesh_points=pts, mesh_colors=cols)
    d = wire.unpack_submap_msg(SPEC, buf)
    np.testing.assert_allclose(d["mesh_points"], pts)
    np.testing.assert_array_equal(d["mesh_colors"], cols)
    assert int(d["layer"].num_blocks) == int(layer.num_blocks)
    # absent cloud stays None
    buf2 = wire.pack_submap_msg(SPEC, 1, 2, layer, np.zeros(7, np.float32),
                                0.0, 1.0, np.zeros(3), np.zeros((3, 7)))
    d2 = wire.unpack_submap_msg(SPEC, buf2)
    assert d2["mesh_points"] is None and d2["mesh_colors"] is None
