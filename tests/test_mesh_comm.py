"""Mesh-with-history transport (comm/mesh_comm) — MeshConverter +
TsdfRecover parity (SURVEY.md §2.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from coxgraph_tpu.comm import mesh_comm, wire
from coxgraph_tpu.core import voxel as vx
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import mesh as mesh_ops
from coxgraph_tpu.ops import tsdf as tsdf_ops

INTR = syn.PinholeIntrinsics().scaled(0.125)  # 80x60
SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=32,
                        max_blocks=2048, truncation=0.3)
CFG = tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=1024)

_CACHE = {}


def build_submap(n_frames=6):
    if n_frames in _CACHE:
        return _CACHE[n_frames]
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(n_frames, scene.room_center, radius=2.5,
                                sweep=0.8 * jnp.pi)
    layer = vx.create_tsdf_layer(SPEC)
    stamps = []
    for i in range(n_frames):
        depth, color = syn.render_depth(scene, INTR, traj[i])
        layer = tsdf_ops.integrate_frame(SPEC, CFG, INTR, layer, depth,
                                         color, traj[i])
        stamps.append(0.05 * i)
    _CACHE[n_frames] = (scene, layer, np.asarray(stamps), np.asarray(traj))
    return _CACHE[n_frames]


def test_roundtrip_pack_unpack():
    _, layer, stamps, poses = build_submap(6)
    msg = mesh_comm.encode_submap_mesh(SPEC, layer, stamps, poses, INTR,
                                       client_id=1, submap_id=2,
                                       keyframe_stride=2)
    assert msg.faces.shape[0] > 100
    buf = msg.pack()
    assert len(buf) == msg.nbytes
    back = mesh_comm.MeshWithHistory.unpack(buf)
    assert back.client_id == 1 and back.submap_id == 2
    np.testing.assert_array_equal(back.qverts, msg.qverts)
    np.testing.assert_array_equal(back.faces, msg.faces)
    np.testing.assert_array_equal(back.frame_runs, msg.frame_runs)
    np.testing.assert_allclose(back.kf_poses, msg.kf_poses)
    np.testing.assert_allclose(back.vertices(), msg.vertices(), atol=1e-6)
    # quantization is lossless to within one wire LSB
    assert msg.scale < SPEC.voxel_size


def test_decode_buckets_and_interpolates():
    _, layer, stamps, poses = build_submap(6)
    msg = mesh_comm.encode_submap_mesh(SPEC, layer, stamps, poses, INTR,
                                       keyframe_stride=2)
    clouds = mesh_comm.decode_to_pointclouds(
        msg, interpolate_voxel_size=0.05)
    assert len(clouds) >= 2          # several keyframes observe the scene
    n_pts = sum(p.shape[0] for p, _ in clouds.values())
    # edge/centroid interpolation emits more points than raw vertices
    assert n_pts > msg.faces.shape[0] * 3
    total_front = 0
    for k, (pts, cols) in clouds.items():
        total_front += int((pts[:, 2] > 0).sum())
        assert cols.shape == pts.shape
    # most points lie in front of their keyframe camera (faces outside all
    # frusta fall back to nearest-keyframe and may sit behind it)
    assert total_front / n_pts > 0.75


@pytest.mark.parametrize("method", ["projective", "merged"])
def test_recover_layer_matches_surface(method):
    """Both re-integration methods the reference configures per node
    (the per-node ``method`` param; tsdf_recover.yaml:6 uses "fast") rebuild a TSDF whose zero crossing lies on the
    true scene surface."""
    scene, layer, stamps, poses = build_submap(6)
    msg = mesh_comm.encode_submap_mesh(SPEC, layer, stamps, poses, INTR,
                                       keyframe_stride=2)
    rec = mesh_comm.recover_layer(SPEC, CFG, INTR, msg, method=method)
    assert int(rec.num_blocks) > 10
    verts, _ = mesh_ops.extract_mesh(SPEC, rec, min_weight=1e-4)
    assert verts.shape[0] > 100
    sdf = np.asarray(syn.scene_sdf(scene, jnp.asarray(verts.reshape(-1, 3))))
    assert np.quantile(np.abs(sdf), 0.9) < 2.0 * SPEC.voxel_size


def test_mesh_transport_is_smaller_than_voxel_wire():
    """The bandwidth-saving rationale of the reference's L2 tier
    (tsdf_recover.h:59-99): mesh bytes ≪ voxel-layer bytes."""
    _, layer, stamps, poses = build_submap(6)
    msg = mesh_comm.encode_submap_mesh(SPEC, layer, stamps, poses, INTR,
                                       keyframe_stride=4)
    mesh_bytes = len(msg.pack())
    voxel_bytes = len(wire.serialize_layer(SPEC, layer))
    assert mesh_bytes < 0.5 * voxel_bytes, (mesh_bytes, voxel_bytes)


def test_run_length_observation_history():
    """Per-triangle run-length observation history (VERDICT r2 Missing
    #5 — the reference carries [start,end] frame-index pairs per
    triangle, mesh_converter.h:137-142): runs are valid intervals over
    the keyframe range, multiply-observed faces carry multi-keyframe
    runs, and decode expands each face into EVERY covered keyframe's
    bucket (multi-view re-integration weight)."""
    _, layer, stamps, poses = build_submap(6)
    msg = mesh_comm.encode_submap_mesh(SPEC, layer, stamps, poses, INTR,
                                       keyframe_stride=1)
    K = msg.kf_poses.shape[0]
    runs = msg.frame_runs
    assert runs.shape[1:] == (2, 2)
    live = runs[:, :, 0] != mesh_comm.RUN_SENTINEL
    assert live[:, 0].all()                    # every face has a run
    # valid intervals within the keyframe range
    assert (runs[live][:, 0] <= runs[live][:, 1]).all()
    assert (runs[live][:, 1] < K).all()
    # an orbiting camera observes most surface over several keyframes
    lengths = np.where(live, runs[:, :, 1] - runs[:, :, 0] + 1, 0).sum(1)
    assert (lengths >= 2).mean() > 0.3, lengths.mean()

    # decode: a multi-run face's points land in every covered keyframe
    clouds = mesh_comm.decode_to_pointclouds(msg, interpolate_voxel_size=0.1)
    covered = set()
    for f in range(runs.shape[0]):
        for p in range(runs.shape[1]):
            if runs[f, p, 0] != mesh_comm.RUN_SENTINEL:
                covered.update(range(int(runs[f, p, 0]),
                                     int(runs[f, p, 1]) + 1))
    assert set(clouds) == covered
    # total decoded points exceed a single-keyframe assignment's count
    n_pts = sum(p.shape[0] for p, _ in clouds.values())
    assert n_pts > msg.faces.shape[0] * 3


def test_recover_empty_mesh_is_noop():
    """ADVICE r3: recover_layer(method="merged") on an empty mesh message
    must return an empty layer, not raise on max() of an empty decode."""
    layer = vx.create_tsdf_layer(SPEC)          # nothing integrated
    msg = mesh_comm.encode_submap_mesh(SPEC, layer, np.zeros(1),
                                       np.tile(np.array(
                                           [1, 0, 0, 0, 0, 0, 0],
                                           np.float32), (1, 1)), INTR)
    assert msg.faces.shape[0] == 0
    for method in ("merged", "projective"):
        out = mesh_comm.recover_layer(SPEC, CFG, INTR, msg, method=method)
        assert int(out.num_blocks) == 0


def test_frame_idx_is_chronological_first():
    """ADVICE r3: runs are stored ranked by LENGTH; frame_idx must still
    report the chronologically earliest observation."""
    runs = np.full((3, 2, 2), mesh_comm.RUN_SENTINEL, np.uint16)
    runs[0] = [[5, 9], [1, 1]]       # longest run starts at 5; first obs 1
    runs[1] = [[2, 3], [mesh_comm.RUN_SENTINEL, mesh_comm.RUN_SENTINEL]]
    # face 2: no runs at all → fallback 0
    msg = mesh_comm.MeshWithHistory(
        0, 0, 0.0, 1.0, np.zeros(3, np.float32), 1e-3,
        np.zeros((3, 3), np.uint16), np.zeros((3, 3), np.uint8),
        np.zeros((3, 3), np.uint32), runs,
        np.zeros(10), np.tile(np.array([1, 0, 0, 0, 0, 0, 0],
                                       np.float32), (10, 1)))
    np.testing.assert_array_equal(msg.frame_idx, [1, 2, 0])
