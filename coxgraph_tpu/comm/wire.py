"""Submap wire format + bandwidth accounting — the host-level transport
tier of the two-tier fabric (SURVEY.md §5.8): ICI collectives handle dense
math inside jit; this layer plays the role of the reference's ROS
topics/services for submap hand-off between robot pipelines and the fused
global solve (msgFromCliSubmap/cliSubmapFromMsg, msg_converter.h:46-118,
with sizeOfMsg bandwidth accounting :149-167 via EvalDataPublisher).

Encoding is the native C++ serializer (occupancy bitmap + 7-byte quantized
voxels — the same bandwidth-saving job as the reference's mesh_with_history
compression, without the lossy mesh round trip)."""

from __future__ import annotations

import ctypes
import dataclasses
import struct
import time
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import voxel as vx
from ..native import lib

_HDR = struct.Struct("<III dd")  # client_id, submap_id, n_hist, t0, t1


def serialize_layer(spec: vx.VoxelGridSpec, layer: vx.TsdfLayer) -> bytes:
    """Encode the live blocks of a layer → bytes."""
    from ..utils.hostops import bucket_slice

    L = lib()
    n = int(layer.num_blocks)
    coords = np.ascontiguousarray(bucket_slice(layer.block_coords, n),
                                  np.int32)
    sdf = np.ascontiguousarray(bucket_slice(layer.sdf, n), np.float32)
    w = np.ascontiguousarray(bucket_slice(layer.weight, n), np.float32)
    c = np.ascontiguousarray(bucket_slice(layer.color, n), np.float32)
    vps = spec.voxels_per_side
    cap = L.cox_serialized_bound(n, vps)
    out = np.empty(cap, np.uint8)
    written = L.cox_serialize(
        coords.ctypes.data, sdf.ctypes.data, w.ctypes.data, c.ctypes.data,
        n, vps, ctypes.c_float(spec.truncation),
        ctypes.c_float(spec.voxel_size), out.ctypes.data, cap)
    if written == 0:
        raise RuntimeError("serialization failed")
    return out[:written].tobytes()


def deserialize_layer(spec: vx.VoxelGridSpec, buf: bytes) -> vx.TsdfLayer:
    """Decode bytes → a fresh TsdfLayer (allocating the decoded blocks)."""
    L = lib()
    nb = ctypes.c_uint32()
    vps = ctypes.c_uint32()
    trunc = ctypes.c_float()
    vsz = ctypes.c_float()
    b = np.frombuffer(buf, np.uint8)
    rc = L.cox_peek(b.ctypes.data, len(buf), ctypes.byref(nb),
                    ctypes.byref(vps), ctypes.byref(trunc),
                    ctypes.byref(vsz))
    if rc != 0:
        raise ValueError(f"bad wire buffer (rc={rc})")
    n, v = nb.value, vps.value
    assert v == spec.voxels_per_side, "voxels_per_side mismatch"
    assert abs(vsz.value - spec.voxel_size) < 1e-6, "voxel_size mismatch"
    coords = np.empty((n, 3), np.int32)
    sdf = np.empty((n, v * v * v), np.float32)   # flat rows, like the pool
    w = np.empty((n, v * v * v), np.float32)
    c = np.empty((n, 3 * v * v * v), np.float32)  # planar channel rows
    rc = L.cox_deserialize(b.ctypes.data, len(buf), coords.ctypes.data,
                           sdf.ctypes.data, w.ctypes.data, c.ctypes.data)
    if rc != 0:
        raise ValueError(f"deserialize failed (rc={rc})")

    layer = vx.create_tsdf_layer(spec)
    layer = vx.allocate_blocks(spec, layer, jnp.asarray(coords))
    # decoded block order == allocation order is NOT guaranteed by the
    # allocator (it assigns grid-scan order); scatter via lookup instead
    slots = vx.lookup_block(spec, layer, jnp.asarray(coords))
    slots_np = np.asarray(slots)
    assert (slots_np >= 0).all()
    return dataclasses.replace(
        layer,
        sdf=layer.sdf.at[slots_np].set(jnp.asarray(sdf)),
        weight=layer.weight.at[slots_np].set(jnp.asarray(w)),
        color=layer.color.at[slots_np].set(jnp.asarray(c)),
        block_coords=layer.block_coords.at[slots_np].set(
            jnp.asarray(coords)),
    )


@dataclasses.dataclass
class BandwidthEvent:
    """Per-transfer record (node_evaluator/Bandwidth equivalent,
    eval_data_publisher.h:23-31)."""

    name: str
    n_bytes: int
    t_pub: float
    t_recv: float


class BandwidthLog:
    def __init__(self):
        self.events: List[BandwidthEvent] = []

    def record(self, name: str, n_bytes: int, t_pub: float) -> None:
        self.events.append(BandwidthEvent(name, n_bytes, t_pub, time.time()))

    def total_bytes(self) -> int:
        return sum(e.n_bytes for e in self.events)

    def summary(self) -> str:
        mb = self.total_bytes() / 1e6
        return f"{len(self.events)} transfers, {mb:.2f} MB"


def pack_submap_msg(spec: vx.VoxelGridSpec, client_id: int, submap_id: int,
                    layer: vx.TsdfLayer, T_cli_submap, t0: float, t1: float,
                    hist_stamps: np.ndarray, hist_poses,
                    mesh_points=None, mesh_colors=None) -> bytes:
    """Full ClientSubmap message: header + pose + history + length-prefixed
    encoded layer + optional submap-frame mesh pointcloud
    (coxgraph_msgs/ClientSubmap.msg equivalent incl. its mesh_pointclouds
    field, ClientSubmap.msg:1-3 — the recover-mode cloud the client
    attaches to the active submap, coxgraph_client.h:162-165)."""
    hs = np.asarray(hist_stamps, np.float64)
    hp = np.asarray(hist_poses, np.float32).reshape(-1, 7)
    hdr = _HDR.pack(client_id, submap_id, len(hs), t0, t1)
    pose = np.asarray(T_cli_submap, np.float32).tobytes()
    lay = serialize_layer(spec, layer)
    if mesh_points is None:
        cloud = struct.pack("<I", 0)
    else:
        pts = np.ascontiguousarray(mesh_points, np.float32).reshape(-1, 3)
        cols = (np.full((pts.shape[0], 3), 128, np.uint8)
                if mesh_colors is None
                else np.ascontiguousarray(mesh_colors,
                                          np.uint8).reshape(-1, 3))
        cloud = (struct.pack("<I", pts.shape[0]) + pts.tobytes()
                 + cols.tobytes())
    return (hdr + pose + hs.tobytes() + hp.tobytes()
            + struct.pack("<I", len(lay)) + lay + cloud)


def unpack_submap_msg(spec: vx.VoxelGridSpec, buf: bytes):
    cid, sid, n_hist, t0, t1 = _HDR.unpack_from(buf, 0)
    off = _HDR.size
    pose = jnp.asarray(np.frombuffer(buf, np.float32, 7, off).copy())
    off += 28
    hs = np.frombuffer(buf, np.float64, n_hist, off).copy()
    off += 8 * n_hist
    hp = jnp.asarray(
        np.frombuffer(buf, np.float32, 7 * n_hist, off).reshape(n_hist, 7)
        .copy())
    off += 28 * n_hist
    (lay_len,) = struct.unpack_from("<I", buf, off)
    off += 4
    layer = deserialize_layer(spec, buf[off:off + lay_len])
    off += lay_len
    (n_pts,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = cols = None
    if n_pts:
        pts = np.frombuffer(buf, np.float32, 3 * n_pts, off).reshape(
            n_pts, 3).copy()
        off += 12 * n_pts
        cols = np.frombuffer(buf, np.uint8, 3 * n_pts, off).reshape(
            n_pts, 3).copy()
    return dict(client_id=cid, submap_id=sid, t0=t0, t1=t1,
                T_cli_submap=pose, hist_stamps=hs, hist_poses=hp,
                layer=layer, mesh_points=pts, mesh_colors=cols)


_MAP_TF = struct.Struct("<dh")


def pack_map_transform(stamp: float, submap_id: int, pose7) -> bytes:
    """MapTransform message: stamped optimized submap pose the server
    broadcasts back to a client (coxgraph_msgs/MapTransform.msg:1-4,
    published per submap by ClientHandler's sm_pose_tf_pub_,
    client_handler.cpp:60)."""
    return (_MAP_TF.pack(stamp, submap_id)
            + np.asarray(pose7, np.float32).tobytes())


def unpack_map_transform(buf: bytes):
    stamp, sid = _MAP_TF.unpack_from(buf, 0)
    pose = np.frombuffer(buf, np.float32, 7, _MAP_TF.size).copy()
    return stamp, sid, pose


def pack_tf_set(stamp: float, frames: dict) -> bytes:
    """One stamped TF-tree snapshot {(parent, child): pose7} — the wire
    body of the timer-driven TF broadcast (the reference's tf2 tree fed
    by TfPublisher at 100 Hz, tf_publisher.h:38-40,
    global_tf_controller.h:122)."""
    parts = [struct.pack("<dI", stamp, len(frames))]
    for (parent, child), pose in frames.items():
        p = parent.encode()
        c = child.encode()
        parts.append(struct.pack("<HH", len(p), len(c)) + p + c
                     + np.asarray(pose, np.float32).tobytes())
    return b"".join(parts)


def unpack_tf_set(buf: bytes):
    """→ (stamp, {(parent, child): pose7 np.float32})."""
    stamp, n = struct.unpack_from("<dI", buf, 0)
    off = 12
    out = {}
    for _ in range(n):
        lp, lc = struct.unpack_from("<HH", buf, off)
        off += 4
        parent = buf[off:off + lp].decode()
        off += lp
        child = buf[off:off + lc].decode()
        off += lc
        out[(parent, child)] = np.frombuffer(buf, np.float32, 7, off).copy()
        off += 28
    return stamp, out
