"""TSDF → triangle mesh extraction — replaces voxblox MeshIntegrator /
MeshLayer (reference call sites: common.h:38, map_server.cpp:123-130,
server_visualizer.cpp:67-121).

The TPU design uses **marching tetrahedra** over voxel cells: each cubic
cell between 8 voxel centers is split into 6 tetrahedra sharing the main
diagonal; each tetrahedron independently emits 0/1/2 triangles from a
16-entry case table generated programmatically at import (no hand-copied
marching-cubes tables). All tetrahedra across all blocks are processed as
one dense masked batch — ideal for the VPU — with fixed-capacity output;
compaction happens on the host at export time (meshing is the reference's
1 Hz visualization path, not the frame hot loop).

Cross-block cell corners are fetched through the block-index grid with the
same voxel_lookup gather as interior ones, so boundary cells stitch
seamlessly.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import voxel as vx

Array = jax.Array

# Cube corner offsets (x, y, z), the 6-tetrahedra decomposition around the
# main diagonal c0-c6, and the tet edge list.
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.int32,
)
_TETS = np.array(
    [
        [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
        [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
    ],
    dtype=np.int32,
)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)


def _build_tet_table() -> Tuple[np.ndarray, np.ndarray]:
    """Generate the marching-tetrahedra case table.

    Returns (tri_edges (16, 2, 3) int32 edge ids into _TET_EDGES with -1
    padding, n_tris (16,) int32). Case bit i set ⇔ sdf at tet vertex i < 0.
    """
    edge_of_pair = -np.ones((4, 4), dtype=np.int32)
    for e, (a, b) in enumerate(_TET_EDGES):
        edge_of_pair[a, b] = edge_of_pair[b, a] = e

    tri_edges = -np.ones((16, 2, 3), dtype=np.int32)
    n_tris = np.zeros((16,), dtype=np.int32)
    for case in range(16):
        neg = [v for v in range(4) if case & (1 << v)]
        pos = [v for v in range(4) if v not in neg]
        if len(neg) in (1, 3):
            iso = neg[0] if len(neg) == 1 else pos[0]
            others = [v for v in range(4) if v != iso]
            es = [edge_of_pair[iso, o] for o in others]
            tri_edges[case, 0] = es
            n_tris[case] = 1
        elif len(neg) == 2:
            a, b = neg
            c, d = pos
            # quad ring: (a,c) (a,d) (b,d) (b,c) — consecutive edges share
            # a tet vertex, so the quad is planar-ring ordered
            e0, e1, e2, e3 = (
                edge_of_pair[a, c], edge_of_pair[a, d],
                edge_of_pair[b, d], edge_of_pair[b, c],
            )
            tri_edges[case, 0] = [e0, e1, e2]
            tri_edges[case, 1] = [e0, e2, e3]
            n_tris[case] = 2
    return tri_edges, n_tris


_TRI_EDGES_TABLE, _N_TRIS_TABLE = _build_tet_table()


@partial(jax.jit, static_argnums=(0, 3))
def mesh_block_chunk(spec: vx.VoxelGridSpec, layer: vx.TsdfLayer,
                     slots: Array, min_weight: float = 1e-4):
    """Extract triangles for a chunk of pool slots.

    slots: (C,) int32 pool slots (may include dead slots ≥ num_blocks —
    they emit nothing). Returns (verts (cap,3,3) f32, colors (cap,3,3) f32,
    n_valid () int32) with cap = C·v³·3 — triangles compacted to the front
    on device so only real data crosses the host link.
    """
    v = spec.voxels_per_side
    coords = layer.block_coords[slots]                      # (C,3)
    live = slots < layer.num_blocks

    # corner grid: global voxel index of each of (v+1)³ corners
    r = jnp.arange(v + 1, dtype=jnp.int32)
    ii, jj, kk = jnp.meshgrid(r, r, r, indexing="ij")
    corner_local = jnp.stack([ii, jj, kk], axis=-1)          # (v+1,)³,3
    gvox = coords[:, None, None, None, :] * v + corner_local  # (C,v+1,v+1,v+1,3)
    sdf, w, ok = vx.voxel_lookup(spec, layer, gvox)
    ok = ok & (w > min_weight) & live[:, None, None, None]
    # corner world positions (voxel centers)
    cpos = (gvox.astype(jnp.float32) + 0.5) * spec.voxel_size
    # corner colors
    b, l = vx.voxel_to_block(spec, gvox)
    bidx = jnp.maximum(vx.lookup_block(spec, layer, b), 0)
    ccol = layer.color[bidx, l[..., 0], l[..., 1], l[..., 2]]

    # gather the 8 cube corners for each of v³ cells
    def cell_gather(x):
        # x: (C, v+1, v+1, v+1, ...) → (C, v, v, v, 8, ...)
        parts = []
        for cx, cy, cz in _CORNERS:
            parts.append(x[:, cx:cx + v, cy:cy + v, cz:cz + v])
        return jnp.stack(parts, axis=4)

    cs = cell_gather(sdf)          # (C,v,v,v,8)
    cok = cell_gather(ok)
    cp = cell_gather(cpos)         # (C,v,v,v,8,3)
    cc = cell_gather(ccol)

    C = slots.shape[0]
    n_cells = C * v * v * v
    cs = cs.reshape(n_cells, 8)
    cok = jnp.all(cok.reshape(n_cells, 8), axis=-1)
    cp = cp.reshape(n_cells, 8, 3)
    cc = cc.reshape(n_cells, 8, 3)

    tets = jnp.asarray(_TETS)                     # (6,4)
    tet_edges = jnp.asarray(_TET_EDGES)           # (6,2)
    tri_table = jnp.asarray(_TRI_EDGES_TABLE)     # (16,2,3)
    ntri_table = jnp.asarray(_N_TRIS_TABLE)       # (16,)

    ts = cs[:, tets]                               # (N,6,4) sdf per tet vert
    tp = cp[:, tets]                               # (N,6,4,3)
    tc = cc[:, tets]
    case = jnp.sum(
        (ts < 0).astype(jnp.int32) * (1 << jnp.arange(4, dtype=jnp.int32)),
        axis=-1,
    )                                              # (N,6)

    # interpolated crossing point on each of the 6 tet edges
    ea = ts[..., tet_edges[:, 0]]                  # (N,6,6)
    eb = ts[..., tet_edges[:, 1]]
    denom = ea - eb
    t = ea / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    pa = tp[..., tet_edges[:, 0], :]               # (N,6,6,3)
    pb = tp[..., tet_edges[:, 1], :]
    epoint = pa + t * (pb - pa)
    ca = tc[..., tet_edges[:, 0], :]
    cb = tc[..., tet_edges[:, 1], :]
    ecolor = ca + t * (cb - ca)

    tri_e = tri_table[case]                        # (N,6,2,3)
    ntri = ntri_table[case]                        # (N,6)
    safe_e = jnp.maximum(tri_e, 0)
    verts = jnp.take_along_axis(
        epoint[:, :, None, :, :],                  # (N,6,1,6,3)
        safe_e[..., None].astype(jnp.int32),       # (N,6,2,3,1)
        axis=3,
    )                                              # (N,6,2,3,3)
    colors = jnp.take_along_axis(
        ecolor[:, :, None, :, :], safe_e[..., None].astype(jnp.int32), axis=3
    )
    tri_valid = (
        (jnp.arange(2)[None, None, :] < ntri[..., None])
        & cok[:, None, None]
    )                                              # (N,6,2)

    # orient triangles so the normal points toward positive sdf (outward):
    # flip if dot(normal, mean sdf gradient proxy) < 0. Use the isolated /
    # mean-corner direction: grad proxy = Σ_v sdf_v * (p_v - centroid).
    centroid = jnp.mean(tp, axis=2, keepdims=True)             # (N,6,1,3)
    grad = jnp.sum((ts[..., None]) * (tp - centroid), axis=2)  # (N,6,3)
    e1 = verts[..., 1, :] - verts[..., 0, :]
    e2 = verts[..., 2, :] - verts[..., 0, :]
    nrm = jnp.cross(e1, e2)                                    # (N,6,2,3)
    flip = jnp.sum(nrm * grad[:, :, None, :], axis=-1) < 0
    verts = jnp.where(
        flip[..., None, None],
        verts[..., jnp.array([0, 2, 1]), :],
        verts,
    )
    colors = jnp.where(
        flip[..., None, None], colors[..., jnp.array([0, 2, 1]), :], colors
    )

    out_v = verts.reshape(-1, 3, 3)
    out_c = colors.reshape(-1, 3, 3)
    out_m = tri_valid.reshape(-1)

    # device-side compaction: only ~a few % of triangle slots are real, and
    # host transfer (possibly over a TPU tunnel) is the bottleneck. Scatter
    # valid triangles to the front of a bounded buffer.
    cap = out_m.shape[0] // 4
    pos = jnp.cumsum(out_m.astype(jnp.int32)) - 1
    tgt = jnp.where(out_m & (pos < cap), pos, cap)
    cv = jnp.zeros((cap, 3, 3), out_v.dtype).at[tgt].set(out_v, mode="drop")
    cc = jnp.zeros((cap, 3, 3), out_c.dtype).at[tgt].set(out_c, mode="drop")
    n_valid = jnp.minimum(jnp.sum(out_m.astype(jnp.int32)), cap)
    return cv, cc, n_valid


def extract_mesh(spec: vx.VoxelGridSpec, layer: vx.TsdfLayer,
                 min_weight: float = 1e-4, chunk: int = 32):
    """Full-layer mesh extraction → (verts (T,3,3), colors (T,3,3)) numpy,
    compacted. Host-driven chunking over the block pool."""
    n = int(layer.num_blocks)
    all_v, all_c = [], []
    for start in range(0, max(n, 1), chunk):
        slots = jnp.arange(start, start + chunk, dtype=jnp.int32)
        vts, cls, cnt = mesh_block_chunk(spec, layer, slots, min_weight)
        k = int(cnt)
        if k > 0:
            # bucket the slice length to the next power of two so the
            # device→host slice compiles O(log cap) times, not per-chunk
            kb = min(1 << (k - 1).bit_length(), vts.shape[0])
            all_v.append(np.asarray(vts[:kb])[:k])
            all_c.append(np.asarray(cls[:kb])[:k])
    if not all_v:
        return np.zeros((0, 3, 3), np.float32), np.zeros((0, 3, 3), np.float32)
    return np.concatenate(all_v), np.concatenate(all_c)
