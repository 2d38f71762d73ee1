"""Mesh postprocessing (ops/mesh_post) — the ServerVisualizer Open3D chain
(server_visualizer.cpp:80-84)."""

import numpy as np

from coxgraph_tpu.eval import export
from coxgraph_tpu.ops import mesh_post


def icosphere_soup(subdiv: int = 2, radius: float = 1.0, jitter: float = 0.0,
                   seed: int = 0):
    """Triangle soup of a subdivided icosahedron (analytic sphere mesh)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    tris = v[f]
    for _ in range(subdiv):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        tris = np.concatenate([
            np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
            np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1)])
        tris /= np.linalg.norm(tris, axis=-1, keepdims=True)
    tris = tris * radius
    if jitter > 0:
        rng = np.random.default_rng(seed)
        flat = tris.reshape(-1, 3)
        # identical positions must get identical jitter (soup shares verts)
        uniq, inv = np.unique(flat.round(6), axis=0, return_inverse=True)
        noise = rng.normal(0, jitter, uniq.shape)
        tris = (uniq + noise)[inv].reshape(-1, 3, 3)
    return tris.astype(np.float32)


def roughness(mesh: mesh_post.IndexedMesh) -> float:
    """Mean |uniform Laplacian| — small for smooth meshes."""
    edges = mesh_post._adjacency_edges(mesh.faces)
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    v = mesh.n_vertices
    deg = np.maximum(np.bincount(src, minlength=v), 1)[:, None]
    nbr = np.zeros_like(mesh.vertices, np.float64)
    for k in range(3):
        nbr[:, k] = np.bincount(src, weights=mesh.vertices[dst, k],
                                minlength=v)
    lap = nbr / deg - mesh.vertices
    return float(np.linalg.norm(lap, axis=1).mean())


def test_connect_soup_shares_vertices():
    soup = icosphere_soup(1)
    mesh = mesh_post.connect_soup(soup)
    assert mesh.n_faces == soup.shape[0]
    # icosphere after 1 subdiv: 42 shared vertices + 40 face centers... the
    # center triangle adds midpoints only → 12 + 30 = 42 unique vertices
    assert mesh.n_vertices == 42
    assert soup.reshape(-1, 3).shape[0] == 240  # vs 42 shared


def test_remove_duplicated_triangles():
    f = np.array([[0, 1, 2], [2, 0, 1], [1, 2, 3]], np.int32)
    out = mesh_post.remove_duplicated_triangles(f)
    assert out.shape[0] == 2


def test_merge_close_vertices_reduces_count():
    soup = icosphere_soup(3)
    mesh = mesh_post.connect_soup(soup)
    merged = mesh_post.merge_close_vertices(mesh, 0.3)
    assert 0 < merged.n_vertices < mesh.n_vertices
    assert merged.n_faces < mesh.n_faces
    # all faces reference valid vertices
    assert merged.faces.max() < merged.n_vertices


def test_taubin_smooths_without_shrinking():
    soup = icosphere_soup(3, radius=1.0, jitter=0.01)
    mesh = mesh_post.connect_soup(soup)
    # noise = spread of vertex radii around the unit sphere
    noise0 = np.linalg.norm(mesh.vertices, axis=1).std()
    smoothed = mesh_post.taubin_smooth(mesh, iterations=50)
    noise1 = np.linalg.norm(smoothed.vertices, axis=1).std()
    assert noise1 < 0.5 * noise0
    # Taubin's μ pass counteracts Laplacian shrinkage: mean radius stays
    # within a few % of 1.0 (plain Laplacian ×50 iters would collapse)
    mean_r = np.linalg.norm(smoothed.vertices, axis=1).mean()
    assert 0.9 < mean_r < 1.1
    # colors/topology untouched
    assert smoothed.n_faces == mesh.n_faces


def test_simplify_vertex_clustering():
    soup = icosphere_soup(3)
    mesh = mesh_post.connect_soup(soup)
    simple = mesh_post.simplify_vertex_clustering(mesh, 0.4)
    assert simple.n_vertices < mesh.n_vertices // 4
    # bounding box preserved within a cell size
    lo0, hi0 = mesh.vertices.min(0), mesh.vertices.max(0)
    lo1, hi1 = simple.vertices.min(0), simple.vertices.max(0)
    assert np.all(np.abs(lo0 - lo1) < 0.4) and np.all(np.abs(hi0 - hi1) < 0.4)


def test_full_postprocess_pipeline_and_ply(tmp_path):
    soup = icosphere_soup(3, jitter=0.005)
    colors = np.full_like(soup, 0.5)
    clean = mesh_post.postprocess(soup, colors, merge_radius=0.05,
                                  taubin_iterations=30, simplify_voxel=0.1)
    assert clean.n_vertices > 0 and clean.n_faces > 0
    assert clean.colors is not None and clean.colors.shape == (
        clean.n_vertices, 3)
    p = str(tmp_path / "clean.ply")
    nv = export.write_ply_indexed(p, clean.vertices, clean.faces,
                                  clean.colors)
    assert nv == clean.n_vertices
    assert export.read_ply_counts(p) == (clean.n_vertices, clean.n_faces)
