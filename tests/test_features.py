import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import geometry as geo
from coxgraph_tpu.frontends import synthetic as syn
from coxgraph_tpu.ops import features as ft

INTR = syn.PinholeIntrinsics().scaled(0.5)  # 320x240
CFG = ft.FeatureConfig(max_keypoints=384)


def render(scene, T):
    return syn.render_depth(scene, INTR, T)


def textured_scene():
    """Scene with several distinct objects → corner-rich renders."""
    return syn.default_scene()


def test_detect_keypoints_on_structure():
    scene = textured_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = render(scene, T)
    kp = ft.detect_and_describe(INTR, color, depth, CFG)
    n = int(kp.valid.sum())
    assert n > 50
    # keypoints carry valid 3D backprojections
    assert int(kp.has_depth.sum()) > 40
    pts_w = geo.transform_points(T, kp.p_cam)
    sdf = np.asarray(syn.scene_sdf(scene, pts_w))[np.asarray(kp.has_depth)]
    # backprojected corners lie on scene surfaces
    assert np.quantile(np.abs(sdf), 0.9) < 0.08


def test_popcount():
    x = jnp.asarray(np.array([0, 1, 3, 0xFFFFFFFF, 0x0F0F0F0F], np.uint32))
    got = np.asarray(ft._popcount32(x))
    np.testing.assert_array_equal(got, [0, 1, 2, 32, 16])


def test_hamming_matrix_matmul_form_exact():
    """The MXU ±1-matmul Hamming form is bit-exact against the
    xor+popcount definition (dot = nbits − 2·hamming; |dot| ≤ 256 is
    integer-exact under f32 accumulation)."""
    rng = np.random.default_rng(7)
    da = jnp.asarray(rng.integers(0, 2**32, (33, ft._N_WORDS),
                                  dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, (21, ft._N_WORDS),
                                  dtype=np.uint32))
    ref = np.asarray(jnp.sum(ft._popcount32(
        da[:, None, :] ^ db[None, :, :]), axis=-1), np.int32)
    got = np.asarray(ft.hamming_matrix(da, db))
    np.testing.assert_array_equal(got, ref)


def test_self_matching_is_identity():
    scene = textured_scene()
    T = syn.orbit_trajectory(1, scene.room_center, radius=2.5)[0]
    depth, color = render(scene, T)
    kp = ft.detect_and_describe(INTR, color, depth, CFG)
    mb, d = ft.match_descriptors(kp, kp, CFG)
    m = np.asarray(mb)
    v = np.asarray(kp.valid)
    matched = m[v & (m >= 0)]
    own = np.arange(len(m))[v & (m >= 0)]
    assert (matched == own).mean() > 0.95
    assert np.asarray(d)[v & (m >= 0)].max() == 0


def test_relative_pose_between_views():
    """Two nearby views: matched features + RANSAC must recover the true
    relative camera pose."""
    scene = textured_scene()
    traj = syn.orbit_trajectory(24, scene.room_center, radius=2.5)
    Ta, Tb = traj[0], traj[1]  # 15 deg apart
    da, ca = render(scene, Ta)
    db, cb = render(scene, Tb)
    kpa = ft.detect_and_describe(INTR, ca, da, CFG)
    kpb = ft.detect_and_describe(INTR, cb, db, CFG)
    T_ab, n_inl = ft.estimate_relative_pose(kpa, kpb, CFG,
                                            key=jax.random.PRNGKey(1))
    assert int(n_inl) >= CFG.min_inliers
    T_true = geo.relative(Ta, Tb)
    err = geo.se3_log(geo.relative(T_ab, T_true))
    assert float(jnp.linalg.norm(err[3:])) < 0.06, np.asarray(err)
    assert float(jnp.linalg.norm(err[:3])) < 0.05


def test_ransac_rejects_outliers():
    key = jax.random.PRNGKey(3)
    N = 200
    pa = jax.random.uniform(key, (N, 3), minval=-2, maxval=2)
    T_true = geo.se3_exp(jnp.array([0.1, -0.2, 0.3, 0.5, 0.2, -0.1]))
    pb = geo.transform_points(T_true, pa)
    # corrupt 40% with gross outliers
    n_out = 80
    pb = pb.at[:n_out].add(
        jax.random.normal(jax.random.PRNGKey(4), (n_out, 3)) * 2.0)
    valid = jnp.ones((N,), bool)
    res = ft.ransac_rigid(pa, pb, valid, CFG, key=jax.random.PRNGKey(5))
    assert int(res.n_inliers) >= N - n_out - 10
    err = geo.se3_log(geo.relative(res.T_b_a, T_true))
    assert float(jnp.linalg.norm(err)) < 0.02
