import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coxgraph_tpu.core import geometry as geo


def random_pose(key):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (3,)) * 1.5
    t = jax.random.normal(k2, (3,)) * 5.0
    return geo.make(geo.so3_exp(w), t)


def test_identity_compose():
    T = random_pose(jax.random.PRNGKey(0))
    I = geo.identity()
    np.testing.assert_allclose(geo.compose(I, T), T, atol=1e-6)
    np.testing.assert_allclose(geo.compose(T, I), T, atol=1e-6)


def test_inverse():
    T = random_pose(jax.random.PRNGKey(1))
    TI = geo.compose(T, geo.inverse(T))
    np.testing.assert_allclose(TI, geo.identity(), atol=1e-5)


def test_transform_points_matches_matrix():
    T = random_pose(jax.random.PRNGKey(2))
    p = jax.random.normal(jax.random.PRNGKey(3), (17, 3))
    M = geo.to_matrix(T)
    expected = p @ np.asarray(M[:3, :3]).T + np.asarray(M[:3, 3])
    np.testing.assert_allclose(geo.transform_points(T, p), expected, atol=1e-5)


def test_compose_matches_matrix_product():
    Ta = random_pose(jax.random.PRNGKey(4))
    Tb = random_pose(jax.random.PRNGKey(5))
    M = np.asarray(geo.to_matrix(Ta)) @ np.asarray(geo.to_matrix(Tb))
    np.testing.assert_allclose(geo.to_matrix(geo.compose(Ta, Tb)), M, atol=1e-5)


def test_matrix_quat_roundtrip():
    for seed in range(8):
        T = random_pose(jax.random.PRNGKey(seed))
        q = geo.rotation(T)
        q2 = geo.matrix_to_quat(geo.quat_to_matrix(q))
        # sign-canonical comparison
        qc = np.where(np.asarray(q[0]) < 0, -np.asarray(q), np.asarray(q))
        np.testing.assert_allclose(np.asarray(q2), qc, atol=1e-5)


def test_se3_exp_log_roundtrip():
    xi = jnp.array([0.3, -0.2, 0.5, 1.0, -2.0, 0.7])
    np.testing.assert_allclose(geo.se3_log(geo.se3_exp(xi)), xi, atol=1e-5)
    # near identity
    xi2 = jnp.array([1e-5, -2e-5, 1e-5, 1e-4, 0.0, -1e-4])
    np.testing.assert_allclose(geo.se3_log(geo.se3_exp(xi2)), xi2, atol=1e-7)


def test_so3_exp_log_roundtrip_batch():
    # keep |w| < pi (log returns the wrapped representative)
    w = jax.random.normal(jax.random.PRNGKey(7), (32, 3)) * 0.8
    w2 = geo.so3_log(geo.so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)
    # beyond pi the rotation must still match even if the vector wraps
    wbig = jnp.array([[4.0, 0.0, 0.0]])
    q1 = geo.so3_exp(wbig)
    q2 = geo.so3_exp(geo.so3_log(q1))
    p = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(geo.quat_rotate(q1[0], p)),
        np.asarray(geo.quat_rotate(q2[0], p)),
        atol=1e-5,
    )


def test_xyzyaw_roundtrip():
    p = jnp.array([1.0, -2.0, 3.0, 0.7])
    np.testing.assert_allclose(geo.to_xyzyaw(geo.from_xyzyaw(p)), p, atol=1e-6)


def test_interpolate_endpoints():
    Ta = random_pose(jax.random.PRNGKey(8))
    Tb = random_pose(jax.random.PRNGKey(9))
    np.testing.assert_allclose(geo.interpolate(Ta, Tb, 0.0), Ta, atol=1e-5)
    qb = np.asarray(geo.interpolate(Ta, Tb, 1.0))
    # rotation sign may flip; compare as transforms on a point
    pt = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        geo.transform_points(jnp.asarray(qb), pt),
        geo.transform_points(Tb, pt),
        atol=1e-4,
    )


def test_lookup_pose_interpolates():
    stamps = jnp.array([0.0, 1.0, 2.0])
    poses = jnp.stack(
        [
            geo.make(geo.so3_exp(jnp.zeros(3)), jnp.array([0.0, 0, 0])),
            geo.make(geo.so3_exp(jnp.zeros(3)), jnp.array([2.0, 0, 0])),
            geo.make(geo.so3_exp(jnp.zeros(3)), jnp.array([4.0, 0, 0])),
        ]
    )
    T = geo.lookup_pose(stamps, poses, jnp.asarray(0.5))
    np.testing.assert_allclose(geo.translation(T), [1.0, 0, 0], atol=1e-6)
    # clamped beyond ends
    T2 = geo.lookup_pose(stamps, poses, jnp.asarray(5.0))
    np.testing.assert_allclose(geo.translation(T2), [4.0, 0, 0], atol=1e-6)


def test_relative():
    Ta = random_pose(jax.random.PRNGKey(10))
    Tb = random_pose(jax.random.PRNGKey(11))
    T_ab = geo.relative(Ta, Tb)
    np.testing.assert_allclose(geo.compose(Ta, T_ab), Tb, atol=1e-5)


def test_jit_and_vmap():
    Ts = jax.vmap(lambda s: random_pose(jax.random.PRNGKey(s)))(jnp.arange(4))
    out = jax.jit(jax.vmap(geo.inverse))(Ts)
    assert out.shape == (4, 7)


def test_odometry_transformer():
    """OdometryTransformPublisher parity
    (odometry_transform_publisher.cpp:30-110): T_O_B = T_G_O^-1 T_G_B and
    twist re-expressed through R_G_O^-1."""
    from coxgraph_tpu.frontends.replay import OdometryTransformer

    ot = OdometryTransformer(origin_xyz=(1.0, -2.0, 0.5), origin_yaw=0.7,
                             odom_frame="odom_0", base_frame="base_0")
    assert ot.frames() == {}
    q = np.array([np.cos(0.35), 0, 0, np.sin(0.35)], np.float32)
    T_G_O = np.concatenate([q, np.array([1.0, -2.0, 0.5], np.float32)])
    T_G_B = np.asarray(geo.from_xyzyaw(jnp.array([3.0, 1.0, 2.0, 1.2])))
    lin = np.array([1.0, 0.0, 0.0])
    ang = np.array([0.0, 0.0, 0.5])
    T_O_B, lin_o, ang_o = ot.transform(T_G_B, lin, ang)
    expect = geo.compose_np(geo.inverse_np(T_G_O), T_G_B)
    np.testing.assert_allclose(T_O_B, expect, atol=1e-5)
    # velocity: pure yaw rotation by -0.7 → [cos(-0.7), sin(-0.7), 0]
    np.testing.assert_allclose(lin_o, [np.cos(-0.7), np.sin(-0.7), 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(ang_o, [0.0, 0.0, 0.5], atol=1e-5)
    assert ("odom_0", "base_0") in ot.frames()
    # identity origin is a passthrough
    ot0 = OdometryTransformer()
    np.testing.assert_allclose(ot0.transform(T_G_B), T_G_B, atol=1e-6)
