"""Trajectory metrics (eval/metrics) — golden tests for the ATE tooling
the reference's TUM exports are evaluated with (SURVEY.md §4: replay →
ATE bound; coxgraph_server.cpp:165-179 output format)."""

import numpy as np

from coxgraph_tpu.eval import metrics


def _poses(positions):
    p = np.zeros((len(positions), 7), np.float32)
    p[:, 0] = 1.0
    p[:, 4:7] = positions
    return p


def test_associate_nearest_within_window():
    a = np.array([0.0, 1.0, 2.0, 3.0])
    b = np.array([0.04, 1.2, 2.01, 5.0])
    ia, ib = metrics.associate(a, b, max_dt=0.05)
    np.testing.assert_array_equal(ia, [0, 2])     # 1.0→1.2 and 3.0→5.0 fail
    np.testing.assert_array_equal(ib, [0, 2])


def test_umeyama_recovers_rigid_transform():
    rng = np.random.RandomState(3)
    src = rng.randn(40, 3)
    th = 0.7
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    t_true = np.array([1.0, -2.0, 0.5])
    dst = (R_true @ src.T).T + t_true
    R, t, s = metrics.umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)
    assert s == 1.0
    # with_scale recovers a uniform scale
    R2, t2, s2 = metrics.umeyama_alignment(src, 2.0 * dst, with_scale=True)
    np.testing.assert_allclose(s2, 2.0, atol=1e-6)


def test_ate_rigid_offset_cancels_with_alignment():
    rng = np.random.RandomState(4)
    stamps = np.arange(30) * 0.1
    gt = rng.randn(30, 3)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    est = (R @ gt.T).T + np.array([5.0, 0.0, 1.0])
    assert metrics.ate_rmse(stamps, _poses(est), stamps, _poses(gt)) < 1e-6
    # without alignment the offset shows
    assert metrics.ate_rmse(stamps, _poses(est), stamps, _poses(gt),
                            align=False) > 1.0
    # known isotropic noise → RMSE ≈ sqrt(3)·σ
    sigma = 0.05
    noisy = gt + rng.randn(30, 3) * sigma
    ate = metrics.ate_rmse(stamps, _poses(noisy), stamps, _poses(gt),
                           align=False)
    assert 0.4 * np.sqrt(3) * sigma < ate < 1.6 * np.sqrt(3) * sigma


def test_rpe_measures_drift_rate_not_offset():
    # constant-velocity gt; est has the same motion plus a constant rigid
    # offset (RPE must be 0) and, separately, per-step drift (RPE = drift)
    stamps = np.arange(50) * 0.1
    gt = np.zeros((50, 3))
    gt[:, 0] = np.arange(50) * 0.1          # 1 m/s along x
    est_offset = gt + np.array([3.0, -1.0, 0.5])
    t_err, r_err = metrics.rpe(stamps, _poses(est_offset), stamps,
                               _poses(gt), delta=1.0)
    assert t_err < 1e-5 and r_err < 1e-5   # float32 pose quantization
    drift = 0.02                             # 2 cm per 0.1 s step
    est_drift = gt.copy()
    est_drift[:, 1] = np.arange(50) * drift
    t_err, _ = metrics.rpe(stamps, _poses(est_drift), stamps, _poses(gt),
                           delta=1.0)
    np.testing.assert_allclose(t_err, drift * 10, rtol=1e-6)


def test_rpe_rotational_component():
    # constant yaw rate: 0.1 rad per 0.1 s step in est, identity gt
    stamps = np.arange(30) * 0.1
    p = np.zeros((30, 7))
    yaw = np.arange(30) * 0.1
    p[:, 0] = np.cos(yaw / 2)
    p[:, 3] = np.sin(yaw / 2)
    gt = _poses(np.zeros((30, 3)))
    _, r_err = metrics.rpe(stamps, p, stamps, gt, delta=1.0)
    np.testing.assert_allclose(r_err, 1.0, rtol=1e-6)


def test_rpe_no_pairs_is_inf():
    stamps = np.array([0.0, 0.1])
    p = _poses(np.zeros((2, 3)))
    assert metrics.rpe(stamps, p, stamps, p, delta=5.0) == (float("inf"),
                                                            float("inf"))


def test_ate_no_overlap_is_inf():
    stamps_a = np.array([0.0, 0.1])
    stamps_b = np.array([10.0, 10.1])
    assert metrics.ate_rmse(stamps_a, _poses(np.zeros((2, 3))),
                            stamps_b, _poses(np.zeros((2, 3)))) == float(
        "inf")
