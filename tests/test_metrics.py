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


def test_ate_no_overlap_is_inf():
    stamps_a = np.array([0.0, 0.1])
    stamps_b = np.array([10.0, 10.1])
    assert metrics.ate_rmse(stamps_a, _poses(np.zeros((2, 3))),
                            stamps_b, _poses(np.zeros((2, 3)))) == float(
        "inf")
