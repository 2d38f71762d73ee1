"""Trajectory evaluation — ATE/RPE in the style the reference's TUM-format
exports are consumed by (evo-style ATE on coxgraph_server.cpp:165-179
outputs; SURVEY.md §4 'bags → ATE bound + mesh')."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def associate(stamps_a: np.ndarray, stamps_b: np.ndarray,
              max_dt: float = 0.05) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-stamp association → (idx_a, idx_b)."""
    stamps_a = np.asarray(stamps_a)
    stamps_b = np.asarray(stamps_b)
    j = np.searchsorted(stamps_b, stamps_a)
    j = np.clip(j, 1, len(stamps_b) - 1)
    left = stamps_b[j - 1]
    right = stamps_b[j]
    j = np.where(np.abs(stamps_a - left) < np.abs(stamps_a - right), j - 1, j)
    ok = np.abs(stamps_b[j] - stamps_a) <= max_dt
    return np.nonzero(ok)[0], j[ok]


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares rigid alignment src→dst. Returns (R, t, s)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = float((D * np.diag(S)).sum() / (sc ** 2).sum() * src.shape[0]) \
        if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(stamps_est, poses_est, stamps_gt, poses_gt,
             align: bool = True, max_dt: float = 0.05) -> float:
    """ATE RMSE (m) between trajectories of (N,7) [qw qx qy qz t] poses."""
    pe = np.asarray(poses_est)[:, 4:7]
    pg = np.asarray(poses_gt)[:, 4:7]
    ia, ib = associate(stamps_est, stamps_gt, max_dt)
    if len(ia) == 0:
        return float("inf")
    pe, pg = pe[ia], pg[ib]
    if align and len(ia) >= 3:
        R, t, s = umeyama_alignment(pe, pg)
        pe = (s * (R @ pe.T)).T + t
    return float(np.sqrt(((pe - pg) ** 2).sum(axis=-1).mean()))
