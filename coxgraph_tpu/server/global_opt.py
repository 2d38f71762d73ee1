"""Global two-phase pose-graph optimization with dense registration —
the server's solve (reference: PoseGraphInterface::optimize's double
solve with updateRegistrationConstraints between,
pose_graph_interface.cpp:32-49; overlap detection via submap AABBs,
SURVEY.md §2.9).

Phase 1 solves relative-pose constraints only (loop closures + submap
chains); phase 2 adds explicit-to-implicit registration residuals between
overlapping submap pairs. Registration normal equations are evaluated per
pair with the jitted kernel from ops.registration and scatter-added into
the global system on the host (fusion events are seconds apart — this is
control-rate, not frame-rate, code).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..core import voxel as vx
from ..ops import registration as reg
from ..solver import pose_graph as pg

Array = jax.Array


def submap_aabb(spec: vx.VoxelGridSpec, layer: vx.TsdfLayer) -> np.ndarray:
    """Axis-aligned bounds of allocated blocks in the submap frame →
    (2,3) [min;max] (voxgraph getOdomFrameSurfaceAabb capability)."""
    n = int(layer.num_blocks)
    if n == 0:
        return np.zeros((2, 3), np.float32)
    bc = np.asarray(layer.block_coords)[:n].astype(np.float32) \
        * spec.block_size
    return np.stack([bc.min(0), bc.max(0) + spec.block_size])


def aabb_overlap(a: np.ndarray, b: np.ndarray, margin: float = 0.0) -> bool:
    return bool(np.all(a[0] - margin <= b[1]) and np.all(b[0] - margin <= a[1]))


def transformed_aabb(aabb: np.ndarray, T) -> np.ndarray:
    """Conservative world-frame AABB of a posed submap AABB (host math)."""
    T = np.asarray(T)
    corners = np.array([[aabb[i, 0], aabb[j, 1], aabb[k, 2]]
                        for i in (0, 1) for j in (0, 1) for k in (0, 1)])
    w = geo._np_quat_rotate(T[None, :4], corners) + T[4:7]
    return np.stack([w.min(0), w.max(0)])


def find_overlapping_pairs(spec: vx.VoxelGridSpec,
                           layers: Sequence[vx.TsdfLayer],
                           poses: Array,
                           skip_adjacent_same_client: Optional[
                               Sequence[Tuple[int, int]]] = None,
                           margin: float = 0.5) -> List[Tuple[int, int]]:
    """Candidate registration pairs by world-AABB intersection
    (updateRegistrationConstraints overlap detection)."""
    n = len(layers)
    poses_np = np.asarray(poses)
    boxes = [transformed_aabb(submap_aabb(spec, layers[k]), poses_np[k])
             for k in range(n)]
    skip = set(skip_adjacent_same_client or [])
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in skip or (j, i) in skip:
                continue
            if int(layers[i].num_blocks) and int(layers[j].num_blocks) \
                    and aabb_overlap(boxes[i], boxes[j], margin):
                pairs.append((i, j))
    return pairs


def evaluate_residuals(poses: Array,
                       constraints: pg.RelPoseConstraints) -> np.ndarray:
    """Per-constraint whitened residual norms, insertion order (invalid
    rows are 0) — voxgraph PoseGraphInterface::evaluateResiduals parity
    (printed after each PGO run when verbose,
    coxgraph_server.cpp:541-554, pose_graph_interface.h:85-90)."""
    r = pg.residuals(poses, constraints)
    return np.asarray(jnp.linalg.norm(r, axis=-1))


def check_loop_closure_candidates(
        spec: vx.VoxelGridSpec,
        layers: Sequence[vx.TsdfLayer],
        candidates: Sequence[Tuple[int, int, Array]],
        cfg: reg.RegistrationConfig = reg.RegistrationConfig(),
        max_rms: float = 0.5,
        min_inliers: int = 30,
) -> List[dict]:
    """Verify candidate loop closures by dense TSDF agreement — the
    TPU-native equivalent of voxgraph's checkLoopClosureCandidates
    (called before every PGO run, coxgraph_server.cpp:509-512; the
    reference only WARNS on failure and optimizes anyway — the commented
    return at :511 — so callers here gate on the result themselves).

    For each (i, j, T_i_j) candidate: sample submap i's surface points,
    map them through T_i_j into submap j, and read j's TSDF there. A true
    loop closure places surface on surface → small |sdf| at many points.
    Returns one dict per candidate: {i, j, rms (in voxels), n_inliers,
    ok}."""
    out = []
    for (i, j, T_i_j) in candidates:
        pts, mask = reg.extract_surface_points(spec, layers[i], cfg)
        s_i, _, ok_i = vx.sample_tsdf_trilinear(spec, layers[i], pts)
        r, m = reg.registration_residuals(
            spec, layers[j], pts, jnp.where(ok_i, s_i, 0.0), mask & ok_i,
            geo.identity(), jnp.asarray(T_i_j))
        m = np.asarray(m)
        r = np.asarray(r)[m]
        n = int(m.sum())
        rms = float(np.sqrt(np.mean(r ** 2))) if n else np.inf
        out.append({"i": int(i), "j": int(j), "rms": rms / spec.voxel_size,
                    "n_inliers": n,
                    "ok": bool(n >= min_inliers
                               and rms / spec.voxel_size <= max_rms)})
    return out


@dataclasses.dataclass
class RegistrationPair:
    i: int
    j: int
    pts_i: Array     # surface samples of submap i (its frame)
    sdf_i: Array
    mask_i: Array


def make_registration_pairs(spec: vx.VoxelGridSpec,
                            layers: Sequence[vx.TsdfLayer],
                            pairs: Sequence[Tuple[int, int]],
                            cfg: reg.RegistrationConfig,
                            caches: Optional[list] = None,
                            ) -> List[RegistrationPair]:
    """``caches`` (mutable, len == len(layers)) holds per-submap
    (pts, sdf, mask) registration-point caches — filled lazily here, the
    reference's per-submap ISDF sample cache (SURVEY.md §2.9)."""
    out = []
    for (i, j) in pairs:
        if caches is not None and caches[i] is not None:
            pts, sdf, mask = caches[i]
        else:
            pts, sdf, mask = reg.surface_point_cache(spec, layers[i], cfg)
            if caches is not None:
                caches[i] = (pts, sdf, mask)
        out.append(RegistrationPair(i=i, j=j, pts_i=pts, sdf_i=sdf,
                                    mask_i=mask))
    return out


def optimize_two_phase(poses: Array,
                       constraints: pg.RelPoseConstraints,
                       spec: vx.VoxelGridSpec,
                       layers: Sequence[vx.TsdfLayer],
                       reg_cfg: reg.RegistrationConfig = reg.RegistrationConfig(),
                       solver_cfg: pg.SolverConfig = pg.SolverConfig(),
                       registration_weight: float = 30.0,
                       reg_iterations: int = 6,
                       fixed: Optional[Array] = None,
                       skip_pairs: Optional[Sequence[Tuple[int, int]]] = None,
                       reg_caches: Optional[list] = None,
                       ) -> Tuple[Array, dict]:
    """Phase 1: LM over relative-pose constraints. Phase 2: joint GN adding
    registration residuals of overlapping pairs. Returns (poses, info)."""
    n = poses.shape[0]
    res1 = pg.optimize(poses, constraints, solver_cfg, fixed=fixed)
    poses = res1.poses

    if registration_weight == 0.0:
        # zero-weight registration contributes nothing to the solve —
        # skip overlap detection and phase 2 entirely
        return poses, {"phase1_cost": float(res1.cost),
                       "n_registration_pairs": 0}

    pairs_idx = find_overlapping_pairs(spec, layers, poses,
                                       skip_adjacent_same_client=skip_pairs)
    rpairs = make_registration_pairs(spec, layers, pairs_idx, reg_cfg,
                                     caches=reg_caches)
    info = {"phase1_cost": float(res1.cost),
            "n_registration_pairs": len(rpairs)}
    if not rpairs:
        return poses, info

    if fixed is None:
        fixed_np = np.zeros((n,), bool)
        fixed_np[0] = True
    else:
        fixed_np = np.asarray(fixed).copy()
    # keep poses untouched by anything constant (solver does this too)
    touched = np.zeros((n,), bool)
    ci = np.asarray(constraints.i)[np.asarray(constraints.valid)]
    cj = np.asarray(constraints.j)[np.asarray(constraints.valid)]
    touched[ci] = True
    touched[cj] = True
    for p in rpairs:
        touched[p.i] = True
        touched[p.j] = True
    fixed_all = jnp.asarray(fixed_np | ~touched)

    w2 = registration_weight ** 2
    for _ in range(reg_iterations):
        H, b, _ = pg._build_normal_equations(poses, constraints, solver_cfg,
                                             fixed_all)
        H = np.array(H)   # writable host copies
        b = np.array(b)
        poses_np = np.asarray(poses)
        for p in rpairs:
            Hp, bp, _, nin = reg.registration_normal_eq(
                spec, layers[p.j], p.pts_i, p.sdf_i, p.mask_i,
                jnp.asarray(poses_np[p.i]), jnp.asarray(poses_np[p.j]),
                reg_cfg.huber_delta)
            scale = w2 / max(int(nin), 1)
            Hp = np.asarray(Hp) * scale
            bp = np.asarray(bp) * scale
            si, sj = 6 * p.i, 6 * p.j
            H[si:si + 6, si:si + 6] += Hp[:6, :6]
            H[si:si + 6, sj:sj + 6] += Hp[:6, 6:]
            H[sj:sj + 6, si:si + 6] += Hp[6:, :6]
            H[sj:sj + 6, sj:sj + 6] += Hp[6:, 6:]
            b[si:si + 6] += bp[:6]
            b[sj:sj + 6] += bp[6:]
        # re-apply gauge zeroing for rows the registration pairs touched
        fmask = np.repeat(np.asarray(fixed_all), 6)
        H[fmask, :] = 0.0
        H[:, fmask] = 0.0
        H[fmask, fmask] = 1.0
        b[fmask] = 0.0
        Hd = H + 1e-4 * np.diag(np.maximum(np.diag(H), 1e-8))
        delta = np.linalg.solve(Hd, -b)
        poses = pg._apply_delta(poses, jnp.asarray(delta), solver_cfg)

    res2_cost = float(pg._total_cost(poses, constraints, solver_cfg))
    info["phase2_relpose_cost"] = res2_cost
    return poses, info
