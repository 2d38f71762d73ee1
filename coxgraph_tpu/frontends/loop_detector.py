"""Keyframe database + loop-closure detection → MapFusion messages.

Replaces the reference's external loop-closure stack (corbslam /
pose_graph_backend with BoW vocabulary, BRISK, RANSAC gates —
launch/utils/pose_graph_backend.launch:13-60) and the coxgraph_mod
LoopClosurePublisher routing (loop_closure_publisher.h:71-136: cross-robot
→ MapFusion, same-robot → LoopClosure).

TPU design: no BoW inverted index — the whole keyframe descriptor database
is matched brute-force on the MXU/VPU (hundreds of keyframes × 512
descriptors is small change for a chip), candidates are ranked by mutual
good-match count and verified with batched 3D-3D RANSAC.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..ops import features as ft
from ..server.fusion_server import MapFusionMsg
from .synthetic import PinholeIntrinsics

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LoopDetectorConfig:
    features: ft.FeatureConfig = ft.FeatureConfig()
    min_match_score: int = 30          # good matches to shortlist a pair
    min_inliers: int = 15              # RANSAC gate (SAC threshold analog)
    min_time_separation: float = 3.0   # s, same-robot loop gate
    max_candidates: int = 2            # verified per new keyframe
    # minimum planar spread (m) of the RANSAC inlier cloud: concentrated
    # inliers (one texture patch) make the rigid fit rotation-degenerate
    # and the closure ~10× less accurate than its inlier count suggests
    # (measured on tests/fixtures/tum_real; see
    # features.estimate_relative_pose). 0 disables.
    min_inlier_spread: float = 0.4
    keyframe_stride: float = 0.5       # s between stored keyframes
    sqrt_info: float = 10.0            # emitted measurement weight — the
    #  MapFusion message carries a 6x6 information matrix
    #  (MapFusion.msg:1-6); without it a closure enters pose graphs at
    #  weight 1 against odometry chains whitened at ~20 and cannot pull
    #  the drift out (0 ⇒ emit None and let receivers default)


@dataclasses.dataclass
class Keyframe:
    client_id: int
    t: float
    kp: ft.Keypoints


@partial(jax.jit, static_argnums=4)
def _batched_match_counts(db_desc, db_valid, q_desc, q_valid,
                          cfg: ft.FeatureConfig):
    """(N,K,8)×(K,8) → (N,) mutual-good-match counts."""

    def one(desc_b, valid_b):
        a = ft.Keypoints(uv=None, response=None, valid=q_valid, desc=q_desc,
                         p_cam=None, has_depth=None)
        b = ft.Keypoints(uv=None, response=None, valid=valid_b, desc=desc_b,
                         p_cam=None, has_depth=None)
        mb, _ = ft.match_descriptors(a, b, cfg)
        return (mb >= 0).sum()

    return jax.vmap(one)(db_desc, db_valid)


@partial(jax.jit, donate_argnums=(0, 1))
def _db_append(db_desc, db_valid, desc, valid, n):
    """In-place keyframe append at traced slot n (one cached program per
    capacity bucket — an eager update would bake n as a constant and
    recompile per keyframe on remote TPUs). The database buffers are
    DONATED so XLA aliases input to output — without it every append
    device-copies the whole (cap, K, 8) pool (ADVICE r4)."""
    return (jax.lax.dynamic_update_index_in_dim(db_desc, desc, n, 0),
            jax.lax.dynamic_update_index_in_dim(db_valid, valid, n, 0))


class LoopDetector:
    """Shared multi-robot keyframe database (the reference runs one such
    backend fed by every robot's keyframes)."""

    def __init__(self, intr: PinholeIntrinsics,
                 cfg: LoopDetectorConfig = LoopDetectorConfig()):
        self.intr = intr
        self.cfg = cfg
        self.keyframes: List[Keyframe] = []
        self._last_kf_time: dict[int, float] = {}
        # DEVICE-RESIDENT descriptor database, appended in place: the
        # old form rebuilt a (cap, K, 8) numpy array and re-uploaded it
        # EVERY keyframe — 12.6 MB of host assembly + transfer per call,
        # measured 255 ms/keyframe at db=32 on the tunnel and growing
        # with the database (round-4). Pow2 capacity buckets keep the
        # append/match jit caches bounded.
        self._db_desc = None      # (cap, K, 8) u32
        self._db_valid = None     # (cap, K) bool

    def _score(self, kp_a: ft.Keypoints, kp_b: ft.Keypoints) -> int:
        mb, _ = ft.match_descriptors(kp_a, kp_b, self.cfg.features)
        return int((mb >= 0).sum())

    def _append_db(self, kp: ft.Keypoints) -> None:
        """Append one keyframe's descriptors to the device database
        (in-place dynamic update; capacity doubles at pow2 boundaries)."""
        n = len(self.keyframes)       # slot of the entry being added
        K = self.cfg.features.max_keypoints
        cap = 0 if self._db_desc is None else self._db_desc.shape[0]
        if n >= cap:
            new_cap = max(64, 2 * cap)
            if self._db_desc is None:
                self._db_desc = jnp.zeros((new_cap, K, ft._N_WORDS),
                                          jnp.uint32)
                self._db_valid = jnp.zeros((new_cap, K), jnp.bool_)
            else:
                grow = new_cap - cap
                self._db_desc = jnp.pad(self._db_desc,
                                        ((0, grow), (0, 0), (0, 0)))
                self._db_valid = jnp.pad(self._db_valid, ((0, grow), (0, 0)))
        self._db_desc, self._db_valid = _db_append(
            self._db_desc, self._db_valid, kp.desc, kp.valid,
            jnp.asarray(n, jnp.int32))

    def _score_all(self, kp: ft.Keypoints) -> np.ndarray:
        """Match the query against the WHOLE device-resident database in
        one jitted dispatch (remote-TPU friendly: one sync, no per-call
        re-upload). Returns (n_keyframes,) good-match counts."""
        n = len(self.keyframes)
        if n == 0:
            return np.zeros((0,), np.int32)
        counts = _batched_match_counts(
            self._db_desc, self._db_valid, kp.desc, kp.valid,
            self.cfg.features)
        return np.asarray(counts)[:n]

    def add_keyframe(self, client_id: int, t: float, color: Array,
                     depth: Array,
                     key: Optional[Array] = None) -> List[MapFusionMsg]:
        """Ingest a frame; returns verified loop closures as MapFusion
        messages (from = the stored keyframe, to = the new frame)."""
        last = self._last_kf_time.get(client_id)
        if last is not None and t - last < self.cfg.keyframe_stride - 1e-9:
            return []
        self._last_kf_time[client_id] = t

        kp = ft.detect_and_describe(self.intr, color, depth,
                                    self.cfg.features)
        msgs: List[MapFusionMsg] = []
        counts = self._score_all(kp)
        scored = []
        for i, kf in enumerate(self.keyframes):
            if kf.client_id == client_id and \
                    abs(t - kf.t) < self.cfg.min_time_separation:
                continue
            if counts[i] >= self.cfg.min_match_score:
                scored.append((int(counts[i]), kf))
        scored.sort(key=lambda x: -x[0])

        for rank, (s, kf) in enumerate(scored[:self.cfg.max_candidates]):
            k = (jax.random.PRNGKey(len(self.keyframes) * 97 + rank)
                 if key is None else jax.random.fold_in(key, rank))
            T_a_b, n_inl, spread = ft.estimate_relative_pose(
                kf.kp, kp, self.cfg.features, key=k, return_spread=True)
            # ONE device→host readback for both gate scalars — separate
            # int()/float() pulls are a ~25 ms tunnel round trip EACH
            n_inl, spread = jax.device_get((n_inl, spread))
            if (int(n_inl) >= self.cfg.min_inliers
                    and float(spread) >= self.cfg.min_inlier_spread):
                si = (self.cfg.sqrt_info * jnp.eye(6)
                      if self.cfg.sqrt_info > 0 else None)
                msgs.append(MapFusionMsg(
                    from_client=kf.client_id, from_time=kf.t,
                    to_client=client_id, to_time=t, T_from_to=T_a_b,
                    sqrt_info=si))

        self._append_db(kp)
        self.keyframes.append(Keyframe(client_id=client_id, t=t, kp=kp))
        return msgs
