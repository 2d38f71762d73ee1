"""Dataset replay + scripted experiments — replaces the reference's
rosbag-replay harness (corb_frontend_cvg.launch:46-51, including the
time-shifted second replay of the same bag emulating a second robot) and
the TUM/EuRoC-style dataset input path.

Sources:
  * SyntheticReplay — renders an analytic scene along a trajectory
    (Gazebo/CARLA stand-in), optionally with drifting odometry;
  * TumRgbdReplay — streams a TUM-RGBD-format directory (rgb.txt /
    depth.txt / groundtruth.txt with PNG frames) if one is available;
  * time_shifted(replay, dt) — the reference's two-robot-from-one-bag
    trick: the same stream re-based in time.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from . import synthetic as syn

Array = jax.Array


class Frame(NamedTuple):
    t: float
    depth: Array            # (H,W) z-depth, 0 invalid
    color: Optional[Array]  # (H,W,3) in [0,1]
    T_world_cam: Array      # ground truth (for eval)
    T_odom_cam: Array       # odometry estimate (input to the mapper)


@dataclasses.dataclass
class SyntheticReplay:
    scene: syn.Scene
    intr: syn.PinholeIntrinsics
    trajectory: Array                     # (N,7) ground truth
    dt: float = 0.05                      # 20 Hz (BASELINE.md)
    odom_rot_std: float = 0.0
    odom_trans_std: float = 0.0
    T_world_odom: Optional[Array] = None  # odom-frame offset (client frame)
    seed: int = 0

    def __iter__(self) -> Iterator[Frame]:
        traj = self.trajectory
        if self.odom_rot_std > 0 or self.odom_trans_std > 0:
            odom = syn.noisy_odometry(jax.random.PRNGKey(self.seed), traj,
                                      self.odom_rot_std, self.odom_trans_std)
        else:
            odom = traj
        X_inv = (geo.inverse(self.T_world_odom)
                 if self.T_world_odom is not None else None)
        for i in range(traj.shape[0]):
            depth, color = syn.render_depth(self.scene, self.intr, traj[i])
            T_odom = odom[i] if X_inv is None else geo.compose(X_inv, odom[i])
            yield Frame(t=i * self.dt, depth=depth, color=color,
                        T_world_cam=traj[i], T_odom_cam=T_odom)


def time_shifted(frames, shift: float):
    """Re-base a frame stream in time (the second-robot-from-the-same-bag
    replay trick, corb_frontend_cvg.launch:48-51)."""
    for f in frames:
        yield Frame(t=f.t + shift, depth=f.depth, color=f.color,
                    T_world_cam=f.T_world_cam, T_odom_cam=f.T_odom_cam)


@dataclasses.dataclass
class TumRgbdReplay:
    """TUM-RGBD directory replay (rgb.txt/depth.txt/groundtruth.txt).

    Depth PNGs are 16-bit millimeter-scaled (factor 5000); needs PIL or
    imageio for decoding — raises at iteration time if unavailable."""

    root: str
    intr: syn.PinholeIntrinsics = syn.PinholeIntrinsics()
    depth_factor: float = 5000.0
    max_frames: Optional[int] = None
    # Rebase timestamps to start near 0 (t0 = first served frame's stamp,
    # exposed on self after iteration starts). TUM stamps are unix epoch
    # (~1.3e9 s); the mapper keeps stamps in f32 device arrays where
    # epoch-scale values quantize to ~128 s — rebasing preserves the
    # sub-ms deltas that matter. Associate ground truth with the same t0.
    rebase_time: bool = True
    t0: float = 0.0

    def _read_list(self, name):
        rows = []
        with open(os.path.join(self.root, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                rows.append((float(parts[0]), parts[1:]))
        return rows

    def __iter__(self) -> Iterator[Frame]:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("TUM replay needs PIL") from e
        rgb = self._read_list("rgb.txt")
        dep = self._read_list("depth.txt")
        gt = self._read_list("groundtruth.txt")
        gt_t = np.array([t for t, _ in gt])
        gt_p = np.array([[float(x) for x in v] for _, v in gt])  # tx..qw
        dep_t = np.array([t for t, _ in dep])
        if self.rebase_time and rgb:
            self.t0 = rgb[0][0]
        n = 0
        for t, (rgb_path,) in rgb:
            if self.max_frames is not None and n >= self.max_frames:
                break
            j = int(np.argmin(np.abs(dep_t - t)))
            if abs(dep_t[j] - t) > 0.03:
                continue
            k = int(np.clip(np.searchsorted(gt_t, t), 1, len(gt_t) - 1))
            tx, ty, tz, qx, qy, qz, qw = gt_p[k]
            T = geo.make(jnp.asarray([qw, qx, qy, qz]),
                         jnp.asarray([tx, ty, tz]))
            depth = np.asarray(
                Image.open(os.path.join(self.root, dep[j][1][0])),
                np.float32) / self.depth_factor
            color = np.asarray(
                Image.open(os.path.join(self.root, rgb_path)),
                np.float32)[..., :3] / 255.0
            yield Frame(t=t - self.t0, depth=jnp.asarray(depth),
                        color=jnp.asarray(color), T_world_cam=T,
                        T_odom_cam=T)
            n += 1


def two_robot_experiment(scene=None, n_frames: int = 40,
                         intr: Optional[syn.PinholeIntrinsics] = None,
                         dt: float = 0.05, drift: bool = True):
    """The CVG two-client experiment generator: two overlapping sweeps with
    distinct odom frames → list of per-robot SyntheticReplay."""
    scene = scene or syn.default_scene()
    intr = intr or syn.PinholeIntrinsics().scaled(0.25)
    trajs = [
        syn.orbit_trajectory(n_frames, scene.room_center, radius=2.4,
                             sweep=1.2 * jnp.pi, start_angle=0.0),
        syn.orbit_trajectory(n_frames, scene.room_center, radius=2.4,
                             sweep=1.2 * jnp.pi, start_angle=jnp.pi),
    ]
    X = [geo.identity(), geo.from_xyzyaw(jnp.array([0.8, -0.4, 0.0, 0.5]))]
    return [
        SyntheticReplay(
            scene=scene, intr=intr, trajectory=trajs[r], dt=dt,
            odom_rot_std=0.002 if drift else 0.0,
            odom_trans_std=0.005 if drift else 0.0,
            T_world_odom=X[r], seed=r)
        for r in range(2)
    ], trajs, X


class OdometryTransformer:
    """Ground-truth world-frame odometry → a per-robot odom frame with a
    configurable origin offset — the coxgraph_sim OdometryTransformPublisher
    node (odometry_transform_publisher.cpp:30-110): T_O_B = T_G_O⁻¹·T_G_B
    with T_G_O from (origin_x/y/z, origin_yaw) params (:30-43), and the
    twist re-expressed through R_G_O⁻¹ (:74-91). Pure numpy (host control
    path). ``frames()`` is the pull equivalent of its odom→base TF timer
    (:102-110)."""

    def __init__(self, origin_xyz=(0.0, 0.0, 0.0), origin_yaw: float = 0.0,
                 odom_frame: str = "odom", base_frame: str = "base_link"):
        half = 0.5 * float(origin_yaw)
        q = np.array([np.cos(half), 0.0, 0.0, np.sin(half)], np.float32)
        self.T_G_O = np.concatenate(
            [q, np.asarray(origin_xyz, np.float32)])
        self.odom_frame = odom_frame
        self.base_frame = base_frame
        self.T_O_B: Optional[np.ndarray] = None

    def transform(self, T_G_B, lin_vel=None, ang_vel=None):
        """One ground-truth odometry sample → (T_O_B[, lin_vel_O, ang_vel_O])
        in this robot's odom frame (odomCallback, :60-98)."""
        self.T_O_B = geo.compose_np(geo.inverse_np(self.T_G_O),
                                    np.asarray(T_G_B, np.float32))
        if lin_vel is None and ang_vel is None:
            return self.T_O_B
        q_inv = self.T_G_O[:4] * np.array([1, -1, -1, -1], np.float32)
        out = [self.T_O_B]
        for v in (lin_vel, ang_vel):
            out.append(None if v is None else geo._np_quat_rotate(
                q_inv, np.asarray(v, np.float32)))
        return tuple(out)

    def frames(self):
        """{(odom_frame, base_frame): latest T_O_B} — publishTf (:103-110)."""
        if self.T_O_B is None:
            return {}
        return {(self.odom_frame, self.base_frame): self.T_O_B}
