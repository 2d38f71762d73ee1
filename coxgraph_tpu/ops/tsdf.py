"""Projective TSDF integration of RGB-D frames — replaces the voxblox
fast/merged/projective integrators (reference call sites: tsdf_recover.h:75,
tsdf_recover.yaml:5-12, launch/firefly/tsdf_client.launch:25-50).

TPU-first design: instead of per-ray CPU ray-casting with OpenMP threads
(integrator_threads: 8), each frame is integrated in two dense passes
inside one jit:

  1. **Allocation** — backproject every pixel at a few depths spanning the
     truncation band, scatter the touched block coordinates into the dense
     block-index grid (core.voxel.allocate_blocks), and collect the touched
     pool slots with a fixed-capacity top_k.
  2. **Update** — for the ≤ max_touched_blocks touched blocks, project all
     16³ voxel centers into the frame at once ((T·4096, ) lane-parallel on
     the VPU), gather depths, and apply the weighted running-average TSDF
     update as a pure scatter back into the pool.

Everything is fixed-shape; invalid pixels/blocks ride along masked.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..core import voxel as vx
from ..frontends.synthetic import PinholeIntrinsics

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TsdfIntegratorConfig:
    """Static integrator parameters (reference operating points:
    BASELINE.md — max_ray_length_m 10, truncation 0.15, max_weight 1e4)."""

    max_range: float = 10.0
    min_range: float = 0.1
    max_weight: float = 1.0e4
    max_touched_blocks: int = 2048
    alloc_band_samples: int = 3     # depth samples across the trunc band
    use_dropoff: bool = True        # linear weight drop-off behind surface
    use_distance_weight: bool = True  # 1/z² observation weighting


def _backproject(intr: PinholeIntrinsics, depth: Array) -> Array:
    """Depth (H,W) → camera-frame points (H,W,3) at pixel centers."""
    u = jnp.arange(intr.width, dtype=jnp.float32)
    v = jnp.arange(intr.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - intr.cx) / intr.fx * depth
    y = (vv - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def touched_block_slots(spec: vx.VoxelGridSpec, layer: vx.TsdfLayer,
                        block_coords: Array, valid: Array,
                        max_touched: int) -> Tuple[Array, Array]:
    """Dedupe candidate block coords → (slots (K,), mask (K,)) pool slots.

    Fixed capacity K = max_touched; extra blocks (beyond capacity) are
    dropped for this frame and picked up on later frames."""
    max_touched = min(max_touched, layer.max_blocks)
    idx = vx.lookup_block(spec, layer, block_coords)
    ok = valid & (idx >= 0)
    touched = jnp.zeros((layer.max_blocks,), dtype=jnp.bool_)
    touched = touched.at[jnp.where(ok, idx, layer.max_blocks)].set(True, mode="drop")
    # top_k over scores: touched slots get score 1, others 0
    score = touched.astype(jnp.float32)
    _, slots = jax.lax.top_k(score, max_touched)
    mask = touched[slots]
    return slots, mask


def integrate_frame_impl(spec: vx.VoxelGridSpec, cfg: TsdfIntegratorConfig,
                         intr: PinholeIntrinsics, layer: vx.TsdfLayer,
                         depth: Array, color: Optional[Array],
                         T_sm_cam: Array) -> vx.TsdfLayer:
    """Unjitted integrate_frame body (for vmap/shard_map composition).

    depth: (H,W) z-depth (0 = invalid); color: (H,W,3) in [0,1] or None;
    T_sm_cam: (7,) camera pose in the layer (submap) frame.
    """
    valid_px = (depth > cfg.min_range) & (depth < cfg.max_range)

    # ---- pass 1: allocation ---------------------------------------------
    # sample depths across the truncation band: d + k, k ∈ [-τ, τ]
    ks = jnp.linspace(-spec.truncation, spec.truncation,
                      cfg.alloc_band_samples)
    d_samples = depth[None, ...] + ks[:, None, None]          # (S,H,W)
    pts_cam = _backproject(
        intr, jnp.ones_like(depth)
    )  # unit-z dirs scaled below
    pts_cam = pts_cam[None, ...] * d_samples[..., None]       # (S,H,W,3)
    pts_sm = geo.transform_points(T_sm_cam, pts_cam)
    cand_blocks, _ = vx.voxel_to_block(spec, vx.point_to_voxel(spec, pts_sm))
    cand_valid = jnp.broadcast_to(valid_px[None], d_samples.shape) & (
        d_samples > cfg.min_range
    )
    layer = vx.allocate_blocks(
        spec, layer,
        cand_blocks.reshape(-1, 3), cand_valid.reshape(-1),
    )

    # ---- pass 2: voxel update -------------------------------------------
    slots, slot_mask = touched_block_slots(
        spec, layer, cand_blocks.reshape(-1, 3), cand_valid.reshape(-1),
        cfg.max_touched_blocks,
    )
    coords = layer.block_coords[slots]                         # (K,3)
    centers = vx.voxel_centers_of_block(spec, coords)          # (K,v,v,v,3)
    T_cam_sm = geo.inverse(T_sm_cam)
    p_cam = geo.transform_points(T_cam_sm, centers)            # (K,v,v,v,3)
    z = p_cam[..., 2]
    u = p_cam[..., 0] / jnp.maximum(z, 1e-6) * intr.fx + intr.cx
    v = p_cam[..., 1] / jnp.maximum(z, 1e-6) * intr.fy + intr.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_img = (
        (z > cfg.min_range)
        & (ui >= 0) & (ui < intr.width)
        & (vi >= 0) & (vi < intr.height)
    )
    uis = jnp.clip(ui, 0, intr.width - 1)
    vis = jnp.clip(vi, 0, intr.height - 1)
    d = depth[vis, uis]                                        # (K,v,v,v)
    has_depth = (d > cfg.min_range) & (d < cfg.max_range)

    sdf = d - z
    tau = spec.truncation
    observed = in_img & has_depth & (sdf > -tau)
    # observation weight: 1/z² beyond 1 m (voxblox use_const_weight=false
    # default), with linear drop-off behind the surface
    w_obs = jnp.ones_like(sdf)
    if cfg.use_distance_weight:
        w_obs = w_obs / jnp.maximum(d * d, 1.0)
    if cfg.use_dropoff:
        # 1 in front of surface, linearly → 0 from -τ/2 to -τ behind
        dropoff = jnp.clip((sdf + tau) / (0.5 * tau), 0.0, 1.0)
        w_obs = w_obs * dropoff
    w_obs = jnp.where(observed & slot_mask[:, None, None, None], w_obs, 0.0)
    sdf_obs = jnp.clip(sdf, -tau, tau)

    old_sdf = layer.sdf[slots]
    old_w = layer.weight[slots]
    new_w = jnp.minimum(old_w + w_obs, cfg.max_weight)
    new_sdf = jnp.where(
        new_w > 0, (old_w * old_sdf + w_obs * sdf_obs) / jnp.maximum(new_w, 1e-9),
        old_sdf,
    )
    sdf_out = layer.sdf.at[slots].set(new_sdf, mode="drop")
    w_out = layer.weight.at[slots].set(new_w, mode="drop")

    color_out = layer.color
    if color is not None:
        c = color[vis, uis]                                    # (K,v,v,v,3)
        near_surface = w_obs * (jnp.abs(sdf) < tau)
        old_c = layer.color[slots]
        new_c = jnp.where(
            (new_w > 0)[..., None],
            (old_w[..., None] * old_c + (near_surface)[..., None] * c)
            / jnp.maximum(new_w, 1e-9)[..., None],
            old_c,
        )
        color_out = layer.color.at[slots].set(new_c, mode="drop")

    return dataclasses.replace(
        layer, sdf=sdf_out, weight=w_out, color=color_out
    )


integrate_frame = partial(jax.jit, static_argnums=(0, 1, 2))(
    integrate_frame_impl
)
integrate_frame.__doc__ = "Jitted integrate_frame_impl."
