"""Pointcloud TSDF integration ("merged" integrator) — the voxblox
pointcloud-integrator family (merged/simple/fast, selected per node by
the ``method`` param: tsdf_recover.yaml:6 uses "fast",
tsdf_server_default.yaml:6 "projective"; integratePointCloud call site
tsdf_recover.h:75). The projective
integrator (ops/tsdf.py) covers the organized-RGB-D hot path; this one
accepts ARBITRARY unordered pointclouds — lidar scans, recovered mesh
points, clouds with no pinhole model — which the reference's L1 consumes
natively on its ``pointcloud`` topic.

TPU-first design (no per-ray casting, no threads):

  1. **Bundling** (the voxblox "merged" trade): points are grouped by
     containing voxel via a lexicographic sort of (block-cell, local
     voxel) keys + segment sums — one ray per occupied voxel instead of
     one per point, with the bundle carrying the weighted-mean position/
     color and the SUMMED weight of its points. ``merge_points=False``
     gives the "simple" per-point variant.
  2. **Band sampling**: each bundle emits ``band_samples`` static sample
     points along its view ray across the truncation band [-τ, τ] (step
     defaults to one voxel at the reference operating point), plus
     optional ``carve_samples`` free-space samples toward the sensor
     (voxel_carving_enabled parity, coarse). Every updated voxel gets
     the exact voxblox SDF: distance along the ray from its own center's
     projection, not the sample offset.
  3. **Update**: samples land in a compact (K, v³) touched-block buffer
     through one scatter-add (duplicate indices are the point of the
     accumulation — XLA's sort-based lowering is fine at this path's
     control rate), then merge into the pool with the same running
     weighted average as the projective path and ONE unique-row scatter.

Everything is fixed-shape: N points (mask-padded), S samples, K touched
blocks (`max_touched_blocks` cap, overflow blocks picked up by later
clouds — same semantics as the frame integrator).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..core import voxel as vx

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PointIntegratorConfig:
    """Static parameters of the pointcloud integrator (reference operating
    points: BASELINE.md — max range 10 m, truncation 0.15 m)."""

    max_range: float = 10.0
    min_range: float = 0.1
    max_weight: float = 1.0e4
    band_samples: int = 7        # ray samples across [-τ, τ]; 7 ⇒ one
    #                              voxel step at τ=0.15, voxel=0.05.
    #  Weight-parity nuance vs voxblox's one-update-per-voxel ray cast
    #  (ADVICE r2): the fixed-offset samples step ~one voxel ALONG THE
    #  RAY, so an oblique ray can place 0 or 2 samples inside one voxel
    #  — per-voxel observation weight varies with ray angle, and two
    #  samples of one ray in one voxel double-count that ray's weight.
    #  Bounded (≤2x per ray per voxel) and angle-smooth; the accuracy
    #  gates (tests/test_points.py) hold. Deduplicate per (voxel, ray)
    #  before the scatter-add if tighter parity is ever needed.
    carve_samples: int = 0       # free-space samples sensor→(surface-τ);
    #                              0 = carving off (voxblox
    #                              voxel_carving_enabled=false). Coarse:
    #                              fixed count per ray, not per-voxel.
    max_touched_blocks: int = 2048
    use_distance_weight: bool = True   # 1/d² observation weighting
    use_dropoff: bool = True           # linear drop-off behind surface
    merge_points: bool = True          # False = "simple" per-point rays


def _bundle_points(spec: vx.VoxelGridSpec, px, py, pz, cr, cg, cb, w,
                   valid):
    """Merge points by containing voxel (the "merged" integrator's
    bundling, done as sort + segment sums instead of a hash map).

    All inputs (N,) SoA. Returns SoA bundles (N,-shaped, mask-padded):
    (px, py, pz, cr, cg, cb, w_sum, valid). Bundle position/color are
    weighted means; weight is the SUM over merged points.
    """
    n = px.shape[0]
    # two-level int32 key: block grid cell (< G³) then local voxel id
    # (< vps³) — a single flat voxel key overflows int32 for
    # grid_dim·vps > 1024, lexsort keeps every grid size safe
    p3 = jnp.stack([px, py, pz], axis=-1)
    vox = vx.point_to_voxel(spec, p3)
    b, l = vx.voxel_to_block(spec, vox)
    cell = vx.block_grid_slot(spec, b)
    vps = spec.voxels_per_side
    lin = (l[..., 0] * vps + l[..., 1]) * vps + l[..., 2]
    ok = valid & vx.block_in_grid(spec, b)
    g3 = spec.grid_dim ** 3
    cell = jnp.where(ok, cell, g3)          # invalid sorts to the end
    perm = jnp.lexsort((lin, cell))
    cell_s = cell[perm]
    lin_s = lin[perm]
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (cell_s[1:] != cell_s[:-1]) | (lin_s[1:] != lin_s[:-1]),
    ])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1          # (N,) sorted ids

    def seg_sum(x):
        return jax.ops.segment_sum(x[perm], seg, num_segments=n,
                                   indices_are_sorted=True)

    ok_s = ok[perm]
    wv = jnp.where(ok, w, 0.0)
    sw = seg_sum(wv)
    denom = jnp.maximum(sw, 1e-12)
    out = [seg_sum(wv * q) / denom for q in (px, py, pz, cr, cg, cb)]
    b_valid = seg_sum(ok_s.astype(jnp.float32)) > 0
    return (*out, sw, b_valid)


def integrate_points_stacked_impl(
        spec: vx.VoxelGridSpec, cfg: PointIntegratorConfig,
        layers: vx.TsdfLayer, k: Array, points: Array,
        colors: Optional[Array], valid: Array,
        T_sm_sensor: Array, return_stats: bool = False):
    """Integrate one pointcloud into submap ``k`` of a STACKED collection
    (leading (S,) axis on every TsdfLayer leaf), addressing the big voxel
    pools through a flat (S·max_blocks) view — never a per-submap pool
    copy (same discipline as tsdf.integrate_frame_stacked_impl).

    points: (N,3) sensor-frame; colors: (N,3) in [0,1] or None;
    valid: (N,) bool; T_sm_sensor: (7,) sensor pose in the submap frame.
    ``return_stats=True`` additionally returns the (max_blocks,) bool
    bitmap of updated pool slots (MapperState.mesh_dirty feed, like
    tsdf.integrate_window_stacked_impl).
    """
    S = layers.sdf.shape[0]
    mb = spec.max_blocks
    g3 = spec.grid_dim ** 3
    vps = spec.voxels_per_side
    v3 = vps ** 3
    tau = spec.truncation
    base = k * mb
    n = points.shape[0]

    # ---- sensor-frame → submap-frame, SoA components ----------------------
    R = geo.quat_to_matrix(T_sm_sensor[:4])
    t = T_sm_sensor[4:7]
    sx, sy, sz = points[:, 0], points[:, 1], points[:, 2]
    px = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
    py = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
    pz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]
    dist = jnp.sqrt(jnp.maximum(
        (px - t[0]) ** 2 + (py - t[1]) ** 2 + (pz - t[2]) ** 2, 1e-12))
    valid = valid & (dist > cfg.min_range) & (dist < cfg.max_range)

    if colors is None:
        cr = cg = cb = jnp.zeros_like(px)
    else:
        cr, cg, cb = colors[:, 0], colors[:, 1], colors[:, 2]
    w0 = jnp.ones_like(px)
    if cfg.use_distance_weight:
        w0 = w0 / jnp.maximum(dist * dist, 1.0)

    # ---- bundling (merged) ------------------------------------------------
    if cfg.merge_points:
        px, py, pz, cr, cg, cb, wb, valid = _bundle_points(
            spec, px, py, pz, cr, cg, cb, w0, valid)
        dist = jnp.sqrt(jnp.maximum(
            (px - t[0]) ** 2 + (py - t[1]) ** 2 + (pz - t[2]) ** 2, 1e-12))
    else:
        wb = jnp.where(valid, w0, 0.0)

    dirx = (px - t[0]) / dist
    diry = (py - t[1]) / dist
    dirz = (pz - t[2]) / dist

    # ---- static sample offsets along each ray -----------------------------
    Sb = cfg.band_samples
    Sc = cfg.carve_samples
    d_band = dist[None, :] + jnp.linspace(
        -tau, tau, Sb, dtype=jnp.float32)[:, None]            # (Sb, N)
    if Sc:
        # carve: min_range → dist-τ, per-ray stride (coarse free-space)
        frac = jnp.linspace(0.0, 1.0, Sc + 1,
                            dtype=jnp.float32)[:-1][:, None]  # exclude d-τ
        d_carve = cfg.min_range + frac * jnp.maximum(
            dist[None, :] - tau - cfg.min_range, 0.0)
        d_all = jnp.concatenate([d_band, d_carve], axis=0)    # (Ss, N)
        carve_row = jnp.arange(Sb + Sc)[:, None] >= Sb
    else:
        d_all = d_band
        carve_row = jnp.zeros((Sb, 1), jnp.bool_)
    qx = t[0] + dirx[None] * d_all
    qy = t[1] + diry[None] * d_all
    qz = t[2] + dirz[None] * d_all
    s_valid = jnp.broadcast_to(valid[None], d_all.shape) & (
        d_all > cfg.min_range)

    # ---- allocation (small per-submap arrays only) ------------------------
    inv = 1.0 / spec.voxel_size
    gx = jnp.floor(qx * inv).astype(jnp.int32)
    gy = jnp.floor(qy * inv).astype(jnp.int32)
    gz = jnp.floor(qz * inv).astype(jnp.int32)
    bxc = jnp.floor_divide(gx, vps)
    byc = jnp.floor_divide(gy, vps)
    bzc = jnp.floor_divide(gz, vps)
    h = spec.half_grid
    gd = spec.grid_dim
    in_grid = ((bxc >= -h) & (bxc < h) & (byc >= -h) & (byc < h)
               & (bzc >= -h) & (bzc < h))
    cell = ((jnp.clip(bxc + h, 0, gd - 1) * gd
             + jnp.clip(byc + h, 0, gd - 1)) * gd
            + jnp.clip(bzc + h, 0, gd - 1))
    s_valid = s_valid & in_grid

    K = min(cfg.max_touched_blocks, mb)
    bi_k, bc_k, nb_k, slots, slot_mask = vx.allocate_and_slots(
        spec, layers.block_index[k].reshape(g3), layers.block_coords[k],
        layers.num_blocks[k], cell.reshape(-1), s_valid.reshape(-1), K)
    layers = dataclasses.replace(
        layers,
        block_index=layers.block_index.at[k].set(
            bi_k.reshape(layers.block_index.shape[1:])),
        block_coords=layers.block_coords.at[k].set(bc_k),
        num_blocks=layers.num_blocks.at[k].set(nb_k),
    )

    # ---- per-sample voxel update values -----------------------------------
    # exact voxblox SDF: project the VOXEL CENTER onto the ray
    vcx = (gx.astype(jnp.float32) + 0.5) * spec.voxel_size
    vcy = (gy.astype(jnp.float32) + 0.5) * spec.voxel_size
    vcz = (gz.astype(jnp.float32) + 0.5) * spec.voxel_size
    d_vc = ((vcx - t[0]) * dirx[None] + (vcy - t[1]) * diry[None]
            + (vcz - t[2]) * dirz[None])
    sdf = dist[None] - d_vc
    w_obs = jnp.broadcast_to(wb[None], sdf.shape)
    if cfg.use_dropoff:
        # same ramp as the projective path: 1 → 0 from -τ/2 to -τ
        dropoff = jnp.clip((sdf + tau) / (0.5 * tau), 0.0, 1.0)
        w_obs = w_obs * jnp.where(carve_row, 1.0, dropoff)
    w_obs = jnp.where(s_valid & (sdf > -tau), w_obs, 0.0)
    sdf_obs = jnp.clip(sdf, -tau, tau)
    near = (jnp.abs(sdf) < tau) & ~carve_row

    # ---- compact scatter-add into the K touched block rows ----------------
    pool_slot = bi_k[cell.reshape(-1)]                    # (M,) post-alloc
    compact = jnp.full((mb + 1,), K, jnp.int32)
    compact = compact.at[jnp.where(slot_mask, slots, mb)].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop")
    ci = compact[jnp.clip(pool_slot, 0, mb)]              # (M,) — K = drop
    lx = gx - bxc * vps
    ly = gy - byc * vps
    lz = gz - bzc * vps
    lin = ((lx * vps + ly) * vps + lz).reshape(-1)
    live = (w_obs.reshape(-1) > 0) & (pool_slot >= 0) & (ci < K)
    addr = jnp.where(live, ci * v3 + lin, K * v3)

    wf = jnp.where(live, w_obs.reshape(-1), 0.0)
    acc_w = jnp.zeros((K * v3,), jnp.float32).at[addr].add(wf, mode="drop")
    acc_ws = jnp.zeros((K * v3,), jnp.float32).at[addr].add(
        wf * sdf_obs.reshape(-1), mode="drop")

    # ---- merge into the pool (flat stacked view, unique-row scatter) ------
    sdf_pool = layers.sdf.reshape(S * mb, v3)
    w_pool = layers.weight.reshape(S * mb, v3)
    rows = jnp.minimum(base + slots, S * mb - 1)
    old_sdf = sdf_pool[rows]                              # (K, v³)
    old_w = w_pool[rows]
    aw = acc_w.reshape(K, v3)
    aws = acc_ws.reshape(K, v3)
    new_w = jnp.minimum(old_w + aw, cfg.max_weight)
    denom = jnp.maximum(new_w, 1e-9)
    new_sdf = jnp.where(new_w > 0, (old_w * old_sdf + aws) / denom, old_sdf)

    tgt = jnp.where(slot_mask, base + slots,
                    S * mb + jnp.arange(K, dtype=jnp.int32))
    sdf_out = sdf_pool.at[tgt].set(new_sdf, mode="drop", unique_indices=True)
    w_out = w_pool.at[tgt].set(new_w, mode="drop", unique_indices=True)
    out = dataclasses.replace(
        layers,
        sdf=sdf_out.reshape(layers.sdf.shape),
        weight=w_out.reshape(layers.weight.shape),
    )

    if colors is not None:
        wn = jnp.where(live & near.reshape(-1), wf, 0.0)
        accs = [jnp.zeros((K * v3,), jnp.float32).at[addr].add(
            wn * jnp.broadcast_to(c[None], near.shape).reshape(-1),
            mode="drop").reshape(K, v3) for c in (cr, cg, cb)]
        c_pool = layers.color.reshape(S * mb, 3 * v3)
        old_c = c_pool[rows]                              # (K, 3·v³) planar
        new_c = jnp.concatenate(
            [jnp.where(new_w > 0,
                       (old_w * old_c[:, ch * v3:(ch + 1) * v3]
                        + accs[ch]) / denom,
                       old_c[:, ch * v3:(ch + 1) * v3])
             for ch in range(3)], axis=1)
        c_out = c_pool.at[tgt].set(new_c, mode="drop", unique_indices=True)
        out = dataclasses.replace(out, color=c_out.reshape(layers.color.shape))
    if return_stats:
        touched = jnp.zeros((mb,), jnp.bool_).at[
            jnp.where(slot_mask, slots, mb)].set(True, mode="drop")
        return out, touched
    return out


integrate_points_stacked = partial(jax.jit, static_argnums=(0, 1),
                                   donate_argnums=2)(
    integrate_points_stacked_impl)
integrate_points_stacked.__doc__ = "Jitted integrate_points_stacked_impl."


def integrate_points_impl(spec: vx.VoxelGridSpec, cfg: PointIntegratorConfig,
                          layer: vx.TsdfLayer, points: Array,
                          colors: Optional[Array], valid: Array,
                          T_sm_sensor: Array) -> vx.TsdfLayer:
    """Single-layer pointcloud integrate (S = 1 view of the stacked impl;
    for vmap/shard_map composition and direct layer use)."""
    stacked = jax.tree.map(lambda x: x[None], layer)
    out = integrate_points_stacked_impl(
        spec, cfg, stacked, jnp.zeros((), jnp.int32), points, colors,
        valid, T_sm_sensor)
    return jax.tree.map(lambda x: x[0], out)


integrate_points = partial(jax.jit, static_argnums=(0, 1))(
    integrate_points_impl)
integrate_points.__doc__ = "Jitted integrate_points_impl."
