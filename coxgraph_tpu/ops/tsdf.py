"""Projective TSDF integration of RGB-D frames — replaces the voxblox
fast/merged/projective integrators (reference call sites: tsdf_recover.h:75,
tsdf_recover.yaml:5-12, launch/firefly/tsdf_client.launch:25-50).

TPU-first design: instead of per-ray CPU ray-casting with OpenMP threads
(integrator_threads: 8), each frame is integrated in two dense passes
inside one jit:

  1. **Allocation** — backproject a (strided) pixel grid at a few depths
     spanning the truncation band, scatter the touched block coordinates
     into the dense block-index grid, and compact the touched pool slots
     straight out of the allocation bitmap (no re-lookup of the raw
     candidates — their duplicate-heavy addresses serialize the TPU
     gather unit).
  2. **Update** — for the ≤ max_touched_blocks touched blocks, project all
     16³ voxel centers into the frame at once (lane-parallel on the VPU),
     gather depths, and apply the weighted running-average TSDF update.
     On the Pallas path a WINDOW of frames shares one compact
     tile-aligned working set of the union of touched rows, gathered and
     scattered once per window (integrate_window_stacked_impl) with the
     kernel row-DMA-ing results in place; the XLA path scatters rows
     back per frame.

The canonical implementation is `integrate_frame_stacked_impl`, which
operates on a stacked submap collection (leading (S,) axis on every leaf)
through a flat (S·max_blocks) pool view so no per-submap copy of the voxel
pools is ever materialized. The single-layer `integrate_frame` wraps it
with S = 1. Everything is fixed-shape; invalid pixels/blocks ride along
masked.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# opt-in runtime invariant checks (see integrate_frame_stacked_impl)
_DEBUG_UNIQUE_SLOTS = bool(os.environ.get("COXGRAPH_DEBUG_CHECKS"))

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
    alloc_stride: int = 4           # pixel stride of the allocation pass
    #  (a block spans ≥16 voxels ≈ many pixels — ~40 px even at 10 m
    #   range with 5 cm voxels at 640×480 — so strided sampling cannot
    #   miss one and cuts the allocation-pass candidate count stride²×;
    #   the voxblox "fast" integrator makes the same trade with
    #   subsampled rays. The candidate count drives the dedup sorts
    #   (3.1 ms of a 35 ms 30-frame window at stride 4, round-4 trace).
    #   SCALE WITH RESOLUTION: 8 is safe at 640×480 (the bench config
    #   uses it; ≥5 samples per block footprint), but at 80×60 test
    #   scale stride 8 visibly under-allocates — keep 4 as the default.)
    use_dropoff: bool = True        # linear weight drop-off behind surface
    use_distance_weight: bool = True  # 1/z² observation weighting
    update_chunk_blocks: int = 512  # blocks per update dispatch
    use_pallas: Optional[bool] = None  # None = auto (TPU backend only).
    #  The Pallas kernel replaces the per-voxel depth gather with one-hot
    #  MXU contractions on a stride-pyramid tile (ops/pallas_tsdf.py);
    #  blocks whose pixel bbox exceeds the tile window sample depth at
    #  stride 2^l — the voxblox "fast" integrator's subsampled-ray trade.
    window_union_blocks: int = 1024  # working-set capacity of the
    #  windowed (integrate_batch) kernel path: the UNION of all frames'
    #  touched blocks lives in a compact tile-aligned array for the
    #  whole window (consecutive frames re-touch ~90% of the same
    #  blocks), gathered once and scattered back once instead of per
    #  frame. HARD CEILING: blocks beyond capacity lose their updates
    #  for that window — size it ≥ the scene's visible-block count.
    #  Overflow is loud: an unconditional host warning fires per
    #  overflowing window, and MapperState carries the union watermark +
    #  dropped-block counter (HostMapper.union_saturation). Single-frame
    #  integration is never capped below max_touched_blocks.
    tile_h: int = 48  # kernel tile-window rows (multiple of 8). Sets the
    #  one-hot matmul's row count 5·tile_h: 48 → 240 rows = 2 systolic
    #  passes (64 → 320 = 3 passes, ~35% more MXU time) and shrinks the
    #  row-select product-reduce proportionally. Smaller windows push
    #  blocks whose pixel bbox exceeds tile_h rows one pyramid level
    #  coarser — the accuracy/throughput dial of the "fast" trade.


def _backproject(intr: PinholeIntrinsics, depth: Array) -> Array:
    """Depth (H,W) → camera-frame points (H,W,3) at pixel centers."""
    u = jnp.arange(intr.width, dtype=jnp.float32)
    v = jnp.arange(intr.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - intr.cx) / intr.fx * depth
    y = (vv - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def decimate(img: Array, st: int) -> Array:
    """Top-left stride-``st`` decimation of the last two dims via
    reshape+static-slice. A plain ``img[::2, ::2]`` lowers to a
    lane-shuffle gather costing ~0.6 ms/frame on chip at 640x480; the
    reshape form is free."""
    if st == 1:
        return img
    H, W = img.shape[-2:]
    ph, pw = (-H) % st, (-W) % st
    if ph or pw:
        img = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)])
    s = img.shape[:-2]
    img = img.reshape(s + ((H + ph) // st, st, (W + pw) // st, st))
    return img[..., :, 0, :, 0]


def color_layout(color: Array, height: int, width: int) -> str:
    """Classify a color image layout against the KNOWN intrinsics:
    'planar' for (3, H, W), 'interleaved' for (H, W, 3). The single
    layout-decision boundary — callers must not sniff shapes themselves
    (a (3, H, 3) planar image with W == 3 is undecidable from the shape
    alone; the intrinsics disambiguate)."""
    if color.shape == (3, height, width):
        return "planar"
    if color.shape == (height, width, 3):
        return "interleaved"
    raise ValueError(
        f"color shape {color.shape} matches neither planar (3, {height}, "
        f"{width}) nor interleaved ({height}, {width}, 3)")


def _alloc_candidates_soa(spec: vx.VoxelGridSpec, cfg: TsdfIntegratorConfig,
                          intr: PinholeIntrinsics, depth: Array,
                          T_sm_cam: Array):
    """Pass-1 candidate block slots, structure-of-arrays form →
    (grid_slots (N,), valid (N,)).

    Every step runs on (B,h,w) component arrays. A (...,3)-trailing
    candidate array would make XLA tile the 3-wide minor dim padded to
    128 lanes (42x VPU/memory waste) — measured ~2.4 ms/frame for the
    AoS formulation vs ~0.3 ms for this one."""
    st = cfg.alloc_stride
    d_s = decimate(depth, st)
    valid_s = (d_s > cfg.min_range) & (d_s < cfg.max_range)
    ks = jnp.linspace(-spec.truncation, spec.truncation,
                      cfg.alloc_band_samples)
    d_samples = d_s[None] + ks[:, None, None]              # (B,h,w)
    u = (jnp.arange(intr.width, dtype=jnp.float32)[::st]
         - intr.cx) / intr.fx
    v = (jnp.arange(intr.height, dtype=jnp.float32)[::st]
         - intr.cy) / intr.fy
    dx = u[None, None, :] * d_samples
    dy = v[None, :, None] * d_samples
    R = geo.quat_to_matrix(T_sm_cam[:4])
    t = T_sm_cam[4:7]
    px = R[0, 0] * dx + R[0, 1] * dy + R[0, 2] * d_samples + t[0]
    py = R[1, 0] * dx + R[1, 1] * dy + R[1, 2] * d_samples + t[1]
    pz = R[2, 0] * dx + R[2, 1] * dy + R[2, 2] * d_samples + t[2]
    inv = 1.0 / spec.voxel_size
    vps = spec.voxels_per_side
    bx = jnp.floor_divide(jnp.floor(px * inv).astype(jnp.int32), vps)
    by = jnp.floor_divide(jnp.floor(py * inv).astype(jnp.int32), vps)
    bz = jnp.floor_divide(jnp.floor(pz * inv).astype(jnp.int32), vps)
    h = spec.half_grid
    gd = spec.grid_dim
    in_grid = ((bx >= -h) & (bx < h) & (by >= -h) & (by < h)
               & (bz >= -h) & (bz < h))
    gx = jnp.clip(bx + h, 0, gd - 1)
    gy = jnp.clip(by + h, 0, gd - 1)
    gz = jnp.clip(bz + h, 0, gd - 1)
    grid_slots = (gx * gd + gy) * gd + gz
    valid = (valid_s[None] & (d_samples > cfg.min_range) & in_grid)
    return grid_slots.reshape(-1), valid.reshape(-1)


def touched_block_slots(spec: vx.VoxelGridSpec, layer: vx.TsdfLayer,
                        block_coords: Array, valid: Array,
                        max_touched: int) -> Tuple[Array, Array]:
    """Dedupe candidate block coords → (slots (K,), mask (K,)) pool slots.

    Fixed capacity K = max_touched; extra blocks (beyond capacity) are
    dropped for this call and picked up on later calls. (Used by the
    transform-merge op; the frame integrator compacts its touched set
    straight out of the allocation bitmap instead.)"""
    max_touched = min(max_touched, layer.max_blocks)
    idx = vx.lookup_block(spec, layer, block_coords)
    ok = valid & (idx >= 0)
    touched = jnp.zeros((layer.max_blocks,), dtype=jnp.bool_)
    touched = touched.at[jnp.where(ok, idx, layer.max_blocks)].set(
        True, mode="drop")
    pos = jnp.cumsum(touched.astype(jnp.int32)) - 1
    tgt = jnp.where(touched & (pos < max_touched), pos, max_touched)
    slots = jnp.full((max_touched,), layer.max_blocks, jnp.int32)
    slots = slots.at[tgt].set(jnp.arange(layer.max_blocks, dtype=jnp.int32),
                              mode="drop")
    mask = slots < layer.max_blocks
    slots = jnp.minimum(slots, layer.max_blocks - 1)
    return slots, mask


def integrate_frame_stacked_impl(spec: vx.VoxelGridSpec,
                                 cfg: TsdfIntegratorConfig,
                                 intr: PinholeIntrinsics,
                                 layers: vx.TsdfLayer, k: Array,
                                 depth: Array, color: Optional[Array],
                                 T_sm_cam: Array,
                                 return_stats: bool = False):
    """integrate one RGB-D frame into submap ``k`` of a STACKED collection
    (every TsdfLayer leaf carries a leading (S,) submap axis) without ever
    materializing a per-submap copy of the voxel pools.

    The naive route — dynamic-index submap k out, integrate, write it
    back — copies the full (max_blocks, v³) sdf/weight/color pools twice
    per frame (~1 GB of HBM traffic at reference scale). Here the big
    pools are addressed through a flat (S·max_blocks) view with base
    offset k·max_blocks: every access stays a gather/scatter of just the
    touched blocks. Only the SMALL per-submap arrays (block_index 1 MB,
    block_coords, num_blocks) are sliced out and written back.

    depth: (H,W) z-depth (0 = invalid); color: (H,W,3) in [0,1] or None;
    T_sm_cam: (7,) camera pose in the submap frame; k: () int32.
    """
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # single-frame window through the working-set kernel path; a
        # single frame's union IS its touched set, so the working set
        # must hold max_touched_blocks rows — a config with
        # max_touched_blocks > window_union_blocks would otherwise
        # silently drop per-frame updates the old per-frame path
        # handled uncapped (ADVICE r3)
        if cfg.window_union_blocks < cfg.max_touched_blocks:
            cfg = dataclasses.replace(
                cfg, window_union_blocks=cfg.max_touched_blocks)
        c = None if color is None else color[None]
        return integrate_window_stacked_impl(
            spec, cfg, intr, layers, k, depth[None], c, T_sm_cam[None],
            return_stats=return_stats)

    layers, slots, slot_mask, bc_k = _alloc_pass(spec, cfg, intr, layers,
                                                 k, depth, T_sm_cam)
    if return_stats:
        mb = spec.max_blocks
        touched = jnp.zeros((mb,), jnp.bool_).at[
            jnp.where(slot_mask, slots, mb)].set(True, mode="drop")
        layers = _update_xla(spec, cfg, intr, layers,
                             k * spec.max_blocks, bc_k, slots, slot_mask,
                             depth, color, geo.inverse(T_sm_cam))
        return layers, (jnp.sum(touched.astype(jnp.int32)),
                        jnp.zeros((), jnp.int32), touched)
    return _update_xla(spec, cfg, intr, layers, k * spec.max_blocks, bc_k,
                       slots, slot_mask, depth, color,
                       geo.inverse(T_sm_cam))


def _alloc_pass(spec: vx.VoxelGridSpec, cfg: TsdfIntegratorConfig,
                intr: PinholeIntrinsics, layers: vx.TsdfLayer, k: Array,
                depth: Array, T_sm_cam: Array):
    """Pass 1 for one frame on the stacked collection: allocate the
    blocks the frame's truncation band touches and compact the touched
    slots. → (layers', slots (K,) clamped, slot_mask (K,), bc_k (mb,3))."""
    mb = spec.max_blocks
    g3 = spec.grid_dim ** 3

    grid_slots, cand_valid = _alloc_candidates_soa(spec, cfg, intr, depth,
                                                   T_sm_cam)
    K = min(cfg.max_touched_blocks, mb)
    bi_k, bc_k, nb_k, slots, slot_mask = vx.allocate_and_slots(
        spec, layers.block_index[k].reshape(g3), layers.block_coords[k],
        layers.num_blocks[k], grid_slots, cand_valid, K)
    layers = dataclasses.replace(
        layers,
        block_index=layers.block_index.at[k].set(
            bi_k.reshape(layers.block_index.shape[1:])),
        block_coords=layers.block_coords.at[k].set(bc_k),
        num_blocks=layers.num_blocks.at[k].set(nb_k),
    )
    slots = jnp.minimum(slots, mb - 1)  # safe gather addresses (masked)

    if _DEBUG_UNIQUE_SLOTS:
        # opt-in guard (COXGRAPH_DEBUG_CHECKS=1) for the allocate_and_slots
        # uniqueness postcondition the pool scatters' unique_indices hint
        # depends on (duplicates under the hint = silent pool corruption)
        def _assert_unique(s, m):
            import numpy as _np
            live = _np.asarray(s)[_np.asarray(m)]
            if len(_np.unique(live)) != len(live):
                raise AssertionError(
                    "allocate_and_slots returned duplicate mask-True slots")
        jax.debug.callback(_assert_unique, slots, slot_mask)
    return layers, slots, slot_mask, bc_k


def integrate_window_stacked_impl(spec: vx.VoxelGridSpec,
                                  cfg: TsdfIntegratorConfig,
                                  intr: PinholeIntrinsics,
                                  layers: vx.TsdfLayer, k: Array,
                                  depths: Array, colors: Optional[Array],
                                  T_sm_cams: Array,
                                  return_stats: bool = False):
    """Integrate a WINDOW of F frames into submap ``k`` of a stacked
    collection. On the Pallas path the window shares one compact
    tile-aligned working set: per-frame allocation runs first (scan),
    then the UNION of all touched rows is gathered ONCE, every frame's
    kernel reads from and row-DMAs back into the working arrays, and one
    scatter lands the union back in the pools — consecutive frames touch
    ~90% the same blocks, and the per-frame pool row scatters were 24 ms
    of a 66 ms 30-frame window on the v5e (round-3 trace,
    docs/PERFORMANCE.md). The update math is identical to F sequential
    frame integrations (differences are confined to projection rounding
    boundaries across program structures).
    colors: (F,H,W,3) | (F,3,H,W) | None.

    ``return_stats=True`` additionally returns ``(n_union, n_dropped,
    updated)`` — two () int32 device scalars (the window's touched-block
    union size and how many of those blocks overflowed the working-set
    capacity; their updates were lost for this window, and an
    unconditional host warning fires on overflow either way) plus the
    (max_blocks,) bool bitmap of pool slots whose voxel data this window
    actually UPDATED (the voxblox per-block updated(mesh) flag the
    reference MeshIntegrator consumes, map_server.cpp:119-152 — feeds
    MapperState.mesh_dirty for incremental re-meshing). The XLA fallback
    has no capacity (scalars count the touched union with 0 dropped).
    Control-rate callers should accumulate these
    (MapperState.union_watermark / dropped_union_blocks)."""
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        mb = spec.max_blocks

        def body(carry, fr):
            lay, touched = carry
            if colors is None:
                d, T = fr
                c = None
            else:
                d, c, T = fr
            lay, slots, mask, bc_k = _alloc_pass(spec, cfg, intr, lay, k,
                                                 d, T)
            touched = touched.at[jnp.where(mask, slots, mb)].set(
                True, mode="drop")
            return (_update_xla(spec, cfg, intr, lay, k * spec.max_blocks,
                                bc_k, slots, mask, d, c,
                                geo.inverse(T)), touched), None
        xs = ((depths, T_sm_cams) if colors is None
              else (depths, colors, T_sm_cams))
        (layers, touched), _ = jax.lax.scan(
            body, (layers, jnp.zeros((mb,), jnp.bool_)), xs)
        if return_stats:
            return layers, (jnp.sum(touched.astype(jnp.int32)),
                            jnp.zeros((), jnp.int32), touched)
        return layers
    out = _integrate_window_pallas(spec, cfg, intr, layers, k, depths,
                                   colors, T_sm_cams)
    return out if return_stats else out[0]


def _integrate_window_pallas(spec: vx.VoxelGridSpec,
                             cfg: TsdfIntegratorConfig,
                             intr: PinholeIntrinsics,
                             layers: vx.TsdfLayer, k: Array,
                             depths: Array, colors: Optional[Array],
                             T_sm_cams: Array) -> vx.TsdfLayer:
    from . import pallas_tsdf

    S = layers.sdf.shape[0]
    mb = spec.max_blocks
    v3 = spec.voxels_per_side ** 3
    R, L = pallas_tsdf.block_row_shape(v3)
    F = depths.shape[0]
    base = k * mb
    K = min(cfg.max_touched_blocks, mb)
    K8 = K + ((-K) % pallas_tsdf.GROUP)
    U = min(cfg.window_union_blocks, mb, F * K8)

    # ---- per-frame allocation --------------------------------------
    # The candidate compaction (decimate + projection + sort + top_k) is
    # per-frame INDEPENDENT → one batched vmap op instead of 30
    # sequential copies inside the scan (the sorts were 3.1 + 1.6 ms of
    # the 6.8 ms round-3 alloc scan). Only the genuinely sequential
    # slot assignment stays in the scan, on K-sized arrays, with the
    # submap's index grid hoisted out (one slice + one write per window
    # instead of per frame). Bit-identical to the sequential form.
    g3 = spec.grid_dim ** 3

    def frame_cands(d, T):
        gs, cv = _alloc_candidates_soa(spec, cfg, intr, d, T)
        return vx.candidate_cells(spec, gs, cv, K)
    t_cells_f = jax.vmap(frame_cands)(depths, T_sm_cams)      # (F, K)

    bi_k = layers.block_index[k].reshape(g3)
    bc_k0 = layers.block_coords[k]
    nb_k = layers.num_blocks[k]

    def alloc_body(carry, t_cells):
        bi, bc, nb = carry
        bi, bc, nb, slots, mask = vx.allocate_cells(spec, bi, bc, nb,
                                                    t_cells)
        slots = jnp.minimum(slots, mb - 1)
        return (bi, bc, nb), (slots, mask, bc[slots])

    (bi_k, bc_k, nb_k), (slots_f, mask_f, coords_f) = jax.lax.scan(
        alloc_body, (bi_k, bc_k0, nb_k), t_cells_f)
    layers = dataclasses.replace(
        layers,
        block_index=layers.block_index.at[k].set(
            bi_k.reshape(layers.block_index.shape[1:])),
        block_coords=layers.block_coords.at[k].set(bc_k),
        num_blocks=layers.num_blocks.at[k].set(nb_k),
    )
    if _DEBUG_UNIQUE_SLOTS:
        def _assert_unique_f(s, m):
            import numpy as _np
            for r in range(s.shape[0]):
                live = _np.asarray(s[r])[_np.asarray(m[r])]
                if len(_np.unique(live)) != len(live):
                    raise AssertionError(
                        "allocate_cells returned duplicate mask-True slots")
        jax.debug.callback(_assert_unique_f, slots_f, mask_f)
    if K8 != K:
        slots_f = jnp.pad(slots_f, ((0, 0), (0, K8 - K)))
        mask_f = jnp.pad(mask_f, ((0, 0), (0, K8 - K)))
        coords_f = jnp.pad(coords_f, ((0, 0), (0, K8 - K), (0, 0)))
    # DEAD blocks first within each frame (compaction puts them at the
    # tail): the kernel writes every grid step's row in place, and a
    # live update of a shared row must land after any dead write-through
    slots_f = jnp.flip(slots_f, axis=1)
    mask_f = jnp.flip(mask_f, axis=1)
    coords_f = jnp.flip(coords_f, axis=1)

    # ---- window union of touched slots ---------------------------------
    flat = jnp.where(mask_f, slots_f, mb).reshape(-1)
    bitmap = jnp.zeros((mb,), jnp.bool_).at[flat].set(True, mode="drop")
    pos = jnp.cumsum(bitmap.astype(jnp.int32)) - 1
    selected = bitmap & (pos < U)
    # union saturation is observable, not silent (the fixed-capacity
    # discipline): overflowing blocks keep integrating into the dummy
    # row and their updates drop for this window. The warning is
    # UNCONDITIONAL wherever the backend can host-callback (VERDICT r3
    # #1 — this was the one pool whose overflow corrupted the map
    # quietly); the axon tunnel plugin raises UNIMPLEMENTED on any host
    # callback, so there the loud path is the (n_union, n_dropped)
    # stats return consumed by HostMapper's per-window async readback +
    # MapperState counters.
    n_union = jnp.sum(bitmap.astype(jnp.int32))
    from ..utils.runtime import host_callbacks_supported
    if host_callbacks_supported():
        def _warn_union(n, cap=U):
            if int(n) > cap:
                import warnings
                warnings.warn(
                    f"window union {int(n)} blocks > working-set capacity "
                    f"{cap}: {int(n) - cap} blocks lose this window's "
                    "updates — raise "
                    "TsdfIntegratorConfig.window_union_blocks",
                    RuntimeWarning, stacklevel=2)
        jax.debug.callback(_warn_union, n_union)
    all_slots = jnp.arange(mb, dtype=jnp.int32)
    union_slots = jnp.full((U,), mb, jnp.int32).at[
        jnp.where(selected, pos, U)].set(all_slots, mode="drop")
    union_valid = union_slots < mb
    union_slots_c = jnp.minimum(union_slots, mb - 1)
    # slot → working row; row U is a DUMMY row for dead blocks and (on
    # union overflow) dropped blocks — their updates are lost for this
    # window (size cfg.window_union_blocks to the scene)
    inv = jnp.full((mb,), U, jnp.int32).at[
        jnp.where(selected, all_slots, mb)].set(pos, mode="drop")
    wrows_f = jnp.where(mask_f, inv[slots_f], U).astype(jnp.int32)

    # ---- working set: gather the union once, tile-aligned rows ---------
    sdf_pool = layers.sdf.reshape(S * mb, v3)
    w_pool = layers.weight.reshape(S * mb, v3)
    c_pool = layers.color.reshape(S * mb, 3 * v3)
    urows = jnp.minimum(base + union_slots_c, S * mb - 1)
    zrow = jnp.zeros((1, v3), sdf_pool.dtype)
    ws_sdf = jnp.concatenate([sdf_pool[urows], zrow]).reshape(U + 1, R, L)
    ws_w = jnp.concatenate([w_pool[urows], zrow]).reshape(U + 1, R, L)
    ws_c = jnp.concatenate([c_pool[urows],
                            jnp.zeros((1, 3 * v3), c_pool.dtype)]
                           ).reshape(U + 1, 3, R, L)

    # ---- per-frame kernel updates against the working set --------------
    def upd_body(ws, fr):
        ws_sdf, ws_w, ws_c = ws
        if colors is None:
            d, Tsm, slots_k, mask_k, coords_k, wrows_k = fr
            c = None
        else:
            d, c, Tsm, slots_k, mask_k, coords_k, wrows_k = fr
        T_cam_sm = geo.inverse(Tsm)
        Rm = geo.quat_to_matrix(T_cam_sm[:4])
        params = jnp.concatenate([
            Rm.reshape(9), T_cam_sm[4:7],
            jnp.asarray([intr.fx, intr.fy, intr.cx, intr.cy],
                        jnp.float32)])
        atlas = pallas_tsdf.build_atlases(intr, d, c)
        tiles = pallas_tsdf.compute_tile_specs(spec, cfg, intr, coords_k,
                                               mask_k, params)
        old_sdf = ws_sdf[wrows_k]
        old_w = ws_w[wrows_k]
        old_c = ws_c[wrows_k]
        ws_sdf, ws_w, ws_c = pallas_tsdf.tsdf_update_blocks_ws(
            spec, cfg, intr, coords_k, tiles, wrows_k, params, atlas,
            ws_sdf, ws_w, ws_c, old_sdf, old_w, old_c)
        return (ws_sdf, ws_w, ws_c), None

    xs = ((depths, T_sm_cams, slots_f, mask_f, coords_f, wrows_f)
          if colors is None
          else (depths, colors, T_sm_cams, slots_f, mask_f, coords_f,
                wrows_f))
    (ws_sdf, ws_w, ws_c), _ = jax.lax.scan(
        upd_body, (ws_sdf, ws_w, ws_c), xs)

    # ---- one scatter lands the union back ------------------------------
    tgt = jnp.where(union_valid, base + union_slots_c,
                    S * mb + jnp.arange(U, dtype=jnp.int32))
    sdf_out = sdf_pool.at[tgt].set(ws_sdf[:U].reshape(U, v3),
                                   mode="drop", unique_indices=True)
    w_out = w_pool.at[tgt].set(ws_w[:U].reshape(U, v3),
                               mode="drop", unique_indices=True)
    c_out = c_pool.at[tgt].set(ws_c[:U].reshape(U, 3 * v3),
                               mode="drop", unique_indices=True)
    layers = dataclasses.replace(
        layers,
        sdf=sdf_out.reshape(layers.sdf.shape),
        weight=w_out.reshape(layers.weight.shape),
        color=c_out.reshape(layers.color.shape),
    )
    # the updated-block bitmap is `selected`, not the raw union: blocks
    # dropped on union overflow never received this window's updates, so
    # their cached mesh chunks are still current
    return layers, (n_union, jnp.maximum(n_union - U, 0), selected)


def _update_xla(spec, cfg, intr, layers, base, bc_k, slots, slot_mask,
                depth, color, T_cam_sm):
    """Voxel update as pure XLA (CPU fallback + cross-check path)."""
    S = layers.sdf.shape[0]
    mb = spec.max_blocks
    v = spec.voxels_per_side
    K = slots.shape[0]
    depth_flat = depth.reshape(-1)
    # color may arrive interleaved (H,W,3) or planar (3,H,W); the layout
    # decision lives in color_layout (intrinsics-driven, no shape sniff)
    if color is None:
        color_flat = None
    elif color_layout(color, intr.height, intr.width) == "planar":
        color_flat = color.reshape(3, -1).T
    else:
        color_flat = color.reshape(-1, 3)
    tau = spec.truncation
    npix = intr.height * intr.width
    # pools ride the scan FLAT (N, v³): a (..., 16, 16) carry would pad
    # 16 lanes → 128 in XLA's (8,128) tiling (8x HBM blow-up, OOM)
    v3 = v ** 3
    sdf_pool0 = layers.sdf.reshape(S * mb, v3)
    w_pool0 = layers.weight.reshape(S * mb, v3)
    c_pool0 = layers.color.reshape(S * mb, v3 * 3)

    def update_chunk(carry, chunk):
        sdf_pool, w_pool, c_pool = carry
        c_slots, c_mask = chunk
        # unique scatter targets: masked rows get
        # distinct out-of-range ids so the unique_indices hint holds
        flat_slots = jnp.where(
            c_mask, base + c_slots,
            S * mb + jnp.arange(c_slots.shape[0], dtype=jnp.int32))
        coords = bc_k[c_slots]                                 # (C,3)
        centers = vx.voxel_centers_of_block(spec, coords)
        p_cam = geo.transform_points(T_cam_sm, centers)
        z = p_cam[..., 2]
        u = p_cam[..., 0] / jnp.maximum(z, 1e-6) * intr.fx + intr.cx
        vv = p_cam[..., 1] / jnp.maximum(z, 1e-6) * intr.fy + intr.cy
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(vv).astype(jnp.int32)
        in_img = (
            (z > cfg.min_range)
            & (ui >= 0) & (ui < intr.width)
            & (vi >= 0) & (vi < intr.height)
        )
        # spread dummy addresses for masked voxels (duplicate-address
        # gathers serialize the vector gather unit)
        lin = (vi * intr.width + ui).reshape(-1)
        spread = jax.lax.broadcasted_iota(
            jnp.int32, (lin.shape[0], 1), 0).squeeze(-1) % npix
        lin = jnp.where(in_img.reshape(-1), lin, spread)
        d = depth_flat[lin].reshape(in_img.shape)
        has_depth = in_img & (d > cfg.min_range) & (d < cfg.max_range)

        sdf = d - z
        observed = has_depth & (sdf > -tau)
        w_obs = jnp.ones_like(sdf)
        if cfg.use_distance_weight:
            w_obs = w_obs / jnp.maximum(d * d, 1.0)
        if cfg.use_dropoff:
            # 1 in front of surface, linearly → 0 from -τ/2 to -τ behind
            dropoff = jnp.clip((sdf + tau) / (0.5 * tau), 0.0, 1.0)
            w_obs = w_obs * dropoff
        w_obs = jnp.where(observed & c_mask[:, None, None, None], w_obs, 0.0)
        sdf_obs = jnp.clip(sdf, -tau, tau)

        vshape = in_img.shape                   # (C, v, v, v)
        C = vshape[0]
        safe = jnp.minimum(flat_slots, S * mb - 1)
        old_sdf = sdf_pool[safe].reshape(vshape)
        old_w = w_pool[safe].reshape(vshape)
        new_w = jnp.minimum(old_w + w_obs, cfg.max_weight)
        new_sdf = jnp.where(
            new_w > 0,
            (old_w * old_sdf + w_obs * sdf_obs) / jnp.maximum(new_w, 1e-9),
            old_sdf,
        )
        sdf_pool = sdf_pool.at[flat_slots].set(new_sdf.reshape(C, -1),
                                               mode="drop",
                                               unique_indices=True)
        w_pool = w_pool.at[flat_slots].set(new_w.reshape(C, -1),
                                           mode="drop",
                                           unique_indices=True)

        if color_flat is not None:
            # image gather stays interleaved (the image is (H,W,3)); the
            # pool is planar — move channels up front (small, K rows)
            c_img = jnp.moveaxis(color_flat[lin].reshape(vshape + (3,)),
                                 -1, 1)                      # (C,3,v,v,v)
            near_surface = w_obs * (jnp.abs(sdf) < tau)
            old_c = c_pool[safe].reshape((C, 3) + vshape[1:])
            new_c = jnp.where(
                (new_w > 0)[:, None],
                (old_w[:, None] * old_c + near_surface[:, None] * c_img)
                / jnp.maximum(new_w, 1e-9)[:, None],
                old_c,
            )
            c_pool = c_pool.at[flat_slots].set(new_c.reshape(C, -1),
                                               mode="drop",
                                               unique_indices=True)
        return (sdf_pool, w_pool, c_pool), None

    chunk = min(cfg.update_chunk_blocks, K)
    n_chunks = -(-K // chunk)
    if n_chunks == 1:
        # no scan: a length-1 scan still copies the (large) pool carries
        (sdf_out, w_out, c_out), _ = update_chunk(
            (sdf_pool0, w_pool0, c_pool0), (slots, slot_mask))
    else:
        pad = n_chunks * chunk - K
        # pad masks OFF (padded slots would race duplicate writes)
        slots_p = jnp.pad(slots, (0, pad)).reshape(n_chunks, chunk)
        mask_p = jnp.pad(slot_mask, (0, pad)).reshape(n_chunks, chunk)
        (sdf_out, w_out, c_out), _ = jax.lax.scan(
            update_chunk, (sdf_pool0, w_pool0, c_pool0), (slots_p, mask_p))

    return dataclasses.replace(
        layers,
        sdf=sdf_out.reshape(layers.sdf.shape),
        weight=w_out.reshape(layers.weight.shape),
        color=c_out.reshape(layers.color.shape),
    )


integrate_frame_stacked = partial(jax.jit, static_argnums=(0, 1, 2),
                                  donate_argnums=3)(
    integrate_frame_stacked_impl
)
integrate_frame_stacked.__doc__ = "Jitted integrate_frame_stacked_impl."


def integrate_frame_impl(spec: vx.VoxelGridSpec, cfg: TsdfIntegratorConfig,
                         intr: PinholeIntrinsics, layer: vx.TsdfLayer,
                         depth: Array, color: Optional[Array],
                         T_sm_cam: Array) -> vx.TsdfLayer:
    """Unjitted single-layer integrate (S = 1 view of the stacked impl;
    for vmap/shard_map composition).

    depth: (H,W) z-depth (0 = invalid); color: (H,W,3) in [0,1] or None;
    T_sm_cam: (7,) camera pose in the layer (submap) frame.
    """
    stacked = jax.tree.map(lambda x: x[None], layer)
    out = integrate_frame_stacked_impl(
        spec, cfg, intr, stacked, jnp.zeros((), jnp.int32), depth, color,
        T_sm_cam)
    return jax.tree.map(lambda x: x[0], out)


integrate_frame = partial(jax.jit, static_argnums=(0, 1, 2))(
    integrate_frame_impl)
integrate_frame.__doc__ = "Jitted integrate_frame_impl."
