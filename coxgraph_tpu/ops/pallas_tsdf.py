"""Pallas TPU kernel for the projective TSDF voxel update — the per-robot
hot loop (reference: voxblox fast/merged integrators, 8 OpenMP threads,
tsdf_recover.yaml:12).

Why a kernel: the XLA formulation spends its time in a 4096-wide random
depth gather per block (duplicate-heavy addresses serialize the vector
gather unit — two orders of magnitude off the roofline). This kernel
converts the gather into MXU matmuls with everything laid out LANE-MAJOR:

  * the depth (and per-channel color) image is pre-decimated into a
    5-level stride pyramid of bf16 planes packed into one VMEM atlas;
  * per block, the projected pixel bbox picks the finest level whose
    ALIGNED 64x128 tile window covers it (the voxblox "fast" integrator's
    subsampled-ray trade, applied per block);
  * per-voxel projection math runs for ALL GROUP blocks at once on
    (GROUP, v3) arrays — full 8-sublane utilization. (The first kernel
    generation computed it per block on (v3,) 1-D vectors, which Mosaic
    lays out on a single sublane: 1/8 the VPU rate. Measured on chip,
    that inefficiency was ~60% of the kernel's runtime.);
  * the per-voxel fetch is a TRANSPOSED one-hot contraction: the one-hot
    is built directly in (TILE_W, v3) orientation by comparing a sublane
    iota against the lane-vector of voxel pixel-columns (no transpose or
    1-D↔2-D relayout, which Mosaic cannot lower), and all 5 planes
    [depth_hi, depth_lo, r, g, b] ride ONE MXU matmul
    (5·tile_h, TILE_W) @ (TILE_W, v3), followed by a shared row-select
    against the (tile_h, v3) transposed row-one-hot (tile_h from
    TsdfIntegratorConfig: 48 rows ⇒ 240-row matmul = 2 systolic passes).

Depth splits hi/lo into bf16 so the MXU runs at bf16 rate with ~f32
results (hi + lo ≈ 0.1 mm at 10 m); color channels are single bf16
planes (exact to ±1 LSB above 128 — ≤0.4% — since each channel is
selected separately, no packed-integer exactness is needed).

Per grid step the kernel processes GROUP=8 blocks; the per-block loop
only does one-hot builds + the stacked matmul + row-select, merging each
block's selected values into (GROUP, v3) accumulators; the TSDF
running-average update then applies vectorized over all GROUP rows. Pool
rows are gathered/scattered XLA-side (row DMA is fast there); color
arrives in PLANAR channel layout so every in-kernel slice is static.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import voxel as vx
from ..frontends.synthetic import PinholeIntrinsics

Array = jax.Array

TILE_H = 64        # default tile rows — overridden per run by
#                    TsdfIntegratorConfig.tile_h (multiple of 8)
TILE_W = 128       # tile lanes (window aligned to 128 lanes)
LEVELS = 5         # stride pyramid 1,2,4,8,16
GROUP = 8          # blocks per grid step (TPU block-dim-0 granularity)
PLANES = 5         # [depth_hi, depth_lo, r, g, b]


def _pyramid_layout(intr: PinholeIntrinsics):
    """Static atlas layout: (row_offsets, widths, heights, total_rows)."""
    offs, ws, hs = [], [], []
    r = 0
    for l in range(LEVELS):
        offs.append(r)
        ws.append(max(-(-intr.width // (1 << l)), 1))   # ceil-div: the
        hs.append(max(-(-intr.height // (1 << l)), 1))  # stride slice keeps
        #                                                 the partial edge
        # row offsets and level heights stay 8-aligned (Mosaic requires
        # dynamic sublane offsets provably divisible by 8)
        r += -(-hs[-1] // 8) * 8
    return offs, ws, hs, r


def build_atlases(intr: PinholeIntrinsics, depth: Array,
                  color: Optional[Array]) -> Array:
    """Depth (H,W) + color (H,W,3) | PLANAR (3,H,W) | None → stacked plane
    atlas (PLANES, total_rows, max(W,TILE_W)) bf16 = [d_hi, d_lo, r, g, b].
    Level l is the stride-2^l subsample (top-left aligned); cells beyond
    a level's extent stay 0 (= invalid depth / black). Color channels are
    0..255 floats (bf16: exact to ±1 LSB above 128). Callers that loop
    over frames should pre-transpose color to planar OUTSIDE the loop —
    the interleaved→planar relayout costs ~0.24 ms/frame inside a scan
    (mapper.integrate_batch hoists it)."""
    offs, ws, hs, rows = _pyramid_layout(intr)
    aw = max(intr.width, TILE_W)

    # one 5-plane bf16 cascade [d_hi, d_lo, r, g, b] written into the
    # preallocated atlas via static dynamic_update_slice. The split and
    # the 0..255 quantization happen BEFORE the pyramid: stride
    # decimation is pure pixel selection, so plane-of-decimated ==
    # decimated-plane exactly, and running the cascade in bf16 halves
    # its HBM traffic (the f32 4-channel variant spent ~0.5 ms/frame in
    # layout-conversion copies around the cascade — op-profile measured;
    # 5 separate per-plane pad+concat pyramids were worse still,
    # ~6 ms/frame).
    #
    # The hi/lo split MUST round through lax.reduce_precision: XLA's
    # excess-precision pass (on by default on TPU) elides f32→bf16→f32
    # convert pairs, so the naive `d - f32(bf16(d))` folds to zero ON
    # CHIP — the lo plane silently vanished and depth carried half-ulp
    # bf16 error (~8 mm at 4 m; caught by tests/test_tpu_onchip.py,
    # invisible in interpret mode where CPU keeps the rounding).
    hi_f32 = jax.lax.reduce_precision(depth, exponent_bits=8,
                                      mantissa_bits=7)
    if color is None:
        z = jnp.zeros_like(depth)
        c8 = (z, z, z)
    else:
        from .tsdf import color_layout
        if color_layout(color, intr.height, intr.width) == "interleaved":
            color = jnp.moveaxis(color, -1, 0)
        c8 = jnp.clip(jnp.round(color * 255.0), 0, 255)
    chans = jnp.stack(
        [hi_f32, depth - hi_f32, c8[0], c8[1], c8[2]]).astype(jnp.bfloat16)

    # stride-2 decimation as one-hot selection MATMULS (row selector ·
    # plane · column selector): exact top-left pixel selection entirely
    # on the MXU. The reshape-and-slice decimate that works for f32
    # relayouts bf16 (16,128)-tiled planes — op-profile showed it at
    # ~0.45 ms/frame, 5x the whole f32 cascade; the dots are ~10 µs.
    import numpy as np

    def sel(n_out: int, n_in: int) -> Array:
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), np.arange(n_out) * 2] = 1.0
        return jnp.asarray(m, jnp.bfloat16)

    atlas = jnp.zeros((PLANES, rows, aw), jnp.bfloat16)
    lvl = chans
    for l in range(LEVELS):
        atlas = jax.lax.dynamic_update_slice(atlas, lvl, (0, offs[l], 0))
        if l + 1 < LEVELS:
            R = sel(hs[l + 1], hs[l])           # (h_out, h_in)
            C = sel(ws[l + 1], ws[l]).T         # (w_in, w_out)
            lvl = jnp.einsum("rh,phw,wc->prc", R, lvl, C,
                             preferred_element_type=jnp.bfloat16)
    return atlas


def _kernel(spec: vx.VoxelGridSpec, cfg, intr: PinholeIntrinsics,
            # scalar prefetch
            params_ref,
            # tensor inputs (coords/tiles ride in VMEM blocks — K can be
            # thousands, which would overflow SMEM as scalar prefetch)
            coords_ref, tiles_ref, atlas_ref,
            sdf_ref, w_ref, c_ref,
            # outputs
            out_sdf_ref, out_w_ref, out_c_ref):
    v = spec.voxels_per_side
    v3 = v * v * v
    tau = spec.truncation
    vs = spec.voxel_size
    P = params_ref
    fx, fy, cxp, cyp = P[12], P[13], P[14], P[15]

    # ---- per-voxel lattice: (1, v3) lane vectors (hoisted, static) --------
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, v3), 1)
    ix = idx // (v * v)
    iy = (idx // v) % v
    iz = idx % v

    # ---- per-block scalars as (GROUP, 1) sublane columns ------------------
    BX = coords_ref[:, 0:1]
    BY = coords_ref[:, 1:2]
    BZ = coords_ref[:, 2:3]
    LVL = tiles_ref[:, 0:1]
    V0 = tiles_ref[:, 2:3]
    U0 = tiles_ref[:, 3:4]
    ALIVE = tiles_ref[:, 4:5] > 0

    # ---- projection for ALL GROUP blocks at once: (GROUP, v3) -------------
    # (full sublane utilization — per-block (v3,) vectors run 8x slower)
    px = (BX * v + ix).astype(jnp.float32) * vs + 0.5 * vs
    py = (BY * v + iy).astype(jnp.float32) * vs + 0.5 * vs
    pz = (BZ * v + iz).astype(jnp.float32) * vs + 0.5 * vs
    cx_ = P[0] * px + P[1] * py + P[2] * pz + P[9]
    cy_ = P[3] * px + P[4] * py + P[5] * pz + P[10]
    Z = P[6] * px + P[7] * py + P[8] * pz + P[11]
    zs = jnp.maximum(Z, 1e-6)
    uf = jnp.clip(cx_ / zs * fx + cxp, -1e6, 1e6)
    vf = jnp.clip(cy_ / zs * fy + cyp, -1e6, 1e6)
    ui = jnp.round(uf).astype(jnp.int32)
    vi = jnp.round(vf).astype(jnp.int32)
    IN = ((Z > cfg.min_range)
          & (ui >= 0) & (ui < intr.width)
          & (vi >= 0) & (vi < intr.height) & ALIVE)
    LU = jnp.where(IN, (ui >> LVL) - U0, -1)      # pixel col in tile
    LV = jnp.where(IN, (vi >> LVL) - V0, -1)      # pixel row in tile

    # ---- per-block transposed one-hot selects -----------------------------
    sub_w = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, v3), 0)
    th = getattr(cfg, "tile_h", TILE_H)
    sub_h = jax.lax.broadcasted_iota(jnp.int32, (1, th, v3), 1)
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)

    def body(j, acc):
        D, CR, CG, CB = acc
        hit = rowsel == j                                    # (GROUP,1)
        lu_j = jnp.sum(jnp.where(hit, LU, 0), axis=0, keepdims=True)
        lv_j = jnp.sum(jnp.where(hit, LV, 0), axis=0, keepdims=True)
        row0 = pl.multiple_of(tiles_ref[j, 1], 8)
        col0 = pl.multiple_of(tiles_ref[j, 3], 128)
        tile = jnp.concatenate(
            [atlas_ref[p, pl.ds(row0, th), pl.ds(col0, TILE_W)]
             for p in range(PLANES)], axis=0)      # (PLANES·Th, Tw) bf16
        # one-hots built directly transposed: sublane iota vs lane vector
        ohuT = (sub_w == lu_j).astype(jnp.bfloat16)          # (Tw, v3)
        ohvT = (sub_h == lv_j[None]).astype(jnp.float32)     # (1, Th, v3)
        cand = jax.lax.dot_general(
            tile, ohuT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (PLANES·Th, v3)
        sel5 = jnp.sum(cand.reshape(PLANES, th, v3) * ohvT, axis=1)
        hitf = hit.astype(jnp.float32)
        D = D + (sel5[0] + sel5[1])[None, :] * hitf
        CR = CR + sel5[2][None, :] * hitf
        CG = CG + sel5[3][None, :] * hitf
        CB = CB + sel5[4][None, :] * hitf
        return D, CR, CG, CB

    zeros = jnp.zeros((GROUP, v3), jnp.float32)
    D, CR, CG, CB = jax.lax.fori_loop(0, GROUP, body,
                                      (zeros, zeros, zeros, zeros))

    # ---- vectorized TSDF update over all GROUP rows ------------------------
    has_depth = IN & (D > cfg.min_range) & (D < cfg.max_range)
    sdf = D - Z
    observed = has_depth & (sdf > -tau)
    w_obs = jnp.ones_like(sdf)
    if cfg.use_distance_weight:
        w_obs = w_obs / jnp.maximum(D * D, 1.0)
    if cfg.use_dropoff:
        w_obs = w_obs * jnp.clip((sdf + tau) / (0.5 * tau), 0.0, 1.0)
    w_obs = jnp.where(observed, w_obs, 0.0)
    sdf_obs = jnp.clip(sdf, -tau, tau)

    old_sdf = sdf_ref[...]
    old_w = w_ref[...]
    new_w = jnp.minimum(old_w + w_obs, cfg.max_weight)
    denom = jnp.maximum(new_w, 1e-9)
    new_sdf = jnp.where(new_w > 0,
                        (old_w * old_sdf + w_obs * sdf_obs) / denom,
                        old_sdf)
    out_sdf_ref[...] = new_sdf
    out_w_ref[...] = new_w

    # color (PLANAR rows: [r(v3), g(v3), b(v3)]): weighted-average near
    # the surface; channels were selected separately (no unpacking)
    near = w_obs * (jnp.abs(sdf) < tau)
    for ch, img_ch in enumerate((CR, CG, CB)):
        oc = c_ref[:, ch * v3:(ch + 1) * v3]
        nc = jnp.where(new_w > 0,
                       (old_w * oc + near * (img_ch / 255.0)) / denom, oc)
        out_c_ref[:, ch * v3:(ch + 1) * v3] = nc


def compute_tile_specs(spec: vx.VoxelGridSpec, cfg,
                       intr: PinholeIntrinsics, coords: Array, mask: Array,
                       params: Array) -> Array:
    """XLA-side per-block tile selection (vectorized over all K blocks):
    project the 8 block corners (perspective extremes of an axis-aligned
    box with z>0 lie at its corners), pick the finest pyramid level whose
    ALIGNED 64x128 window covers the bbox, and emit
    tiles (K,5) int32 = [lvl, atlas_row0, v0, u0, alive]. Keeping this out
    of the kernel removes its per-block scalar reductions (the dominant
    cost otherwise)."""
    offs, ws, hs, _ = _pyramid_layout(intr)
    bs = spec.block_size
    corner = jnp.stack(jnp.meshgrid(*([jnp.arange(2.0)] * 3),
                                    indexing="ij"), -1).reshape(8, 3) * bs
    pts = coords.astype(jnp.float32)[:, None, :] * bs + corner[None]  # K,8,3
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    p_cam = pts @ R.T + t
    z = p_cam[..., 2]
    zs = jnp.maximum(z, 1e-6)
    u = jnp.clip(p_cam[..., 0] / zs * params[12] + params[14], -1e6, 1e6)
    v = jnp.clip(p_cam[..., 1] / zs * params[13] + params[15], -1e6, 1e6)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    umin = jnp.clip(jnp.min(ui, 1), 0, intr.width - 1)
    umax = jnp.clip(jnp.max(ui, 1), 0, intr.width - 1)
    vmin = jnp.clip(jnp.min(vi, 1), 0, intr.height - 1)
    vmax = jnp.clip(jnp.max(vi, 1), 0, intr.height - 1)
    # a corner behind the camera breaks the corner-extreme argument →
    # fall back to the whole-image level
    degenerate = jnp.any(z <= cfg.min_range, axis=1)

    lvl = jnp.full(umin.shape, LEVELS - 1, jnp.int32)
    for l in range(LEVELS - 2, -1, -1):
        u0l = ((umin >> l) >> 7) << 7
        v0l = ((vmin >> l) >> 3) << 3
        fits = (((umax >> l) - u0l) < TILE_W) & (
            ((vmax >> l) - v0l) < getattr(cfg, "tile_h", TILE_H))
        lvl = jnp.where(fits, l, lvl)
    lvl = jnp.where(degenerate, LEVELS - 1, lvl)
    ro = jnp.asarray(offs, jnp.int32)[lvl]
    u0 = jnp.where(degenerate, 0, ((umin >> lvl) >> 7) << 7)
    v0 = jnp.where(degenerate, 0, ((vmin >> lvl) >> 3) << 3)
    return jnp.stack([lvl, ro + v0, v0, u0,
                      mask.astype(jnp.int32)], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("spec", "cfg", "intr", "interpret"))
def tsdf_update_blocks(spec: vx.VoxelGridSpec, cfg, intr: PinholeIntrinsics,
                       coords: Array, tiles: Array, params: Array,
                       atlas: Array,
                       old_sdf: Array, old_w: Array, old_c_planar: Array,
                       interpret: bool = False):
    """Run the block-update kernel over K touched blocks.

    coords (K,3) int32 block coords; tiles (K,5) from compute_tile_specs;
    params (16,) f32 = [R row-major(9), t(3), fx, fy, cx, cy];
    atlas (PLANES, rows, aw) bf16 from build_atlases;
    old_sdf/old_w (K, v3); old_c_planar (K, 3*v3) channel-major.
    → (new_sdf, new_w, new_c_planar).
    """
    K = coords.shape[0]
    assert K % GROUP == 0, f"K must be a multiple of {GROUP}"
    v3 = spec.voxels_per_side ** 3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, 3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 5), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(atlas.shape, lambda i, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, v3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, v3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, v3 * 3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, v3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, v3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, v3 * 3), lambda i, p: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(_kernel, spec, cfg, intr)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((K, v3), jnp.float32),
            jax.ShapeDtypeStruct((K, v3), jnp.float32),
            jax.ShapeDtypeStruct((K, v3 * 3), jnp.float32),
        ],
        interpret=interpret,
    )(params, coords, tiles, atlas, old_sdf, old_w, old_c_planar)
