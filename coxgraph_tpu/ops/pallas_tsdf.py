"""Pallas TPU kernel for the projective TSDF voxel update — the per-robot
hot loop (reference: voxblox fast/merged integrators, 8 OpenMP threads,
tsdf_recover.yaml:12).

Why a kernel: the XLA formulation spends its time in a 4096-wide random
depth gather per block (duplicate-heavy addresses serialize the vector
gather unit — two orders of magnitude off the roofline). This kernel
converts the gather into MXU matmuls:

  * the depth (and packed-RGB) image is pre-decimated into a 5-level
    stride pyramid packed into one VMEM-resident atlas;
  * per block, the projected pixel bbox picks the finest level whose
    ALIGNED 64x128 tile window covers it (the voxblox "fast" integrator's
    subsampled-ray trade, applied per block);
  * the per-voxel depth fetch becomes one-hot contractions on the MXU
    (cand = onehot_u @ tile-transposed, then a VPU row-select) — exact
    selects, zero scattered memory traffic. Inputs are split hi/lo into
    bf16 pairs/triples so the MXU runs at bf16 rate with near-f32-exact
    results: depth = hi + lo (~0.1 mm error at 10 m); the 24-bit packed
    RGB splits exactly into three 8-bit bf16 planes.

Per grid step the kernel processes GROUP=8 blocks in a fori_loop (Mosaic
reuses the loop body's VMEM; an unrolled loop would keep 8 copies of the
one-hot alive and overflow VMEM), merging per-block results into small
(GROUP, v3) carries, then applies the TSDF running-average update
vectorized over all GROUP rows. Pool rows are gathered/scattered XLA-side
(row DMA is fast there); color arrives in PLANAR channel layout so every
in-kernel slice is static.
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

TILE_H = 64        # tile rows (window aligned to 8 sublanes)
TILE_W = 128       # tile lanes (window aligned to 128 lanes)
LEVELS = 5         # stride pyramid 1,2,4,8,16
GROUP = 8          # blocks per grid step (TPU block-dim-0 granularity)


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
                  color: Optional[Array]) -> Tuple[Array, Array]:
    """Depth (H,W) + color (H,W,3)|None → (atlas_d, atlas_c), each
    (total_rows, max(W,TILE_W)) f32. Level l is the stride-2^l subsample
    (top-left aligned); cells beyond a level's extent stay 0 (= invalid
    depth). Color is packed r*2^16+g*2^8+b (exact below 2^24)."""
    offs, ws, hs, rows = _pyramid_layout(intr)
    aw = max(intr.width, TILE_W)
    if color is None:
        packed = jnp.zeros_like(depth)
    else:
        c8 = jnp.clip(jnp.round(color * 255.0), 0, 255).astype(jnp.float32)
        packed = c8[..., 0] * 65536.0 + c8[..., 1] * 256.0 + c8[..., 2]

    def pyramid(img):
        parts = []
        lvl = img
        for l in range(LEVELS):
            h, w = lvl.shape
            pad_h = (offs[l + 1] - offs[l] if l + 1 < LEVELS
                     else rows - offs[l]) - h
            parts.append(jnp.pad(lvl, ((0, pad_h), (0, aw - w))))
            lvl = lvl[::2, ::2]   # cascade: each level from the previous
        return jnp.concatenate(parts, axis=0)

    return pyramid(depth), pyramid(packed)


def _split_hi_lo(x):
    """f32 → (hi, lo) bf16 pair with hi + lo ~= x to ~16-bit mantissa."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _select_matmul(ohu_bf, tile_bf, ohv):
    """cand = ohu @ tile^T on the MXU (bf16 in, f32 out), then row-select:
    → (v3,) f32 values tile[lv_n, lu_n]."""
    cand = jax.lax.dot_general(
        ohu_bf, tile_bf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (v3, TILE_H)
    return jnp.sum(ohv * cand, axis=1)


def _kernel(spec: vx.VoxelGridSpec, cfg, intr: PinholeIntrinsics,
            # scalar prefetch
            params_ref,
            # tensor inputs (coords/tiles ride in VMEM blocks — K can be
            # thousands, which would overflow SMEM as scalar prefetch)
            coords_ref, tiles_ref,
            atlas_d_ref, atlas_c_ref, sdf_ref, w_ref, c_ref,
            # outputs
            out_sdf_ref, out_w_ref, out_c_ref):
    g = pl.program_id(0)
    v = spec.voxels_per_side
    v3 = v * v * v
    tau = spec.truncation

    idx = jax.lax.broadcasted_iota(jnp.int32, (v3, 1), 0).squeeze(-1)
    ix = idx // (v * v)
    iy = (idx // v) % v
    iz = idx % v
    vs = spec.voxel_size
    P = params_ref
    fx, fy, cxp, cyp = P[12], P[13], P[14], P[15]
    row_sel = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)

    def body(j, carry):
        D, CPK, Z, VAL = carry
        # tile spec precomputed XLA-side from block-corner projections
        # (tiles = [lvl, atlas_row0, v0, u0, alive]): keeps the kernel
        # free of per-block scalar reductions, which dominate otherwise
        lvl = tiles_ref[j, 0]
        aro = tiles_ref[j, 1]
        v0 = tiles_ref[j, 2]
        u0 = tiles_ref[j, 3]
        alive = tiles_ref[j, 4] > 0

        def compute(_):
            bx = coords_ref[j, 0]
            by = coords_ref[j, 1]
            bz = coords_ref[j, 2]
            px = (bx * v + ix).astype(jnp.float32) * vs + 0.5 * vs
            py = (by * v + iy).astype(jnp.float32) * vs + 0.5 * vs
            pz = (bz * v + iz).astype(jnp.float32) * vs + 0.5 * vs
            cx_ = P[0] * px + P[1] * py + P[2] * pz + P[9]
            cy_ = P[3] * px + P[4] * py + P[5] * pz + P[10]
            z = P[6] * px + P[7] * py + P[8] * pz + P[11]
            zs = jnp.maximum(z, 1e-6)
            uf = jnp.clip(cx_ / zs * fx + cxp, -1e6, 1e6)
            vf = jnp.clip(cy_ / zs * fy + cyp, -1e6, 1e6)
            ui = jnp.round(uf).astype(jnp.int32)
            vi = jnp.round(vf).astype(jnp.int32)
            in_img = ((z > cfg.min_range)
                      & (ui >= 0) & (ui < intr.width)
                      & (vi >= 0) & (vi < intr.height))

            row0 = pl.multiple_of(aro, 8)
            col0 = pl.multiple_of(u0, 128)
            tile_d = atlas_d_ref[pl.ds(row0, TILE_H), pl.ds(col0, TILE_W)]
            tile_c = atlas_c_ref[pl.ds(row0, TILE_H), pl.ds(col0, TILE_W)]

            lu = jnp.where(in_img, (ui >> lvl) - u0, -1)
            lv = jnp.where(in_img, (vi >> lvl) - v0, -1)
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (v3, TILE_W), 1)
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (v3, TILE_H), 1)
            ohu = (lu[:, None] == lane_w).astype(jnp.bfloat16)  # (v3,Tw)
            ohv = (lv[:, None] == lane_h).astype(jnp.float32)   # (v3,Th)

            # depth: hi/lo bf16 split (~16-bit mantissa, ~0.1 mm at 10 m)
            d_hi, d_lo = _split_hi_lo(tile_d)
            d = (_select_matmul(ohu, d_hi, ohv)
                 + _select_matmul(ohu, d_lo, ohv))
            # packed RGB: exact 3-way split into 8-bit bf16 planes
            c_hi = jnp.floor(tile_c / 65536.0)
            rem = tile_c - c_hi * 65536.0
            c_mid = jnp.floor(rem / 256.0)
            c_lo = rem - c_mid * 256.0
            cr = _select_matmul(ohu, c_hi.astype(jnp.bfloat16), ohv)
            cg = _select_matmul(ohu, c_mid.astype(jnp.bfloat16), ohv)
            cb = _select_matmul(ohu, c_lo.astype(jnp.bfloat16), ohv)
            cpk = cr * 65536.0 + cg * 256.0 + cb
            return d, cpk, z, in_img.astype(jnp.float32)

        def skip(_):
            zz = jnp.zeros((v3,), jnp.float32)
            return zz, zz, zz, zz

        d, cpk, z, val = jax.lax.cond(alive, compute, skip, 0)

        hit = row_sel == j                                  # (GROUP,1)
        D = jnp.where(hit, d[None, :], D)
        CPK = jnp.where(hit, cpk[None, :], CPK)
        Z = jnp.where(hit, z[None, :], Z)
        VAL = jnp.where(hit, val[None, :], VAL)
        return D, CPK, Z, VAL

    zeros = jnp.zeros((GROUP, v3), jnp.float32)
    D, CPK, Z, VAL = jax.lax.fori_loop(
        0, GROUP, body, (zeros, zeros, zeros, zeros))

    # ---- vectorized TSDF update over all GROUP rows ------------------------
    in_img = VAL > 0.5
    has_depth = in_img & (D > cfg.min_range) & (D < cfg.max_range)
    sdf = D - Z
    observed = has_depth & (sdf > -tau)
    w_obs = jnp.ones_like(sdf)
    if cfg.use_distance_weight:
        w_obs = w_obs / jnp.maximum(D * D, 1.0)
    if cfg.use_dropoff:
        w_obs = w_obs * jnp.clip((sdf + tau) / (0.5 * tau), 0.0, 1.0)
    # dead blocks already produced VAL = 0 in the loop
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

    # color (PLANAR rows: [r(v3), g(v3), b(v3)]): unpack the packed pixel,
    # weighted-average near the surface
    near = w_obs * (jnp.abs(sdf) < tau)
    cr = jnp.floor(CPK / 65536.0)
    cg = jnp.floor((CPK - cr * 65536.0) / 256.0)
    cb = CPK - cr * 65536.0 - cg * 256.0
    for ch, img_ch in enumerate((cr, cg, cb)):
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
            ((vmax >> l) - v0l) < TILE_H)
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
                       atlas_d: Array, atlas_c: Array,
                       old_sdf: Array, old_w: Array, old_c_planar: Array,
                       interpret: bool = False):
    """Run the block-update kernel over K touched blocks.

    coords (K,3) int32 block coords; tiles (K,5) from compute_tile_specs;
    params (16,) f32 = [R row-major(9), t(3), fx, fy, cx, cy];
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
            pl.BlockSpec(atlas_d.shape, lambda i, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(atlas_c.shape, lambda i, p: (0, 0),
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
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((K, v3), jnp.float32),
            jax.ShapeDtypeStruct((K, v3), jnp.float32),
            jax.ShapeDtypeStruct((K, v3 * 3), jnp.float32),
        ],
        interpret=interpret,
    )(params, coords, tiles,
      atlas_d, atlas_c, old_sdf, old_w, old_c_planar)
