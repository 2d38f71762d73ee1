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

Per grid step the kernel processes GROUP=8 blocks with the (j, s)
loops fully STATICALLY unrolled; the voxel axis lives as (rows, lanes) =
block_row_shape(v3) 3-D slabs — a tile-aligned shape whose single-block
rows are legal Mosaic DMA units — and each block's result rows DMA
straight onto their row of the window's WORKING SET (in-place aliased
output). The flat (R, v3) pools are gathered into / scattered out of
that working set ONCE PER WINDOW by the caller
(ops/tsdf._integrate_window_pallas): per-frame XLA row scatters into the
sublane-interleaved pool layout were 24 ms of a 66 ms 30-frame window
(round-3 trace — docs/PERFORMANCE.md). Color arrives in PLANAR channel
layout so every in-kernel slice is static.
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


# ---------------------------------------------------------------------------
# Working-set kernel: 3-D voxel axis + in-kernel row DMA (round 3)
# ---------------------------------------------------------------------------


def block_row_shape(v3: int) -> Tuple[int, int]:
    """(rows, lanes) of one block's voxels in the tile-aligned working
    layout: lanes = max(128, v3/8) so a row group is whole (8,128) tiles
    and a single block is a legal DMA unit (a flat (R, v3) pool row is
    sublane-interleaved across 32 lane-tiles and is NOT — Mosaic rejects
    the slice; docs/PERFORMANCE.md round-3)."""
    L = max(128, v3 // 8)
    assert v3 % L == 0 and v3 >= 128, f"v3={v3} too small for the kernel"
    return v3 // L, L


def _kernel_ws(spec: vx.VoxelGridSpec, cfg, intr: PinholeIntrinsics,
               # scalar prefetch: params (16,), target working rows (K,)
               params_ref, rows_ref,
               # blocked tensor inputs
               coords_ref, tiles_ref, atlas_ref,
               old_sdf_ref, old_w_ref, old_c_ref,
               # working arrays (ANY/HBM; aliased to the outputs; never
               # read — old values arrive pre-gathered above)
               ws_sdf_in, ws_w_in, ws_c_in,
               # outputs = the working arrays, written row-wise by DMA
               out_sdf_ref, out_w_ref, out_c_ref,
               # VMEM scratch + DMA semaphores
               sdf_s, w_s, c_s, sems):
    """One grid step = GROUP blocks, fully STATICALLY unrolled (j, s):
    per block, per sub-row, one (PLANES·th, TILE_W) @ (TILE_W, L) one-hot
    fetch matmul + row select; the TSDF update runs per block on
    (1, R, L) slabs (R sublanes — full vregs); each block's result rows
    DMA straight onto their working-set row. Compute math is identical
    to the flat kernel (bit-exact results)."""
    v = spec.voxels_per_side
    v3 = v * v * v
    R, L = block_row_shape(v3)
    tau = spec.truncation
    vs = spec.voxel_size
    P = params_ref
    fx, fy, cxp, cyp = P[12], P[13], P[14], P[15]
    th = getattr(cfg, "tile_h", TILE_H)
    i = pl.program_id(0)

    # per-voxel lattice over one block: (1, R, L)
    sidx = jax.lax.broadcasted_iota(jnp.int32, (1, R, L), 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, R, L), 2)
    idx = sidx * L + lidx
    ix = idx // (v * v)
    iy = (idx // v) % v
    iz = idx % v

    sub_w = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, L), 0)
    sub_h = jax.lax.broadcasted_iota(jnp.int32, (1, th, L), 1)

    copies = []
    for j in range(GROUP):
        bx = coords_ref[j, 0]
        by = coords_ref[j, 1]
        bz = coords_ref[j, 2]
        lvl = tiles_ref[j, 0]
        v0 = tiles_ref[j, 2]
        u0 = tiles_ref[j, 3]
        alive = tiles_ref[j, 4] > 0

        # ---- projection of this block's voxels: (1, R, L) -------------
        px = (bx * v + ix).astype(jnp.float32) * vs + 0.5 * vs
        py = (by * v + iy).astype(jnp.float32) * vs + 0.5 * vs
        pz = (bz * v + iz).astype(jnp.float32) * vs + 0.5 * vs
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
              & (vi >= 0) & (vi < intr.height) & alive)
        LU = jnp.where(IN, (ui >> lvl) - u0, -1)
        LV = jnp.where(IN, (vi >> lvl) - v0, -1)

        # ---- one-hot fetch, one matmul per sub-row ---------------------
        row0 = pl.multiple_of(tiles_ref[j, 1], 8)
        col0 = pl.multiple_of(tiles_ref[j, 3], 128)
        tile = jnp.concatenate(
            [atlas_ref[p, pl.ds(row0, th), pl.ds(col0, TILE_W)]
             for p in range(PLANES)], axis=0)      # (PLANES·th, Tw) bf16
        drows, crrows, cgrows, cbrows = [], [], [], []
        for s in range(R):
            lu_s = LU[:, s, :]                     # (1, L)
            lv_s = LV[:, s, :]
            ohuT = (sub_w == lu_s).astype(jnp.bfloat16)       # (Tw, L)
            ohvT = (sub_h == jnp.expand_dims(lv_s, 1)
                    ).astype(jnp.float32)                     # (1, th, L)
            cand = jax.lax.dot_general(
                tile, ohuT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (PLANES·th, L)
            sel5 = jnp.sum(cand.reshape(PLANES, th, L) * ohvT,
                           axis=1)                    # (PLANES, L)
            drows.append(sel5[0:1] + sel5[1:2])
            crrows.append(sel5[2:3])
            cgrows.append(sel5[3:4])
            cbrows.append(sel5[4:5])
        D = jnp.concatenate(drows, axis=0)[None]      # (1, R, L)
        CR = jnp.concatenate(crrows, axis=0)[None]
        CG = jnp.concatenate(cgrows, axis=0)[None]
        CB = jnp.concatenate(cbrows, axis=0)[None]

        # ---- TSDF update for this block: (1, R, L) ---------------------
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

        old_sdf = old_sdf_ref[j:j + 1]                # (1, R, L)
        old_w = old_w_ref[j:j + 1]
        new_w = jnp.minimum(old_w + w_obs, cfg.max_weight)
        denom = jnp.maximum(new_w, 1e-9)
        new_sdf = jnp.where(new_w > 0,
                            (old_w * old_sdf + w_obs * sdf_obs) / denom,
                            old_sdf)
        sdf_s[j:j + 1] = new_sdf
        w_s[j:j + 1] = new_w

        near = w_obs * (jnp.abs(sdf) < tau)
        for ch, img_ch in enumerate((CR, CG, CB)):
            oc = old_c_ref[j:j + 1, ch]               # (1, R, L)
            nc = jnp.where(new_w > 0,
                           (old_w * oc + near * (img_ch / 255.0)) / denom,
                           oc)
            c_s[j:j + 1, ch] = nc

        # ---- DMA this block's rows onto its working-set row ------------
        row = rows_ref[i * GROUP + j]
        for t, (src, dst) in enumerate(((sdf_s, out_sdf_ref),
                                        (w_s, out_w_ref),
                                        (c_s, out_c_ref))):
            cp = pltpu.make_async_copy(src.at[pl.ds(j, 1)],
                                       dst.at[pl.ds(row, 1)],
                                       sems.at[j, t])
            cp.start()
            copies.append(cp)
    for cp in copies:
        cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("spec", "cfg", "intr", "interpret"))
def tsdf_update_blocks_ws(spec: vx.VoxelGridSpec, cfg,
                          intr: PinholeIntrinsics,
                          coords: Array, tiles: Array, rows: Array,
                          params: Array, atlas: Array,
                          ws_sdf: Array, ws_w: Array, ws_c: Array,
                          old_sdf: Array, old_w: Array, old_c: Array,
                          interpret: bool = False):
    """Working-set block update: results land IN PLACE on the (U, R, L)
    working arrays (aliased outputs, row DMA per block).

    coords (K,3); tiles (K,5); rows (K,) target working-set rows (dead
    blocks FIRST — their clamped targets are overwritten by any later
    live update of the same row); params (16,); atlas from
    build_atlases; ws_sdf/ws_w (U, R, L), ws_c (U, 3, R, L);
    old_sdf/old_w (K, R, L), old_c (K, 3, R, L) = the pre-gathered
    working rows at ``rows`` (dead blocks rewrite their own old values —
    a no-op). → (ws_sdf, ws_w, ws_c) updated."""
    K = coords.shape[0]
    assert K % GROUP == 0, f"K must be a multiple of {GROUP}"
    v3 = spec.voxels_per_side ** 3
    R, L = block_row_shape(v3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, 3), lambda i, p, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 5), lambda i, p, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(atlas.shape, lambda i, p, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, R, L), lambda i, p, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, R, L), lambda i, p, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 3, R, L), lambda i, p, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # working buffers: aliased to the outputs, never read here
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP, R, L), jnp.float32),
            pltpu.VMEM((GROUP, R, L), jnp.float32),
            pltpu.VMEM((GROUP, 3, R, L), jnp.float32),
            pltpu.SemaphoreType.DMA((GROUP, 3)),
        ],
    )
    kern = functools.partial(_kernel_ws, spec, cfg, intr)
    U = ws_sdf.shape[0]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((U, R, L), jnp.float32),
            jax.ShapeDtypeStruct((U, R, L), jnp.float32),
            jax.ShapeDtypeStruct((U, 3, R, L), jnp.float32),
        ],
        # operand indices INCLUDE the scalar-prefetch args: the working
        # buffers are operands 8/9/10 of (params, rows, coords, tiles,
        # atlas, old_sdf, old_w, old_c, ws_sdf, ws_w, ws_c)
        input_output_aliases={8: 0, 9: 1, 10: 2},
        interpret=interpret,
    )(params, rows, coords, tiles, atlas, old_sdf, old_w, old_c,
      ws_sdf, ws_w, ws_c)
