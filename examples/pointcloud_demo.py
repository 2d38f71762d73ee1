"""Pointcloud-sensor (lidar-style) mapping demo — the reference client's
native ``pointcloud``-topic input (SURVEY.md §3.2: sensor → voxblox
tsdf_server integratePointCloud, 'merged' method tsdf_recover.yaml:5).

A robot streams UNORDERED point clouds (no pinhole model at the mapper:
clouds are backprojected from rendered depth, shuffled, and fed as bare
3-D points) through HostMapper.step_points → merged/bundled TSDF
integration (ops/points.py) → submap chain → mesh + surface-error gate
against the analytic scene.

Run: python examples/pointcloud_demo.py [--frames N] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/coxgraph_pointcloud_demo")
    ap.add_argument("--scale", type=float, default=0.25)
    args = ap.parse_args()

    from coxgraph_tpu.utils import runtime
    if args.cpu:
        runtime.force_cpu()
    runtime.enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.eval import export
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import mesh as mesh_ops, tsdf as tsdf_ops

    os.makedirs(args.out, exist_ok=True)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    dt = 0.1
    spec = vx.VoxelGridSpec(voxel_size=0.05, voxels_per_side=16,
                            grid_dim=64, max_blocks=4096, truncation=0.15)
    intr = syn.PinholeIntrinsics().scaled(args.scale)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=2048),
        intrinsics=intr, max_submaps=8, max_history=64,
        submap_interval=args.frames * dt / 4)
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(args.frames, scene.room_center, radius=2.5)
    traj_np = np.asarray(traj)

    mapper = sm.HostMapper(cfg)
    rng = np.random.default_rng(0)
    t0 = time.time()
    cap = None
    for i in range(args.frames):
        depth, color = syn.render_depth(scene, intr, traj[i])
        # sensor-frame cloud: backproject, then SHUFFLE — the mapper gets
        # an unordered cloud, exactly what a lidar driver would hand over
        p = np.asarray(tsdf_ops._backproject(intr, depth)).reshape(-1, 3)
        c = np.asarray(color).reshape(-1, 3)
        m = np.asarray(depth).reshape(-1) > 0.1
        perm = rng.permutation(p.shape[0])
        p, c, m = p[perm], c[perm], m[perm]
        # fixed capacity keeps the jit cache at one entry
        cap = p.shape[0] if cap is None else cap
        mapper.step_points(jnp.asarray(p[:cap]), jnp.asarray(c[:cap]),
                           jnp.asarray(m[:cap]),
                           jnp.asarray(traj_np[i]), i * dt)
    n_sub = mapper.n_submaps
    jax.block_until_ready(mapper.state.collection.layers.weight)
    print(f"integrated {args.frames} clouds → {n_sub} submaps "
          f"in {time.time() - t0:.1f}s")

    merged = sm.merged_layer(cfg, mapper.state.collection)
    verts, cols = mesh_ops.extract_mesh(spec, merged, min_weight=1e-4)
    ply = os.path.join(args.out, "pointcloud_map.ply")
    export.write_ply(ply, verts, cols)
    sdf = np.asarray(syn.scene_sdf(scene, jnp.asarray(verts.reshape(-1, 3))))
    p90 = float(np.quantile(np.abs(sdf), 0.9))
    print(f"mesh: {verts.shape[0]} tris → {ply}; surface error p90 "
          f"{p90 * 100:.1f} cm")

    assert n_sub >= 3, n_sub
    assert verts.shape[0] > 1000
    assert p90 < 2.0 * spec.voxel_size, p90
    print("DEMO PASS")


if __name__ == "__main__":
    main()
