"""Benchmark: TSDF integration frames/s/chip on the per-robot hot path.

Prints ONE JSON line:
  {"metric": "tsdf_integration_fps", "value": N, "unit": "frames/s/chip",
   "vs_baseline": N}

vs_baseline compares against the CPU baseline (the reference pipeline is
CPU-only — voxblox fast integrator w/ 8 OpenMP threads; BASELINE.md pins
the operating point: 640x480 @ 5 cm voxels, 0.15 m truncation, 10 m max
range). The CPU number is measured once on this machine via a subprocess
and cached in .bench_cpu_baseline.json.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cpu_baseline.json")
N_FRAMES = 30
SCALE = 1.0  # 640x480


def run(cpu: bool, n_frames: int, quiet: bool = False):
    from coxgraph_tpu.utils import runtime
    if cpu:
        runtime.force_cpu(1)
    runtime.enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import tsdf as tsdf_ops

    cfg = sm.MapperConfig(
        spec=vx.VoxelGridSpec(voxel_size=0.05, voxels_per_side=16,
                              grid_dim=64, max_blocks=8192, truncation=0.15),
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=4096),
        intrinsics=syn.PinholeIntrinsics().scaled(SCALE),
        max_submaps=4,
        max_history=1024,
        submap_interval=1e9,  # single submap: pure integration throughput
    )
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(n_frames, scene.room_center, radius=2.5)

    # pre-render all frames (input pipeline excluded from the metric)
    frames = []
    for i in range(n_frames):
        d, c = syn.render_depth(scene, cfg.intrinsics, traj[i])
        frames.append((d, c))
    jax.block_until_ready(frames[-1][0])

    state = sm.create_mapper(cfg)
    state = sm.start_submap(cfg, state, traj[0], jnp.asarray(0.0))
    # warmup / compile
    state = sm.integrate(cfg, state, frames[0][0], frames[0][1], traj[0],
                         jnp.asarray(0.0))
    jax.block_until_ready(state.frame_count)

    t0 = time.perf_counter()
    for i in range(1, n_frames):
        state = sm.integrate(cfg, state, frames[i][0], frames[i][1], traj[i],
                             jnp.asarray(i * 0.05))
    jax.block_until_ready(state.frame_count)
    dt = time.perf_counter() - t0
    fps = (n_frames - 1) / dt
    if not quiet:
        print(f"# backend={jax.default_backend()} frames={n_frames - 1} "
              f"wall={dt:.2f}s fps={fps:.1f}", file=sys.stderr)
    return fps


def cpu_baseline() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["fps"]
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    fps = json.loads(line)["fps"]
    with open(CACHE, "w") as f:
        json.dump({"fps": fps}, f)
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-baseline", action="store_true")
    ap.add_argument("--frames", type=int, default=N_FRAMES)
    args = ap.parse_args()

    if args.cpu_baseline:
        fps = run(cpu=True, n_frames=min(args.frames, 8), quiet=True)
        print(json.dumps({"fps": fps}))
        return

    fps = run(cpu=False, n_frames=args.frames)
    base = cpu_baseline()
    print(json.dumps({
        "metric": "tsdf_integration_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / base, 2),
    }))


if __name__ == "__main__":
    main()
