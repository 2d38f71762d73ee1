"""Op-profile the frame-integration hot path on the current backend.

The single highest-leverage perf tool in this repo (docs/PERFORMANCE.md
"Profiling recipe"): runs a warm `integrate_batch` window under
jax.profiler.trace with an honest readback fence, then parses the trace
with xprof's op_profile converter and prints the top ops with their
source mapping. Every round-2 kernel win started from this view.

Usage:
    python tools/profile_integrate.py [--frames 30] [--scale 1.0]
        [--top 25] [--tracedir /tmp/jaxtrace_frame]

On the axon TPU tunnel the first run pays ~10 compiles (10-40 s each);
enable_compilation_cache makes repeats fast.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coxgraph_tpu.utils import runtime

runtime.enable_compilation_cache()

import jax
import jax.numpy as jnp


def capture(tracedir: str, n_frames: int, scale: float):
    from coxgraph_tpu.core import voxel as vx
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import tsdf as tsdf_ops

    cfg = sm.MapperConfig(
        spec=vx.VoxelGridSpec(voxel_size=0.05, voxels_per_side=16,
                              grid_dim=64, max_blocks=2048,
                              truncation=0.15),
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=512),
        intrinsics=syn.PinholeIntrinsics().scaled(scale),
        max_submaps=4, max_history=1024, submap_interval=1e9)
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(n_frames, scene.room_center, radius=2.5)
    frames = [syn.render_depth(scene, cfg.intrinsics, traj[i])
              for i in range(n_frames)]
    jax.block_until_ready(frames[-1][0])
    depths = jnp.stack([f[0] for f in frames])
    colors = jnp.stack([f[1] for f in frames])
    ts = jnp.arange(n_frames, dtype=jnp.float32) * 0.05

    def fresh():
        s = sm.create_mapper(cfg)
        s = sm.start_submap(cfg, s, traj[0], jnp.asarray(0.0))
        return sm.integrate_batch(cfg, s, depths[:1], colors[:1],
                                  traj[:1], ts[:1])

    # warm both window shapes, fence on real data
    s = fresh()
    s = sm.integrate_batch(cfg, s, depths[1:], colors[1:], traj[1:], ts[1:])
    float(jnp.sum(s.collection.layers.weight))

    s = fresh()
    float(jnp.sum(s.collection.layers.weight))
    with jax.profiler.trace(tracedir):
        s = sm.integrate_batch(cfg, s, depths[1:], colors[1:],
                               traj[1:], ts[1:])
        # READBACK FENCE: through the axon tunnel block_until_ready can
        # return before execution — only a data readback is honest
        fence = float(jnp.sum(s.collection.layers.weight))
    print(f"# backend={jax.default_backend()} frames={n_frames - 1} "
          f"fence={fence:.1f}", file=sys.stderr)


def report(tracedir: str, top: int, n_frames: int):
    from xprof.convert import raw_to_tool_data as r2t

    runs = sorted(glob.glob(tracedir + "/plugins/profile/*"))
    if not runs:
        sys.exit(f"no trace under {tracedir}")
    xplane = glob.glob(runs[-1] + "/*.xplane.pb")[0]
    data, _ = r2t.xspace_to_tool_data(
        [xplane], "op_profile",
        {"tqx": "out:json;", "host": "", "module_name": ""})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data

    leaves = []

    def walk(node, path):
        ch = node.get("children", [])
        m = node.get("metrics", {})
        if not ch and m.get("rawTime"):
            leaves.append((m["rawTime"], node.get("name", "?"), path))
        for c in ch:
            walk(c, path + "/" + node.get("name", "?"))

    walk(d.get("byProgram") or d.get("byCategory"), "")
    leaves.sort(reverse=True)
    total = sum(t for t, _, _ in leaves)
    per_frame = total / 1e9 / max(n_frames - 1, 1)
    print(f"device total {total / 1e9:.3f} ms "
          f"({per_frame:.3f} ms/frame) over {len(leaves)} leaf ops")
    for t, name, path in leaves[:top]:
        print(f"{t / 1e9:9.4f} ms {t / total * 100:5.1f}%  {name}"
              f"  <<{path[-100:]}")
    print("\n# map fusion.N/copy.N names to source: dump the compiled HLO"
          "\n#   jitted.lower(...).compile().as_text()  (same process!)"
          "\n# and grep the op name — metadata carries file:line.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--tracedir", default="/tmp/jaxtrace_frame")
    ap.add_argument("--report-only", action="store_true",
                    help="parse an existing trace without re-running")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.tracedir, args.frames, args.scale)
    report(args.tracedir, args.top, args.frames)


if __name__ == "__main__":
    main()
