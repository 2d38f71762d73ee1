"""Live map viewer (eval/live_view.py) — the headless stand-in for the
reference's Open3D live windows (coxgraph_client.h:177-214,
server_visualizer.h:108-120)."""

import json
import os

import numpy as np

from coxgraph_tpu.eval.live_view import LiveMeshViewer


def test_viewer_writes_selfcontained_page(tmp_path):
    v = np.random.default_rng(0).normal(0, 1, (500, 3)).astype(np.float32)
    c = np.full((500, 3), 128, np.uint8)
    viewer = LiveMeshViewer(str(tmp_path), label="unit", max_points=200)
    p = viewer.update(v, c)
    assert os.path.exists(p)
    html = open(p).read()
    assert "coxgraph_tpu live map" in html
    assert "http-equiv=\"refresh\"" in html      # auto-reload
    assert "src=" not in html                    # no external deps
    meta = json.load(open(os.path.join(str(tmp_path), "live.json")))
    assert 0 < meta["n_points"] <= 200           # decimated to budget
    # second update replaces atomically and bumps the counter
    viewer.update(v)
    meta = json.load(open(os.path.join(str(tmp_path), "live.json")))
    assert meta["update"] == 1


def test_viewer_pulls_from_server(tmp_path):
    import jax.numpy as jnp

    from coxgraph_tpu.core import geometry as geo, voxel as vx
    from coxgraph_tpu.frontends import synthetic as syn
    from coxgraph_tpu.mapper import submap_mapper as sm
    from coxgraph_tpu.ops import tsdf as tsdf_ops
    from coxgraph_tpu.server import fusion_server as fs
    from coxgraph_tpu.server.client_interface import InProcessClient
    from coxgraph_tpu.solver import pose_graph as pg

    # capacity sized for two robots on OPPOSITE sides of the scene: the
    # global merge touches ~2x one robot's coverage plus resample halos
    spec = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                            max_blocks=1024, truncation=0.3)
    cfg = sm.MapperConfig(
        spec=spec,
        integrator=tsdf_ops.TsdfIntegratorConfig(max_touched_blocks=256),
        intrinsics=syn.PinholeIntrinsics().scaled(0.125),
        max_submaps=4, max_history=32, submap_interval=100.0)
    scene = syn.default_scene()
    traj = syn.orbit_trajectory(2, scene.room_center, radius=2.5)
    clients = []
    for cid in range(2):
        T = traj[cid]
        d, c = syn.render_depth(scene, cfg.intrinsics, T)
        st = sm.create_mapper(cfg)
        st = sm.start_submap(cfg, st, T, jnp.asarray(0.0))
        st = sm.integrate(cfg, st, d, c, T, jnp.asarray(0.0))
        clients.append(InProcessClient(cid, cfg, st))
    server = fs.CoxgraphServer(
        fs.ServerConfig(spec=spec, max_submaps=8,
                        solver=pg.SolverConfig(iterations=3)), clients)
    server.map_fusion(fs.MapFusionMsg(
        from_client=0, from_time=0.0, to_client=1, to_time=0.0,
        T_from_to=geo.relative(traj[0], traj[1])))

    viewer = LiveMeshViewer(str(tmp_path), max_points=5000)
    p = viewer.update_from_server(server)
    meta = json.load(open(os.path.join(str(tmp_path), "live.json")))
    assert meta["n_points"] > 20          # one tiny frame per robot
    assert os.path.getsize(p) > 2_000
