"""Generate the committed REAL-IMAGERY TUM-RGBD fixture
(tests/fixtures/tum_real) — VERDICT r3 Missing #3 / task #8: the feature
pipeline must be validated against real camera texture and noise, not
only the analytic checkerboard.

This build environment has zero network egress, so an actual public
TUM/ICL excerpt cannot be downloaded. The honest middle ground: the
committed clip maps REAL PHOTOGRAPHS (bundled with matplotlib /
scikit-learn / pygame — real sensor texture, real gradients, real JPEG
statistics) onto the analytic scene's surfaces and pushes every frame
through a Kinect-style sensor model:

  * RGB: photo texture × Lambert shading, Gaussian shot noise, and a
    JPEG encode/decode round trip (quality 90) so the descriptors see
    real compression artifacts;
  * depth: axial noise σ(z) = 1.2 mm + 1.9 mm·(z − 0.4)² (the Khoshelham
    & Elberink Kinect model shape), grazing-incidence dropout
    (cos θ < 0.12 → invalid, as structured-light sensors lose lock), and
    0.3 % random speckle holes — before the TUM factor-5000 16-bit
    quantization.

The geometry stays analytic so ground truth is exact. Run once:

    python tests/make_real_fixture.py

Consumed by tests/test_real_replay.py — the SAME drift-correction gate
as tum_loop, driven by the real feature loop detector over these frames
(reference parity: replay-driven validation, corb_frontend_cvg.launch:46-51).
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = 1305031102.175
DT = 0.1
N_FRAMES = 144
SCALE = 0.25           # 160×120
SWEEP = 4.0            # two full turns → closures along the whole path


def _load_photos():
    """Real photographs bundled with installed packages (each a genuine
    camera capture; no synthetic art)."""
    from PIL import Image

    sp = "/opt/venv/lib/python3.12/site-packages"
    candidates = [
        f"{sp}/sklearn/datasets/images/china.jpg",
        f"{sp}/sklearn/datasets/images/flower.jpg",
        f"{sp}/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
        f"{sp}/pygame/docs/generated/_images/intro_freedom.jpg",
        f"{sp}/pygame/docs/generated/_images/intro_blade.jpg",
        f"{sp}/pygame/docs/generated/_images/camera_rgb.jpg",
    ]
    photos = []
    for c in candidates:
        for p in glob.glob(c):
            img = np.asarray(Image.open(p).convert("RGB"), np.float32)
            photos.append(img / 255.0)
            break
    assert len(photos) >= 3, "no bundled real photos found"
    return photos


def _sample(photo, u, v):
    """Bilinear-free nearest sample of photo (H,W,3) at u,v in [0,1]."""
    h, w = photo.shape[:2]
    iu = np.clip((u * (w - 1)).astype(np.int32), 0, w - 1)
    iv = np.clip((v * (h - 1)).astype(np.int32), 0, h - 1)
    return photo[iv, iu]


def _classify_and_uv(scene_np, p, eps=5e-3):
    """Per-pixel surface id + UV for hit points p (N,3).

    Surfaces: 0-5 room walls (-x,+x,-y,+y,-z floor,+z ceiling),
    6.. spheres, then boxes. UV spans each surface once (no tiling — a
    repeated texture would hand the loop detector aliased matches)."""
    c = scene_np["room_center"]
    hlf = scene_np["room_half"]
    q = p - c
    sid = np.full(p.shape[0], -1, np.int64)
    best = np.full(p.shape[0], np.inf)

    # walls: distance to each face plane
    for ax in range(3):
        for si, sign in enumerate((-1.0, 1.0)):
            d = np.abs(q[:, ax] - sign * hlf[ax])
            m = d < best
            sid[m] = ax * 2 + si
            best[m] = d[m]
    # spheres
    for i, s in enumerate(scene_np["spheres"]):
        d = np.abs(np.linalg.norm(p - s[:3], axis=1) - s[3])
        m = d < best
        sid[m] = 6 + i
        best[m] = d[m]
    # boxes
    nsph = len(scene_np["spheres"])
    for i, b in enumerate(scene_np["boxes"]):
        bc = 0.5 * (b[:3] + b[3:])
        bh = 0.5 * (b[3:] - b[:3])
        qq = np.abs(p - bc) - bh
        d = np.abs(np.maximum(qq.max(axis=1), 0)
                   + np.minimum(qq.max(axis=1), 0))
        m = d < best
        sid[m] = 6 + nsph + i
        best[m] = d[m]

    u = np.zeros(p.shape[0], np.float32)
    v = np.zeros(p.shape[0], np.float32)
    for ax in range(3):
        for si in range(2):
            w = sid == ax * 2 + si
            if not w.any():
                continue
            a1, a2 = [a for a in range(3) if a != ax]
            u[w] = (q[w, a1] / hlf[a1] + 1) * 0.5
            v[w] = (q[w, a2] / hlf[a2] + 1) * 0.5
    for i, s in enumerate(scene_np["spheres"]):
        w = sid == 6 + i
        if not w.any():
            continue
        r = p[w] - s[:3]
        u[w] = (np.arctan2(r[:, 1], r[:, 0]) / np.pi + 1) * 0.5
        v[w] = np.arccos(np.clip(r[:, 2] / max(s[3], 1e-6), -1, 1)) / np.pi
    for i, b in enumerate(scene_np["boxes"]):
        w = sid == 6 + nsph + i
        if not w.any():
            continue
        bc = 0.5 * (b[:3] + b[3:])
        bh = np.maximum(0.5 * (b[3:] - b[:3]), 1e-6)
        qq = (p[w] - bc) / bh
        ax = np.argmax(np.abs(qq), axis=1)
        for a in range(3):
            ww = ax == a
            a1, a2 = [x for x in range(3) if x != a]
            u[np.where(w)[0][ww]] = (qq[ww, a1] + 1) * 0.5
            v[np.where(w)[0][ww]] = (qq[ww, a2] + 1) * 0.5
    return sid, u, v


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp
    from PIL import Image

    from coxgraph_tpu.core import geometry as geo
    from coxgraph_tpu.frontends import synthetic as syn

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "tum_real")
    for sub in ("rgb", "depth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    scene = syn.default_scene()
    scene_np = {
        "room_center": np.asarray(scene.room_center, np.float64),
        "room_half": np.asarray(scene.room_half, np.float64),
        "spheres": np.asarray(scene.spheres, np.float64),
        "boxes": np.asarray(scene.boxes, np.float64),
    }
    intr = syn.PinholeIntrinsics().scaled(SCALE)
    traj = syn.orbit_trajectory(N_FRAMES, scene.room_center, radius=2.4,
                                sweep=SWEEP * jnp.pi)
    photos = _load_photos()
    rng = np.random.default_rng(7)

    # camera-frame ray dirs (numpy twin of synthetic._ray_dirs)
    uu, vv = np.meshgrid(np.arange(intr.width, dtype=np.float64),
                         np.arange(intr.height, dtype=np.float64))
    dirs_cam = np.stack([(uu - intr.cx) / intr.fx,
                         (vv - intr.cy) / intr.fy,
                         np.ones_like(uu)], axis=-1)
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)

    rgb_lines = ["# color images", "# timestamp filename"]
    dep_lines = ["# depth images", "# timestamp filename"]
    gt_lines = ["# ground truth trajectory",
                "# timestamp tx ty tz qx qy qz qw"]
    for i in range(N_FRAMES):
        t_rgb = T0 + i * DT
        t_dep = t_rgb + 0.011
        pose = np.asarray(traj[i], np.float64)
        depth, _ = syn.render_depth(scene, intr, traj[i])
        depth = np.asarray(depth, np.float64)

        origin = pose[4:7]
        dirs_w = geo._np_quat_rotate(
            pose[None, :4], dirs_cam.reshape(-1, 3)).reshape(dirs_cam.shape)
        tray = np.where(depth > 0, depth / dirs_cam[..., 2], 0.0)
        pw = origin + tray[..., None] * dirs_w
        hit = depth > 0

        ph = pw[hit]
        sid, u, v = _classify_and_uv(scene_np, ph)

        # analytic normals (finite difference on the scene sdf)
        eps = 1e-3
        grads = []
        for a in range(3):
            off = np.zeros(3)
            off[a] = eps
            grads.append(np.asarray(
                syn.scene_sdf(scene, jnp.asarray(ph + off))
                - syn.scene_sdf(scene, jnp.asarray(ph - off))))
        n = np.stack(grads, axis=-1)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

        # ---- RGB: real photo texture × Lambert + shot noise + JPEG ----
        tex = np.zeros((ph.shape[0], 3), np.float32)
        for s in np.unique(sid):
            w = sid == s
            tex[w] = _sample(photos[int(s) % len(photos)], u[w], v[w])
        light = np.array([0.3, -0.5, 0.81])
        lam = 0.55 + 0.45 * np.abs(n @ light)
        col = np.zeros(depth.shape + (3,), np.float32)
        col[hit] = tex * lam[:, None]
        col += rng.normal(0, 2.0 / 255.0, col.shape)
        c8 = np.clip(col * 255.0, 0, 255).astype(np.uint8)
        okj, enc = cv2.imencode(".jpg", c8[..., ::-1],
                                [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert okj
        c8 = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]

        # ---- depth: Kinect-style axial noise + dropout ---------------
        cosang = np.zeros(depth.shape)
        cosang[hit] = np.abs(np.sum(n * (dirs_w[hit]), axis=-1))
        sigma = 0.0012 + 0.0019 * np.square(np.maximum(depth - 0.4, 0.0))
        d_noisy = depth + rng.normal(0, 1.0, depth.shape) * sigma
        drop = (cosang < 0.12) | (rng.random(depth.shape) < 0.003)
        d_noisy = np.where(hit & ~drop, d_noisy, 0.0)
        d16 = np.clip(d_noisy * 5000.0, 0, 65535).astype(np.uint16)

        rgb_name = f"rgb/{t_rgb:.6f}.png"
        dep_name = f"depth/{t_dep:.6f}.png"
        Image.fromarray(c8).save(os.path.join(root, rgb_name))
        Image.fromarray(d16).save(os.path.join(root, dep_name))
        rgb_lines.append(f"{t_rgb:.6f} {rgb_name}")
        dep_lines.append(f"{t_dep:.6f} {dep_name}")
        qw, qx, qy, qz, x, y, z = pose
        for off in (-0.005, 0.004):
            gt_lines.append(
                f"{t_rgb + off:.6f} {x:.6f} {y:.6f} {z:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
        if (i + 1) % 16 == 0:
            print(f"{i + 1}/{N_FRAMES}")

    for fname, lines in (("rgb.txt", rgb_lines), ("depth.txt", dep_lines),
                         ("groundtruth.txt", gt_lines)):
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"fixture written to {root}")


if __name__ == "__main__":
    main()
