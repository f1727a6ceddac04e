"""Synthetic scenes and small helpers shared by tests and benchmarks."""

from __future__ import annotations

import numpy as np

from .camera import Camera


def make_camera(width: int = 64, height: int = 64, fov_deg: float = 60.0,
                with_image: bool = False) -> Camera:
    """Identity-pose camera at the origin looking down +z."""
    R = np.eye(3, dtype=np.float32)
    T = np.zeros(3, dtype=np.float32)
    fov = np.deg2rad(fov_deg)
    gt = np.zeros((3, height, width), np.float32) if with_image else None
    return Camera.create(R=R, T=T, fovx=fov, fovy=fov,
                         image_width=width, image_height=height, gt_image=gt)


def make_random_scene(n: int, seed: int = 0, z_range=(3.0, 6.0),
                      xy_extent: float = 1.5, size_range=(0.05, 0.25),
                      opacity_range=(0.3, 0.95)):
    """Random triangles in front of the identity camera.

    Returns dict of numpy arrays: vertex (N,3,3), opacity (N,), rgb (N,3),
    sh_dc (N,1,3).
    """
    rng = np.random.default_rng(seed)
    centers = np.stack([
        rng.uniform(-xy_extent, xy_extent, n),
        rng.uniform(-xy_extent, xy_extent, n),
        rng.uniform(*z_range, n),
    ], axis=-1).astype(np.float32)

    sizes = rng.uniform(*size_range, n).astype(np.float32)
    # random triangle orientations: orthonormal (u, v) per point
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    u = np.cross(np.broadcast_to(up, (n, 3)), normals)
    bad = np.linalg.norm(u, axis=1) < 1e-6
    u[bad] = np.array([1.0, 0.0, 0.0], np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    v = np.cross(normals, u)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    s = sizes[:, None]
    v1 = centers + u * s
    v2 = centers + (-0.5 * u + (np.sqrt(3) / 2) * v) * s
    v3 = centers + (-0.5 * u - (np.sqrt(3) / 2) * v) * s
    vertex = np.stack([v1, v2, v3], axis=1).astype(np.float32)

    opacity = rng.uniform(*opacity_range, n).astype(np.float32)
    rgb = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    return dict(vertex=vertex, opacity=opacity, rgb=rgb,
                sh_dc=((rgb - 0.5) / 0.28209479177387814)[:, None, :].astype(np.float32))


def make_surface_scene(n_tri: int, seed: int = 0, opacity: float = 0.95):
    """A closed SURFACE as ground truth: a bumpy UV-sphere triangulation.

    The random-soup scene (make_random_scene) is adversarial for the mesh
    endpoint — semi-transparent floating triangles have no opaque-surface
    representation, so solidify scores bottom out regardless of pipeline
    quality. Real mesh-training targets are opaque surfaces
    (reference README.md:29-35: rooms, objects, city blocks); this scene
    provides one with a known triangle-soup GT for chamfer/F-score.

    Returns the same dict layout as make_random_scene; the actual face
    count is the closest UV grid <= n_tri (2 * nu * nv faces).
    """
    rng = np.random.default_rng(seed)
    nv = max(3, int(np.sqrt(n_tri / 4)))
    nu = max(4, n_tri // (2 * nv))
    th = np.linspace(0.0, np.pi, nv + 1)
    ph = np.linspace(0.0, 2 * np.pi, nu + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")           # (nv+1, nu+1)
    # low-frequency radial bumps -> non-trivial geometry for chamfer
    r = (0.85 + 0.12 * np.sin(3 * T) * np.cos(2 * P)
         + 0.08 * np.cos(5 * P + 1.0) * np.sin(2 * T))
    x = r * np.sin(T) * np.cos(P)
    y = r * np.cos(T)
    z = r * np.sin(T) * np.sin(P)
    V = np.stack([x, y, z], axis=-1)                    # (nv+1, nu+1, 3)

    quads = []
    for i in range(nv):
        for j in range(nu):
            a, b = V[i, j], V[i, j + 1]
            c, d = V[i + 1, j + 1], V[i + 1, j]
            quads.append((a, b, c))
            quads.append((a, c, d))
    vertex = np.asarray(quads, np.float32)              # (F, 3, 3)
    n = vertex.shape[0]

    # smooth per-face color from the face centroid direction
    cen = vertex.mean(1)
    cn = cen / np.maximum(np.linalg.norm(cen, axis=1, keepdims=True), 1e-6)
    rgb = np.clip(0.5 + 0.45 * np.stack(
        [cn[:, 0], np.sin(2.0 * cn[:, 1]), cn[:, 2] * cn[:, 0]], axis=1),
        0.05, 0.95).astype(np.float32)
    opac = np.full((n,), opacity, np.float32)
    return dict(vertex=vertex, opacity=opac, rgb=rgb,
                sh_dc=((rgb - 0.5) / 0.28209479177387814)[:, None, :]
                .astype(np.float32))


def pose_on_circle(theta: float, radius: float = 4.5, height: float = 0.0):
    """Camera on a circle looking at the origin, as a Blender/OpenGL c2w
    matrix (NerfSynthetic_dataset.py:20-25 converts to COLMAP)."""
    eye = np.array([radius * np.sin(theta), height, radius * np.cos(theta)])
    forward = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward          # OpenGL: -z is the viewing direction
    c2w[:3, 3] = eye
    return c2w


def build_synthetic_nerf_dataset(root, *, res: int = 48, n_tri: int = 120,
                                 n_train: int = 6, n_test: int = 2,
                                 impl: str = "oracle", seed: int = 7,
                                 size_range=(0.15, 0.3),
                                 pcd_noise: float = 0.05,
                                 pcd_points: int | None = None,
                                 scene_kind: str = "soup"):
    """Write a Blender/NeRF-Synthetic-format dataset of a known random
    triangle scene to ``root`` (transforms_{train,test}.json + PNGs +
    point_cloud.ply). GT images are rendered with this framework's own
    rasterizer (``impl``: oracle on CPU for tests, pallas on a chip for
    large resolutions). ``scene_kind``: "soup" = floating random
    semi-transparent triangles (photo stress test), "surface" = a bumpy
    opaque closed surface (the mesh/solidify endpoint's realistic target —
    see make_surface_scene). Returns ``root``."""
    import json
    import math
    from pathlib import Path

    import jax.numpy as jnp
    from PIL import Image

    from ..models.point_cloud import PointCloud
    from ..ops.projection import RasterSettings
    from ..ops.rasterize import rasterize

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    if scene_kind == "surface":
        scene = make_surface_scene(n_tri, seed=seed)
    else:
        scene = make_random_scene(n_tri, seed=seed, z_range=(-0.8, 0.8),
                                  xy_extent=0.8, size_range=size_range,
                                  opacity_range=(0.7, 0.95))
    n_tri = scene["vertex"].shape[0]          # surface rounds to its grid
    vertex = jnp.asarray(scene["vertex"])
    opacity = jnp.asarray(scene["opacity"])
    rgb = jnp.asarray(scene["rgb"])
    fovx = math.radians(50)
    settings = RasterSettings(image_width=res, image_height=res)

    import jax

    # Pre-size the pair budget from the DEMANDED pair count (preprocess
    # only — a cheap compile) instead of discovering overflow with full
    # renders: each overflow-grow recompile of the whole rasterizer costs
    # minutes through a remote-compile tunnel, and GT scenes at full-run
    # scale need 2-3 growths from the default budget.
    if impl == "pallas":
        from dataclasses import replace as _dc_replace
        from ..ops.projection import preprocess_2d
        from ..trainers.adc_utils import adapt_pair_budget

        def _demand(cam):
            prep = preprocess_2d(vertex, jnp.zeros((n_tri, 2)), rgb,
                                 cam.world_view, cam.full_proj,
                                 cam.tan_fovx, cam.tan_fovy, settings,
                                 opacity=opacity,
                                 gamma=jnp.float32(1.0))
            return prep.tiles_touched.astype(jnp.int32).sum()

        c2w0 = pose_on_circle(0.0).copy()
        c2w0[:3, 1:3] *= -1
        w2c0 = np.linalg.inv(c2w0)
        probe_cam = Camera.create(R=w2c0[:3, :3].T, T=w2c0[:3, 3],
                                  fovx=fovx, fovy=fovx,
                                  image_width=res, image_height=res)
        demanded = int(jax.jit(_demand)(probe_cam.strip_static()))
        ppt = adapt_pair_budget(settings.pairs_per_triangle,
                                int(demanded * 1.2), n_tri, False,
                                shrink_if_below=1.0)
        if ppt > settings.pairs_per_triangle:
            settings = _dc_replace(settings, pairs_per_triangle=ppt)

    # Jitted per-camera render: eager op dispatch is pathologically slow on
    # remote-compile TPU backends. Cameras share one trace (strip_static).
    def _make_render(settings):
        @jax.jit
        def _render_jit(cam):
            out = rasterize(vertex, opacity, None, cam, settings, gamma=1.0,
                            background=jnp.ones(3), bg_depth=20.0,
                            colors=rgb, impl=impl)
            return jnp.clip(out["render"], 0, 1), out["overflow"], \
                out["num_pairs"]
        return _render_jit

    _render_jit = _make_render(settings)

    def render(c2w_gl):
        nonlocal _render_jit, settings
        c2w = c2w_gl.copy()
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        cam = Camera.create(R=w2c[:3, :3].T, T=w2c[:3, 3], fovx=fovx,
                            fovy=fovx, image_width=res, image_height=res)
        img, overflow, num_pairs = _render_jit(cam.strip_static())
        # GROUND-TRUTH frames must never silently drop pairs: a truncated
        # pair list renders a visibly incomplete scene that every
        # subsequent score inherits (this exact bug shipped truncated GT
        # for four rounds of full runs — caught by the r5 oracle-GT
        # de-circularization, PERF.md). Grow the budget and re-render
        # until the frame fits (the oracle path never overflows).
        while bool(overflow):
            from dataclasses import replace
            from ..trainers.adc_utils import adapt_pair_budget
            settings = replace(
                settings,
                pairs_per_triangle=adapt_pair_budget(
                    settings.pairs_per_triangle, None, n_tri, True))
            _render_jit = _make_render(settings)
            img, overflow, num_pairs = _render_jit(cam.strip_static())
        return np.asarray(img)

    for split, count in [("train", n_train), ("test", n_test)]:
        frames = []
        for i in range(count):
            theta = 2 * math.pi * (i + (0.5 if split == "test" else 0)) / count
            c2w = pose_on_circle(theta)
            img = render(c2w)
            arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            rgba = np.concatenate(
                [arr, np.full((res, res, 1), 255, np.uint8)], -1)
            (root / split).mkdir(exist_ok=True)
            Image.fromarray(rgba).save(root / split / f"r_{i}.png")
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    # GT triangle soup — the synthetic setup's unique asset: geometry
    # metrics (models/mesh_metrics.py) can score an exported mesh against
    # the exact surface the images were rendered from, something no real
    # capture provides.
    np.savez(root / "gt_scene.npz", vertex=scene["vertex"],
             opacity=scene["opacity"], rgb=scene["rgb"])

    # init point cloud: noisy triangle centroids (optionally re-sampled)
    centers = scene["vertex"].mean(1)
    colors = scene["rgb"]
    if pcd_points is not None:
        idx = rng.integers(0, n_tri, pcd_points)
        centers, colors = centers[idx], colors[idx]
    centers = centers + rng.normal(0, pcd_noise, centers.shape)
    PointCloud(centers.astype(np.float32), colors).storePly(
        root / "point_cloud.ply")
    return root
