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
