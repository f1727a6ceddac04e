"""Independent opaque-triangle ray tracer (ground-truth generator).

Every other render path in this repo — Pallas blend, dense oracle,
MeshRenderer — shares the splatting formulation (barycentric eccentricity
falloff, front-to-back compositing, per-triangle depth sort). A forward bug
common to that family would cancel out of any self-scored run (VERDICT r4
weak #3). This module renders the OPAQUE endpoint (gamma = infinity, the
solidify/GLB regime) by a completely different algorithm: per-pixel
Moeller-Trumbore ray-triangle intersection with a true nearest-hit
z-buffer — exact per-pixel depth resolution, hard edges, no falloff, no
compositing, no shared code with the rasterizers beyond the camera
transform. Used to de-circularize mesh-run ground truth
(``tools/full_run.py --mesh``) and to pin MeshRenderer semantics
(tests/test_raytrace.py).

Differences from the splatting family it checks (all inherent to gamma-inf
vs gamma-50): sub-pixel edge coverage (the splatter keeps a ~1px soft
falloff ring), mutually-intersecting triangles (per-pixel vs per-triangle
depth), and pixel-center sampling (no dilation). Comparisons budget a small
fraction of differing edge pixels rather than a uniform epsilon.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def raytrace_soup(vertex: jnp.ndarray, rgb: jnp.ndarray, camera,
                  settings, background=None, znear: float = 0.01):
    """Trace camera rays against an opaque triangle soup.

    Args:
        vertex: (N, 3, 3) world-space triangle vertices.
        rgb: (N, 3) flat per-triangle colors.
        camera: utils.camera.Camera (pose + fov).
        settings: RasterSettings (image size only).
    Returns:
        dict(render (3,H,W), depth (H,W) — ray depth t, inf where no hit,
        hit (H,W) bool).
    """
    W, H = settings.image_width, settings.image_height
    if background is None:
        background = jnp.zeros(3, jnp.float32)
    background = jnp.asarray(background, jnp.float32)

    # View-space triangles; camera at origin. Pixel-center rays use the same
    # pixToProj convention as the perspective pipeline (3D/auxiliary.h:40-43):
    # r = (tfx*(2px - W + 1)/W, tfy*(2py - H + 1)/H, 1).
    M = camera.world_view[:3]
    v = vertex.reshape(-1, 3)
    v_view = (v[:, 0:1] * M[:, 0] + v[:, 1:2] * M[:, 1]
              + v[:, 2:3] * M[:, 2] + M[:, 3]).reshape(-1, 3, 3)
    px = jnp.arange(W, dtype=jnp.float32)[None, :]
    py = jnp.arange(H, dtype=jnp.float32)[:, None]
    rx = jnp.broadcast_to(
        camera.tan_fovx * (2.0 * px - W + 1.0) / W, (H, W))
    ry = jnp.broadcast_to(
        camera.tan_fovy * (2.0 * py - H + 1.0) / H, (H, W))

    def one(carry, tri):
        t_best, c_best = carry
        v1, v2, v3, col = tri                        # (3,) each, col (3,)
        # Moeller-Trumbore with ray origin 0, direction (rx, ry, 1).
        e1 = v2 - v1
        e2 = v3 - v1
        # h = dir x e2 (per pixel; dir_z == 1)
        hx = ry * e2[2] - e2[1]
        hy = e2[0] - rx * e2[2]
        hz = rx * e2[1] - ry * e2[0]
        a = e1[0] * hx + e1[1] * hy + e1[2] * hz
        ok = jnp.abs(a) > 1e-12
        f = 1.0 / jnp.where(ok, a, 1.0)
        # s = origin - v1 = -v1 (constant per triangle)
        u = f * (-(v1[0] * hx + v1[1] * hy + v1[2] * hz))
        # q = s x e1 (constant per triangle); w = f * dot(dir, q)
        qx = -(v1[1] * e1[2] - v1[2] * e1[1])
        qy = -(v1[2] * e1[0] - v1[0] * e1[2])
        qz = -(v1[0] * e1[1] - v1[1] * e1[0])
        w = f * (rx * qx + ry * qy + qz)
        t = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
        hit = (ok & (u >= 0.0) & (w >= 0.0) & (u + w <= 1.0)
               & (t > znear) & (t < t_best))
        t_best = jnp.where(hit, t, t_best)
        c_best = jnp.where(hit[None], col[:, None, None], c_best)
        return (t_best, c_best), None

    t0 = jnp.full((H, W), jnp.inf, jnp.float32)
    c0 = jnp.broadcast_to(background[:, None, None], (3, H, W)).astype(
        jnp.float32)
    (t, color), _ = jax.lax.scan(
        one, (t0, c0),
        (v_view[:, 0], v_view[:, 1], v_view[:, 2],
         jnp.asarray(rgb, jnp.float32)))
    return {"render": color, "depth": t, "hit": jnp.isfinite(t)}
