"""Opaque mesh comparison renderer (reference renderer/kaolin_renderer.py:8-72).

The reference renders exported meshes through kaolin/nvdiffrast (a z-buffer
rasterizer with flat face colors) to compare against splat renders. Neither
dependency exists here; instead the mesh is pushed through the framework's
own perspective-correct 3D triangle pipeline with opacity 1 and a hard
solidified falloff (gamma 50, the reference's terminal gamma,
config/NerfSynthetic_VanillaTS_mesh.yaml) — front-to-back compositing of
opaque triangles with early termination is a depth-sort z-buffer.

Deviation (documented): depth ordering is per-triangle view depth, not
per-pixel — mutually intersecting triangles resolve by centroid depth, and
edge pixels keep the soft sub-pixel falloff ring instead of hard jaggies.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.projection import RasterSettings
from ..ops.rasterize import rasterize
from ..utils.camera import Camera
from ..utils.gltf import read_glb


def _load_mesh(path: str):
    """(vertices (V,3), faces (F,3), face_colors (F,3) in [0,1]) from GLB."""
    vertices, faces, vertex_colors = read_glb(path)
    if vertex_colors is None:
        face_colors = np.full((faces.shape[0], 3), 0.5, np.float32)
    else:
        face_colors = vertex_colors[faces[:, 0], :3].astype(np.float32)
    return vertices.astype(np.float32), faces.astype(np.int64), face_colors


class MeshRenderer:
    def __init__(self, cam: Camera, bg_color=(0.0, 0.0, 0.0),
                 gamma: float = 50.0, impl: str = "pallas",
                 max_pairs: Optional[int] = None):
        self.cam = cam
        self.bg_color = jnp.asarray(bg_color, jnp.float32)
        self.gamma = gamma
        self.impl = impl
        self.max_pairs = max_pairs
        self.settings = RasterSettings(
            image_width=int(cam.image_width),
            image_height=int(cam.image_height),
            back_culling=False, rich_info=True, rasterizer_type="3D",
        )

    def render(self, vertices: Optional[jnp.ndarray] = None,
               faces: Optional[jnp.ndarray] = None,
               faces_color: Optional[jnp.ndarray] = None,
               mesh_path: Optional[str] = None) -> dict:
        """Returns ``{"render": (3,H,W), "mask": (1,H,W)}`` plus ``depth``,
        clamped to [0,1] and composited over ``bg_color`` like the
        reference (kaolin_renderer.py:62-72)."""
        if mesh_path is not None:
            vertices, faces, faces_color = _load_mesh(mesh_path)
        elif vertices is None or faces is None or faces_color is None:
            raise ValueError(
                "Either mesh_path or vertices, faces, and faces_color must be provided")

        vertices = jnp.asarray(vertices, jnp.float32)
        faces = jnp.asarray(faces)
        tri = vertices[faces.reshape(-1)].reshape(-1, 3, 3)     # (F, 3, 3)
        colors = jnp.asarray(faces_color, jnp.float32)[:, :3]
        opacity = jnp.ones((tri.shape[0],), jnp.float32)

        out = rasterize(tri, opacity, None, self.cam, self.settings,
                        gamma=self.gamma, background=self.bg_color,
                        colors=colors, impl=self.impl,
                        max_pairs=self.max_pairs)
        mask = (1.0 - out["final_T"])[None]                     # (1, H, W)
        image = jnp.clip(out["render"], 0.0, 1.0)
        return {"render": image, "mask": mask, "depth": out["depth"]}
