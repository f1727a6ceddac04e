"""Object-style gaussian renderer (reference renderer/gaussian_renderer.py:8-99).

Wraps :func:`~triangle_splatting_tpu.ops.rasterize.rasterize_gaussian` with
the reference's constructor/render surface, plus the two auxiliary queries
the reference forwards to the CUDA module:

- ``get_radii``  ≙ ``_C.rasterize_gaussians_filter``
  (custom-gaussian-rasterization rasterizer_impl.cu:495) — no-grad screen
  radii used for visibility prefiltering.
- ``in_frustum`` ≙ ``_C.mark_visible`` (rasterizer_impl.cu:142-156) — the
  view-space ``z > 0.2`` test.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.gaussian import preprocess_gaussian
from ..ops.projection import RasterSettings
from ..ops.rasterize import rasterize_gaussian
from ..utils.camera import Camera


class GaussianRenderer:
    def __init__(self, cam: Camera, bg_color=(0.0, 0.0, 0.0),
                 scaling_modifier: float = 1.0, sh_degree: int = 0,
                 gamma: float = 1.0, rich_info: bool = False,
                 debug: bool = False, impl: str = "pallas",
                 max_pairs: Optional[int] = None):
        self.cam = cam
        self.bg_color = jnp.asarray(bg_color, jnp.float32)
        self.scaling_modifier = float(scaling_modifier)
        self.sh_degree = int(sh_degree)
        self.gamma = gamma
        self.debug = bool(debug)
        self.impl = impl
        self.max_pairs = max_pairs
        self.settings = RasterSettings(
            image_width=int(cam.image_width),
            image_height=int(cam.image_height),
            rich_info=bool(rich_info),
            rasterizer_type="GS",
        )

    def render(self, xyz: jnp.ndarray, shs: Optional[jnp.ndarray],
               color: Optional[jnp.ndarray], opacity: jnp.ndarray,
               scaling: jnp.ndarray, rot: jnp.ndarray,
               means2d: Optional[jnp.ndarray] = None) -> dict:
        """Render; differentiable w.r.t. every array argument. ``means2d``
        plays the reference's ``means2D`` dummy-gradient role
        (renderer/gaussian_renderer.py:33) — differentiate w.r.t. it for
        densification statistics. Echoed back under ``"means2D"``."""
        settings = self.settings
        if shs is not None:
            max_deg = int(round(shs.shape[1] ** 0.5)) - 1
            if settings.max_sh_degree != max_deg:
                settings = dataclasses.replace(settings, max_sh_degree=max_deg)
        if means2d is None:
            means2d = jnp.zeros((xyz.shape[0], 2), jnp.float32)
        out = rasterize_gaussian(
            xyz, scaling, rot, opacity, shs, self.cam, settings,
            gamma=self.gamma, background=self.bg_color,
            active_sh_degree=self.sh_degree, colors=color,
            mean2d_offset=means2d, scale_modifier=self.scaling_modifier,
            impl=self.impl, max_pairs=self.max_pairs, interpret=self.debug)
        out["means2D"] = means2d
        if not settings.rich_info:
            out = {k: v for k, v in out.items()
                   if k not in ("depth", "normal", "contrib_sum", "contrib_max")}
        return out

    def get_radii(self, means3D: jnp.ndarray, scales: jnp.ndarray,
                  rotations: jnp.ndarray) -> jnp.ndarray:
        """No-grad screen-space radii (px), 0 for culled gaussians —
        the `rasterize_gaussians_filter` prefilter surface."""
        prep = preprocess_gaussian(
            means3D, scales, rotations,
            jnp.zeros((means3D.shape[0], 3), jnp.float32),
            self.cam.world_view, self.cam.full_proj,
            self.cam.tan_fovx, self.cam.tan_fovy, self.settings,
            scale_modifier=self.scaling_modifier)
        return jax.lax.stop_gradient(prep.radii)

    def in_frustum(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Boolean visibility per point: view-space ``z > 0.2``
        (mark_visible, rasterizer_impl.cu:149)."""
        wv = self.cam.world_view
        z = (positions[:, 0] * wv[2, 0] + positions[:, 1] * wv[2, 1]
             + positions[:, 2] * wv[2, 2]) + wv[2, 3]
        return z > 0.2
