"""Object-style model facade over the functional cores.

The reference exposes model CLASSES at the package root
(src/diff_recon/__init__.py:10-12: ``VanillaTSModel``, ``VanillaGSModel``,
``ScaffoldGSModel`` — models/VanillaTS_model.py:21, VanillaGS_model.py:19,
ScaffoldGS_model.py:21) whose surface is: construct from the ``model``
config section, ``create_from_pcd``, ``forward(camera, background)``,
PLY/GLB IO. Here the compute cores are pure functions over fixed-capacity
pytrees (models/triangle.py, gaussian_model.py, scaffold.py — the
TPU-native design); these thin classes wrap them so reference code keeps
working (e.g. a viewer doing ``model.loadPLY(...); model.forward(cam)``).

The trainers do NOT use these wrappers — their hot loops call the
functional cores directly with donated buffers.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import RasterSettings
from ..utils.config import Config


def _mk_settings(camera, max_sh_degree, rasterizer_type="2D",
                 back_culling=False):
    return RasterSettings(
        image_width=camera.image_width, image_height=camera.image_height,
        max_sh_degree=max_sh_degree, back_culling=back_culling,
        rasterizer_type=rasterizer_type)


class VanillaTSModel:
    """Triangle model facade (reference models/VanillaTS_model.py:21-917).

    ``config.max_sh_degree`` defaults to 0 like the reference
    (VanillaTS_model.py:25); pass the checkpoint's trained degree when
    loading a PLY/GLB or higher SH bands are dropped.
    """

    def __init__(self, config: Optional[Config] = None, impl: str = "pallas",
                 interpret: bool = False):
        from . import triangle as M
        self._M = M
        mc = config or Config()
        self.cfg = M.ModelConfig(
            max_sh_degree=mc.max_sh_degree if mc.max_sh_degree is not None else 0,
            use_color_affine=bool(mc.use_color_affine),
            back_culling=bool(mc.back_culling),
            ste_threshold=mc.ste_threshold,
            gamma_rescale=bool(mc.gamma_rescale),
            render_up_scale=mc.render_up_scale,
            rasterizer_type=mc.rasterizer_type or "2D")
        self.impl = impl
        self.interpret = interpret
        self.params = None
        self.state = None
        self._fwd = jax.jit(
            lambda settings, params, state, camera, background, training:
            M.forward(params, state, camera, background, self.cfg, settings,
                      is_training=training, apply_color_affine=False,
                      impl=self.impl, interpret=self.interpret),
            static_argnums=(0, 5))

    # -- init / IO ----------------------------------------------------------
    def create_from_pcd(self, pcd, init_opacity: float = 0.1, seed: int = 0):
        self.params, self.state = self._M.create_from_points(
            pcd.points, pcd.colors, getattr(pcd, "normals", None), self.cfg,
            init_opacity=init_opacity, seed=seed)
        return self

    @property
    def point_count(self) -> int:
        return 0 if self.state is None else int(self.state.alive.sum())

    def forward(self, camera, background=None, is_training: bool = False) -> dict:
        """Render through one camera; returns the reference render_pkg dict
        (render/depth/normal/radii/contrib_* ...)."""
        if background is None:
            background = jnp.zeros(3, jnp.float32)
        settings = _mk_settings(camera, self.cfg.max_sh_degree,
                                self.cfg.rasterizer_type,
                                self.cfg.back_culling)
        return self._fwd(settings, self.params, self.state,
                         camera.strip_static(), jnp.asarray(background),
                         bool(is_training))

    def toRaw(self):
        from .raw_triangle import RawTriangle
        alive = np.asarray(self.state.alive)
        vertex = np.asarray(self.params.vertex)[alive]
        opacity = np.asarray(self.params.opacity)[alive]
        shs = np.asarray(self._M.get_features(self.params))[alive]
        return RawTriangle(vertex, opacity, shs.reshape(len(vertex), -1))

    def savePLY(self, path):
        self.toRaw().savePLY(path, save_extra=True)

    def saveGLB(self, path):
        self.toRaw().saveGLB(path, save_back=not self.cfg.back_culling)

    def _from_raw(self, raw):
        M = self._M
        n = len(raw)
        K = (self.cfg.max_sh_degree + 1) ** 2
        shs = raw.shs.reshape(n, -1, 3)
        feats = np.zeros((n, K, 3), np.float32)
        take = min(K, shs.shape[1])
        feats[:, :take] = shs[:, :take]
        cap = M._round_up(n, 256)
        pad = lambda x: np.concatenate(
            [x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])
        self.params = M.TriangleParams(
            vertex=jnp.asarray(pad(raw.vertex)),
            opacity=jnp.asarray(pad(raw.opacity)),
            f_dc=jnp.asarray(pad(feats[:, :1])),
            f_rest=jnp.asarray(pad(feats[:, 1:])))
        self.state = replace(M.TriangleState.create(cap),
                             alive=jnp.asarray(np.arange(cap) < n))
        return self

    def loadPLY(self, path):
        from .raw_triangle import RawTriangle
        return self._from_raw(RawTriangle(ply_path=str(path)))

    def loadGLB(self, path):
        from .raw_triangle import RawTriangle
        return self._from_raw(RawTriangle(glb_path=str(path)))

    def set_gamma(self, gamma: float):
        self.state = replace(self.state, gamma=jnp.float32(gamma))
        return self


class VanillaGSModel:
    """Gaussian model facade (reference models/VanillaGS_model.py:19-718)."""

    def __init__(self, config: Optional[Config] = None, impl: str = "pallas",
                 interpret: bool = False):
        from . import gaussian_model as G
        self._G = G
        mc = config or Config()
        self.cfg = G.GSModelConfig(
            max_sh_degree=mc.max_sh_degree if mc.max_sh_degree is not None else 3)
        self.impl = impl
        self.interpret = interpret
        self.params = None
        self.state = None
        self._fwd = jax.jit(
            lambda settings, params, state, camera, background, training:
            G.forward(params, state, camera, background, self.cfg, settings,
                      is_training=training, impl=self.impl,
                      interpret=self.interpret),
            static_argnums=(0, 5))

    def create_from_pcd(self, pcd, init_opacity: float = 0.1):
        self.params, self.state = self._G.create_from_points(
            pcd.points, pcd.colors, self.cfg, init_opacity=init_opacity)
        return self

    @property
    def point_count(self) -> int:
        return 0 if self.state is None else int(self.state.alive.sum())

    def forward(self, camera, background=None, is_training: bool = False) -> dict:
        if background is None:
            background = jnp.zeros(3, jnp.float32)
        settings = _mk_settings(camera, self.cfg.max_sh_degree)
        return self._fwd(settings, self.params, self.state,
                         camera.strip_static(), jnp.asarray(background),
                         bool(is_training))

    def savePLY(self, path):
        from pathlib import Path
        from .raw_gaussian import RawGaussian
        from .raw_gaussian import pack_sh_features
        G = self._G
        alive = np.asarray(self.state.alive)
        g = RawGaussian(
            xyz=np.asarray(self.params.xyz)[alive],
            opacity=np.asarray(self.params.opacity)[alive],
            shs=pack_sh_features(np.asarray(G.get_features(self.params))[alive]),
            scale=np.asarray(self.params.scaling)[alive],
            rotation=np.asarray(self.params.rotation)[alive])
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        g.savePLY(path)

    def loadPLY(self, path):
        from .raw_gaussian import RawGaussian, unpack_sh_features
        G = self._G
        g = RawGaussian(ply_path=str(path))
        n = len(g)
        K = (self.cfg.max_sh_degree + 1) ** 2
        feats = unpack_sh_features(g.shs, K)
        cap = (n + 255) // 256 * 256
        pad = lambda x: np.concatenate(
            [x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])
        self.params = G.GaussianParams(
            xyz=jnp.asarray(pad(g.xyz)), scaling=jnp.asarray(pad(g.scale)),
            rotation=jnp.asarray(pad(g.rotation)),
            opacity=jnp.asarray(pad(g.opacity)),
            f_dc=jnp.asarray(pad(feats[:, :1])),
            f_rest=jnp.asarray(pad(np.ascontiguousarray(feats[:, 1:]))))
        self.state = replace(G.GaussianState.create(cap),
                             alive=jnp.asarray(np.arange(cap) < n))
        return self


class ScaffoldGSModel:
    """Scaffold-GS facade (reference models/ScaffoldGS_model.py:21-633):
    anchors + MLP heads decode neural gaussians per view."""

    def __init__(self, config: Optional[Config] = None, impl: str = "pallas",
                 interpret: bool = False):
        from . import scaffold as S
        self._S = S
        mc = config or Config()
        self.cfg = S.ScaffoldConfig(
            feat_dim=mc.feat_dim or 32,
            hidden_dim=mc.hidden_dim or 32,
            n_offsets=mc.n_offsets or 10)
        self.impl = impl
        self.interpret = interpret
        self.params = None
        self.state = None
        self._fwd = jax.jit(
            lambda settings, params, state, camera, background, training:
            S.forward(params, state, camera, background, self.cfg, settings,
                      is_training=training, impl=self.impl,
                      interpret=self.interpret),
            static_argnums=(0, 5))

    def create_from_pcd(self, pcd, voxel_size: float = 0.001, seed: int = 0):
        self.params, self.state = self._S.create_from_points(
            pcd.points, self.cfg, voxel_size=voxel_size, seed=seed)
        return self

    @property
    def anchor_count(self) -> int:
        return 0 if self.state is None else int(self.state.alive.sum())

    def forward(self, camera, background=None, is_training: bool = False) -> dict:
        if background is None:
            background = jnp.zeros(3, jnp.float32)
        settings = _mk_settings(camera, 0)
        return self._fwd(settings, self.params, self.state,
                         camera.strip_static(), jnp.asarray(background),
                         bool(is_training))
