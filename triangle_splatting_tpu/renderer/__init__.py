"""Renderer facade layer (reference L2: src/diff_recon/renderer/).

Thin, object-style wrappers over the functional ``ops.rasterize`` API for
users of the reference's ``diff_recon.renderer`` package:

- :class:`TriangleRenderer`  — renderer/triangle_renderer.py:15-95
- :class:`GaussianRenderer`  — renderer/gaussian_renderer.py:8-99
- :class:`MeshRenderer`      — renderer/kaolin_renderer.py:8-72 (opaque mesh
  comparison renders, without the kaolin/nvdiffrast dependency)

Offline BEV/tour/comparison video helpers (renderer/render_utils.py) live in
``triangle_splatting_tpu.utils.render_utils``.
"""

from .triangle_renderer import TriangleRenderer  # noqa: F401
from .gaussian_renderer import GaussianRenderer  # noqa: F401
from .mesh_renderer import MeshRenderer  # noqa: F401
