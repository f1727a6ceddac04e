"""triangle_splatting_tpu — TPU-native 2D Triangle Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
GaodeRender/triangle-splatting (arXiv:2506.18575): differentiable 2D/3D
triangle-splat rasterization, triangle scene models with adaptive density
control, dataset loaders (COLMAP / NeRF-Synthetic / MatrixCity), trainers,
and multi-chip data parallelism over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from .utils.config import Config, loadConfig, saveConfig  # noqa: F401
from .utils.camera import Camera  # noqa: F401
from .ops.projection import RasterSettings  # noqa: F401
