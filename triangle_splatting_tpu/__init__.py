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

# The reference package surface (src/diff_recon/__init__.py:1-20), exported
# lazily so importing the package stays light (no jax compile, no TensorBoard
# import) until a symbol is actually used. The compute cores are functional
# modules (models.triangle / models.gaussian_model / models.scaffold); the
# reference's model CLASSES are thin wrappers over them (models/facade.py).
_LAZY = {
    # model classes (diff_recon/__init__.py:10-12) — facade over the
    # functional cores; trainers bypass them and call the cores directly
    "VanillaTSModel": ("models.facade", "VanillaTSModel"),
    "VanillaGSModel": ("models.facade", "VanillaGSModel"),
    "ScaffoldGSModel": ("models.facade", "ScaffoldGSModel"),
    # trainers (diff_recon/__init__.py:1-3)
    "VanillaTSTrainer": ("trainers.vanilla_ts", "VanillaTSTrainer"),
    "VanillaGSTrainer": ("trainers.vanilla_gs", "VanillaGSTrainer"),
    "ScaffoldGSTrainer": ("trainers.scaffold_gs", "ScaffoldGSTrainer"),
    "build_trainer": ("trainers", "build_trainer"),
    # datasets (:5-8)
    "BaseDatasetFactory": ("datasets.base", "BaseDatasetFactory"),
    "ColmapDatasetFactory": ("datasets.colmap", "ColmapDatasetFactory"),
    "NerfSyntheticDatasetFactory": ("datasets.nerf_synthetic", "NerfSyntheticDatasetFactory"),
    "MatrixCityDatasetFactory": ("datasets.matrix_city", "MatrixCityDatasetFactory"),
    "QijingDatasetFactory": ("datasets.qijing", "QijingDatasetFactory"),
    # serialization value types (:13-14)
    "RawTriangle": ("models.raw_triangle", "RawTriangle"),
    "RawGaussian": ("models.raw_gaussian", "RawGaussian"),
    "PointCloud": ("models.point_cloud", "PointCloud"),
    # renderer facade (L2)
    "TriangleRenderer": ("renderer.triangle_renderer", "TriangleRenderer"),
    "GaussianRenderer": ("renderer.gaussian_renderer", "GaussianRenderer"),
    "MeshRenderer": ("renderer.mesh_renderer", "MeshRenderer"),
    # utils (:16-19)
    "run_exp": ("utils.pipeline_utils", "run_exp"),
    "run_exp_with_args": ("utils.pipeline_utils", "run_exp_with_args"),
    "stdout_logger": ("utils.logger", "stdout_logger"),
    "OSSHandler": ("utils.file_handler", "OSSHandler"),
    # evaluation extras beyond the reference surface
    "mesh_geometry_scores": ("models.mesh_metrics", "mesh_geometry_scores"),
    "raytrace_soup": ("ops.raytrace", "raytrace_soup"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(f".{mod_name}", __name__), attr)


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
