"""Trainer base: output dir, logging, seeding, dataset construction
(reference trainers/Base_trainer.py:13-73)."""

from __future__ import annotations

import random
import shutil
from pathlib import Path

import numpy as np

from ..utils.config import Config, loadConfig
from ..utils.logger import Logger


def build_dataset(config: Config, logger: Logger):
    dtype = config.type
    if dtype == "NerfSynthetic":
        from ..datasets.nerf_synthetic import NerfSyntheticDatasetFactory
        return NerfSyntheticDatasetFactory(config, logger)
    if dtype in ("Colmap", "MipNerf360", "TanksAndBlending", "TanksAndTemples"):
        from ..datasets.colmap import ColmapDatasetFactory
        return ColmapDatasetFactory(config, logger)
    if dtype == "MatrixCity":
        from ..datasets.matrix_city import MatrixCityDatasetFactory
        return MatrixCityDatasetFactory(config, logger)
    if dtype == "Qijing":
        from ..datasets.qijing import QijingDatasetFactory
        return QijingDatasetFactory(config, logger)
    raise ValueError(f"Unknown dataset type: {dtype}")


class BaseTrainer:
    def __init__(self, config: str | Config, exp_name: str | None = None,
                 log_file: bool = True):
        if isinstance(config, (str, Path)):
            config = loadConfig(config)
        self.config = config

        out_root = config.trainer.output_dir or "outputs/exp"
        self.output_dir = str(Path(out_root) / exp_name) if exp_name else out_root
        if config.trainer.clean_output_dir and Path(self.output_dir).exists():
            shutil.rmtree(self.output_dir)
        Path(self.output_dir).mkdir(parents=True, exist_ok=True)

        self.logger = Logger("trainer", output_dir=self.output_dir,
                             log_file=log_file,
                             use_tensorboard=bool(config.trainer.use_tensorboard))

        # Multi-host: join the jax.distributed job BEFORE any jax use when
        # the trainer.distributed block or TS_COORDINATOR env is present
        # (SURVEY §5 distributed backend; parallel/multihost.py). After
        # this, jax.devices() is the GLOBAL pool, so the DP mesh the
        # subclasses build spans hosts with no further changes.
        from ..parallel.multihost import distributed_settings, maybe_initialize
        if distributed_settings(config) is not None:
            maybe_initialize(config, self.logger)

        seed = config.trainer.seed
        if seed is not None:
            random.seed(seed)
            np.random.seed(seed)
        self.seed = seed if seed is not None else 0

        if config.trainer.detect_anomaly:
            # torch.autograd.set_detect_anomaly analog
            # (reference Base_trainer.py:38): fail fast on NaN production
            import jax
            jax.config.update("jax_debug_nans", True)
            self.logger.warning("detect_anomaly: jax_debug_nans enabled "
                                "(slow; disables some fusions)")

        self.dataset = build_dataset(config.dataset, self.logger)

    # -- per-iteration host-scalar packing (trainers/scalar_pack.py) --------
    # Subclasses declare their loss-weight keys and the lr groups their
    # _lrs() setdefaults; the pack layout is derived once, lazily, so direct
    # _train_step calls (tests) work without running train().
    _PACK_WEIGHT_KEYS: tuple = ()
    _PACK_LR_DEFAULTS: tuple = ()

    @property
    def _pack(self):
        p = getattr(self, "_pack_cache", None)
        if p is None:
            from .scalar_pack import HostScalarPack
            lr_keys = tuple(self.lr_schedulers)
            for n in self._PACK_LR_DEFAULTS:
                if n not in lr_keys:
                    lr_keys += (n,)
            p = HostScalarPack(self._PACK_WEIGHT_KEYS, lr_keys)
            self._pack_cache = p
        return p

    # -- profiling (SURVEY §5: phase Timer + jax.profiler trace hooks) ------
    def _profile_hooks(self, iteration: int) -> None:
        """Start/stop a jax.profiler trace over the configured iteration
        window (``trainer.profile_start_iter`` / ``profile_end_iter``);
        view with tensorboard or xprof on ``<output_dir>/profile``."""
        cfgt = self.config.trainer
        if not cfgt.profile_start_iter:
            return
        import jax
        if iteration == cfgt.profile_start_iter:
            self.logger.info(f"[ITER {iteration}] profiler trace started")
            jax.profiler.start_trace(str(Path(self.output_dir) / "profile"))
        end = cfgt.profile_end_iter or (cfgt.profile_start_iter + 10)
        if iteration == end:
            jax.profiler.stop_trace()
            self.logger.info(f"[ITER {iteration}] profiler trace written to "
                             f"{self.output_dir}/profile")
