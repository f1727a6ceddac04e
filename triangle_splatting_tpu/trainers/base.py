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

        seed = config.trainer.seed
        if seed is not None:
            random.seed(seed)
            np.random.seed(seed)
        self.seed = seed if seed is not None else 0

        self.dataset = build_dataset(config.dataset, self.logger)
