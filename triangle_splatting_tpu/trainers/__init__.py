"""Trainers (reference diff_recon/__init__.py exports)."""

TRAINER_TYPES = ("VanillaTS", "VanillaGS", "ScaffoldGS")


def build_trainer(config, **kwargs):
    """Dispatch on ``config.trainer.type`` (VanillaTS | VanillaGS |
    ScaffoldGS; default VanillaTS)."""
    from ..utils.config import Config, loadConfig
    if isinstance(config, str):
        config = loadConfig(config)
    ttype = (config.trainer.type if config.trainer is not None else None) \
        or "VanillaTS"
    if ttype == "VanillaTS":
        from .vanilla_ts import VanillaTSTrainer
        return VanillaTSTrainer(config, **kwargs)
    if ttype == "VanillaGS":
        from .vanilla_gs import VanillaGSTrainer
        return VanillaGSTrainer(config, **kwargs)
    if ttype == "ScaffoldGS":
        from .scaffold_gs import ScaffoldGSTrainer
        return ScaffoldGSTrainer(config, **kwargs)
    raise ValueError(f"Unknown trainer type: {ttype}")


def __getattr__(name):
    if name == "VanillaTSTrainer":
        from .vanilla_ts import VanillaTSTrainer
        return VanillaTSTrainer
    if name == "VanillaGSTrainer":
        from .vanilla_gs import VanillaGSTrainer
        return VanillaGSTrainer
    if name == "ScaffoldGSTrainer":
        from .scaffold_gs import ScaffoldGSTrainer
        return ScaffoldGSTrainer
    raise AttributeError(name)
