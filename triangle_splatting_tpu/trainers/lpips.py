"""LPIPS (VGG16 variant) in pure JAX.

The reference computes eval LPIPS through a torchmetrics VGG16 model
(trainer_utils.py:349-352). There is no torchvision/torchmetrics in the TPU
image and no network egress, so this module implements the LPIPS
architecture natively (13 VGG16 convs, unit-normalized feature
differences, non-negative 1x1 linear heads, spatial mean, layer sum) and
loads the pretrained weights from an ``.npz`` produced once on any machine
that has them (see ``convert_torchvision_weights``). The weight path comes
from ``trainer.lpips_weights`` config or the ``TS_LPIPS_WEIGHTS`` env var.

Without a weights file the metric is unavailable and the evaluator reports
PSNR/SSIM only (a warning is logged once).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: channels per conv, True = maxpool after this conv
_VGG_PLAN = [(64, False), (64, True), (128, False), (128, True),
             (256, False), (256, False), (256, True),
             (512, False), (512, False), (512, True),
             (512, False), (512, False), (512, False)]
# LPIPS taps the ReLU outputs of convs 2, 4, 7, 10, 13 (1-indexed)
_TAPS = (1, 3, 6, 9, 12)
# input scaling layer (lpips.ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_CACHED: Optional[dict] = None
_TRIED = False


def _find_weights() -> Optional[str]:
    path = os.environ.get("TS_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        return path
    default = os.path.join(os.path.dirname(__file__), "..", "..",
                           "weights", "lpips_vgg.npz")
    return default if os.path.exists(default) else None


def load_weights(path: Optional[str] = None) -> Optional[dict]:
    """Load (and cache) LPIPS weights; None when unavailable."""
    global _CACHED, _TRIED
    if _CACHED is not None:
        return _CACHED
    if path is None:
        if _TRIED:
            return None
        _TRIED = True
        path = _find_weights()
        if path is None:
            return None
    data = np.load(path)
    weights = {k: jnp.asarray(data[k]) for k in data.files}
    for i in range(len(_VGG_PLAN)):
        if f"conv{i}_w" not in weights:
            raise ValueError(f"LPIPS weights at {path} missing conv{i}_w")
    _CACHED = weights
    return weights


def _conv(x, w, b):
    """NCHW 3x3 same conv."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b.reshape(1, -1, 1, 1)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _vgg_features(weights: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: (N, 3, H, W) in [-1, 1] -> tapped ReLU feature maps."""
    x = (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
    feats = []
    for i, (_, pool) in enumerate(_VGG_PLAN):
        x = jax.nn.relu(_conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"]))
        if i in _TAPS:
            feats.append(x)
        if pool:
            x = _maxpool(x)
    return feats


@functools.partial(jax.jit, static_argnums=())
def _lpips_jit(weights: dict, img: jnp.ndarray, gt: jnp.ndarray):
    f1 = _vgg_features(weights, img)
    f2 = _vgg_features(weights, gt)
    total = jnp.float32(0.0)
    for j, (a, b) in enumerate(zip(f1, f2)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                                  # (N, C, H, W)
        lin = weights[f"lin{j}_w"].reshape(1, -1, 1, 1)     # non-negative
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total


def lpips(img, gt, weights: Optional[dict] = None) -> jnp.ndarray:
    """LPIPS distance between (3, H, W) or (N, 3, H, W) images in [0, 1].

    Raises FileNotFoundError when no weights are available.
    """
    if weights is None:
        weights = load_weights()
    if weights is None:
        raise FileNotFoundError(
            "LPIPS weights not found: set TS_LPIPS_WEIGHTS or place "
            "weights/lpips_vgg.npz (see convert_torchvision_weights)")
    img = jnp.asarray(img, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    squeeze = img.ndim == 3
    if squeeze:
        img, gt = img[None], gt[None]
    out = _lpips_jit(weights, img * 2.0 - 1.0, gt * 2.0 - 1.0)
    return out[0] if squeeze else out


def convert_torchvision_weights(out_path: str) -> None:
    """One-time export helper (run on a machine WITH torchvision + lpips):

        python -c "from triangle_splatting_tpu.trainers.lpips import \\
            convert_torchvision_weights as c; c('weights/lpips_vgg.npz')"

    Pulls VGG16 conv weights from torchvision and the linear heads from the
    `lpips` package, and saves them in this module's npz schema.
    """
    import torch
    import torchvision
    import lpips as lpips_pkg

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    net = lpips_pkg.LPIPS(net="vgg").eval()
    out = {}
    ci = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{ci}_w"] = layer.weight.detach().numpy()
            out[f"conv{ci}_b"] = layer.bias.detach().numpy()
            ci += 1
    for j, lin in enumerate(net.lins):
        out[f"lin{j}_w"] = (lin.model[-1].weight.detach()
                            .numpy().reshape(-1))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)


def random_weights(seed: int = 0) -> dict:
    """Random-init weights with the right shapes (tests only — the metric
    value is meaningless without pretrained weights)."""
    rng = np.random.default_rng(seed)
    out = {}
    in_c = 3
    for i, (c, _) in enumerate(_VGG_PLAN):
        out[f"conv{i}_w"] = jnp.asarray(
            rng.normal(0, 0.05, (c, in_c, 3, 3)).astype(np.float32))
        out[f"conv{i}_b"] = jnp.zeros((c,), jnp.float32)
        in_c = c
    for j, tap in enumerate(_TAPS):
        c = _VGG_PLAN[tap][0]
        out[f"lin{j}_w"] = jnp.asarray(
            rng.uniform(0, 0.1, (c,)).astype(np.float32))
    return out
