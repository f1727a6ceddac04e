"""Spherical-harmonics color evaluation (degrees 0..3) in jax.numpy.

Math mirrors the reference kernel (``diff-triangle-rasterization-2D/src/
forward.cu:9-59``) and ``utils/sh_utils.py:24-108``: real SH basis up to
degree 3, +0.5 shift, clamp at zero (the clamp's subgradient is handled
automatically by ``jnp.maximum`` under AD, matching the reference's
``clamped`` bookkeeping in backward.cu:9-119).

Instead of switching SH degree statically (which would force a recompile at
every degree bump), ``eval_sh`` takes a traced ``active_degree`` and masks the
coefficient bands — identical numerics, zero recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def RGB2SH(rgb):
    return (rgb - 0.5) / SH_C0


def SH2RGB(sh):
    return sh * SH_C0 + 0.5


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, max_degree: int) -> jnp.ndarray:
    """Real SH basis values for unit directions.

    Args:
        dirs: (..., 3) unit vectors.
        max_degree: static int in [0, 3].
    Returns:
        (..., (max_degree+1)**2) basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, SH_C0)]
    if max_degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if max_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if max_degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def band_mask(active_degree, max_degree: int) -> jnp.ndarray:
    """(K,) 0/1 mask keeping coefficients with l <= active_degree.

    ``active_degree`` may be traced; ``max_degree`` is static.
    """
    k = num_sh_coeffs(max_degree)
    idx = np.arange(k)
    # degree of coefficient i is floor(sqrt(i))
    coeff_degree = jnp.asarray(np.floor(np.sqrt(idx)).astype(np.int32))
    return (coeff_degree <= active_degree).astype(jnp.float32)


def eval_sh(sh: jnp.ndarray, positions: jnp.ndarray, campos: jnp.ndarray,
            active_degree, max_degree: int) -> jnp.ndarray:
    """Evaluate SH color at each primitive (reference forward.cu:9-59).

    Args:
        sh: (P, K, 3) coefficients with K = (max_degree+1)**2.
        positions: (P, 3) world positions (triangle centroids).
        campos: (3,) camera center.
        active_degree: traced int — bands above it are masked to zero.
        max_degree: static int.
    Returns:
        (P, 3) colors, clamped at zero after the +0.5 shift.
    """
    d = positions - campos[None, :]
    # Grad-safe normalize: degenerate (zero) directions — dead capacity
    # slots parked at the camera center — must not produce NaNs. The eps
    # lives INSIDE the sqrt so the VJP at d = 0 is finite too
    # (jnp.linalg.norm's backward is 0/0 there even if the forward is
    # clamped afterwards).
    n = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-24)
    d = d / n
    basis = sh_basis(d, max_degree)                        # (P, K)
    basis = basis * band_mask(active_degree, max_degree)[None, :]
    # Broadcast-sum, not einsum: a K<=16 contraction pads to a full MXU
    # tile (and bf16 default breaks the <=1e-3/pixel parity budget); the
    # elementwise f32 form is exact and prices ~nothing on the VPU.
    rgb = (basis[:, :, None] * sh).sum(axis=1) + 0.5
    return jnp.maximum(rgb, 0.0)
