"""Per-triangle screen-space preprocess (differentiable, pure jax.numpy).

This is the TPU-native replacement for the CUDA preprocess kernels
(``diff-triangle-rasterization-2D/src/forward.cu:61-193`` and the matching
backward ``src/backward.cu:144-263``). Unlike the reference we do NOT write a
hand-derived backward: the preprocess is embarrassingly parallel elementwise
math, so it is expressed in jax.numpy and differentiated with JAX AD; XLA
fuses it into a handful of elementwise kernels. Hand-written Pallas is
reserved for the tile blend stage where it actually pays off.

2D variant semantics reproduced exactly:
- linearized projection of centroid-relative vectors (``projectVecApprox``,
  src/auxiliary.h:97-118) with view-space clipping at 1.3*tan(fov),
- 0.5 px low-pass dilation of the projected radii (src/forward.cu:127-131),
- near culling on projected z, degenerate culling on view-space normal and
  projected radii, optional backface culling on signed screen area,
- 3x dilated bounding rectangle -> touched 16x16 tiles + pixel radius
  (src/forward.cu:151-192).

``center2d_offset`` is a zeros (P, 2) input added to the projected centroid;
its cotangent equals the sum of the three screen-vertex gradients — the
densification statistic the reference extracts via the ``center2D`` dummy
tensor (renderer/triangle_renderer.py:66-67, src/backward.cu:261-262).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-8


def safe_norm(x, axis=-1):
    """Norm whose VJP is finite at x = 0.

    ``jnp.linalg.norm``'s cotangent is x/||x|| — NaN at zero vectors (dead
    capacity slots are all-zero triangles), and ``0 * NaN`` still poisons
    gradients. The tiny bias changes live values by < 1e-12.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-24)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RasterSettings:
    """Static rasterization configuration (hashable; jit-static).

    Tiles are 32x32 pixels by default, close to the reference's 16x16 CUDA
    blocks (src/config.h:5-6). The kernel handles any (tile_h, tile_w) with
    tile_h*tile_w % 128 == 0 — pixels live flat on the lane axis, so tile
    geometry is a pure perf knob: squarer tiles minimize the tiles a splat
    bbox touches (v5e sweep @800x800/100k: 32x32 -> 2.7 pairs/triangle vs
    4.2 at 8x128, fwd+bwd 42 ms vs 66 ms). Binning/membership semantics
    are identical across shapes (only which pixels see the faint ecc>3
    falloff ring differs — sub-1/255-alpha).
    """
    image_width: int = field(metadata=dict(static=True), default=800)
    image_height: int = field(metadata=dict(static=True), default=800)
    tile_h: int = field(metadata=dict(static=True), default=32)
    tile_w: int = field(metadata=dict(static=True), default=32)
    back_culling: bool = field(metadata=dict(static=True), default=False)
    rich_info: bool = field(metadata=dict(static=True), default=True)
    max_sh_degree: int = field(metadata=dict(static=True), default=3)
    rasterizer_type: str = field(metadata=dict(static=True), default="2D")
    # Pair budget for tile binning, as a multiple of the triangle count
    # (fractional budgets allowed — the need-based adaptation quantizes in
    # eighths). Binning reports overflow; trainers re-size adaptively.
    pairs_per_triangle: float = field(metadata=dict(static=True), default=6)

    @property
    def grid_w(self) -> int:
        return (self.image_width + self.tile_w - 1) // self.tile_w

    @property
    def grid_h(self) -> int:
        return (self.image_height + self.tile_h - 1) // self.tile_h

    @property
    def num_tiles(self) -> int:
        return self.grid_w * self.grid_h


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Preprocessed:
    """Per-triangle screen-space quantities feeding binning + blend."""
    v1_2d: jax.Array        # (P, 2) screen-space vertices (pixels)
    v2_2d: jax.Array
    v3_2d: jax.Array
    area2: jax.Array        # (P,) signed 2x area in pixel^2
    depth: jax.Array        # (P,) view-space z of the centroid (sort key)
    rgb: jax.Array          # (P, 3) SH-evaluated color
    valid: jax.Array        # (P,) bool — survives culling
    rect_min: jax.Array     # (P, 2) int32 tile coords (x, y), inclusive
    rect_max: jax.Array     # (P, 2) int32 tile coords, exclusive
    tiles_touched: jax.Array  # (P,) int32
    radii: jax.Array        # (P,) int32 pixel radius (0 if culled)
    normal_view: jax.Array  # (P, 3) unit view-space normal (rich_info)
    v_depth: jax.Array      # (P, 3) per-vertex view depth (rich_info)


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1,1] -> pixel center coordinates (src/auxiliary.h:35-38)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def project_vec_approx(p_view, vec_view, tan_fovx, tan_fovy):
    """Linearized perspective projection of a view-space vector at p_view.

    Mirrors ``projectVecApprox`` (src/auxiliary.h:97-118):
    d(x_proj) = (dx - dz*x/z) / (z * tan_fovx), same for y.
    """
    z = p_view[..., 2]
    x = vec_view[..., 0] - vec_view[..., 2] * p_view[..., 0] / z
    y = vec_view[..., 1] - vec_view[..., 2] * p_view[..., 1] / z
    return jnp.stack([x / (z * tan_fovx), y / (z * tan_fovy)], axis=-1)


def preprocess_2d(vertex: jnp.ndarray, center2d_offset: jnp.ndarray,
                  rgb: jnp.ndarray, world_view: jnp.ndarray,
                  full_proj: jnp.ndarray, tan_fovx, tan_fovy,
                  settings: RasterSettings,
                  alive_mask: Optional[jnp.ndarray] = None,
                  opacity: Optional[jnp.ndarray] = None,
                  gamma=None) -> Preprocessed:
    """Project triangles to screen space (2D linearized variant).

    Args:
        vertex: (P, 3, 3) world-space triangle vertices.
        center2d_offset: (P, 2) zeros; receives screen-space centroid grads.
        rgb: (P, 3) per-triangle color (SH already evaluated).
        world_view: (4, 4) world->view; full_proj: (4, 4) world->clip.
        opacity/gamma: optional — enables the TIGHT bounding box. The
            reference dilates every bbox by a fixed 3x (src/forward.cu:151),
            but the exact support of ``alpha >= 1/255`` is
            ``ecc <= (2 ln(255 o))^(1/(2 gamma))`` (eccentricity grows
            linearly with dilation about the centroid), which is <= 3.33 and
            shrinks hard at low opacity or solidified gamma. Pixels outside
            it are skipped by the alpha cutoff in the blend loop either way,
            so tightening produces the SAME image with far fewer tile pairs
            (up to ~9x fewer during gamma=50 solidify).
    """
    W, H = settings.image_width, settings.image_height
    TW, TH = settings.tile_w, settings.tile_h
    grid_w, grid_h = settings.grid_w, settings.grid_h

    center = vertex.mean(axis=1)                                    # (P, 3)

    # These tiny 4x4 transforms must stay exact f32 — TPU matmuls default to
    # bf16 inputs, which costs ~3 decimal digits on projected coordinates,
    # so spell them out as broadcasts on the VPU.
    def _apply(M, pts):
        """(R, 4) affine matrix applied to (P, 3) points -> (P, R)."""
        out = M[:, 0] * pts[:, 0:1] + M[:, 1] * pts[:, 1:2] + M[:, 2] * pts[:, 2:3]
        return out + M[:, 3]

    # Projected centroid (homogeneous, |w|+EPS guard, src/auxiliary.h:89-95).
    c_hom = _apply(full_proj, center)                               # (P, 4)
    cw = c_hom[:, 3]
    w_inv = 1.0 / (jnp.abs(cw) + EPS)
    center_proj = c_hom[:, :3] * w_inv[:, None]                     # (P, 3)
    valid = center_proj[:, 2] > 0                                   # near culling
    if alive_mask is not None:
        # Dead capacity slots (fixed-capacity model arrays) are culled here
        # so they produce no tile pairs at all.
        valid = valid & alive_mask

    Rv = world_view[:3, :3]
    center_view = _apply(world_view[:3], center)                    # (P, 3)
    zv = center_view[:, 2]
    zv_safe = jnp.where(jnp.abs(zv) < EPS, 1.0, zv)
    limx = 1.3 * tan_fovx * zv_safe
    limy = 1.3 * tan_fovy * zv_safe
    cvc = jnp.stack([
        jnp.clip(center_view[:, 0], -limx, limx),
        jnp.clip(center_view[:, 1], -limy, limy),
        zv_safe,
    ], axis=-1)

    r = vertex - center[:, None, :]                                 # (P, 3, 3)
    # Rotation-only transform, same full-precision broadcast treatment.
    r_view = (Rv[:, 0] * r[..., 0:1] + Rv[:, 1] * r[..., 1:2]
              + Rv[:, 2] * r[..., 2:3])                             # (P, 3, 3)
    n_view_raw = jnp.cross(r_view[:, 0], r_view[:, 1])              # (P, 3)
    n_view_norm = safe_norm(n_view_raw)
    valid = valid & (n_view_norm >= EPS)

    r_proj = project_vec_approx(cvc[:, None, :], r_view, tan_fovx, tan_fovy)  # (P, 3, 2)
    n_proj = safe_norm(r_proj)                                      # (P, 3)
    valid = valid & jnp.all(n_proj >= EPS, axis=-1)
    n_proj_safe = jnp.where(n_proj < EPS, 1.0, n_proj)

    # 0.5 px low-pass dilation: radii scaled by (0.5*size + 0.5/|r_proj|).
    kernel_size = 0.5
    scale = jnp.stack([
        0.5 * W + kernel_size / n_proj_safe,
        0.5 * H + kernel_size / n_proj_safe,
    ], axis=-1)                                                     # (P, 3, 2)
    r_2d = r_proj * scale                                           # (P, 3, 2)

    center_2d = jnp.stack([
        ndc2pix(center_proj[:, 0], W),
        ndc2pix(center_proj[:, 1], H),
    ], axis=-1) + center2d_offset                                   # (P, 2)

    v_2d = center_2d[:, None, :] + r_2d                             # (P, 3, 2)
    area2 = _cross2(v_2d[:, 1] - v_2d[:, 0], v_2d[:, 2] - v_2d[:, 0])
    if settings.back_culling:
        valid = valid & (area2 < -EPS)
    else:
        valid = valid & (jnp.abs(area2) >= EPS)

    if opacity is not None and gamma is not None:
        o = jax.lax.stop_gradient(opacity.reshape(-1))
        g = jnp.asarray(gamma, jnp.float32)
        vis = o * 255.0 > 1.0 + 1e-6
        valid = valid & vis                      # alpha < 1/255 everywhere
        log_pow = jnp.log(jnp.maximum(2.0 * jnp.log(jnp.maximum(255.0 * o, 1.0 + 1e-6)), 1e-12))
        dilation = jnp.minimum(3.0, jnp.exp(log_pow / (2.0 * g)))[:, None, None]
        dilation = jax.lax.stop_gradient(dilation)
    else:
        dilation = 3.0
    v_dil = center_2d[:, None, :] + dilation * r_2d                 # (P, 3, 2)
    v_min = v_dil.min(axis=1)
    v_max = v_dil.max(axis=1)

    rect_min = jnp.stack([
        jnp.clip(jnp.floor(v_min[:, 0] / TW).astype(jnp.int32), 0, grid_w),
        jnp.clip(jnp.floor(v_min[:, 1] / TH).astype(jnp.int32), 0, grid_h),
    ], axis=-1)
    rect_max = jnp.stack([
        jnp.clip(jnp.floor((v_max[:, 0] + TW - 1) / TW).astype(jnp.int32), 0, grid_w),
        jnp.clip(jnp.floor((v_max[:, 1] + TH - 1) / TH).astype(jnp.int32), 0, grid_h),
    ], axis=-1)
    valid = valid & (rect_max[:, 0] > rect_min[:, 0]) & (rect_max[:, 1] > rect_min[:, 1])

    tiles_touched = jnp.where(
        valid, (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1]), 0
    ).astype(jnp.int32)
    radii = jnp.where(valid, jnp.maximum(
        jnp.ceil((v_max[:, 0] - v_min[:, 0]) * 0.5),
        jnp.ceil((v_max[:, 1] - v_min[:, 1]) * 0.5),
    ).astype(jnp.int32), 0)

    normal_view = n_view_raw / jnp.where(n_view_norm < EPS, 1.0, n_view_norm)[:, None]
    v_depth = r_view[:, :, 2] + zv[:, None]                         # (P, 3)

    return Preprocessed(
        v1_2d=v_2d[:, 0], v2_2d=v_2d[:, 1], v3_2d=v_2d[:, 2],
        area2=area2, depth=zv, rgb=rgb, valid=valid,
        rect_min=rect_min, rect_max=rect_max,
        tiles_touched=tiles_touched, radii=radii,
        normal_view=normal_view, v_depth=v_depth,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Preprocessed3D:
    """Per-triangle quantities for the perspective-correct 3D variant
    (diff-triangle-rasterization-3D): view-space vertices + raw plane normal
    instead of screen-space vertices."""
    v1_view: jax.Array      # (P, 3)
    v2_view: jax.Array
    v3_view: jax.Array
    normal_view: jax.Array  # (P, 3) UNNORMALIZED cross(v2-v1, v3-v1)
    depth: jax.Array        # (P,) view z of the centroid (sort key)
    rgb: jax.Array          # (P, 3)
    valid: jax.Array        # (P,) bool
    rect_min: jax.Array     # (P, 2) int32
    rect_max: jax.Array     # (P, 2) int32
    tiles_touched: jax.Array  # (P,) int32
    radii: jax.Array        # (P,) int32
    # 2D-variant extras kept for a uniform oracle interface
    v_depth: jax.Array      # (P, 3) per-vertex view depth (unused by blend)


def preprocess_3d(vertex: jnp.ndarray, center2d_offset: jnp.ndarray,
                  rgb: jnp.ndarray, world_view: jnp.ndarray,
                  full_proj: jnp.ndarray, tan_fovx, tan_fovy,
                  settings: RasterSettings,
                  alive_mask: Optional[jnp.ndarray] = None,
                  opacity: Optional[jnp.ndarray] = None,
                  gamma=None) -> Preprocessed3D:
    """Perspective-correct preprocess (3D/src/forward.cu:61-148).

    The triangle is dilated in WORLD space about its centroid, each dilated
    vertex is projected (near-culled if any lands behind the camera), and
    the screen bbox of the three projections gives the touched tiles.
    ``center2d_offset`` shifts the projected pixel coordinates so its
    cotangent matches the reference's view-space-xy ``center2D`` gradient
    statistic (3D/src/backward.cu:211-213) up to the pixel scaling.
    """
    W, H = settings.image_width, settings.image_height
    TW, TH = settings.tile_w, settings.tile_h
    grid_w, grid_h = settings.grid_w, settings.grid_h

    def _apply(M, pts):
        out = M[:, 0] * pts[:, 0:1] + M[:, 1] * pts[:, 1:2] + M[:, 2] * pts[:, 2:3]
        return out + M[:, 3]

    v_view = (world_view[:3, 0] * vertex[..., 0:1]
              + world_view[:3, 1] * vertex[..., 1:2]
              + world_view[:3, 2] * vertex[..., 2:3]
              + world_view[:3, 3])                              # (P, 3, 3)
    # center2D statistics hook: the 3D reference accumulates view-space xy
    # vertex gradients into center2D (3D/src/backward.cu:211-213); adding
    # the zero offset to every vertex's view xy reproduces that cotangent.
    offset3 = jnp.concatenate([center2d_offset,
                               jnp.zeros_like(center2d_offset[:, :1])], -1)
    v_view = v_view + offset3[:, None, :]
    center_view = v_view.mean(axis=1)
    normal_view = jnp.cross(v_view[:, 1] - v_view[:, 0],
                            v_view[:, 2] - v_view[:, 0])        # (P, 3)
    n_norm = safe_norm(normal_view)
    valid = n_norm >= EPS
    if settings.back_culling:
        valid = valid & (normal_view[:, 2] < 0)
    if alive_mask is not None:
        valid = valid & alive_mask

    # World-space dilation about the centroid, then projection of all three
    # dilated vertices. Tight dilation (see preprocess_2d) applies equally.
    center = vertex.mean(axis=1)
    if opacity is not None and gamma is not None:
        o = jax.lax.stop_gradient(opacity.reshape(-1))
        g = jnp.asarray(gamma, jnp.float32)
        vis = o * 255.0 > 1.0 + 1e-6
        valid = valid & vis
        log_pow = jnp.log(jnp.maximum(
            2.0 * jnp.log(jnp.maximum(255.0 * o, 1.0 + 1e-6)), 1e-12))
        dilation = jnp.minimum(3.0, jnp.exp(log_pow / (2.0 * g)))[:, None, None]
        dilation = jax.lax.stop_gradient(dilation)
    else:
        dilation = 3.0
    v_dil = center[:, None, :] + dilation * (vertex - center[:, None, :])

    flat = v_dil.reshape(-1, 3)
    h = _apply(full_proj, flat)                                 # (3P, 4)
    w_inv = 1.0 / (jnp.abs(h[:, 3]) + EPS)
    proj = (h[:, :3] * w_inv[:, None]).reshape(-1, 3, 3)        # (P, 3, 3)
    valid = valid & jnp.all(proj[:, :, 2] > 0, axis=1)          # near culling

    # projToPix: (v + 1) * S * 0.5 - 0.5 (3D/src/auxiliary.h:35-38)
    pix_x = (proj[:, :, 0] + 1.0) * (W * 0.5) - 0.5
    pix_y = (proj[:, :, 1] + 1.0) * (H * 0.5) - 0.5
    v_min = jnp.stack([pix_x.min(axis=1), pix_y.min(axis=1)], -1)
    v_max = jnp.stack([pix_x.max(axis=1), pix_y.max(axis=1)], -1)

    rect_min = jnp.stack([
        jnp.clip(jnp.floor(v_min[:, 0] / TW).astype(jnp.int32), 0, grid_w),
        jnp.clip(jnp.floor(v_min[:, 1] / TH).astype(jnp.int32), 0, grid_h),
    ], axis=-1)
    rect_max = jnp.stack([
        jnp.clip(jnp.floor((v_max[:, 0] + TW - 1) / TW).astype(jnp.int32), 0, grid_w),
        jnp.clip(jnp.floor((v_max[:, 1] + TH - 1) / TH).astype(jnp.int32), 0, grid_h),
    ], axis=-1)
    valid = valid & (rect_max[:, 0] > rect_min[:, 0]) & (rect_max[:, 1] > rect_min[:, 1])

    tiles_touched = jnp.where(
        valid, (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1]), 0
    ).astype(jnp.int32)
    radii = jnp.where(valid, jnp.maximum(
        jnp.ceil((v_max[:, 0] - v_min[:, 0]) * 0.5),
        jnp.ceil((v_max[:, 1] - v_min[:, 1]) * 0.5),
    ).astype(jnp.int32), 0)

    return Preprocessed3D(
        v1_view=v_view[:, 0], v2_view=v_view[:, 1], v3_view=v_view[:, 2],
        normal_view=normal_view, depth=center_view[:, 2], rgb=rgb,
        valid=valid, rect_min=rect_min, rect_max=rect_max,
        tiles_touched=tiles_touched, radii=radii,
        v_depth=v_view[:, :, 2])
