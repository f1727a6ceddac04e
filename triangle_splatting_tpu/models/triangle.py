"""VanillaTS triangle model, TPU-native functional redesign.

The reference (``models/VanillaTS_model.py:21-917``) stores parameters as
``nn.Parameter`` and performs adaptive density control by surgically editing
tensors *and* Adam moments in place (``:214-345``). That is hostile to XLA:
shapes must be static under jit. Here:

- parameters are a dict pytree at a fixed capacity C with an ``alive`` mask
  (dead slots are culled in preprocess, contribute nothing, and get no
  gradients);
- the optimizer is a hand-rolled Adam (torch semantics: eps outside the
  bias-corrected sqrt, eps=1e-15 like ``_setup_optimizer`` :124) whose
  moments are plain pytree leaves, so grow/prune/clip "surgery" is pure
  masked arithmetic;
- every model_update op (``:347-581``) is a pure function
  ``(params, opt, state, ...) -> (params, opt, state)`` with static shapes;
- capacity reallocation (when densification fills all dead slots) happens on
  the host between jitted steps (pad + recompile) — rare by design.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_mod
from ..ops.projection import RasterSettings, safe_norm
from ..ops.rasterize import rasterize
from ..utils.camera import Camera
from .model_utils import (get_inside_mask, inter_point_distance_np,
                          inverse_sigmoid, inverse_sigmoid_np)


# ---------------------------------------------------------------------------
# Pytrees
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TriangleParams:
    """Learnable parameters at fixed capacity C."""
    vertex: jax.Array        # (C, 3, 3)
    opacity: jax.Array       # (C, 1) logits
    f_dc: jax.Array          # (C, 1, 3)
    f_rest: jax.Array        # (C, K-1, 3)
    affine_weight: Optional[jax.Array] = None   # (V, 3, 3)
    affine_bias: Optional[jax.Array] = None     # (V, 3)

    @property
    def capacity(self) -> int:
        return self.vertex.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TriangleState:
    """Non-learnable model state (densification statistics + schedules)."""
    alive: jax.Array          # (C,) bool
    gradient_accum: jax.Array  # (C,)
    gradient_denom: jax.Array  # (C,)
    max_radii2d: jax.Array     # (C,)
    contrib_sum: jax.Array     # (C,)
    contrib_max: jax.Array     # (C,)
    contrib_denom: jax.Array   # (C,)
    gamma: jax.Array           # () f32
    active_sh_degree: jax.Array  # () i32

    @staticmethod
    def create(capacity: int, gamma: float = 1.0) -> "TriangleState":
        # Distinct buffers per field — aliased zeros break buffer donation
        # ("attempt to donate the same buffer twice").
        def z():
            return jnp.zeros((capacity,), jnp.float32)
        return TriangleState(
            alive=jnp.zeros((capacity,), bool), gradient_accum=z(),
            gradient_denom=z(), max_radii2d=z(), contrib_sum=z(),
            contrib_max=z(), contrib_denom=z(), gamma=jnp.float32(gamma),
            active_sh_degree=jnp.int32(0))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AdamState:
    m: TriangleParams
    v: TriangleParams
    step: jax.Array   # () i32

    @staticmethod
    def create(params: TriangleParams) -> "AdamState":
        # m and v must be distinct buffers (donation aliasing).
        m = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(m=m, v=v, step=jnp.int32(0))


@dataclass(frozen=True)
class ModelConfig:
    """Static model switches (reference VanillaTS_model.py:25-32)."""
    max_sh_degree: int = 3
    use_color_affine: bool = False
    back_culling: bool = False
    back_culling_prob: float = 1.0
    ste_threshold: Optional[float] = None
    gamma_rescale: bool = False
    render_up_scale: Optional[int] = None
    rasterizer_type: str = "2D"


# ---------------------------------------------------------------------------
# Derived quantities
# ---------------------------------------------------------------------------

def get_xyz(params: TriangleParams) -> jnp.ndarray:
    return params.vertex.mean(axis=1)


def get_scaling(params: TriangleParams) -> jnp.ndarray:
    """Mean side length per triangle (VanillaTS_model.py:71-76).

    safe_norm: dead slots are zero triangles and a plain norm VJP would NaN.
    """
    v = params.vertex
    l1 = safe_norm(v[:, 2] - v[:, 1])
    l2 = safe_norm(v[:, 0] - v[:, 2])
    l3 = safe_norm(v[:, 1] - v[:, 0])
    return (l1 + l2 + l3) / 3.0


def get_opacity(params: TriangleParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_features(params: TriangleParams) -> jnp.ndarray:
    return jnp.concatenate([params.f_dc, params.f_rest], axis=1)


def rescale_triangles(vertex: jnp.ndarray, ratio) -> jnp.ndarray:
    """Scale triangles about their centroid (VanillaTS_model.py:431-447)."""
    center = vertex.mean(axis=1, keepdims=True)
    ratio = jnp.asarray(ratio)
    if ratio.ndim == 1:
        ratio = ratio[:, None, None]
    return (vertex - center) * ratio + center


def gamma_rescale_ratio(gamma) -> jnp.ndarray:
    """Keep the integrated splat opacity invariant across gamma
    (VanillaTS_model.py:614-618): 1/sqrt(2^b * b * Gamma(b)), b = 1/gamma."""
    b = 1.0 / jnp.asarray(gamma, jnp.float32)
    log_val = b * jnp.log(2.0) + jnp.log(b) + jax.scipy.special.gammaln(b)
    return jnp.exp(-0.5 * log_val)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def forward(params: TriangleParams, state: TriangleState, camera: Camera,
            background: jnp.ndarray, cfg: ModelConfig,
            settings: RasterSettings, *, is_training: bool = True,
            center2d_offset: Optional[jnp.ndarray] = None,
            apply_color_affine: Optional[bool] = None,
            impl: str = "pallas", interpret: bool = False,
            max_pairs: Optional[int] = None,
            need_stats: bool = True) -> dict:
    """Render the scene through one camera (VanillaTS_model.py:583-685).

    ``center2d_offset`` is the densification-statistics hook: pass zeros
    (C, 2) and differentiate w.r.t. it to obtain the screen-space centroid
    gradients the reference reads from ``center2D.grad``.
    """
    vertex = params.vertex
    opacity = get_opacity(params)[:, 0]
    shs = get_features(params)
    alive = state.alive

    if cfg.gamma_rescale:
        vertex = rescale_triangles(vertex, gamma_rescale_ratio(state.gamma))

    if cfg.ste_threshold is not None:
        # Straight-through estimator: binary opacity forward, identity grad
        # (VanillaTS_model.py:620-621).
        hard = (opacity > cfg.ste_threshold).astype(jnp.float32)
        opacity = jax.lax.stop_gradient(hard - opacity) + opacity

    # Background depth: farthest vertex distance from the camera
    # (VanillaTS_model.py:623). Dead slots excluded.
    dist = safe_norm(camera.camera_center[None, None, :] - vertex)
    bg_depth = jnp.max(jnp.where(alive[:, None], dist, 0.0))

    up = cfg.render_up_scale if (cfg.render_up_scale or 0) > 1 else 1
    if up > 1:
        settings = replace(settings,
                           image_width=settings.image_width * up,
                           image_height=settings.image_height * up)

    out = rasterize(vertex, opacity, shs, camera, settings,
                    gamma=state.gamma, background=background,
                    bg_depth=bg_depth,
                    active_sh_degree=state.active_sh_degree,
                    center2d_offset=center2d_offset, alive_mask=alive,
                    impl=impl, interpret=interpret, max_pairs=max_pairs,
                    need_stats=need_stats)

    if up > 1:
        H, W = settings.image_height // up, settings.image_width // up
        out["render"] = jax.image.resize(out["render"], (3, H, W), "linear")
        out["depth"] = jax.image.resize(out["depth"], (H, W), "linear")
        out["normal"] = jax.image.resize(out["normal"], (3, H, W), "linear")
        out["radii"] = out["radii"] // up

    render_pkg = dict(out)
    render_pkg.update(
        scaling=get_scaling(params), opacity=get_opacity(params),
        vertex=params.vertex,
        visible_mask=(out["radii"] > 0) & alive,
    )

    use_affine = cfg.use_color_affine if apply_color_affine is None else apply_color_affine
    if cfg.use_color_affine and use_affine and params.affine_weight is not None:
        img = render_pkg["render"]
        W3 = params.affine_weight[camera.uid]
        b3 = params.affine_bias[camera.uid]
        transformed = jnp.einsum("chw,cd->dhw", img, W3,
                                 precision=jax.lax.Precision.HIGHEST) \
            + b3[:, None, None]
        render_pkg["render_original"] = img
        render_pkg["render"] = jnp.clip(transformed, 0.0, 1.0)

    return render_pkg


# ---------------------------------------------------------------------------
# Adam (torch semantics, per-group learning rates)
# ---------------------------------------------------------------------------

PARAM_GROUPS = ("vertex", "opacity", "f_dc", "f_rest",
                "affine_weight", "affine_bias")


def adam_update(params: TriangleParams, opt: AdamState,
                grads: TriangleParams, lrs: dict,
                beta1: float = 0.9, beta2: float = 0.999,
                eps: float = 1e-15):
    """One Adam step with per-group lrs (reference Adam eps=1e-15)."""
    step = opt.step + 1
    bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** step.astype(jnp.float32)

    new_p, new_m, new_v = {}, {}, {}
    for name in PARAM_GROUPS:
        p = getattr(params, name)
        if p is None:
            new_p[name], new_m[name], new_v[name] = None, None, None
            continue
        if name in lrs:
            lr_name = name
        elif name in ("affine_weight", "affine_bias"):
            lr_name = "affine"      # both affine tensors share one schedule
        else:
            raise KeyError(f"no learning rate for parameter group {name!r}")
        g = getattr(grads, name)
        m = getattr(opt.m, name)
        v = getattr(opt.v, name)
        m2 = beta1 * m + (1 - beta1) * g
        v2 = beta2 * v + (1 - beta2) * g * g
        update = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
        new_p[name] = p - lrs[lr_name] * update
        new_m[name] = m2
        new_v[name] = v2

    params2 = TriangleParams(**new_p)
    opt2 = AdamState(m=TriangleParams(**new_m), v=TriangleParams(**new_v),
                     step=step)
    return params2, opt2


def _mask_rows(tree_leaf, mask, value=0.0):
    """Zero (or set) rows of a (C, ...) leaf where mask is True."""
    m = mask.reshape((-1,) + (1,) * (tree_leaf.ndim - 1))
    return jnp.where(m, value, tree_leaf)


def zero_moments(opt: AdamState, mask: jnp.ndarray,
                 groups=("vertex", "opacity", "f_dc", "f_rest")) -> AdamState:
    """Reset Adam moments on selected rows (the reference's state surgery)."""
    def fix(tp: TriangleParams) -> TriangleParams:
        kw = {}
        for name in PARAM_GROUPS:
            leaf = getattr(tp, name)
            if leaf is None or name not in groups:
                kw[name] = leaf
            else:
                kw[name] = _mask_rows(leaf, mask)
        return TriangleParams(**kw)
    return AdamState(m=fix(opt.m), v=fix(opt.v), step=opt.step)


# ---------------------------------------------------------------------------
# Initialization (host side)
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       normals: Optional[np.ndarray], cfg: ModelConfig,
                       init_opacity=0.1, capacity: Optional[int] = None,
                       capacity_factor: float = 1.0, seed: int = 0,
                       duplicate_count: int = 1):
    """Build equilateral triangles around points (VanillaTS_model.py:830-917).

    Returns (params, state) at capacity >= number of triangles.
    """
    rng = np.random.default_rng(seed)
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    n0 = points.shape[0]
    if normals is None or not np.any(normals):
        normals = rng.normal(size=(n0, 3)).astype(np.float32)
    normals = normals / np.linalg.norm(normals, axis=1, keepdims=True)

    shs = ((colors - 0.5) / sh_mod.SH_C0).astype(np.float32)
    scaling = inter_point_distance_np(points)[:, None]

    if duplicate_count > 1:
        reps_p, reps_s, reps_n = [points], [shs], [normals]
        for _ in range(duplicate_count - 1):
            offset = (rng.uniform(size=(n0, 3)).astype(np.float32) * 2 - 1) * 0.5 * scaling
            reps_p.append(points + offset)
            reps_s.append(shs)
            reps_n.append(normals)
        points = np.concatenate(reps_p, 0)
        shs = np.concatenate(reps_s, 0)
        normals = np.concatenate(reps_n, 0)
        scaling = inter_point_distance_np(points)[:, None]

    n = points.shape[0]
    up = np.array([0, 0, 1], np.float32)
    u = np.cross(np.broadcast_to(up, (n, 3)), normals)
    bad = np.linalg.norm(u, axis=1) < 1e-10
    u[bad] = np.array([1, 0, 0], np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    v = np.cross(normals, u)
    badv = np.linalg.norm(v, axis=1) < 1e-10
    v[badv] = np.array([0, 1, 0], np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    v1 = points + u * scaling
    v2 = points + (-0.5 * u + (math.sqrt(3) / 2) * v) * scaling
    v3 = points + (-0.5 * u - (math.sqrt(3) / 2) * v) * scaling
    vertex = np.stack([v1, v2, v3], axis=1)

    if init_opacity == "random":
        opacities = inverse_sigmoid_np(rng.uniform(size=(n, 1)).astype(np.float32))
    else:
        opacities = np.full((n, 1), inverse_sigmoid_np(float(init_opacity)), np.float32)

    K = (cfg.max_sh_degree + 1) ** 2
    f_dc = shs[:, None, :]
    f_rest = np.zeros((n, K - 1, 3), np.float32)

    if cfg.back_culling:
        # Duplicate every triangle with flipped winding so both sides exist
        # (VanillaTS_model.py:904-908).
        vertex = np.concatenate([vertex, vertex[:, ::-1, :]], axis=0)
        opacities = np.concatenate([opacities, opacities], axis=0)
        f_dc = np.concatenate([f_dc, f_dc], axis=0)
        f_rest = np.concatenate([f_rest, f_rest], axis=0)
        n *= 2

    cap = capacity if capacity is not None else _round_up(
        max(int(n * capacity_factor), n), 256)

    def pad(x):
        return np.concatenate(
            [x, np.zeros((cap - n,) + x.shape[1:], x.dtype)], axis=0)

    params = TriangleParams(
        vertex=jnp.asarray(pad(vertex)),
        opacity=jnp.asarray(pad(opacities)),
        f_dc=jnp.asarray(pad(f_dc)),
        f_rest=jnp.asarray(pad(f_rest)),
    )
    state = TriangleState.create(cap)
    state = replace(state, alive=jnp.asarray(np.arange(cap) < n))
    return params, state


def setup_color_affine(params: TriangleParams, view_count: int) -> TriangleParams:
    """Identity-initialized per-view color transforms (VanillaTS_model.py:86-94)."""
    w = np.tile(np.eye(3, dtype=np.float32)[None], (view_count, 1, 1))
    b = np.zeros((view_count, 3), np.float32)
    return replace(params, affine_weight=jnp.asarray(w), affine_bias=jnp.asarray(b))


# ---------------------------------------------------------------------------
# Adaptive density control (VanillaTS_model.py:347-581), pure + fixed shape
# ---------------------------------------------------------------------------

def update_statistics(state: TriangleState, center2d_grad: jnp.ndarray,
                      radii: jnp.ndarray, contrib_sum: jnp.ndarray,
                      contrib_max: jnp.ndarray,
                      visible: jnp.ndarray) -> TriangleState:
    """Accumulate densification statistics (VanillaTS_model.py:347-363)."""
    gnorm = jnp.linalg.norm(center2d_grad, axis=-1)
    vis = visible
    return replace(
        state,
        gradient_accum=state.gradient_accum + jnp.where(vis, gnorm, 0.0),
        gradient_denom=state.gradient_denom + vis.astype(jnp.float32),
        contrib_sum=jnp.where(vis, jnp.maximum(state.contrib_sum, contrib_sum),
                              state.contrib_sum),
        contrib_max=jnp.where(vis, jnp.maximum(state.contrib_max, contrib_max),
                              state.contrib_max),
        contrib_denom=state.contrib_denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d,
                                               radii.astype(jnp.float32)),
                              state.max_radii2d),
    )


def prune(params: TriangleParams, opt: AdamState, state: TriangleState,
          prune_mask: jnp.ndarray):
    """Deactivate rows; stats cleared; moments cleared for reuse hygiene."""
    prune_mask = prune_mask & state.alive
    state = replace(
        state, alive=state.alive & ~prune_mask,
        gradient_accum=jnp.where(prune_mask, 0, state.gradient_accum),
        gradient_denom=jnp.where(prune_mask, 0, state.gradient_denom),
        max_radii2d=jnp.where(prune_mask, 0, state.max_radii2d),
        contrib_sum=jnp.where(prune_mask, 0, state.contrib_sum),
        contrib_max=jnp.where(prune_mask, 0, state.contrib_max),
        contrib_denom=jnp.where(prune_mask, 0, state.contrib_denom),
    )
    opt = zero_moments(opt, prune_mask)
    return params, opt, state


def opacity_pruning(params, opt, state, threshold):
    mask = (get_opacity(params)[:, 0] < threshold) & state.alive
    return prune(params, opt, state, mask) + (mask.sum(),)


def opacity_clipping(params, opt, state, threshold):
    """Push confident opacities to logit 10 (VanillaTS_model.py:399-410)."""
    mask = (get_opacity(params)[:, 0] > threshold) & state.alive
    new_op = jnp.where(mask[:, None], 10.0, params.opacity)
    params = replace(params, opacity=new_op)
    opt = zero_moments(opt, mask, groups=("opacity",))
    return params, opt, state, mask.sum()


def scale_pruning(params, opt, state, radii_threshold, scale_threshold):
    mask = ((state.max_radii2d > radii_threshold)
            | (get_scaling(params) > scale_threshold)) & state.alive
    return prune(params, opt, state, mask) + (mask.sum(),)


def scale_clipping(params, opt, state, scale_max):
    scaling = get_scaling(params)
    mask = (scaling > scale_max) & state.alive
    ratio = jnp.where(mask, scale_max / jnp.maximum(scaling, 1e-12), 1.0)
    new_v = rescale_triangles(params.vertex, ratio)
    params = replace(params, vertex=jnp.where(mask[:, None, None], new_v,
                                              params.vertex))
    opt = zero_moments(opt, mask, groups=("vertex",))
    return params, opt, state, mask.sum()


def opacity_reset(params, opt, state, reset_value):
    """Clamp opacity down to reset_value (VanillaTS_model.py:534-547);
    the reference zeroes the whole opacity moment tensors."""
    op = get_opacity(params)
    new_op = inverse_sigmoid(jnp.minimum(op, reset_value))
    params = replace(params, opacity=new_op)
    opt = zero_moments(opt, jnp.ones(params.capacity, bool), groups=("opacity",))
    return params, opt, state


def densify(params: TriangleParams, opt: AdamState, state: TriangleState,
            grad_threshold, min_view_count, split_scale_threshold):
    """Clone small / split large high-gradient triangles
    (VanillaTS_model.py:260-308, 365-384). Fixed-shape: new rows go into
    dead capacity slots; overflow (capacity full) is reported so the host
    can reallocate.
    """
    C = params.capacity
    select = state.gradient_denom >= min_view_count
    grow = select & (state.gradient_accum > grad_threshold * state.gradient_denom) \
        & state.alive

    large = get_scaling(params) > split_scale_threshold
    clone_mask = grow & ~large       # original kept + 1 copy
    split_mask = grow & large        # original pruned + 2 halves

    v = params.vertex
    side_len = jnp.stack([
        jnp.linalg.norm(v[:, 2] - v[:, 1], axis=-1),
        jnp.linalg.norm(v[:, 0] - v[:, 2], axis=-1),
        jnp.linalg.norm(v[:, 1] - v[:, 0], axis=-1),
    ], axis=1)
    lside = jnp.argmax(side_len, axis=1)
    r = jnp.arange(C)
    p1 = (lside + 1) % 3
    p2 = (lside + 2) % 3
    mid = (v[r, p1] + v[r, p2]) / 2
    tri1 = jnp.stack([v[r, lside], v[r, p1], mid], axis=1)
    tri2 = jnp.stack([v[r, lside], mid, v[r, p2]], axis=1)

    # Candidate new rows: slot 2i   = clone copy or split half 1,
    #                     slot 2i+1 = split half 2 (invalid for clones).
    new_vertex = jnp.stack([jnp.where(split_mask[:, None, None], tri1, v),
                            tri2], axis=1).reshape(2 * C, 3, 3)
    new_valid = jnp.stack([clone_mask | split_mask, split_mask], axis=1).reshape(2 * C)
    src = jnp.stack([r, r], axis=1).reshape(2 * C)

    # Compact: k-th valid new row -> k-th dead slot.
    new_order = jnp.argsort(~new_valid, stable=True)           # valid first
    dead_order = jnp.argsort(state.alive, stable=True)         # dead first
    n_new = new_valid.sum()
    n_dead = (~state.alive).sum()
    n_place = jnp.minimum(n_new, n_dead)
    overflow = n_new > n_dead

    # Atomic split placement: if the capacity boundary would place a split's
    # half 1 while dropping its half 2, hold half 1 back too — the original
    # is kept on partial placement, so a lone half would duplicate geometry.
    inv = jnp.argsort(new_order)                               # cand -> rank
    last = new_order[jnp.clip(n_place - 1, 0, 2 * C - 1)]
    orphan = ((n_place > 0) & (last % 2 == 0) & split_mask[last // 2]
              & (inv[jnp.minimum(last + 1, 2 * C - 1)] >= n_place))
    n_place = n_place - orphan.astype(n_place.dtype)

    k = jnp.arange(C)
    take_new = new_order[k]                     # candidate index for k-th place
    dst = jnp.where(k < n_place, dead_order[k], C)   # target slot (drop if full)
    src_row = src[take_new]

    def place(leaf, new_rows=None):
        rows = new_rows if new_rows is not None else leaf[src_row]
        return leaf.at[dst].set(rows, mode="drop")

    params = replace(
        params,
        vertex=place(params.vertex, new_vertex[take_new]),
        opacity=place(params.opacity),
        f_dc=place(params.f_dc),
        f_rest=place(params.f_rest),
    )
    placed = jnp.zeros(C, bool).at[dst].set(k < n_place, mode="drop")
    state = replace(state, alive=state.alive | placed)
    opt = zero_moments(opt, placed)

    # Stats reset on selected rows + cleared on new rows.
    clear = placed | select
    state = replace(
        state,
        gradient_accum=jnp.where(clear, 0, state.gradient_accum),
        gradient_denom=jnp.where(clear, 0, state.gradient_denom),
        max_radii2d=jnp.where(placed, 0, state.max_radii2d),
        contrib_sum=jnp.where(placed, 0, state.contrib_sum),
        contrib_max=jnp.where(placed, 0, state.contrib_max),
        contrib_denom=jnp.where(placed, 0, state.contrib_denom),
    )

    # Split originals are removed (VanillaTS_model.py:299) — but ONLY when
    # both replacement halves were actually placed; on capacity overflow the
    # dropped tail must not delete geometry (the host grows capacity and the
    # next round re-splits).
    placed_cand = (inv < n_place) & new_valid          # (2C,)
    both_placed = placed_cand.reshape(C, 2).all(axis=1)
    params, opt, state = prune(params, opt, state, split_mask & both_placed)
    return params, opt, state, grow.sum(), overflow


def contribution_pruning(params, opt, state, *, min_view_count,
                         target_point_num, prune_ratio, max_prune_ratio,
                         contrib_max_ratio, scene_bbox=None,
                         ste_threshold=None, inter_point_dist=None,
                         sparsity_retain_ratio=0.0):
    """Prune lowest-contribution triangles toward a target count
    (VanillaTS_model.py:467-532). Fixed-shape ranking via argsort.
    ``inter_point_dist`` (C,), if given, retains the sparsest pruned rows.
    """
    from .adc_common import contribution_prune_mask, reset_contribution_stats
    alive = state.alive
    inside = get_inside_mask(get_xyz(params), scene_bbox) & alive
    if ste_threshold is not None:
        inside = inside & (get_opacity(params)[:, 0] > ste_threshold)
    prune_mask, select = contribution_prune_mask(
        state, inside, min_view_count=min_view_count,
        target_point_num=target_point_num, prune_ratio=prune_ratio,
        max_prune_ratio=max_prune_ratio, contrib_max_ratio=contrib_max_ratio,
        inter_point_dist=inter_point_dist,
        sparsity_retain_ratio=sparsity_retain_ratio)
    state = reset_contribution_stats(state, select)
    return prune(params, opt, state, prune_mask) + (prune_mask.sum(),)
