"""ADC cadence helpers shared by the TS and GS trainers."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resolve_contribution_pruning(cp, iteration: int):
    """Apply the downsample schedule to the contribution-pruning knobs
    (reference VanillaTS_model.py:474-489 / VanillaGS_model.py:419-426:
    each crossed downsample_iteration halves contrib_max_ratio, moves the
    sparsity retain ratio halfway to 0.8, and rebalances prune_ratio so the
    EFFECTIVE prune rate is unchanged by the larger retention).

    Returns ``(target_point_num, contrib_max_ratio, prune_ratio, retain)``.
    """
    target = cp.target_point_num
    ratio = cp.contrib_max_ratio if cp.contrib_max_ratio is not None else 0.1
    prune_ratio = cp.prune_ratio if cp.prune_ratio is not None else 0.15
    retain = cp.sparsity_retain_ratio or 0.0
    if cp.downsample_iteration:
        for it, pnum in zip(cp.downsample_iteration, cp.downsample_point_num):
            if iteration > it:
                target = pnum
                ratio *= 0.5
                new_retain = retain + (0.8 - retain) * 0.5
                prune_ratio *= (1 - retain) / (1 - new_retain)
                retain = new_retain
    return target, ratio, prune_ratio, retain


def adapt_pair_budget(ppt: float, used: int | None, count: int,
                      overflow: bool, *, max_ppt: float = 32.0,
                      margin: float = 1.3,
                      shrink_if_below: float = 0.5) -> float:
    """Need-based pair-budget adaptation shared by the trainers and bench.

    The reference reallocates its binning buffers to the EXACT pair count
    every frame (diff-triangle-rasterization-2D rasterizer_impl resize-on-
    demand); a static XLA budget must instead quantize with hysteresis:
    grow 2x on overflow, and shrink directly to ``margin`` x the measured
    per-primitive need when that frees at least ``1 - shrink_if_below`` of
    the buffer. Both moves JUMP rather than step — every budget change
    costs one recompile. Pass ``used=None`` when the measured pair count is
    not plumbed (DP aux paths): adaptation is then grow-only.

    ``shrink_if_below`` is deliberately conservative (0.5): during
    densification the pair count climbs, and an eager shrink is often
    followed within a few hundred iters by an overflow DOUBLING — two
    recompiles to land near the starting budget (observed in the 800²
    ADC rehearsal at 0.75: 9.0 -> 6.375 -> overflow -> 12.75). Halving
    the threshold bounds wasted buffer at 2x measured need.

    Returns the new pairs-per-primitive budget (may equal ``ppt``).
    """
    if overflow:
        return min(ppt * 2.0, max_ppt)
    if used is None:
        return ppt
    need = margin * float(used) / max(count, 1)
    new = max(2.0, round(need * 8.0) / 8.0)   # eighth-steps: stable jit key
    if new < ppt * shrink_if_below:
        return new
    return ppt


# Leaf field names that are NOT capacity-indexed even when their leading
# dim coincidentally equals the capacity (e.g. affine_weight is
# (num_cameras, 3, 3) — a scene with num_cameras == capacity must not get
# zero rows appended). Keyed by name because the same fields appear nested
# inside AdamState.m / AdamState.v.
NON_CAPACITY_FIELDS = frozenset({"affine_weight", "affine_bias"})


def grow_capacity(params, opt, state, logger=None, factor: float = 1.5,
                  round_to: int = 256):
    """Host-side capacity reallocation shared by the trainers: zero-pad
    every capacity-sized leaf of params/opt/state by ``factor`` (one
    recompile follows). Capacity-sized means leading dim == capacity AND
    the field name is not in ``NON_CAPACITY_FIELDS`` (per-camera tables
    etc. must never be padded by coincidence of size). Callers restore any
    non-zero dead-slot invariants (e.g. identity quaternions) afterwards."""
    import jax
    old = params.capacity
    new = int(old * factor + round_to - 1) // round_to * round_to

    def pad(path, leaf):
        if leaf is None or leaf.ndim == 0 or leaf.shape[0] != old:
            return leaf
        names = {getattr(k, "name", None) for k in path}
        if names & NON_CAPACITY_FIELDS:
            return leaf
        pad_shape = (new - old,) + leaf.shape[1:]
        return jnp.concatenate([leaf, jnp.zeros(pad_shape, leaf.dtype)], 0)

    tmap = jax.tree_util.tree_map_with_path
    params = tmap(pad, params)
    opt = tmap(pad, opt)
    state = tmap(pad, state)
    if logger is not None:
        logger.warning(f"Capacity grown {old} -> {new} "
                       "(recompilation follows)")
    return params, opt, state


def alive_inter_point_dist(xyz: np.ndarray, alive: np.ndarray):
    """(C,) sparsity distances among ALIVE rows only — dead capacity slots
    hold stale/zero positions that would corrupt the kNN ranking."""
    from ..models.model_utils import inter_point_distance_np
    xyz = np.asarray(xyz)
    alive = np.asarray(alive)
    full = np.zeros(len(xyz), np.float32)
    if alive.any():
        full[alive] = inter_point_distance_np(xyz[alive])
    return jnp.asarray(full)
