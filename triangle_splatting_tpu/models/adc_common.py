"""Adaptive-density-control logic shared by the triangle and gaussian
models (the reference duplicates it per model: VanillaTS_model.py:467-532,
VanillaGS_model.py:404-464 — here the fixed-shape ranking lives once)."""

from __future__ import annotations

import jax.numpy as jnp


def contribution_prune_mask(state, inside, *, min_view_count,
                            target_point_num, prune_ratio, max_prune_ratio,
                            contrib_max_ratio, inter_point_dist=None,
                            sparsity_retain_ratio=0.0):
    """Fixed-shape argsort ranking of lowest-contribution rows toward a
    target count. ``state`` needs alive/contrib_{sum,max,denom}; ``inside``
    is the (C,) bbox(-and-STE) filtered alive mask. Returns
    ``(prune_mask, select)``: rows to prune, and the rows whose
    contribution statistics the caller must reset (the reference zeroes
    every selected row's stats, pruned or not).
    """
    C = state.alive.shape[0]
    alive = state.alive
    valid_count = inside.sum()
    total = alive.sum()
    select = (state.contrib_denom >= min_view_count) & alive
    select_count = select.sum()

    diff = jnp.maximum(0.0, valid_count - target_point_num * 0.99) \
        * total / jnp.maximum(valid_count, 1)
    prune_count = jnp.minimum(diff * prune_ratio,
                              select_count * max_prune_ratio)
    n_by_max = (prune_count * contrib_max_ratio).astype(jnp.int32)
    n_by_sum = (prune_count * (1 - contrib_max_ratio)).astype(jnp.int32)

    def rank_mask(values, n_prune):
        score = jnp.where(select, values, jnp.inf)
        order = jnp.argsort(score, stable=True)
        rank = jnp.zeros(C, jnp.int32).at[order].set(
            jnp.arange(C, dtype=jnp.int32))
        return (rank < n_prune) & select

    prune_mask = rank_mask(state.contrib_max, n_by_max) | \
        rank_mask(state.contrib_sum, n_by_sum)

    if sparsity_retain_ratio > 0 and inter_point_dist is not None:
        n_pruned = prune_mask.sum()
        retain = (sparsity_retain_ratio * n_pruned).astype(jnp.int32)
        score = jnp.where(prune_mask, -inter_point_dist, jnp.inf)
        order = jnp.argsort(score, stable=True)
        rank = jnp.zeros(C, jnp.int32).at[order].set(
            jnp.arange(C, dtype=jnp.int32))
        prune_mask = prune_mask & ~(rank < retain)

    return prune_mask, select


def reset_contribution_stats(state, select):
    """Zero the selected rows' contribution statistics (shared field names
    across TriangleState/GaussianState)."""
    from dataclasses import replace
    return replace(
        state,
        contrib_sum=jnp.where(select, 0, state.contrib_sum),
        contrib_max=jnp.where(select, 0, state.contrib_max),
        contrib_denom=jnp.where(select, 0, state.contrib_denom),
    )
