"""Pallas streaming data-movement kernels vs their XLA scatter references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triangle_splatting_tpu.ops.pallas.streams import relayout_pairs


def xla_reference(sorted_tri, raw_starts, astarts, tile_counts, ma):
    out = np.full((ma,), -1, np.int32)
    T = tile_counts.shape[0]
    for t in range(T):
        c = int(tile_counts[t])
        out[int(astarts[t]):int(astarts[t]) + c] = \
            sorted_tri[int(raw_starts[t]):int(raw_starts[t]) + c]
    return out


def make_case(rng, T, max_pairs, empty_frac=0.3):
    counts = rng.integers(0, 400, T).astype(np.int32)
    counts[rng.random(T) < empty_frac] = 0
    total = counts.sum()
    while total > max_pairs:          # keep the prefix-valid invariant
        counts = counts // 2
        total = counts.sum()
    raw = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    padded = ((counts + 127) // 128) * 128
    ast = np.concatenate([[0], np.cumsum(padded)]).astype(np.int32)
    sorted_tri = np.full((max_pairs,), -7, np.int32)
    sorted_tri[:total] = rng.integers(0, 1 << 20, total)
    return sorted_tri, raw, ast, counts


class TestRelayoutPairs:
    @pytest.mark.parametrize("seed,T,mp", [(0, 25, 128 * 90),
                                           (1, 625, 128 * 400),
                                           (2, 4, 128 * 8),
                                           (3, 1, 128)])
    def test_matches_reference(self, seed, T, mp):
        rng = np.random.default_rng(seed)
        sorted_tri, raw, ast, counts = make_case(rng, T, mp)
        ma = ((int(ast[-1]) + 127) // 128) * 128 + 256    # tail slack
        got = relayout_pairs(jnp.asarray(sorted_tri), jnp.asarray(raw),
                             jnp.asarray(ast), jnp.asarray(counts), ma,
                             interpret=True)
        want = xla_reference(sorted_tri, raw, ast, counts, ma)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_all_empty(self):
        T, mp = 16, 128 * 4
        sorted_tri = np.full((mp,), -7, np.int32)
        raw = np.zeros((T + 1,), np.int32)
        ast = np.zeros((T + 1,), np.int32)
        counts = np.zeros((T,), np.int32)
        got = relayout_pairs(jnp.asarray(sorted_tri), jnp.asarray(raw),
                             jnp.asarray(ast), jnp.asarray(counts), 512,
                             interpret=True)
        assert (np.asarray(got) == -1).all()

    def test_dense_single_tile(self):
        """One tile owning every pair (the giant-splat worst case)."""
        mp = 128 * 40
        rng = np.random.default_rng(5)
        sorted_tri = rng.integers(0, 1 << 20, mp).astype(np.int32)
        raw = np.array([0, mp], np.int32)
        ast = np.array([0, mp], np.int32)
        counts = np.array([mp], np.int32)
        got = relayout_pairs(jnp.asarray(sorted_tri), jnp.asarray(raw),
                             jnp.asarray(ast), jnp.asarray(counts), mp,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got), sorted_tri)

    def test_jit_and_grad_safety(self):
        """Compiles under jit; int outputs are non-differentiable pass-through."""
        rng = np.random.default_rng(9)
        sorted_tri, raw, ast, counts = make_case(rng, 25, 128 * 90)
        ma = ((int(ast[-1]) + 127) // 128) * 128 + 128
        f = jax.jit(lambda s: relayout_pairs(
            s, jnp.asarray(raw), jnp.asarray(ast), jnp.asarray(counts), ma,
            interpret=True), static_argnums=())
        got = f(jnp.asarray(sorted_tri))
        want = xla_reference(sorted_tri, raw, ast, counts, ma)
        np.testing.assert_array_equal(np.asarray(got), want)
