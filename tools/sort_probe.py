"""Settle the multi-payload sort cost question (r1 said ~free, r2 profile
said 2.88 ms for 17 operands @480k) + price the building blocks of a
rank-space pair pipeline: compaction gather, P-row scatter, boundary gather.

Method per CLAUDE.md: repeat the op inside one jit via lax.fori_loop with a
data dependence, read back a scalar. Run on the real chip.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from triangle_splatting_tpu.utils.jax_setup import setup

setup()

MA = 480_000
P = 100_000
REPS = 50


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))                       # compile
    t0 = time.time()
    s = float(f(*args))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:44s}: {dt:7.3f} ms/op   (chk={s:.3e})")


def sort_k_payloads(k):
    def body(keys, cols):
        def it(i, carry):
            keys, cols = carry
            ops = jax.lax.sort((keys,) + cols, num_keys=1, is_stable=False)
            keys = ops[0] + i                 # data dependence
            return keys, ops[1:]
        keys, cols = jax.lax.fori_loop(0, REPS, it, (keys, cols))
        return jnp.sum(keys[:8].astype(jnp.float32)) + jnp.sum(cols[0][:8])
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 24, MA, dtype=np.int32))
    cols = tuple(jnp.asarray(rng.random(MA, dtype=np.float32))
                 for _ in range(k))
    timed(f"sort {MA // 1000}k int32 + {k} f32 payloads", body, keys, cols)


def sort_one_wide_payload(w):
    """ONE (MA, w) f32 payload operand instead of w 1-D operands."""
    def body(keys, mat):
        def it(i, carry):
            keys, mat = carry
            keys, mat = jax.lax.sort((keys, mat), num_keys=1, is_stable=False,
                                     dimension=0)
            return keys + i, mat
        keys, mat = jax.lax.fori_loop(0, REPS, it, (keys, mat))
        return jnp.sum(keys[:8].astype(jnp.float32)) + jnp.sum(mat[:2])
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 24, MA, dtype=np.int32))
    mat = jnp.asarray(rng.random((MA, w), dtype=np.float32))
    timed(f"sort {MA // 1000}k int32 + one ({w},) row payload", body, keys, mat)


def gather_rows(n_rows, n_src, w, name):
    def body(src, idx):
        def it(i, carry):
            src, acc = carry
            rows = src[idx]                              # (n_rows, w)
            return src + 1e-12, acc + rows[0, 0]
        _, acc = jax.lax.fori_loop(0, REPS, it, (src, jnp.float32(0)))
        return acc
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((n_src, w), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_src, n_rows, dtype=np.int32))
    timed(name, body, src, idx)


def scatter_add_rows(n_upd, n_dst, w, name):
    def body(upd, idx):
        def it(i, carry):
            upd, acc = carry
            out = jnp.zeros((n_dst, w), jnp.float32).at[idx].add(upd)
            return upd + 1e-12, acc + out[0, 0]
        _, acc = jax.lax.fori_loop(0, REPS, it, (upd, jnp.float32(0)))
        return acc
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.random((n_upd, w), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_dst, n_upd, dtype=np.int32))
    timed(name, body, upd, idx)


if __name__ == "__main__":
    for k in (1, 2, 4, 8, 16):
        sort_k_payloads(k)
    for w in (8, 16):
        sort_one_wide_payload(w)
    gather_rows(P, P, 16, "compaction gather 100k rows (P,16)")
    gather_rows(MA, P, 16, "pack gather 480k rows from (100k,16)")
    scatter_add_rows(P, P, 16, "scatter-add 100k rows -> (100k,16)")
    scatter_add_rows(MA, P, 16, "scatter-add 480k rows -> (100k,16)")
