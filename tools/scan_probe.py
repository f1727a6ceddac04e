"""Probe prefix-product scan variants for the blend kernels' transmittance.

The fwd/bwd blend kernels spend log2(SLAB)=8 shifted-multiply passes per
slab on the Hillis-Steele prefix/suffix product of (1 - alpha) over the
pair axis ((SLAB, NPIX) = (256, 1024) f32). Each step materializes a
concatenate (pad + slice) before the multiply, so the real cost may be
~16 passes. Variants probed, all VMEM-resident with K dependent reps:

  hs         current: concatenate([ones, x[:-k]]) * x
  hs_roll    pltpu.roll + iota-mask select (shift as lane/sublane rotate)
  two_level  chunk-8 HS within sublane rows (3 passes) + carry scan over
             the 32 chunk totals (5 small passes) + one broadcast multiply
  mxu_log    exp(tril @ log(x)) — rejected in r1, re-measured for context

Run on the real chip: python tools/scan_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triangle_splatting_tpu.utils.jax_setup import setup

setup()

S, C = 256, 1024
K = 2048          # dependent reps


def _prefix_hs(x):
    s = x.shape[0]
    k = 1
    while k < s:
        pad = jnp.ones((k,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([pad, x[:-k]], axis=0)
        k *= 2
    return x


def _prefix_roll(x):
    s = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < s:
        shifted = pltpu.roll(x, shift=k, axis=0)
        x = x * jnp.where(row < k, 1.0, shifted)
        k *= 2
    return x


def _prefix_two_level(x, chunk=8):
    s = x.shape[0]
    n = s // chunk
    # within-chunk inclusive prefix products (HS over the chunk axis only)
    y = x.reshape(n, chunk, -1)
    k = 1
    while k < chunk:
        pad = jnp.ones((n, k, y.shape[2]), y.dtype)
        y = y * jnp.concatenate([pad, y[:, :-k, :]], axis=1)
        k *= 2
    # exclusive scan of chunk totals (small: (n, C))
    tot = y[:, chunk - 1, :]                       # (n, C)
    k = 1
    t = tot
    while k < n:
        pad = jnp.ones((k, t.shape[1]), t.dtype)
        t = t * jnp.concatenate([pad, t[:-k]], axis=0)
        k *= 2
    excl = jnp.concatenate([jnp.ones((1, t.shape[1]), t.dtype), t[:-1]], axis=0)
    return (y * excl[:, None, :]).reshape(s, -1)


def _prefix_mxu_log(x):
    l = jnp.log(jnp.maximum(x, 1e-30))
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    L = (c <= r).astype(jnp.float32)
    return jnp.exp(jnp.dot(L, l, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST))


VARIANTS = {
    "hs": _prefix_hs,
    "hs_roll": _prefix_roll,
    "two_level4": functools.partial(_prefix_two_level, chunk=4),
    "two_level8": functools.partial(_prefix_two_level, chunk=8),
    "two_level16": functools.partial(_prefix_two_level, chunk=16),
    "two_level32": functools.partial(_prefix_two_level, chunk=32),
    "mxu_log": _prefix_mxu_log,
}


def _kernel(x_ref, o_ref, *, fn):
    x = x_ref[:]

    def body(i, v):
        # clip keeps values in [0.9, 1] so K dependent reps don't underflow
        return jnp.clip(fn(v), 0.9, 1.0)

    y = jax.lax.fori_loop(0, K, body, x)
    o_ref[:] = y


def run(name, fn):
    x = jnp.full((S, C), 0.9999, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_kernel, fn=fn),
        out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    g = jax.jit(lambda x: jnp.sum(f(x)))
    float(g(x))                            # compile
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(g(x))
        best = min(best, time.time() - t0)
    per = best / K * 1e9
    print(f"{name:12s} {per:8.1f} ns/scan  "
          f"({per / (S * C) * 1000:6.2f} ps/elem)")


def check():
    x = jnp.linspace(0.9, 1.0, S * C).reshape(S, C).astype(jnp.float32)
    ref = jnp.cumprod(x, axis=0)
    for name, fn in VARIANTS.items():
        # pltpu.roll has no eager eval rule — run every variant through a
        # one-shot pallas_call (compiled, same as the timing path).
        def k(x_ref, o_ref, fn=fn):
            o_ref[:] = fn(x_ref[:])
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
        err = float(jnp.max(jnp.abs(out - ref) / ref))
        print(f"{name:12s} max rel err {err:.2e}")


if __name__ == "__main__":
    check()
    for name, fn in VARIANTS.items():
        run(name, fn)
