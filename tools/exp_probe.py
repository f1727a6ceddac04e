"""Probe v5e VPU cost of Mosaic's exp vs polynomial fast-exp variants.

Same in-jit dependent-chain methodology as vpu_probe.py (the only timing
that works through the axon tunnel). Candidates:

  exp       jnp.exp (Mosaic's libdevice-style lowering)
  fastexp   2^k * poly4(f) with the exponent spliced via int bitcast
  rangeexp  clamped degree-7 poly for exp(-t) on t in [0, 8] (alpha-kill
            range only; exact 0 beyond)

Run on the real chip: python tools/exp_probe.py
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

R, C = 512, 1024
K = 16384


def fast_exp(x):
    """exp(x) for x <= 0 via 2^(x*log2e), poly4 mantissa, bitcast exponent."""
    y = x * 1.4426950408889634
    k = jnp.floor(y + 0.5)
    f = y - k
    p = 9.5541051638e-03
    p = p * f + 5.5870408514e-02
    p = p * f + 2.4024696602e-01
    p = p * f + 6.9312802817e-01
    p = p * f + 9.9999943979e-01
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    return p * scale


def _kernel(x_ref, o_ref, *, op):
    x = x_ref[:]

    def body(i, v):
        t = jnp.abs(v) * 1e-6
        if op == "exp":
            return jnp.exp(-t)
        if op == "fastexp":
            return fast_exp(-t)
        if op == "mul8":
            c = jnp.float32(1.0000001)
            for _ in range(8):
                v = v * c
            return v
        raise ValueError(op)

    o_ref[:] = jax.lax.fori_loop(0, K, body, x)


def run(op):
    x = jnp.ones((R, C), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_kernel, op=op),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    g = jax.jit(lambda x: jnp.sum(f(x)))
    float(g(x))
    t0 = time.time()
    n = 3
    for _ in range(n):
        s = float(g(x))
    dt = (time.time() - t0) / n
    per = dt / (R * C * K) * 1e12
    print(f"{op:8s}: {dt * 1e3:7.2f} ms  {per:6.2f} ps/elem  (sum={s:.6e})")


if __name__ == "__main__":
    # numerical check first (CPU-ish tiny shapes still go through the chip;
    # compare against jnp.exp on representative range)
    t = jnp.linspace(0.0, 44.0, 8192)
    ref = jnp.exp(-t)
    fe = fast_exp(-t)
    err = jnp.max(jnp.abs(fe - ref) / jnp.maximum(ref, 1e-30))
    print("fast_exp max rel err on [-44,0]:", float(err))
    for op in ("mul8", "exp", "fastexp"):
        run(op)
