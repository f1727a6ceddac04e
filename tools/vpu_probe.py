"""Probe v5e VPU elementwise throughput: f32 vs bf16, mul chains vs exp.

Times a Pallas kernel that runs K dependent elementwise passes over a
(512, 1024) block resident in VMEM (no HBM traffic inside the loop), so
the measurement is pure VPU issue rate. Used to decide whether bf16
doubles VPU throughput on v5e (it doubles MXU, but the VPU may upconvert).

Run on the real chip: python tools/vpu_probe.py
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
K = 65536         # dependent passes (big enough to dwarf tunnel dispatch)


def _kernel(x_ref, o_ref, *, op, dtype):
    x = x_ref[:].astype(dtype)
    c = jnp.asarray(1.0000001, dtype)

    def body(i, v):
        if op == "mul":
            return v * c
        if op == "fma":
            return v * c + c
        if op == "exp":
            return jnp.exp(-jnp.abs(v) * 1e-6)
        if op == "min3":
            return jnp.minimum(jnp.minimum(v, v * c), v + c)
        raise ValueError(op)

    y = jax.lax.fori_loop(0, K, body, x)
    o_ref[:] = y.astype(jnp.float32)


def run(op, dtype):
    x = jnp.ones((R, C), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_kernel, op=op, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    g = jax.jit(lambda x: jnp.sum(f(x)))
    float(g(x))                            # compile
    # Scalar readback per rep: block_until_ready is a near-no-op through
    # the axon tunnel (CLAUDE.md) — only a host fetch proves completion.
    t_rt = time.time()
    float(g(x))
    t_rt = time.time() - t_rt              # steady-state roundtrip incl. op
    t0 = time.time()
    n = 3
    for _ in range(n):
        s = float(g(x))
    dt = (time.time() - t0) / n
    ops = R * C * K
    print(f"{op:5s} {dtype.__name__:9s}: {dt * 1e3:7.2f} ms  "
          f"{ops / dt / 1e12:6.2f} T elem-ops/s   (sum={s:.3e})")


if __name__ == "__main__":
    for op in ("mul", "fma", "min3", "exp"):
        for dtype in (jnp.float32, jnp.bfloat16):
            run(op, dtype)
