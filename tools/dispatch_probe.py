"""Probe per-dispatch host overhead through the axon tunnel.

Hypothesis (full_run @800^2: ~170 ms/iter wall vs ~44 ms jitted step): each
np-scalar argument to a jit call pays a separate h2d transfer RPC, and the
train step passes ~18 of them (10 loss weights + 7 lrs + iteration).

Measures, for a trivial jitted fn:
  a) dispatch with 18 separate np.float32 scalar args
  b) dispatch with ONE packed np.float32[18] arg
  c) dispatch with 18 pre-device-put scalars (no transfer at call time)
  d) a bare device_put of a tiny array (RPC floor)
All timed as dispatch-only (no block) and as round-trip (block each call).
"""
import time

import numpy as np


def main():
    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp

    n = 18

    @jax.jit
    def many(*xs):
        s = xs[0]
        for x in xs[1:]:
            s = s + x
        return s

    @jax.jit
    def packed(v):
        return v.sum()

    scalars = [np.float32(i) for i in range(n)]
    vec = np.arange(n, dtype=np.float32)
    dev_scalars = [jax.device_put(s) for s in scalars]
    jax.block_until_ready(dev_scalars)

    # warm up compiles
    many(*scalars).block_until_ready()
    packed(vec).block_until_ready()

    def bench(label, fn, iters=30):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        dispatch_ms = (time.perf_counter() - t0) / iters * 1e3
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            fn().block_until_ready()
        rt_ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:34s} dispatch {dispatch_ms:7.2f} ms   "
              f"roundtrip {rt_ms:7.2f} ms", flush=True)

    bench("18 np scalars", lambda: many(*scalars))
    bench("1 packed np[18]", lambda: packed(vec))
    bench("18 device scalars", lambda: many(*dev_scalars))
    bench("device_put tiny", lambda: jax.device_put(vec))
    big = np.random.rand(800, 800, 3).astype(np.float32)
    bench("device_put 7.7MB", lambda: jax.device_put(big), iters=10)

    # (e) train-step-shaped arity: ~40 device-resident buffers in, ~30 out
    # (params/opt/state pytrees). Measures the per-execute floor that the
    # full_run phase timer bills as "train step" (~11 ms/iter @20k iters).
    k_in = 40
    bufs = [jax.device_put(np.random.rand(256, 16).astype(np.float32))
            for _ in range(k_in)]
    jax.block_until_ready(bufs)

    @jax.jit
    def wide(*xs):
        return tuple(x + 1.0 for x in xs[:30])

    wide(*bufs)[0].block_until_ready()
    bench("40 dev arrays -> 30 outs", lambda: wide(*bufs)[0])

    @jax.jit
    def narrow(x):
        return x + 1.0

    narrow(bufs[0]).block_until_ready()
    bench("1 dev array -> 1 out", lambda: narrow(bufs[0]))

    # (g) the train-loop pattern: outputs of call i ARE the inputs of call
    # i+1 (params/opt/state carry), with donation. If output handles only
    # materialize on the remote enqueue-ack, every dispatch eats one RPC
    # round trip — the case K-steps-per-dispatch chaining would amortize.
    def chain(donate, label, iters=30):
        f = jax.jit(lambda *xs: tuple(x + 1.0 for x in xs),
                    donate_argnums=tuple(range(k_in)) if donate else ())
        state = tuple(jax.device_put(np.random.rand(256, 16).astype(np.float32))
                      for _ in range(k_in))
        state = f(*state)          # warm compile
        jax.block_until_ready(state)
        state = tuple(jnp.asarray(np.asarray(s)) for s in state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = f(*state)
        dispatch_ms = (time.perf_counter() - t0) / iters * 1e3
        jax.block_until_ready(state)
        total_ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:34s} dispatch {dispatch_ms:7.2f} ms   "
              f"incl-drain {total_ms:7.2f} ms", flush=True)

    import jax.numpy as jnp
    chain(False, "40-buf dependent chain")
    chain(True, "40-buf dependent chain, donated")


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
