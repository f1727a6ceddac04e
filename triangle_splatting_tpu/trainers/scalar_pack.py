"""Batch per-iteration host<->device scalar traffic into single buffers.

Through a remote-dispatch PJRT backend (the axon tunnel here) every argument
buffer and every readback is its own RPC roundtrip. The reference trainer
loop (VanillaTS_trainer.py:192-282) freely passes ~20 python scalars into
each CUDA step and reads several back per log line — free on a local PCIe
GPU, ~5 ms EACH through a tunnel, which multiplied into >100 ms/iter of
host overhead on a 44 ms train step (PERF.md "full-length run").

Two primitives:

- ``HostScalarPack``: pack loss weights + learning rates + background color
  + iteration into ONE f32 vector on the host; unpack to the original dicts
  INSIDE jit (slicing a traced vector is free after fusion). One h2d RPC
  per step instead of ~20.
- a ``log_vec`` convention: the jitted step stacks every scalar the logging
  branch will want into one f32 vector in its aux dict, so a log step costs
  ONE d2h fetch. f32 round-trips ints exactly below 2^24 (true for
  iteration numbers and counts at NeRF-Synthetic scale); pair counts past
  ~16.7M (MatrixCity capacities) round to even — fine for their only
  consumer, the 1.3x-margin pair-budget quantizer, but don't route exact
  invariants through log_vec.
"""

from __future__ import annotations

import numpy as np


class HostScalarPack:
    """Fixed-layout f32 vector: [weights..., lrs..., background(3), iter]."""

    def __init__(self, weight_keys, lr_keys):
        self.weight_keys = tuple(weight_keys)
        self.lr_keys = tuple(lr_keys)
        self.size = len(self.weight_keys) + len(self.lr_keys) + 4

    def pack(self, weights: dict, lrs: dict, background,
             iteration: int) -> np.ndarray:
        vec = np.empty(self.size, np.float32)
        i = 0
        for k in self.weight_keys:
            vec[i] = weights[k]
            i += 1
        for k in self.lr_keys:
            vec[i] = lrs[k]
            i += 1
        vec[i:i + 3] = np.asarray(background, np.float32)
        vec[i + 3] = np.float32(iteration)   # exact below 2^24
        return vec

    def unpack(self, vec):
        """vec -> (weights dict, lrs dict, background(3,), iteration i32).

        Runs under jit on the traced vector; also works on a numpy vector
        (returns numpy scalars) for tests.
        """
        import jax.numpy as jnp
        nw, nl = len(self.weight_keys), len(self.lr_keys)
        weights = {k: vec[i] for i, k in enumerate(self.weight_keys)}
        lrs = {k: vec[nw + i] for i, k in enumerate(self.lr_keys)}
        background = vec[nw + nl:nw + nl + 3]
        iteration = jnp.asarray(vec[nw + nl + 3], jnp.int32)
        return weights, lrs, background, iteration
