"""Multi-process experiment fan-out (reference utils/pipeline_utils.py:6-64).

The reference runs one training process per scene, round-robined over
``torch.cuda.device_count()`` GPUs. On TPU a host typically owns its chips as
one jax client, so scene-level parallelism maps to either sequential runs
(single chip) or one process per host in a multi-host job. ``run_exp_with_args``
keeps the reference's batching semantics: launch ``num_workers`` concurrent
processes, wait for a batch to finish before starting the next.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable, Sequence


def run_exp(fn: Callable, args_list: Sequence[tuple], num_workers: int = 1):
    if num_workers > 1:
        # A TPU chip is claimed exclusively by ONE process; concurrent
        # workers sharing a chip deadlock on the claim. Only probe device
        # count if jax is already initialized in this process (probing
        # would itself claim the chip and starve the workers).
        import sys
        jax = sys.modules.get("jax")
        if jax is not None:
            try:
                n_dev = len(jax.devices())
                if jax.default_backend() != "cpu" and n_dev < num_workers:
                    print(f"pipeline: {n_dev} device(s) < {num_workers} "
                          f"workers — running scenes sequentially")
                    num_workers = 1
            except Exception:
                pass
    if num_workers <= 1:
        for args in args_list:
            fn(*args)
        return
    ctx = mp.get_context("spawn")
    for i in range(0, len(args_list), num_workers):
        batch = args_list[i:i + num_workers]
        procs = [ctx.Process(target=fn, args=args) for args in batch]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
            if p.exitcode != 0:
                raise RuntimeError(f"experiment process failed (exit {p.exitcode})")


run_exp_with_args = run_exp
