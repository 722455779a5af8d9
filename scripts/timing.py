"""Trustworthy TPU wall-clock timing.

On the axon TPU platform `jax.block_until_ready` returns before execution
completes (dispatch is fully async); only a host fetch synchronizes. All
timing here dispatches N iterations then fetches one element of the LAST
iteration's first output — on a single device programs execute in order, so
this forces every queued program.
"""

import time

import jax
import numpy as np


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1] if leaf.ndim else leaf))


def timeit(fn, *args, iters=8, warmup=2):
    """Mean wall-clock seconds per call of fn(*args), execution-forced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters
