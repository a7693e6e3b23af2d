"""Shared measurement-integrity helpers for the benchmarks.

One canonical implementation of the RTT-corrected synchronous timing
protocol (see bench.py docstring): force one result read (flips the process
into synchronous dispatch), measure the tunnel round-trip with a trivial
kernel, and subtract its median from the measured median."""

from __future__ import annotations

import time

import numpy as np


def measure_rtt(rtt_reps: int = 10) -> float:
    """Median wall time of a trivial kernel — the tunnel RTT floor."""
    import jax
    import jax.numpy as jnp

    triv = jax.jit(lambda z: z + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(triv(z))
    ts = []
    for _ in range(rtt_reps):
        t0 = time.perf_counter()
        jax.block_until_ready(triv(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def rtt_corrected_median_s(fn, args, reps: int = 10, warmup: int = 1,
                           rtt_reps: int = 10) -> float:
    """Median wall time of fn(*args) minus the tunnel RTT, floored at 1 us."""
    import jax

    for _ in range(max(warmup, 1)):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    rtt = measure_rtt(rtt_reps)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - rtt, 1e-6)
