"""Canonical bench-stage registry — ONE definition of each driver-bench
stage's exact configuration, shared by bench.py's device worker
(benchmarks/device_worker.py) and scripts/warm_compile_cache.py, so the
programs the warm tool pre-traces/pre-compiles are byte-identical to the
programs the bench measures (ADVICE r3 #4 was exactly such a drift)."""

from __future__ import annotations


def _latency(core: str, priccati: bool):
    from benchmarks.latency import latency_result

    return latency_result(core=core, pallas_riccati=priccati)


def _batched(core: str, bf16: bool, priccati: bool, batches=(256,)):
    from benchmarks.scaling import batched_result

    return batched_result(batches=batches, iters=6, reps=3, core=core,
                          bf16=bf16, pallas_riccati=priccati)


def _rbd():
    from benchmarks.timedyn import microbench_result

    # scan=256: the Pallas kernels are ~3-12 ns/eval, so a 32-chain's device
    # time (~0.4 ms) drowns in tunnel-RTT jitter; 256 chained evals x 4096
    # batch puts every path's device time well above the jitter floor.
    return microbench_result(batch=4096, reps=8, scan=256)


def _fig8(core: str, priccati: bool):
    from benchmarks.fig8 import device_loop_result

    return device_loop_result(duration=10.0, reps=1, iters=6, core=core,
                              pallas_riccati=priccati)


CANONICAL = {
    "latency": lambda: _latency("auto", False),
    "latency_pallas": lambda: _latency("pallas", False),
    "latency_priccati": lambda: _latency("pallas", True),
    # B-sweep (VERDICT r4 next #3): occupancy is the scale-out knob — the
    # artifact answers where each kernel path's throughput saturates.
    # Sweep sizes are compile-budgeted: a NEW batch size of the unrolled
    # XLA-core program is a multi-hour build through the remote compile
    # helper (B=1024 sat >2 h this round without completing — killed), so
    # the XLA core and its bf16 variant keep the cached B=256 shape and the
    # occupancy sweep rides the Pallas kernel path, whose lane-packed
    # programs compile in minutes.
    "batched": lambda: _batched("auto", False, False,
                                batches=(256,)),
    "batched_pallas": lambda: _batched("pallas", False, False,
                                       batches=(256, 1024)),
    "batched_priccati": lambda: _batched("pallas", False, True,
                                         batches=(256,)),
    "batched_bf16": lambda: _batched("auto", True, False,
                                     batches=(256,)),
    "rbd": _rbd,
    "fig8": lambda: _fig8("auto", False),
    "fig8_priccati": lambda: _fig8("pallas", True),
}

# breadth first: one number per metric family before any family's variants,
# so a squeezed budget still produces a complete artifact
ORDER = [
    "latency", "latency_pallas", "latency_priccati",
    "batched", "rbd", "fig8",
    "batched_pallas", "batched_priccati", "batched_bf16",
    "fig8_priccati",
]

# nominal per-stage caps (s).  With warm AOT + executable caches a stage is
# O(30 s); the caps only matter when a cache is cold (fresh trace + compile).
NOMINAL_S = {
    "latency": 600.0,
    "latency_pallas": 420.0,
    "latency_priccati": 420.0,
    "batched": 600.0,
    "rbd": 420.0,
    "fig8": 600.0,
    "batched_pallas": 420.0,
    "batched_priccati": 420.0,
    "batched_bf16": 420.0,
    "fig8_priccati": 420.0,
}
