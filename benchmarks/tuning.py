"""One-shot latency tuning sweep for the flagship solve (run on TPU).

Sweeps the dispatch-count levers — dynamics core (XLA scalar-channel vs the
fused Pallas forward-sim + derivative kernels) x serial-scan unroll factor —
over the warm Kuka N=64 EE solve and prints an RTT-corrected ms table, so
re-tuning after a shape or compiler change is one command:

    python benchmarks/tuning.py [reps]
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")

CORES = ("auto", "pallas")
UNROLLS = (1, 4, 8, 16)
N_ITERS = 6


def main(reps: int = 10):
    import jax
    import jax.numpy as jnp

    from benchmarks.measure import rtt_corrected_median_s
    from parallel_ddp_tpu.presets import ee_goal, kuka_ee
    from parallel_ddp_tpu.solver import make_ilqr_solver

    goal = ee_goal([0.0, -0.55, 0.35])
    x0 = jnp.zeros((64, 14), jnp.float32)
    u0 = jnp.zeros((64, 7), jnp.float32)
    rows = []
    for core in CORES:
        prob = kuka_ee(core=core)
        for unroll in UNROLLS:
            cfg = dataclasses.replace(prob.cfg, max_iter=N_ITERS,
                                      tol_cost=0.0, scan_unroll=unroll)
            solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
            t = rtt_corrected_median_s(
                lambda a, b: solver(a, b, goal, None, initial_rollout=True),
                (x0, u0), reps=reps,
            )
            rows.append({"core": core, "unroll": unroll,
                         "ms": round(t * 1e3, 3),
                         "solves_per_s": round(1.0 / t, 1)})
            print(json.dumps(rows[-1]), flush=True)
    best = min(rows, key=lambda r: r["ms"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
