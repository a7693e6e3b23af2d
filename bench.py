"""Headline benchmark: Kuka iiwa-14 N=64 MPC-style solve rate on one chip.

Reference baseline (BASELINE.md): GPU MPC solve median 10.29 ms ≈ 97 Hz replan
rate on the WAFR figure-8 config (N=64, 14 states / 7 controls, M=4 blocks,
16 alphas, fp32, EE cost, 10 ms budget ~ a handful of iLQR iterations + warm-
start shift).  Here one "solve" = a warm-started EE-cost solve running a fixed
6 iLQR iterations (the reference's 10 ms budget fits ~6 of its ~1.4 ms
iterations, test/WAFR_fig8.py:8-12).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import time

import numpy as np

BASELINE_SOLVES_PER_S = 97.0  # reference: median 10.29 ms/solve (WAFR_fig8.py:7)
N_ITERS_PER_SOLVE = 6
WARMUP = 2
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.presets import kuka_ee, ee_goal
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = kuka_ee()
    # fixed iteration count (tol_cost=0 disables the early exit so every solve
    # does the same work, like a time-budgeted MPC solve at steady state)
    cfg = dataclasses.replace(prob.cfg, max_iter=N_ITERS_PER_SOLVE, tol_cost=0.0)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)

    rng = np.random.default_rng(0)
    n = cfg.num_time_steps
    goal = ee_goal([0.0, -0.55, 0.35])

    def solve(x0, u0):
        return solver(x0, u0, goal, initial_rollout=True)

    solve_jit = solve  # make_ilqr_solver already jits

    x0 = jnp.asarray(rng.normal(0, 0.3, (n, 14)).astype(np.float32))
    u0 = jnp.asarray(rng.normal(0, 1.0, (n, 7)).astype(np.float32))

    # warmup/compile
    for _ in range(WARMUP):
        out = solve_jit(x0, u0)
        jax.block_until_ready(out.J)

    times = []
    for i in range(REPS):
        xi = jnp.asarray(rng.normal(0, 0.3, (n, 14)).astype(np.float32))
        ui = jnp.asarray(rng.normal(0, 1.0, (n, 7)).astype(np.float32))
        t0 = time.perf_counter()
        out = solve_jit(xi, ui)
        jax.block_until_ready(out.J)
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    solves_per_s = 1.0 / med
    print(
        json.dumps(
            {
                "metric": "kuka_n64_mpc_solves_per_s",
                "value": round(solves_per_s, 2),
                "unit": "solves/s (6-iter warm EE solve, N=64, M=4, 16 alphas)",
                "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
