"""WAFR iLQR statistical benchmark — examples/WAFR_iLQR_examples.cu analog.

Runs `--trials` randomized full-convergence iLQR solves of the chosen plant
and prints the paper-style tables: per-solve wall-time stats (median/avg/std/
min/max), iteration counts, median cost-per-iteration trace, and alpha-index
histogram (printJAlphaStats / printAllTimingStats,
WAFR_iLQR_examples.cu:122-227).

Usage:
    python examples/wafr_ilqr.py --plant kuka_ee --trials 100
    python examples/wafr_ilqr.py --plant pendulum --trials 100 --phase-times
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(plant_name):
    import jax.numpy as jnp

    from parallel_ddp_tpu import presets

    if plant_name == "pendulum":
        prob = presets.pendulum_swingup(num_time_steps=64, total_time=2.0,
                                        m_blocks=2, num_alpha=8)
        goal = jnp.asarray([np.pi, 0.0])
        sig = np.asarray([0.5, 0.5])
    elif plant_name == "cartpole":
        prob = presets.cartpole_swingup(num_time_steps=64, total_time=2.0,
                                        m_blocks=2, num_alpha=16)
        goal = jnp.asarray([0.0, np.pi, 0.0, 0.0])
        sig = np.asarray([0.3, 0.5, 0.2, 0.2])
    elif plant_name == "quadrotor":
        prob = presets.quadrotor_task(num_time_steps=64, total_time=2.0,
                                      m_blocks=2, num_alpha=16)
        goal = jnp.zeros(12).at[0:3].set(jnp.asarray([1.0, 1.0, 1.0]))
        sig = np.full(12, 0.1)
    elif plant_name == "kuka":
        prob = presets.kuka_joint()
        goal = jnp.asarray(
            [-0.5, 1.0, -0.3, 0.5, 0.7, 0.7, 0.0] + [0.0] * 7, jnp.float32
        )
        sig = np.concatenate([np.full(7, 1.0), np.full(7, 0.5)])
    elif plant_name == "kuka_ee":
        prob = presets.kuka_ee()
        goal = presets.ee_goal([0.3, -0.5, 0.4])
        sig = np.concatenate([np.full(7, 0.7), np.full(7, 0.3)])
    else:
        raise SystemExit(f"unknown plant {plant_name}")
    return prob, goal, sig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plant", default="kuka_ee",
                    choices=["pendulum", "cartpole", "quadrotor", "kuka", "kuka_ee"])
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--max-iter", type=int, default=40)
    ap.add_argument("--phase-times", action="store_true",
                    help="also print the per-phase timing table")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.solver import make_ilqr_solver
    from parallel_ddp_tpu.utils import AlgTrace, phase_times, timing_stats

    prob, goal, sig = build(args.plant)
    cfg = dataclasses.replace(prob.cfg, max_iter=args.max_iter)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    n_state, n_ctrl = prob.plant.n_state, prob.plant.n_ctrl
    N = cfg.num_time_steps

    rng = np.random.default_rng(0)

    def rand_x0():
        x0 = (sig * rng.normal(0, 1.0, n_state)).astype(np.float32)
        return jnp.asarray(np.tile(x0, (N, 1)))

    u0 = jnp.zeros((N, n_ctrl), jnp.float32)

    # compile
    out = solver(rand_x0(), u0, goal, initial_rollout=True)
    jax.block_until_ready(out.J)

    trace = AlgTrace()
    j_traces = []
    for _ in range(args.trials):
        x0 = rand_x0()
        t0 = time.perf_counter()
        out = solver(x0, u0, goal, initial_rollout=True)
        jax.block_until_ready(out.J)
        trace.record_solve(out, time.perf_counter() - t0)
        j_traces.append(np.asarray(out.J_trace))

    jt = np.stack(j_traces)  # (trials, max_iter+1), NaN after exit
    med_trace = np.nanmedian(jt, axis=0)
    # BASELINE's convergence-parity metric (see benchmarks/convergence.py)
    from benchmarks.convergence import iters_to_frac

    it1pct = np.asarray([iters_to_frac(j) for j in j_traces], np.float64)

    result = {
        "plant": args.plant,
        "trials": args.trials,
        "solve_time": timing_stats(trace.wall_s),
        "iters": {"median": float(np.median(trace.iters)),
                  "max": int(np.max(trace.iters))},
        "iters_to_1pct_cost": {"median": float(np.median(it1pct)),
                               "max": int(it1pct.max())},
        "J_final": {"median": float(np.median(trace.J)),
                    "std": float(np.std(trace.J))},
        "median_J_per_iter": [round(float(v), 3) for v in med_trace
                              if np.isfinite(v)][:12],
    }
    if args.phase_times:
        x = rand_x0()
        result["phase_times"] = phase_times(
            prob.plant, prob.cost, cfg, x, u0, goal
        )
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
