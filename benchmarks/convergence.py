"""Convergence-quality benchmark: iterations to reach within 1% of final cost.

BASELINE.json's north star names three metrics; two (solves/s per chip, MPC
control-loop Hz) are device-speed numbers recorded by the latency/batched/fig8
bench stages.  The third — "iters to 1% cost" — is a NUMERICS metric: how many
iLQR iterations the solver needs before the trajectory cost is within 1% of
the cost it finally converges to.  It measures convergence-semantics parity
with the reference algorithm (the z-window line search, rho schedule, defect
handling — DDPWrappers.cuh:52-114), not chip speed, so it is deterministic for
a given seed and equally valid computed on the CPU backend: bench.py runs this
stage even when the accelerator is unreachable.

Protocol (the reference's randomized-solve statistics harness,
examples/WAFR_iLQR_examples.cu:16,140-227): `trials` randomized Kuka EE
full-convergence solves from perturbed starts; per solve, find the first
iteration k with (J_k - J_final) <= 0.01 * J_final from the solver's J trace;
report median / mean / max.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def iters_to_frac(j_trace: np.ndarray, frac: float = 0.01) -> int:
    """First iteration index whose cost is within `frac` of the final cost.

    j_trace is the solver's per-iteration accepted-cost series (NaN-padded
    past the exit iteration, J_trace in config.py).
    """
    jt = np.asarray(j_trace, np.float64)
    jt = jt[~np.isnan(jt)]
    j_final = jt[-1]
    thresh = j_final + abs(j_final) * frac
    hit = np.nonzero(jt <= thresh)[0]
    return int(hit[0]) if hit.size else int(jt.size - 1)


def convergence_result(trials: int = 20, max_iter: int = 100, seed: int = 0,
                       plant: str = "kuka_ee", frac: float = 0.01) -> dict:
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu import presets
    from parallel_ddp_tpu.solver import make_ilqr_solver

    if plant == "kuka_ee":
        prob = presets.kuka_ee()
        goal = presets.ee_goal([0.3, -0.5, 0.4])
        sig = np.concatenate([np.full(7, 0.7), np.full(7, 0.3)])
        x_home = np.zeros(14, np.float32)
        x_home[1], x_home[3], x_home[5] = np.pi / 4, -np.pi / 4, np.pi / 4
    else:
        prob = presets.pendulum_swingup(num_time_steps=64, total_time=2.0,
                                        m_blocks=2, num_alpha=8)
        goal = jnp.asarray([np.pi, 0.0])
        sig = np.asarray([0.5, 0.5])
        x_home = np.zeros(2, np.float32)

    cfg = dataclasses.replace(prob.cfg, max_iter=max_iter)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)  # already jitted
    n = cfg.num_time_steps
    rng = np.random.default_rng(seed)

    iters_1pct, total_iters, finals = [], [], []
    for _ in range(trials):
        x0 = x_home + (rng.standard_normal(x_home.size) * sig).astype(np.float32)
        xs = jnp.broadcast_to(jnp.asarray(x0), (n, x_home.size))
        us = jnp.zeros((n, prob.plant.n_ctrl), jnp.float32)
        out = solver(xs, us, goal, initial_rollout=True)
        jt = np.asarray(out.J_trace)
        iters_1pct.append(iters_to_frac(jt, frac))
        total_iters.append(int(out.iters))
        finals.append(float(out.J))

    arr = np.asarray(iters_1pct, np.float64)
    return {
        "value": float(np.median(arr)),
        "unit": f"median iters to {frac:.0%} of final cost "
                f"({trials} randomized {plant} solves)",
        "extra": {
            "mean": round(float(arr.mean()), 2),
            "max": int(arr.max()),
            "median_total_iters": float(np.median(total_iters)),
            "median_final_J": round(float(np.median(finals)), 4),
            "backend": jax.default_backend(),
        },
    }


if __name__ == "__main__":
    import json

    print(json.dumps(convergence_result()))
