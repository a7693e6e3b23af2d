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



# ---------------------------------------------------------------------------
# Convergence ANCHORING (VERDICT r2 weak #3): archived cold-start traces with
# asserted trace-shape properties, plus the warm-replan anchor implied by the
# reference's fig-8 experiment record
# ---------------------------------------------------------------------------

def check_trace_properties(j_trace, alpha_trace, defect_trace, iters,
                           num_alpha, max_defect_size, tol=1e-5):
    """Trace-shape properties the reference's accept logic guarantees
    (forwardSimGPU line-search scan fpHelpers.cuh:395-408 +
    acceptRejectTrajGPU nisInitHelpers.cuh:487-518):

      * monotone accepted J: the J trace never increases (a rejected iteration
        carries the previous cost forward, an accepted one must not raise it);
      * z-window accept pattern: every alpha index is -1 (rejected) or a valid
        line-search index, at least one iteration is accepted, and the first
        accepted alpha of a cold solve is a large step (the z-window passes
        alpha near 1 when the quadratic model is trusted);
      * defect decay: multiple-shooting defects decay from the cold-start
        rollout, ending within the accept bound (defectKern + the line
        search's defect test, fpHelpers.cuh:94-111).

    Returns a dict of named booleans + stats; callers assert all(flags).
    """
    jt = np.asarray(j_trace, np.float64)
    at = np.asarray(alpha_trace)
    dt_ = np.asarray(defect_trace, np.float64)
    it = int(iters)
    jt_v = jt[: it + 1]
    at_v = at[1: it + 1]
    dt_v = dt_[~np.isnan(dt_)]

    accepted = at_v >= 0
    flags = {
        "j_trace_monotone": bool(
            np.all(np.diff(jt_v) <= tol * np.abs(jt_v[:-1]) + 1e-7)
        ),
        "alpha_indices_valid": bool(
            np.all((at_v >= -1) & (at_v < num_alpha))
        ),
        "some_accepted": bool(accepted.any()),
        "defect_final_in_bound": bool(
            dt_v.size == 0 or dt_v[-1] <= max_defect_size + 1e-6
        ),
        # decay is from the PEAK: a cold start at an equilibrium rolls out
        # with zero defect, the accepted sweeps then open boundaries up to
        # the accept bound, and convergence must close them again
        "defect_decays": bool(
            dt_v.size < 2
            or dt_v.max() <= max_defect_size + 1e-6
            or dt_v[-1] <= 0.05 * dt_v.max() + 1e-6
        ),
        "trace_tail_unwritten": bool(np.all(at[it + 1:] == -2)),
    }
    stats = {
        "iters": it,
        "accept_fraction": round(float(accepted.mean()), 3) if at_v.size else 1.0,
        "J0": float(jt_v[0]),
        "J_final": float(jt_v[-1]),
        "first_accepted_alpha": int(at_v[accepted][0]) if accepted.any() else -1,
        "defect0": float(dt_v[0]) if dt_v.size else 0.0,
        "defect_final": float(dt_v[-1]) if dt_v.size else 0.0,
    }
    return flags, stats


def cold_start_cases(scale: str = "full"):
    """The four plant families at the reference's default configs (full) or
    test-sized shapes (small)."""
    import numpy as np

    from parallel_ddp_tpu import presets

    full = scale == "full"

    def _c(name, prob, goal, x0):
        return name, prob, goal, np.asarray(x0, np.float32)

    cases = [
        _c("pendulum",
           presets.pendulum_swingup() if full else
           presets.pendulum_swingup(num_time_steps=64, total_time=2.0,
                                    m_blocks=2, num_alpha=8),
           np.asarray([np.pi, 0.0], np.float32), np.zeros(2)),
        _c("cartpole",
           presets.cartpole_swingup() if full else
           presets.cartpole_swingup(num_time_steps=32, total_time=1.0,
                                    m_blocks=2, num_alpha=8),
           np.asarray([0.0, np.pi, 0.0, 0.0], np.float32), np.zeros(4)),
        _c("quadrotor",
           presets.quadrotor_task() if full else
           presets.quadrotor_task(num_time_steps=32, total_time=1.0,
                                  m_blocks=2, num_alpha=8),
           np.asarray([1.0, 1.0, 1.5] + [0.0] * 9, np.float32),
           np.zeros(12)),
    ]
    prob = (presets.kuka_ee() if full else
            presets.kuka_ee(num_time_steps=16, m_blocks=2, num_alpha=4))
    cases.append(
        _c("kuka_ee", prob, presets.ee_goal([0.3, -0.5, 0.4]), np.zeros(14))
    )
    return cases


def trace_archive(scale: str = "full", max_iter: int = 100):
    """Cold-start J/alpha/defect traces for all four plants + property flags
    (the reference's WAFR_iLQR_examples.cu:140-227 statistics discipline)."""
    import dataclasses

    import jax.numpy as jnp

    from parallel_ddp_tpu.solver import make_ilqr_solver

    out = {}
    for name, prob, goal, x0 in cold_start_cases(scale):
        cfg = dataclasses.replace(prob.cfg, max_iter=max_iter)
        solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
        n = cfg.num_time_steps
        xs = jnp.broadcast_to(jnp.asarray(x0), (n, x0.size))
        us = jnp.zeros((n, prob.plant.n_ctrl), jnp.float32)
        o = solver(xs, us, goal, initial_rollout=True)
        flags, stats = check_trace_properties(
            o.J_trace, o.alpha_trace, o.defect_trace, o.iters,
            cfg.num_alpha, cfg.max_defect_size,
        )
        jt = np.asarray(o.J_trace)
        out[name] = {
            "flags": flags,
            "stats": stats,
            "iters_to_1pct": iters_to_frac(jt),
            "J_trace": [round(float(v), 4) for v in jt[~np.isnan(jt)]],
            "alpha_trace": np.asarray(o.alpha_trace)[
                : int(o.iters) + 1].tolist(),
            "defect_trace": [
                round(float(v), 5)
                for v in np.asarray(o.defect_trace)[
                    ~np.isnan(np.asarray(o.defect_trace))]
            ],
        }
    return out


def warm_replan_anchor(scale: str = "full", budget_iters: int = 6):
    """The reference's fig-8 record implies ~10 ms replans with a handful of
    accepted iterations each (test/WAFR_fig8.py:7: median 10.29 ms total at
    unlimited iters).  Anchor: after converging at one fig-8 point, a
    6-iteration warm re-solve at the NEXT point (0.1 s ahead on the 10 s
    figure) must land within 1% of that point's fully-converged cost."""
    import dataclasses

    import jax.numpy as jnp

    from parallel_ddp_tpu import presets
    from parallel_ddp_tpu.solver import make_ilqr_solver

    full = scale == "full"
    prob = (presets.kuka_ee() if full else
            presets.kuka_ee(num_time_steps=16, m_blocks=2, num_alpha=4))
    cfg = dataclasses.replace(prob.cfg, max_iter=100)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    n = cfg.num_time_steps

    xyz0, _ = presets.figure8_goal(0.0)
    xyz1, _ = presets.figure8_goal(0.1)
    g0 = presets.ee_goal(xyz0)
    g1 = presets.ee_goal(xyz1)
    w = presets.fig8_weights()

    xs = jnp.zeros((n, 14), jnp.float32)
    us = jnp.zeros((n, 7), jnp.float32)
    cold0 = solver(xs, us, g0, w, initial_rollout=True)
    cold1 = solver(xs, us, g1, w, initial_rollout=True)

    warm = solver(cold0.x, cold0.u, g1, w, P0=cold0.P, p0=cold0.p,
                  iter_limit=budget_iters, ignore_first_defect=True)
    gap = float((warm.J - cold1.J) / cold1.J)
    return {
        "budget_iters": budget_iters,
        "warm_iters_used": int(warm.iters),
        "J_cold_next": float(cold1.J),
        "J_warm_next": float(warm.J),
        "warm_vs_cold_gap": round(gap, 5),
        "within_1pct": bool(gap <= 0.01),
    }


if __name__ == "__main__":
    import argparse
    import json
    import os

    # numerics metric — chip-independent, and the axon sitecustomize pins
    # jax_platforms="axon,cpu" by explicit config (env overrides are dead);
    # only another explicit update forces CPU, else a dead tunnel hangs us
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--archive", action="store_true",
                    help="write benchmarks/artifacts/convergence_traces_r03"
                         ".json: cold-start traces (4 plants) + property "
                         "flags + the warm-replan anchor")
    args = ap.parse_args()
    if args.archive:
        res = {
            "cold_start": trace_archive("full"),
            "warm_replan": warm_replan_anchor("full"),
        }
        path = os.path.join(os.path.dirname(__file__), "artifacts")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "convergence_traces_r03.json"), "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps({
            "flags_all_true": all(
                all(v["flags"].values()) for v in res["cold_start"].values()
            ),
            "warm_within_1pct": res["warm_replan"]["within_1pct"],
        }))
    else:
        print(json.dumps(convergence_result()))
