"""Convergence-trace anchoring (benchmarks/convergence.py).

The reference guarantees trace-shape properties through its accept logic
(monotone accepted J, valid z-window alpha pattern, defect decay —
fpHelpers.cuh:395-408, nisInitHelpers.cuh:487-518) and its fig-8 experiment
record implies warm replans converge in a handful of iterations
(test/WAFR_fig8.py:7).  These tests assert those properties on cold-start
solves of all four plant families plus the warm-replan anchor; the full-size
archived traces live in benchmarks/artifacts/convergence_traces_r03.json.
"""

import numpy as np
import pytest

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.convergence import (  # noqa: E402
    check_trace_properties,
    cold_start_cases,
    iters_to_frac,
    warm_replan_anchor,
)


@pytest.mark.parametrize("case", cold_start_cases("small"),
                         ids=lambda c: c[0])
def test_cold_start_trace_properties(case):
    import dataclasses

    import jax.numpy as jnp

    from parallel_ddp_tpu.solver import make_ilqr_solver

    name, prob, goal, x0 = case
    cfg = dataclasses.replace(prob.cfg, max_iter=60)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    n = cfg.num_time_steps
    xs = jnp.broadcast_to(jnp.asarray(x0), (n, x0.size))
    us = jnp.zeros((n, prob.plant.n_ctrl), jnp.float32)
    o = solver(xs, us, goal, initial_rollout=True)

    flags, stats = check_trace_properties(
        o.J_trace, o.alpha_trace, o.defect_trace, o.iters,
        cfg.num_alpha, cfg.max_defect_size,
    )
    assert all(flags.values()), (name, flags, stats)
    # the cost must actually drop on a cold start, not merely not-increase
    assert stats["J_final"] < stats["J0"], (name, stats)
    # and "iters to 1%" must be readable off the trace
    assert iters_to_frac(np.asarray(o.J_trace)) <= int(o.iters)


def test_warm_replan_within_budget():
    """6-iteration warm re-solve at the next fig-8 point lands within 1% of
    that point's fully-converged cost — the property the reference's 10 ms
    MPC replan cycle rests on (WAFR_fig8.py:7)."""
    res = warm_replan_anchor("small")
    assert res["within_1pct"], res
    assert res["warm_iters_used"] <= res["budget_iters"]


def test_defect_trace_exposed_and_decaying():
    """The per-iteration defect trace is part of SolveOutput and decays to
    within the accept bound on a multiple-shooting cold start."""
    import dataclasses

    import jax.numpy as jnp

    from parallel_ddp_tpu.presets import pendulum_swingup
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = pendulum_swingup(num_time_steps=64, total_time=2.0, m_blocks=8,
                            num_alpha=8)
    cfg = dataclasses.replace(prob.cfg, max_iter=40)
    out = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        jnp.zeros((64, 2)), jnp.zeros((64, 1)),
        jnp.asarray([np.pi, 0.0], jnp.float32), initial_rollout=True,
    )
    dt_ = np.asarray(out.defect_trace)
    dt_v = dt_[~np.isnan(dt_)]
    assert dt_v.size == int(out.iters) + 1
    assert dt_v[-1] <= cfg.max_defect_size
    # the final accepted defect matches the scalar the solver already reported
    np.testing.assert_allclose(dt_v[-1], float(out.max_defect), rtol=1e-5,
                               atol=1e-6)
