"""Augmented-Lagrangian constrained DDP (constraints.py).

The reference reserves CONSTRAINTS_ON and never implements it
(config.cuh:177-179); these tests pin down the working implementation:
hard bounds are actually enforced (vs the reference's soft quadratic
penalties which bound nothing), the task still completes, and the outer
multiplier loop converges monotonically without recompiling the solver."""

import jax
import jax.numpy as jnp
import numpy as np

from parallel_ddp_tpu import ilqr_solve
from parallel_ddp_tpu.constraints import ALConfig, BoxConstraints, solve_al
from parallel_ddp_tpu.presets import pendulum_swingup

GOAL = jnp.asarray([np.pi, 0.0])


def _problem():
    return pendulum_swingup(num_time_steps=128, total_time=4.0,
                            m_blocks=4, num_alpha=16)


def test_control_bounds_enforced():
    prob = _problem()
    x0 = jnp.zeros((128, 2))
    u0 = jnp.zeros((128, 1))

    out_u = ilqr_solve(prob.plant, prob.cost, prob.cfg, x0, u0, GOAL,
                       initial_rollout=True)
    peak_u = float(jnp.abs(out_u.u).max())
    assert peak_u > 8.0  # the unconstrained swing-up saturates well above 6

    con = BoxConstraints(n_state=2, n_ctrl=1, u_min=[-6.0], u_max=[6.0])
    out_c, info = solve_al(prob.plant, prob.cost, prob.cfg, x0, u0, GOAL, con)
    assert float(jnp.abs(out_c.u).max()) <= 6.0 + 1e-3
    # still swings up
    np.testing.assert_allclose(np.asarray(out_c.x[-1]), [np.pi, 0.0], atol=0.05)
    # outer loop converged (last violation below tolerance) and the
    # constrained optimum costs more than the unconstrained one
    assert info["violations"][-1] < 1e-3
    assert info["base_J"] > float(out_u.J) - 1e-3


def test_state_bounds_enforced():
    prob = _problem()
    x0 = jnp.zeros((128, 2))
    u0 = jnp.zeros((128, 1))

    con = BoxConstraints(n_state=2, n_ctrl=1,
                         x_min=[-100.0, -2.2], x_max=[100.0, 2.2])
    out, info = solve_al(prob.plant, prob.cost, prob.cfg, x0, u0, GOAL, con)
    assert float(jnp.abs(out.x[:, 1]).max()) <= 2.2 + 1e-3
    np.testing.assert_allclose(np.asarray(out.x[-1]), [np.pi, 0.0], atol=0.05)
    assert info["outer_iters"] <= ALConfig().max_outer
    # violations shrink (AL convergence), allowing small non-monotonic noise
    v = info["violations"]
    assert v[-1] <= v[0]


def test_al_goal_pytree_traced_no_recompile():
    """lam/mu updates must not retrace the inner solver."""
    from parallel_ddp_tpu.constraints import al_cost
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = _problem()
    con = BoxConstraints(n_state=2, n_ctrl=1, u_max=[6.0], u_min=[-6.0])
    solver = make_ilqr_solver(prob.plant, al_cost(prob.cost, con, 127),
                              prob.cfg)
    x0 = jnp.zeros((128, 2))
    u0 = jnp.zeros((128, 1))
    lam0 = jnp.zeros((128, con.n_c), jnp.float32)

    def run(lam, mu):
        g = {"base": GOAL, "lam": lam, "mu": jnp.asarray(mu, jnp.float32)}
        return solver(x0, u0, g, initial_rollout=True)

    out1 = run(lam0, 10.0)
    jax.block_until_ready(out1.J)
    n0 = solver._cache_size()
    out2 = run(lam0 + 0.5, 50.0)
    jax.block_until_ready(out2.J)
    assert solver._cache_size() == n0, "lam/mu update retraced the solver"
    # and the traced values actually took effect
    assert float(out1.J) != float(out2.J)
