"""Solver option coverage: finite-diff Jacobians, SLQ, scenario sharding,
Pallas RBD kernel (interpret mode)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.config import SolverConfig
from parallel_ddp_tpu.costs.joint import pendulum_cost
from parallel_ddp_tpu.models import pendulum
from parallel_ddp_tpu.presets import pendulum_swingup
from parallel_ddp_tpu.solver import make_ilqr_solver


def test_finite_diff_jacobian_matches_ad():
    from parallel_ddp_tpu.ops.integrators import (
        make_step_jacobian,
        make_step_jacobian_fd,
    )
    from parallel_ddp_tpu.models.kuka import kuka

    plant = kuka()
    ad = make_step_jacobian(plant, 3, 0.01)
    fd = make_step_jacobian_fd(plant, 3, 0.01, eps=1e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, 14).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 20.0, 7).astype(np.float32))
    a = np.asarray(ad(x, u))
    f = np.asarray(fd(x, u))
    np.testing.assert_allclose(f, a, rtol=5e-2, atol=5e-3)


def test_finite_diff_solver_converges():
    prob = pendulum_swingup(num_time_steps=32, total_time=1.5,
                            m_blocks=2, num_alpha=8)
    cfg = dataclasses.replace(prob.cfg, use_finite_diff=True, max_iter=40)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    goal = jnp.asarray([np.pi, 0.0])
    out = solver(jnp.zeros((32, 2)), jnp.zeros((32, 1)), goal,
                 initial_rollout=True)
    xf = np.asarray(out.x[-1])
    assert abs(xf[0] - np.pi) < 0.15, xf


def test_slq_runs_and_descends():
    """SLQ (linearized forward pass) — broken in the reference (README.md:36-37),
    implemented working here: the cost must decrease from the initial rollout."""
    cfg = SolverConfig(num_time_steps=32, total_time=1.5, m_blocks_b=1,
                       m_blocks_f=1, num_alpha=8, alpha_base=0.75,
                       integrator=3, rho_init=10.0, slq=True, max_iter=10)
    solver = make_ilqr_solver(pendulum(), pendulum_cost(32), cfg)
    goal = jnp.asarray([np.pi, 0.0])
    out = solver(jnp.zeros((32, 2)), jnp.zeros((32, 1)), goal,
                 initial_rollout=True)
    j_trace = np.asarray(out.J_trace)
    j0 = j_trace[0]
    j_last = j_trace[np.isfinite(j_trace)][-1]
    assert j_last < 0.9 * j0, (j0, j_last)


def test_batched_solver_matches_single():
    """Scenario batching over the 8-device mesh reproduces per-scenario solves."""
    from parallel_ddp_tpu.parallel.sharding import make_batched_solver, make_mesh

    prob = pendulum_swingup(num_time_steps=16, total_time=1.0,
                            m_blocks=2, num_alpha=4)
    cfg = dataclasses.replace(prob.cfg, max_iter=5)
    mesh = make_mesh(8)
    batched = make_batched_solver(prob.plant, prob.cost, cfg, mesh)
    single = make_ilqr_solver(prob.plant, prob.cost, cfg)

    rng = np.random.default_rng(0)
    b = 16
    x0s = jnp.asarray(
        np.tile(rng.normal(0, 0.4, (b, 1, 2)), (1, 16, 1)).astype(np.float32))
    u0s = jnp.zeros((b, 16, 1), jnp.float32)
    goals = jnp.tile(jnp.asarray([[np.pi, 0.0]], jnp.float32), (b, 1))

    out_b = batched(x0s, u0s, goals)
    assert out_b.J.shape == (b,)
    for i in [0, 7, 15]:
        out_s = single(x0s[i], u0s[i], goals[i], initial_rollout=True)
        np.testing.assert_allclose(float(out_b.J[i]), float(out_s.J),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_qdd_matches_soa_interpret():
    """The fused Pallas RBD kernel (interpret mode off-TPU) equals the SoA core."""
    from parallel_ddp_tpu.models.kuka.soa import KukaSoA
    from parallel_ddp_tpu.ops.pallas_rbd import kuka_qdd_pallas

    soa = KukaSoA()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1.0, (1024, 14)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 50.0, (1024, 7)).astype(np.float32))
    qp = kuka_qdd_pallas(x, u)
    qs = soa.forward_dynamics(x, u)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qs),
                               rtol=1e-3, atol=5e-2)
