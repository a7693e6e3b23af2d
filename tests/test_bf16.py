"""Reduced-precision forward path (SolverConfig.bf16_rollout / bf16_cost).

The reference's half-precision toggle is declared broken in its own config
(config.cuh:72-75 "DOES NOT CURRENTLY WORK").  Here bf16 is applied only to
the stages that tolerate it — the multiple-shooting rollout and the stage-cost
evaluation, each with fp32 accumulation — while the derivative stage and the
Riccati recursion stay fp32 (solver.py:143-147 documents why they must).
These tests are the oracle gate the throughput study rests on
(benchmarks/scaling.py `bf16=True`, the bench's batched_bf16 stage).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_ddp_tpu.presets import ee_goal, kuka_ee, pendulum_swingup
from parallel_ddp_tpu.solver import make_ilqr_solver


def test_bf16_rollout_pendulum_still_swings_up():
    prob = pendulum_swingup(num_time_steps=64, total_time=2.0, m_blocks=2,
                            num_alpha=8)
    cfg32 = dataclasses.replace(prob.cfg, max_iter=30)
    cfg16 = dataclasses.replace(cfg32, bf16_rollout=True)
    goal = jnp.asarray([np.pi, 0.0], jnp.float32)
    x0 = jnp.zeros((64, 2), jnp.float32)
    u0 = jnp.zeros((64, 1), jnp.float32)

    o32 = make_ilqr_solver(prob.plant, prob.cost, cfg32)(
        x0, u0, goal, initial_rollout=True)
    o16 = make_ilqr_solver(prob.plant, prob.cost, cfg16)(
        x0, u0, goal, initial_rollout=True)

    # the task outcome survives bf16: swing-up reached, cost within 2%
    np.testing.assert_allclose(np.asarray(o16.x[-1]), [np.pi, 0.0], atol=0.05)
    assert abs(float(o16.J) - float(o32.J)) / float(o32.J) < 0.02


def test_bf16_cost_trace_parity_kuka():
    """Fixed-iteration throughput configuration (tol_cost=0, the batched bench
    shape): the bf16 forward path's per-iteration cost trace stays within
    bf16's ~3e-3 relative band of the fp32 trace."""
    prob = kuka_ee(num_time_steps=16, m_blocks=2, num_alpha=4)
    cfg32 = dataclasses.replace(prob.cfg, max_iter=6, tol_cost=0.0)
    cfg16 = dataclasses.replace(cfg32, bf16_rollout=True, bf16_cost=True)
    goal = ee_goal([0.3, -0.3, 0.9])
    x0 = jnp.zeros((16, 14), jnp.float32)
    u0 = jnp.zeros((16, 7), jnp.float32)

    o32 = make_ilqr_solver(prob.plant, prob.cost, cfg32)(
        x0, u0, goal, initial_rollout=True)
    o16 = make_ilqr_solver(prob.plant, prob.cost, cfg16)(
        x0, u0, goal, initial_rollout=True)

    # the solver takes the SAME accept/step decisions under bf16 forward
    # noise — the strong form of trace parity
    np.testing.assert_array_equal(np.asarray(o16.alpha_trace),
                                  np.asarray(o32.alpha_trace))
    j32 = np.asarray(o32.J_trace, np.float64)
    j16 = np.asarray(o16.J_trace, np.float64)
    m = ~np.isnan(j32) & ~np.isnan(j16)
    assert m.sum() >= 3  # both ran several iterations
    # and the costs track within bf16's accumulated band (~4% after 6
    # iterations of compounding rollout noise; measured 3.8% here)
    np.testing.assert_allclose(j16[m], j32[m], rtol=6e-2)
    # the final trajectories agree to bf16 resolution
    np.testing.assert_allclose(np.asarray(o16.x), np.asarray(o32.x),
                               rtol=0.0, atol=0.05)


def test_bf16_rollout_step_oracle():
    """One bf16 integrator step against the fp32 oracle on random Kuka states:
    relative error within bf16's mantissa budget (no blow-up through the
    channel math)."""
    from parallel_ddp_tpu.ops.integrators import make_step

    prob = kuka_ee(num_time_steps=16, m_blocks=2, num_alpha=4)
    step = make_step(prob.plant, prob.cfg.integrator, prob.cfg.dt)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (32, 14)), jnp.float32)
    u = jnp.asarray(rng.normal(0, 2.0, (32, 7)), jnp.float32)

    f32 = jax.vmap(step)(x, u)
    f16 = jax.vmap(
        lambda xi, ui: step(xi.astype(jnp.bfloat16),
                            ui.astype(jnp.bfloat16)).astype(jnp.float32)
    )(x, u)
    err = np.abs(np.asarray(f16) - np.asarray(f32))
    scale = np.maximum(np.abs(np.asarray(f32)), 1.0)
    assert float((err / scale).max()) < 0.03


def test_bf16_takes_precedence_over_fused_rollout():
    """bf16_rollout must disable the (fp32) fused Pallas rollout hook rather
    than silently ignoring the precision request."""
    import dataclasses as dc

    calls = []

    def fused_factory(integrator, dt, N, M, A):
        calls.append((N, M, A))
        return None

    prob = pendulum_swingup(num_time_steps=16, m_blocks=2, num_alpha=4)
    plant_f = dc.replace(prob.plant, name=prob.plant.name + "_bf16guard",
                         fused_rollout=fused_factory)
    cfg = dataclasses.replace(prob.cfg, max_iter=2, bf16_rollout=True)
    make_ilqr_solver(plant_f, prob.cost, cfg)
    assert calls == []  # factory never consulted under bf16
    cfg32 = dataclasses.replace(prob.cfg, max_iter=2)
    make_ilqr_solver(plant_f, prob.cost, cfg32)
    assert calls  # consulted again once fp32
