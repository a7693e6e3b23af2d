"""Guard: no jit-captured device-array constants in any solver entry point.

On the axon TPU tunnel, an executable that captures a committed jax.Array
constant (created OUTSIDE the trace and closed over) dispatches ~1000x slower
(~25 ms per call) and sticks the whole process in that slow mode.  Numpy
constants (HLO literals) and arrays created during tracing are fine.  This test
traces every major entry point and asserts its jaxpr closes over no jax.Array.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _device_consts(closed_jaxpr):
    # 0-d captures count too: a jnp scalar made outside the trace is just as
    # much a committed device constant as a matrix (caught one in
    # tasks/pick_and_place.py's iteration cap)
    return [c for c in closed_jaxpr.consts if isinstance(c, jax.Array)]


def _assert_clean(closed_jaxpr, what):
    bad = _device_consts(closed_jaxpr)
    assert not bad, (
        f"{what} captures {len(bad)} device-array constant(s) with shapes "
        f"{[b.shape for b in bad[:5]]} — use numpy for closure constants "
        f"(see config.py SolverConfig.alphas docstring)"
    )


def test_ilqr_solver_has_no_device_constants():
    from parallel_ddp_tpu.presets import kuka_ee, ee_goal
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = kuka_ee(num_time_steps=8, m_blocks=2, num_alpha=2)
    cfg = dataclasses.replace(prob.cfg, max_iter=2)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    x0 = jnp.zeros((8, 14)); u0 = jnp.zeros((8, 7))
    goal = ee_goal([0.3, -0.5, 0.4])
    jaxpr = jax.make_jaxpr(
        lambda x, u, g: solver(x, u, g, initial_rollout=True)
    )(x0, u0, goal)
    _assert_clean(jaxpr, "kuka_ee ilqr solver")


def test_ilqr_solver_limits_smoothabs_no_device_constants():
    from parallel_ddp_tpu.presets import kuka_ee, ee_goal
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = kuka_ee(num_time_steps=8, m_blocks=2, num_alpha=2,
                   use_smooth_abs=True, use_limits=True, use_ee_vel=True)
    cfg = dataclasses.replace(prob.cfg, max_iter=2)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    x0 = jnp.zeros((8, 14)); u0 = jnp.zeros((8, 7))
    goal = ee_goal([0.3, -0.5, 0.4])
    jaxpr = jax.make_jaxpr(
        lambda x, u, g: solver(x, u, g, initial_rollout=True)
    )(x0, u0, goal)
    _assert_clean(jaxpr, "kuka_ee (limits+smoothabs+eevel) solver")


def test_joint_solvers_no_device_constants():
    from parallel_ddp_tpu.presets import (
        cartpole_swingup, kuka_joint, pendulum_swingup, quadrotor_task,
    )
    from parallel_ddp_tpu.solver import make_ilqr_solver

    for prob in [pendulum_swingup(num_time_steps=8, m_blocks=2, num_alpha=2),
                 cartpole_swingup(num_time_steps=8, m_blocks=2, num_alpha=2),
                 quadrotor_task(num_time_steps=8, m_blocks=2, num_alpha=2),
                 kuka_joint(num_time_steps=8, m_blocks=2, num_alpha=2)]:
        cfg = dataclasses.replace(prob.cfg, max_iter=2)
        solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
        n = prob.plant.n_state
        m = prob.plant.n_ctrl
        x0 = jnp.zeros((8, n)); u0 = jnp.zeros((8, m))
        goal = jnp.zeros((n,))
        jaxpr = jax.make_jaxpr(
            lambda x, u, g: solver(x, u, g, initial_rollout=True)
        )(x0, u0, goal)
        _assert_clean(jaxpr, f"{prob.plant.name} solver")


def test_mpc_step_no_device_constants():
    from parallel_ddp_tpu.config import SolverConfig, CostWeights
    from parallel_ddp_tpu.costs.joint import pendulum_cost
    from parallel_ddp_tpu.models import pendulum
    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController, MPCState

    cfg = SolverConfig(num_time_steps=8, total_time=0.5, m_blocks_b=2,
                       m_blocks_f=2, num_alpha=2, integrator=3)
    ctrl = MPCController(pendulum(), pendulum_cost(8), cfg,
                         MPCConfig(max_iters_per_solve=2))
    st = MPCState(
        x=jnp.zeros((8, 2)), u=jnp.zeros((8, 1)), K=jnp.zeros((8, 1, 2)),
        P=jnp.zeros((8, 2, 2)), p=jnp.zeros((8, 2)), d=jnp.zeros((8, 2)),
        t0=jnp.asarray(0.0), fails=jnp.asarray(0, jnp.int32),
    )
    jaxpr = jax.make_jaxpr(ctrl._mpc_step)(
        st, jnp.zeros(2), jnp.asarray(0.1), jnp.zeros(2), CostWeights(),
        jnp.asarray(2, jnp.int32)
    )
    _assert_clean(jaxpr, "MPC step")


def test_ab_composer_and_hooked_solver_no_device_constants():
    """The batched-derivative production path (ops/pallas_rbd.make_ab_composer
    and a Plant.batched_step_jac-hooked solver) must not capture device
    constants either — its E/U closure matrices are built outside the trace."""
    from parallel_ddp_tpu.models.base import Plant
    from parallel_ddp_tpu.ops.integrators import make_step_jacobian
    from parallel_ddp_tpu.ops.pallas_rbd import make_ab_composer
    from parallel_ddp_tpu.presets import pendulum_swingup
    from parallel_ddp_tpu.solver import make_ilqr_solver

    def dynamics(x, u):
        q, qd = x[:2], x[2:]
        return -3.0 * jnp.sin(q) - 0.2 * qd + u

    def xdot(x, u):
        return jnp.concatenate([x[2:], dynamics(x, u)])

    def jac1(x, u):
        dx, du = jax.jacfwd(xdot, argnums=(0, 1))(x, u)
        return jnp.concatenate([dx, du], axis=1)

    for integrator in (1, 2, 3):
        ab = make_ab_composer(jax.vmap(xdot), jax.vmap(jac1), integrator,
                              0.01, ns=4, nj=2)
        jaxpr = jax.make_jaxpr(ab)(jnp.zeros((7, 4)), jnp.zeros((7, 2)))
        _assert_clean(jaxpr, f"make_ab_composer(integrator={integrator})")

    prob = pendulum_swingup(num_time_steps=8, m_blocks=2, num_alpha=2)
    base = prob.plant
    hooked = dataclasses.replace(
        base,
        batched_step_jac=lambda integ, dt: jax.vmap(
            make_step_jacobian(base, integ, dt)
        ),
    )
    cfg = dataclasses.replace(prob.cfg, max_iter=2)
    solver = make_ilqr_solver(hooked, prob.cost, cfg)
    jaxpr = jax.make_jaxpr(
        lambda x, u, g: solver(x, u, g, initial_rollout=True)
    )(jnp.zeros((8, 2)), jnp.zeros((8, 1)), jnp.zeros(2))
    _assert_clean(jaxpr, "batched_step_jac-hooked solver")


def test_constraints_paths_no_device_constants():
    """The AL layer's jitted pieces (inner AL-cost solver, residual check,
    real-time multiplier shift/update) must not capture device constants —
    round-2 review caught eager jnp.arange captures exactly here."""
    from parallel_ddp_tpu.config import SolverConfig
    from parallel_ddp_tpu.constraints import (
        ALMPCController, BoxConstraints, al_cost,
    )
    from parallel_ddp_tpu.costs.joint import pendulum_cost
    from parallel_ddp_tpu.models import pendulum
    from parallel_ddp_tpu.mpc.driver import MPCConfig
    from parallel_ddp_tpu.solver import make_ilqr_solver

    cfg = SolverConfig(num_time_steps=8, total_time=0.5, m_blocks_b=2,
                       m_blocks_f=2, num_alpha=2, integrator=3, max_iter=2)
    con = BoxConstraints(n_state=2, n_ctrl=1, u_min=[-6.0], u_max=[6.0])

    solver = make_ilqr_solver(pendulum(), al_cost(pendulum_cost(8), con, 7),
                              cfg)
    goal = {"base": jnp.asarray([np.pi, 0.0]),
            "lam": jnp.zeros((8, con.n_c)),
            "mu": jnp.asarray(10.0)}
    jaxpr = jax.make_jaxpr(
        lambda x, u, g: solver(x, u, g, initial_rollout=True)
    )(jnp.zeros((8, 2)), jnp.zeros((8, 1)), goal)
    _assert_clean(jaxpr, "AL-cost solver")

    ctrl = ALMPCController(pendulum(), pendulum_cost(8), cfg,
                           MPCConfig(max_iters_per_solve=2), con)
    lam = jnp.zeros((8, con.n_c))
    _assert_clean(
        jax.make_jaxpr(ctrl._shift_lam)(lam, jnp.asarray(0.0),
                                        jnp.asarray(0.1)),
        "ALMPC shift_lam",
    )
    _assert_clean(
        jax.make_jaxpr(ctrl._update_lam)(lam, jnp.zeros((8, 2)),
                                         jnp.zeros((8, 1)), jnp.asarray(10.0)),
        "ALMPC update_lam",
    )


def test_urdf_soa_plant_no_device_constants():
    """urdf_plant(core='soa') — generic scalar-channel constants are plain
    python floats and must stay that way."""
    from test_urdf import CARTPOLE_URDF

    from parallel_ddp_tpu.models.urdf import urdf_plant

    plant = urdf_plant(CARTPOLE_URDF, gravity=9.81, core="soa")
    jaxpr = jax.make_jaxpr(plant.dynamics)(jnp.zeros(4), jnp.zeros(2))
    _assert_clean(jaxpr, "urdf soa dynamics")
    jaxpr = jax.make_jaxpr(plant.ee_pos)(jnp.zeros(2))
    _assert_clean(jaxpr, "urdf soa ee_pose")
