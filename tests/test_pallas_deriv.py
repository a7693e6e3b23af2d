"""Batched discrete-Jacobian production path (ops/pallas_rbd.py) tests.

Layered so the suite stays fast on the 1-CPU test box:

  1. `make_ab_composer` — the Butcher-stage chain rule that turns batched stage
     dynamics/Jacobians into AB = [A | B] (the hand-written maps of
     integrators.cuh:40-233) — is verified against jacfwd of the actual
     integrator step on a cheap nonlinear toy plant, for all three integrators.
  2. The solver's `_is_batched` consumption branch (solver.py `_derivatives`)
     is exercised end-to-end with a pendulum whose `batched_step_jac` hook
     wraps the AD Jacobian: the solve must be bit-identical to the unhooked
     solver.
  3. The fused Pallas RBD kernels themselves are oracle-tested at the kernel
     level in tests/test_options.py (qdd, interpret mode); the 21-tangent
     Jacobian kernel + full Kuka AB path is gated behind PDDP_SLOW_TESTS=1
     because interpret-mode evaluation of the RNEA tangent chain takes many
     minutes on the CPU test box (it runs routinely on TPU via
     benchmarks/timedyn.py and the batched bench path).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.ops.integrators import make_step_jacobian
from parallel_ddp_tpu.ops.pallas_rbd import make_ab_composer

SLOW = os.environ.get("PDDP_SLOW_TESTS", "0") == "1"


def _toy_plant() -> Plant:
    """2-DoF nonlinear toy: cheap trace, nonzero coupling in every AB block."""

    def dynamics(x, u):
        q, qd = x[:2], x[2:]
        return -3.0 * jnp.sin(q) - 0.2 * qd * qd + (1.0 + 0.1 * jnp.cos(q)) * u

    return Plant(name="toy2", n_pos=2, n_ctrl=2, dynamics=dynamics)


@pytest.mark.parametrize("integrator", [1, 2, 3])
def test_ab_composer_matches_ad_oracle(integrator):
    plant = _toy_plant()
    dt = 0.02
    oracle = jax.vmap(make_step_jacobian(plant, integrator, dt))

    def xdot(x, u):
        return jnp.concatenate([x[2:], plant.dynamics(x, u)])

    def jac1(x, u):
        dx, du = jax.jacfwd(xdot, argnums=(0, 1))(x, u)
        return jnp.concatenate([dx, du], axis=1)

    ab = make_ab_composer(jax.vmap(xdot), jax.vmap(jac1), integrator, dt,
                          ns=4, nj=2)
    rng = np.random.default_rng(integrator)
    x = jnp.asarray(rng.normal(0, 1.0, (16, 4)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 1.0, (16, 2)).astype(np.float32))
    got, ref = np.asarray(ab(x, u)), np.asarray(oracle(x, u))
    assert got.shape == ref.shape == (16, 4, 6)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_solver_consumes_batched_jac():
    """A plant with `batched_step_jac` must solve bit-identically to the same
    plant without it (solver.py `_derivatives` _is_batched branch)."""
    from parallel_ddp_tpu.presets import pendulum_swingup
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = pendulum_swingup(num_time_steps=32, total_time=1.0, m_blocks=2,
                            num_alpha=4)
    cfg = dataclasses.replace(prob.cfg, max_iter=8)
    base = prob.plant

    def factory(integrator, dt):
        return jax.vmap(make_step_jacobian(base, integrator, dt))

    hooked = dataclasses.replace(base, batched_step_jac=factory)

    x0 = jnp.zeros((32, 2), jnp.float32)
    u0 = 0.1 * jnp.ones((32, 1), jnp.float32)
    goal = jnp.asarray([np.pi, 0.0], jnp.float32)

    out_a = make_ilqr_solver(base, prob.cost, cfg)(x0, u0, goal,
                                                   initial_rollout=True)
    out_b = make_ilqr_solver(hooked, prob.cost, cfg)(x0, u0, goal,
                                                     initial_rollout=True)
    assert float(out_a.J) == float(out_b.J)
    np.testing.assert_array_equal(np.asarray(out_a.u), np.asarray(out_b.u))


@pytest.mark.skipif(not SLOW, reason="interpret-mode RNEA tangent chain: "
                    "many minutes on the 1-CPU box (set PDDP_SLOW_TESTS=1)")
@pytest.mark.parametrize("integrator", [1, 3])
def test_kuka_ab_pallas_matches_ad_oracle(integrator):
    """Full Kuka AB through the fused Pallas kernels (interpret mode off-TPU)
    vs jacfwd of the integrator step through the spatial-algebra core."""
    from parallel_ddp_tpu.models.kuka import kuka, kuka_params
    from parallel_ddp_tpu.ops.pallas_rbd import make_kuka_ab_pallas

    dt = 0.5 / 64
    plant = kuka(kuka_params(core="rbd"))
    oracle = jax.vmap(make_step_jacobian(plant, integrator, dt))
    ab = make_kuka_ab_pallas(ee_type=1, gravity=9.81, integrator=integrator,
                             dt=dt)
    rng = np.random.default_rng(integrator)
    x = jnp.asarray(rng.normal(0, 1.0, (6, 14)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 50.0, (6, 7)).astype(np.float32))
    ref = np.asarray(oracle(x, u))
    got = np.asarray(ab(x, u))
    assert got.shape == ref.shape == (6, 14, 21)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_pallas_core_plant_exposes_batched_jac():
    """core='pallas' must route the plant's batched hook (construction only —
    evaluation is covered by the slow test / TPU bench)."""
    from parallel_ddp_tpu.models.kuka import kuka, kuka_params

    plant = kuka(kuka_params(core="pallas"))
    assert plant.batched_step_jac is not None
    jac = plant.batched_step_jac(3, 0.01)
    assert callable(jac)


def test_qdd_scenario_vmap_flattens_into_tiles():
    """jax.vmap over a scenario axis routes through the kernels' custom_vmap
    rule (ops/pallas_rbd.py _packed_entry_points): the scenario axis is
    flattened into the sample batch (which _to_tiles lane-packs) instead of
    Pallas replicating the grid with 16x-padded tiles per scenario.  B*S
    chosen to span two 1024-lane tiles."""
    from parallel_ddp_tpu.ops.pallas_rbd import kuka_qdd_pallas

    rng = np.random.default_rng(11)
    B, S = 9, 120  # 1080 samples -> two tiles after flattening
    x = jnp.asarray(rng.normal(0, 0.5, (B, S, 14)), jnp.float32)
    u = jnp.asarray(rng.normal(0, 2.0, (B, S, 7)), jnp.float32)

    qdd_b = jax.vmap(lambda a, b: kuka_qdd_pallas(a, b, interpret=True))(x, u)
    for i in (0, 4, B - 1):
        ref = kuka_qdd_pallas(x[i], u[i], interpret=True)
        np.testing.assert_allclose(np.asarray(qdd_b[i]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=f"qdd[{i}]")
