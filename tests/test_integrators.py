"""Integrator step + discrete-Jacobian oracle tests.

Mirrors test/testDynGrad.cu: analytic (here: jacfwd-traced) Jacobians vs central
finite differences of the step function (testDynGrad.cu:86-168, ERR_TOL there 0.1;
we hold a much tighter bound since both sides are float32 exact-ish).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.models import pendulum, cartpole, quadrotor
from parallel_ddp_tpu.ops.integrators import make_step, make_step_jacobian

PLANTS = [pendulum(), cartpole(), quadrotor()]
EPS = 1e-3


def finite_diff_jac(step, x, u, eps=EPS):
    n, m = x.shape[0], u.shape[0]
    cols = []
    for i in range(n):
        dx = np.zeros(n)
        dx[i] = eps
        cols.append((step(x + dx, u) - step(x - dx, u)) / (2 * eps))
    for j in range(m):
        du = np.zeros(m)
        du[j] = eps
        cols.append((step(x, u + du) - step(x, u - du)) / (2 * eps))
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("plant", PLANTS, ids=lambda p: p.name)
@pytest.mark.parametrize("integrator", [1, 2, 3])
def test_step_jacobian_matches_finite_diff(plant, integrator):
    dt = 0.01
    step = jax.jit(make_step(plant, integrator, dt))
    jac = jax.jit(make_step_jacobian(plant, integrator, dt))
    rng = np.random.default_rng(42 + integrator)
    for _ in range(5):
        x = jnp.asarray(rng.normal(0, 1.0, plant.n_state), jnp.float32)
        u = jnp.asarray(rng.normal(0, 5.0, plant.n_ctrl), jnp.float32)
        ab = np.asarray(jac(x, u))
        fd = finite_diff_jac(step, x, u)
        np.testing.assert_allclose(ab, fd, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("plant", PLANTS, ids=lambda p: p.name)
def test_integrator_order(plant):
    """Richardson check: RK3 error shrinks much faster than Euler under dt halving."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, plant.n_state), jnp.float32)
    u = jnp.asarray(rng.normal(0, 1.0, plant.n_ctrl), jnp.float32)

    def endpoint(integrator, dt, steps):
        step = make_step(plant, integrator, dt)
        xc = x
        for _ in range(steps):
            xc = step(xc, u)
        return xc

    ref = endpoint(3, 0.0005, 64)  # fine reference
    err_euler = np.linalg.norm(endpoint(1, 0.004, 8) - ref)
    err_rk3 = np.linalg.norm(endpoint(3, 0.004, 8) - ref)
    assert err_rk3 <= err_euler + 1e-6


def test_pendulum_dynamics_value():
    """qdd = u + g*sin(q) (dynamics_pend.cuh:36)."""
    p = pendulum()
    x = jnp.asarray([0.5, 0.1])
    u = jnp.asarray([2.0])
    np.testing.assert_allclose(
        p.dynamics(x, u), [2.0 - 9.81 * np.sin(0.5)], rtol=1e-6
    )


def test_cartpole_dynamics_value():
    """Mass-matrix solve against a direct numpy evaluation (dynamics_cart.cuh:36-42)."""
    p = cartpole()
    x = np.array([0.1, 0.7, -0.2, 1.3], np.float32)
    u = np.array([3.0], np.float32)
    ct, st = np.cos(x[1]), np.sin(x[1])
    h = np.array([[11.0, 0.5 * ct], [0.5 * ct, 0.25]])
    tau = np.array([0.5 * st * x[3] ** 2 + u[0], 0.5 * st * -9.81])
    expect = np.linalg.solve(h, tau)
    np.testing.assert_allclose(p.dynamics(jnp.asarray(x), jnp.asarray(u)), expect, rtol=1e-5)
