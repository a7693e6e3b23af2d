"""Explicit integrators and their discrete Jacobians (utils/integrators.cuh:14-236).

Each integrator maps (x_k, u_k) -> x_{k+1} using the plant's continuous dynamics
qdd = f(x, u) with x = [q; qd] and xd = [qd; qdd].  The discrete Jacobian
AB = [A | B] = d x_{k+1} / d [x_k; u_k] is obtained with `jax.jacfwd` of the step
function — for these fixed Butcher tableaus this traces to exactly the stage-Jacobian
chain rule the reference composes by hand (integrators.cuh:40-53, 84-120, 159-233),
evaluated at the *true* stage points.  (The reference's RK3 gradient evaluates its
stage Jacobians at slightly wrong points — integrators.cuh:180-192 uses s_x[i]
where the forward pass uses velocities; we deliberately implement the exact
derivative of the forward map instead of replicating that bug, see SURVEY.md §7.)

Stage structure matches the reference's forward integrators exactly:
  Euler    : x' = x + dt*[qd; f(x,u)]                        (integrators.cuh:26-36)
  Midpoint : k1 at x; xm = x + dt/2*k1; x' = x + dt*k2       (integrators.cuh:56-81)
  RK3      : Kutta's third-order rule                        (integrators.cuh:123-157)
             k1 at x; x2 = x + dt/2*k1; k2 at x2;
             x3 = x + dt*(2*k2 - k1); k3 at x3;
             x' = x + dt/6*(k1 + 4*k2 + k3)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.models.base import Plant


def _xdot(plant: Plant, x, u):
    qd = x[plant.n_pos:]
    qdd = plant.dynamics(x, u)
    return jnp.concatenate([qd, qdd])


def make_step(plant: Plant, integrator: int, dt: float) -> Callable:
    """Return step(x, u) -> x_next for the chosen integrator (1/2/3)."""

    if integrator == 1:

        def step(x, u):
            return x + dt * _xdot(plant, x, u)

    elif integrator == 2:

        def step(x, u):
            k1 = _xdot(plant, x, u)
            xm = x + 0.5 * dt * k1
            k2 = _xdot(plant, xm, u)
            return x + dt * k2

    elif integrator == 3:

        def step(x, u):
            k1 = _xdot(plant, x, u)
            x2 = x + 0.5 * dt * k1
            k2 = _xdot(plant, x2, u)
            x3 = x + dt * (2.0 * k2 - k1)
            k3 = _xdot(plant, x3, u)
            return x + (dt / 6.0) * (k1 + 4.0 * k2 + k3)

    else:
        raise ValueError(f"unknown integrator {integrator}")

    return step


def make_step_jacobian(plant: Plant, integrator: int, dt: float) -> Callable:
    """Return jac(x, u) -> AB (n_state, n_state + n_ctrl), the discrete dynamics
    Jacobian [A | B] (the reference's `_integratorGradient`, integrators.cuh)."""

    step = make_step(plant, integrator, dt)

    def jac(x, u):
        a, b = jax.jacfwd(step, argnums=(0, 1))(x, u)
        return jnp.concatenate([a, b], axis=1)

    return jac


def make_step_jacobian_fd(
    plant: Plant, integrator: int, dt: float, eps: float = 1e-4
) -> Callable:
    """Central-finite-difference AB (the reference's USE_FINITE_DIFF variant,
    `finiteDiffInner`, nisInitHelpers.cuh:138-243) — for plants whose dynamics
    are not differentiable (lookup tables, contact hacks) or as a cross-check."""

    step = make_step(plant, integrator, dt)
    n, m = plant.n_state, plant.n_ctrl

    def jac(x, u):
        def col(i):
            dx = jnp.zeros(n + m, x.dtype).at[i].set(eps)
            xp, up = x + dx[:n], u + dx[n:]
            xm, um = x - dx[:n], u - dx[n:]
            return (step(xp, up) - step(xm, um)) / (2.0 * eps)

        return jax.vmap(col, out_axes=1)(jnp.arange(n + m))

    return jac


def make_step_with_jacobian(plant: Plant, integrator: int, dt: float) -> Callable:
    """Return f(x, u) -> (x_next, AB) computing both in one trace."""

    step = make_step(plant, integrator, dt)

    def both(x, u):
        def stacked(xu):
            return step(xu[: plant.n_state], xu[plant.n_state:])

        xu = jnp.concatenate([x, u])
        x_next, ab = stacked(xu), jax.jacfwd(stacked)(xu)
        return x_next, ab

    return both
