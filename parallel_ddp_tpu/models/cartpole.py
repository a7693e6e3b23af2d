"""Cart-pole: 2-DoF analytic mass-matrix solve (dynamics_cart.cuh:28-43).

State x = [cart position, pole angle, cart vel, pole angular vel], control = cart force.
Parameters: m_cart = 10, m_pole = 1, l_pole = 0.5, g = -9.81 (dynamics_cart.cuh:13-19).
"""

from __future__ import annotations

import jax.numpy as jnp

from parallel_ddp_tpu.models.base import Plant

GRAVITY = -9.81
M_CART = 10.0
M_POLE = 1.0
L_POLE = 0.5
ML = M_POLE * L_POLE
MLL = ML * L_POLE


def _dynamics(x, u):
    theta, thetad = x[1], x[3]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    h0 = M_CART + M_POLE
    h1 = MLL
    hod = ML * ct
    tau_m = ML * st
    tau0 = tau_m * thetad * thetad + u[0]
    tau1 = tau_m * GRAVITY
    det = 1.0 / (h0 * h1 - hod * hod)
    return jnp.stack([det * (h1 * tau0 - hod * tau1), det * (h0 * tau1 - hod * tau0)])


def cartpole() -> Plant:
    return Plant(
        name="cartpole",
        n_pos=2,
        n_ctrl=1,
        dynamics=_dynamics,
        rho_init_default=10.0,
        max_defect_default=0.75,
        alpha_base_default=0.75,
        num_alpha_default=32,
    )
