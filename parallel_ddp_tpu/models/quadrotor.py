"""Quadrotor: 12-state / 4-rotor Newton-Euler model (dynamics_quad.cuh:40-65).

State x = [x, y, z, roll, pitch, yaw, xd, yd, zd, rolld, pitchd, yawd]; u = four
rotor thrusts.  Parameters (dynamics_quad.cuh:13-31): m = 0.5, L = 0.175,
Ixx = Iyy = 0.0023, Izz = 0.004, g = -9.81.

The reference hand-expands the Euler-angle rate equations into ~60-term
expressions; here the same model is written in its compact physical form
(translational accelerations from total thrust through the ZYX body rotation;
Euler-angle accelerations from the rigid-body Euler equations mapped through the
angular-velocity kinematics) and the gradient is jacfwd — identical math, compiler
derived.  The body torque model matches the reference's coefficient structure:
  tau_roll  = L*(u1 - u3)            (paired rotors on the y-arm)
  tau_pitch = L*(u2 - u0)            (x-arm)
  tau_yaw   = km*(u0 - u1 + u2 - u3) with km = 0.0245 (1127/184*0.004).
"""

from __future__ import annotations

import jax.numpy as jnp

from parallel_ddp_tpu.models.base import Plant

GRAVITY = -9.81
MASS = 0.5
LENGTH = 0.175
IXX = 0.0023
IYY = 0.0023
IZZ = 0.004
KM = 0.0245  # yaw moment coefficient: reference's 1127/184 = KM/IZZ * ... (dynamics_quad.cuh:61)


def _euler_rate_matrix(roll, pitch):
    """omega_body = W(roll, pitch) @ [rolld, pitchd, yawd] for ZYX Euler angles."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    return jnp.array(
        [
            [1.0, 0.0, -sp],
            [0.0, cr, sr * cp],
            [0.0, -sr, cr * cp],
        ]
    )


def _dynamics(x, u):
    roll, pitch, yaw = x[3], x[4], x[5]
    eul_d = x[9:12]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)

    thrust = jnp.sum(u)
    # translational: R_wb @ [0,0,thrust]/m + g  (matches dynamics_quad.cuh:55-57)
    acc = jnp.stack(
        [
            thrust / MASS * (sr * sy + cr * cy * sp),
            -thrust / MASS * (cy * sr - cr * sp * sy),
            GRAVITY + thrust / MASS * cr * cp,
        ]
    )

    # rotational: Euler equations in the body frame, then map back to Euler-angle accels
    w_mat = _euler_rate_matrix(roll, pitch)
    omega = w_mat @ eul_d
    inertia = jnp.array([IXX, IYY, IZZ])
    tau = jnp.stack(
        [
            LENGTH * (u[1] - u[3]),
            LENGTH * (u[2] - u[0]),
            KM * (u[0] - u[1] + u[2] - u[3]),
        ]
    )
    omega_dot = (tau - jnp.cross(omega, inertia * omega)) / inertia

    # d/dt(W) @ eul_d term: omega = W eul_d  =>  eul_dd = W^-1 (omega_dot - dW/dt eul_d)
    rolld, pitchd = eul_d[0], eul_d[1]
    dw_dt = jnp.array(
        [
            [0.0, 0.0, -cp * pitchd],
            [0.0, -sr * rolld, cr * cp * rolld - sr * sp * pitchd],
            [0.0, -cr * rolld, -sr * cp * rolld - cr * sp * pitchd],
        ]
    )
    eul_dd = jnp.linalg.solve(w_mat, omega_dot - dw_dt @ eul_d)
    return jnp.concatenate([acc, eul_dd])


def quadrotor() -> Plant:
    return Plant(
        name="quadrotor",
        n_pos=6,
        n_ctrl=4,
        dynamics=_dynamics,
        rho_init_default=1.0,
        max_defect_default=1.0,
        alpha_base_default=0.5,
        num_alpha_default=16,
    )
