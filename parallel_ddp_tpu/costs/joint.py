"""Joint-space diagonal quadratic costs.

Covers all four reference plants' joint-level families:
  pendulum/cart-pole: QR(i) = Q1 if i==0 else Q2 if i==2 else R, terminal QF on
    states (cost_pend.cuh:19-55, cost_cart.cuh);
  quadrotor: Q1 xyz / Q2 rpy / Q3 xyzdot / Q4 rpydot, R controls, QF terminal
    (cost_quad.cuh:19-58);
  Kuka arm joint mode: Q1 on q, Q2 on qd, R, terminal QF1/QF2, runtime-tunable
    (cost_arm.cuh:126-202).

cost = 0.5 * sum_i q_i(k) (x_i - xg_i)^2 + 0.5 * sum_j r_j u_j^2   (no control cost
at the terminal step).  Gradient/Hessian are the exact diagonals.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.costs.base import CostModel


def _make(name: str, num_time_steps: int, diags: Callable):
    """diags(w) -> (q_diag, r_diag, qf_diag) weight vectors."""
    nf = num_time_steps - 1

    def stage(x, u, k, goal, w: CostWeights):
        q_diag, r_diag, qf_diag = diags(w)
        dx = x - goal
        terminal = k == nf
        qk = jnp.where(terminal, qf_diag, q_diag)
        rk = jnp.where(terminal, jnp.zeros_like(r_diag), r_diag)
        return 0.5 * (jnp.sum(qk * dx * dx) + jnp.sum(rk * u * u))

    def quad(x, u, k, goal, w: CostWeights):
        q_diag, r_diag, qf_diag = diags(w)
        dx = x - goal
        terminal = k == nf
        qk = jnp.where(terminal, qf_diag, q_diag)
        rk = jnp.where(terminal, jnp.zeros_like(r_diag), r_diag)
        g = jnp.concatenate([qk * dx, rk * u])
        h = jnp.diag(jnp.concatenate([qk, rk]))
        return h, g

    return CostModel(name=name, stage=stage, quad=quad)


def fixed_diag_cost(
    name: str, num_time_steps: int, q_diag, r_diag, qf_diag
) -> CostModel:
    """Cost with fixed (non-runtime-tunable) diagonal weights.

    Weights stay NUMPY: they are captured by jitted closures, and captured
    device arrays hit the axon tunnel's slow dispatch path (config.py)."""
    import numpy as np

    q_diag = np.asarray(q_diag, np.float32)
    r_diag = np.asarray(r_diag, np.float32)
    qf_diag = np.asarray(qf_diag, np.float32)
    return _make(name, num_time_steps, lambda w: (q_diag, r_diag, qf_diag))


def pendulum_cost(num_time_steps: int) -> CostModel:
    """QR = [Q1, R] = [1.0, 0.1], R = 0.1, QF = 1000 (cost_pend.cuh:19-24)."""
    return fixed_diag_cost(
        "pendulum_joint", num_time_steps, [1.0, 0.1], [0.1], [1000.0, 1000.0]
    )


def cartpole_cost(num_time_steps: int) -> CostModel:
    """QR = [Q1, R, Q2, R] = [1.0, 0.1, 0.1, 0.1] (cost_cart.cuh QR macro)."""
    return fixed_diag_cost(
        "cartpole_joint", num_time_steps, [1.0, 0.1, 0.1, 0.1], [0.1], [1000.0] * 4
    )


def quadrotor_cost(num_time_steps: int) -> CostModel:
    """Q = [.01 xyz, .001 rpy, 2 xyzdot, 2 rpydot], R = 5, QF = 1000 (cost_quad.cuh:19-25)."""
    q = [0.01] * 3 + [0.001] * 3 + [2.0] * 3 + [2.0] * 3
    return fixed_diag_cost("quad_joint", num_time_steps, q, [5.0] * 4, [1000.0] * 12)


def joint_cost(name: str, num_time_steps: int, n_pos: int, n_ctrl: int) -> CostModel:
    """Runtime-tunable Q1/Q2/R/QF1/QF2 joint cost (arm joint mode, cost_arm.cuh:126-202)."""

    def diags(w: CostWeights):
        q = jnp.concatenate(
            [jnp.full((n_pos,), w.q1, jnp.float32), jnp.full((n_pos,), w.q2, jnp.float32)]
        )
        r = jnp.full((n_ctrl,), w.r, jnp.float32)
        qf = jnp.concatenate(
            [jnp.full((n_pos,), w.qf1, jnp.float32), jnp.full((n_pos,), w.qf2, jnp.float32)]
        )
        return q, r, qf

    return _make(name, num_time_steps, diags)
